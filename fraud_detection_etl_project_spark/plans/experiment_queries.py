"""Experimentation readouts completing the A/B-analysis family started by
``welch_ab_value_test``: CUPED variance reduction (the industry-standard
pre-period covariate adjustment), the sample-ratio-mismatch guardrail
(chi-square on assignment counts), and the Mann-Whitney U rank-sum test
(the nonparametric alternative when value distributions are heavy-tailed,
with full tie correction).

Contract as everywhere in the repo: Spark plans stay JVM-side and
shuffle-lean (single-scan conditional aggregation; windows only over
reduced or per-key frames), and every query carries a DuckDB oracle that
reproduces the identical numbers — money on the exact integer-cent
lattice, ranks on the exact half-unit lattice, ratios computed from those
identical integers by the same expression in both engines, quantized once
at the end (``fxr``).

Reference parity note: the reference pipeline
(lambda_function_aws.py:24-113) ends at row-level flags; these are the
experiment-measurement layers a fraud/risk team runs downstream of such
flags (did the new rule reduce loss without tanking conversion?), so they
extend SURVEY.md §2.4/§2.5's aggregate/window families, not replace them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_etl_project_spark.plans.registry import query
from fraud_detection_etl_project_spark.sources.parquet import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

# Fixed pre-period / experiment-period boundary inside the events table's
# 2024-01-01..2024-01-30 span (TESTDATA.md): first half is the covariate
# window, second half is the measured window.
_CUPED_BOUNDARY = "2024-01-16 00:00:00"


@query(
    "cuped_adjusted_lift",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         CAST(user_id % 2 AS INT) AS arm,
         CAST(coalesce(sum(CASE WHEN ts <  TIMESTAMP '{_CUPED_BOUNDARY}'
                 THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS x,
         CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_BOUNDARY}'
                 THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
  FROM per_user
),
th AS (
  SELECT n, sx,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta
  FROM g
),
a AS (
  SELECT arm,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(x) AS BIGINT) AS sxa, CAST(sum(y) AS BIGINT) AS sya,
         CAST(sum(x * x) AS BIGINT) AS sxxa, CAST(sum(y * y) AS BIGINT) AS syya,
         CAST(sum(x * y) AS BIGINT) AS sxya
  FROM per_user GROUP BY arm
)
SELECT a.arm, a.n_users,
       floor(CAST(a.sya AS DOUBLE) / a.n_users / 100.0 * 1000000.0 + 0.5) / 1000000.0
         AS mean_value,
       floor((CAST(a.sya AS DOUBLE)
              - th.theta * (CAST(a.sxa AS DOUBLE)
                            - a.n_users * (CAST(th.sx AS DOUBLE) / th.n)))
             / a.n_users / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS mean_value_cuped,
       floor((1.0 - ((CAST(a.syya AS DOUBLE)
                      - 2.0 * th.theta * CAST(a.sxya AS DOUBLE)
                      + th.theta * th.theta * CAST(a.sxxa AS DOUBLE)
                      - (CAST(a.sya AS DOUBLE) - th.theta * CAST(a.sxa AS DOUBLE))
                        * (CAST(a.sya AS DOUBLE) - th.theta * CAST(a.sxa AS DOUBLE))
                        / a.n_users)
                     / (CAST(a.syya AS DOUBLE)
                        - CAST(a.sya AS DOUBLE) * CAST(a.sya AS DOUBLE) / a.n_users)))
             * 1000000.0 + 0.5) / 1000000.0 AS var_reduction,
       floor(th.theta * 1000000000.0 + 0.5) / 1000000000.0 AS theta
FROM a, th
""",
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al.
    2013) variance reduction: per user, X = pre-period value (covariate),
    Y = experiment-period value (metric), arms by user-id parity;
    theta = cov(X,Y)/var(X) pooled across arms, adjusted metric
    Y' = Y - theta*(X - mean(X)). Reports per-arm raw vs CUPED-adjusted
    means and the achieved variance reduction.

    Exactness: X and Y are exact integer-cent sums per user; every
    downstream moment (theta, means, variances) is formed from exact int64
    sufficient statistics by the same IEEE-double expression in both
    engines — nothing depends on a floating-point reduction order. Key
    algebra: mean and variance of the ADJUSTED metric are linear/quadratic
    in the sufficient statistics (mean Y' = mean Y - theta*(mean X_arm -
    mean X); var Y' = var Y - 2*theta*cov + theta^2*var X), so no per-row
    adjusted column is ever materialized or summed.

    Scale: one fact scan with conditional cent-sums grouped by user (the
    only fact-sized shuffle), then two tiny aggregations over the per-user
    frame; theta is a 1-row broadcast cross join. Int64 headroom: per-user
    cents ~3e6, sum-of-products ~1e13/user — safe past sf100; at extreme
    user counts, rescale the per-user lattice to whole dollars before the
    moment pass."""
    boundary = F.lit(_CUPED_BOUNDARY).cast("timestamp")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    per_user = (
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(F.col("ts") < boundary, cents)), F.lit(0)).cast("long").alias("x"),
            F.coalesce(F.sum(F.when(F.col("ts") >= boundary, cents)), F.lit(0)).cast("long").alias("y"),
        )
        .select((F.col("user_id") % 2).cast("int").alias("arm"), "x", "y")
    )
    g = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    th = g.select(
        "n",
        "sx",
        (
            (F.col("n").cast("double") * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (F.col("n").cast("double") * F.col("sxx").cast("double")
               - F.col("sx").cast("double") * F.col("sx").cast("double"))
        ).alias("theta"),
    )
    a = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("sxa"),
        F.sum("y").cast("long").alias("sya"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxxa"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syya"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxya"),
    )
    j = a.crossJoin(F.broadcast(th))
    theta = F.col("theta")
    sya = F.col("sya").cast("double")
    sxa = F.col("sxa").cast("double")
    syya = F.col("syya").cast("double")
    sxxa = F.col("sxxa").cast("double")
    sxya = F.col("sxya").cast("double")
    nu = F.col("n_users")
    mean_x_global = F.col("sx").cast("double") / F.col("n")
    adj_num = syya - 2.0 * theta * sxya + theta * theta * sxxa - (
        (sya - theta * sxa) * (sya - theta * sxa) / nu
    )
    raw_num = syya - sya * sya / nu
    q6 = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return j.select(
        "arm",
        "n_users",
        q6(sya / nu / 100.0).alias("mean_value"),
        q6((sya - theta * (sxa - nu * mean_x_global)) / nu / 100.0).alias("mean_value_cuped"),
        q6(1.0 - adj_num / raw_num).alias("var_reduction"),
        (F.floor(theta * 1000000000.0 + 0.5) / 1000000000.0).alias("theta"),
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) guardrail
# ---------------------------------------------------------------------------


@query(
    "ab_srm_check",
    oracle="""
WITH assign AS (
  SELECT DISTINCT event_type, user_id,
         CAST(('0x' || substring(md5('srm1|' || CAST(user_id AS VARCHAR)), 1, 6)) AS BIGINT) % 2 AS arm
  FROM events
),
c AS (
  SELECT event_type,
         CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
         CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b
  FROM assign GROUP BY 1
)
SELECT event_type, n_a, n_b,
       floor(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
             * 1000000.0 + 0.5) / 1000000.0 AS chi_sq,
       CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b) > 3.841459 AS srm_flag
FROM c
""",
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: deterministic 50/50 assignment
    (first 24 bits of md5('srm1|' || user_id) mod 2 — the same
    cross-engine hash-assignment idiom as doc_train_test_split), distinct
    exposed users counted per arm per event type, and the 2-cell
    chi-square statistic against the expected even split — in the reduced
    form chi^2 = (n_a - n_b)^2 / (n_a + n_b), algebraically identical to
    sum((obs - exp)^2 / exp) with exp = (n_a + n_b)/2 and exact in int64
    until the single final division. Flags segments where chi^2 exceeds
    the 95% critical value (3.841, df = 1) — the standard "don't trust
    this experiment" tripwire.

    Scale: one scan -> distinct on (event_type, user_id) — the same
    map-side-combinable shuffle a count(DISTINCT) needs — then a 5-row
    conditional aggregate. No joins, no windows."""
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("srm1|"), F.col("user_id").cast("string")).cast("binary")),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    assign = (
        _t(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .select("event_type", arm.alias("arm"))
    )
    c = assign.groupBy("event_type").agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("long").alias("n_a"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("long").alias("n_b"),
    )
    diff2 = ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))).cast("double")
    chi = diff2 / (F.col("n_a") + F.col("n_b"))
    return c.select(
        "event_type",
        "n_a",
        "n_b",
        (F.floor(chi * 1000000.0 + 0.5) / 1000000.0).alias("chi_sq"),
        (chi > 3.841459).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test (tie-corrected)
# ---------------------------------------------------------------------------


@query(
    "mannwhitney_value_test",
    oracle="""
WITH g AS (
  SELECT event_type, value,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS cnt_a
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, cnt, cnt_a,
         2 * coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY value
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS midrank2
  FROM g
),
s AS (
  SELECT event_type,
         CAST(sum(cnt_a) AS BIGINT) AS n_a,
         CAST(sum(cnt - cnt_a) AS BIGINT) AS n_b,
         CAST(sum(cnt_a * midrank2) AS BIGINT) AS r2_a,
         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_t
  FROM r GROUP BY 1
)
SELECT event_type, n_a, n_b,
       CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
       floor((CAST(r2_a - n_a * (n_a + 1) - n_a * n_b AS DOUBLE) / 2.0)
             / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                    * ((n_a + n_b + 1)
                       - CAST(tie_t AS DOUBLE)
                         / ((n_a + n_b) * CAST(n_a + n_b - 1 AS DOUBLE))))
             * 1000000.0 + 0.5) / 1000000.0 AS z_stat
FROM s
""",
)
def mannwhitney_value_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test per event type (cohorts by user-id
    parity, matching welch_ab_value_test): the nonparametric two-sample
    test a metrics platform reaches for when values are heavy-tailed and
    the t-test's normality assumption is suspect. Tied values get the
    standard mid-rank, and the normal-approximation z uses the full tie
    correction sum(t^3 - t).

    Exactness: ranks live on the half-unit lattice, so the plan carries
    midrank2 = 2*midrank (pure int64: twice the cumulative count of
    smaller values + t + 1). Rank sums, U, and the tie term stay exact
    integers; the only doubles are the final z division and the /2.0 —
    identical expressions over identical integers in both engines, then
    one 1e-6 quantization.

    Scale: ranking never touches raw rows — values are first grouped to
    (event_type, value) with per-group counts (map-side combinable), and
    the cumulative window runs over that REDUCED frame, partitioned by
    event_type (no global single-partition window). Everything after is a
    5-row aggregate."""
    e = _t(spark, sf_dir, "events").select("event_type", "user_id", "value")
    g = e.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.count(F.when(F.col("user_id") % 2 == 0, 1)).cast("long").alias("cnt_a"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.select(
        "event_type",
        "cnt",
        "cnt_a",
        (2 * F.coalesce(F.sum("cnt").over(w), F.lit(0)) + F.col("cnt") + 1).alias("midrank2"),
    )
    s = r.groupBy("event_type").agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("long").alias("n_b"),
        F.sum(F.col("cnt_a") * F.col("midrank2")).cast("long").alias("r2_a"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).cast("long").alias("tie_t"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    n = n_a + n_b
    num = (F.col("r2_a") - n_a * (n_a + 1) - n_a * n_b).cast("double") / 2.0
    var_u = (
        n_a.cast("double") * n_b / 12.0
        * ((n + 1) - F.col("tie_t").cast("double") / (n * (n - 1).cast("double")))
    )
    return s.select(
        "event_type",
        "n_a",
        "n_b",
        ((F.col("r2_a") - n_a * (n_a + 1)).cast("double") / 2.0).alias("u_a"),
        (F.floor(num / F.sqrt(var_u) * 1000000.0 + 0.5) / 1000000.0).alias("z_stat"),
    )
