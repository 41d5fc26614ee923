"""Skew mitigation: salted aggregation and salted joins for hot keys.

The reference's natural hot keys are high-traffic merchant accounts
(``nameDest`` ``M…`` ids, ``/root/reference/Sample File/test_aws.csv``): at
100 TB a single merchant can dominate a shuffle partition and serialize the
stage. Two standing fixes, both pure DataFrame compositions:

- **Salted two-stage aggregation**: group by (key, salt) first — the hot
  key's rows spread over ``n`` reducers — then re-aggregate by key. Only
  algebraic aggregates (sum/count/min/max) compose this way; avg is
  re-derived as sum/count.
- **Salted join**: explode the *small* side n ways (key, 0..n-1) and salt
  the big side deterministically; the hot key's join work spreads over n
  tasks. AQE's skew-join split (`spark.sql.adaptive.skewJoin`, on by
  default in session.py) handles moderate skew automatically — the manual
  salt is for the pathological keys AQE's split threshold misses.

Salts are derived with ``pmod(xxhash64(...), n)`` — deterministic, so
results are reproducible and oracle-checkable (no ``rand()``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def salt_col(on: Column | str | None, n: int = DEFAULT_SALT_BUCKETS) -> Column:
    """Salt in [0, n). With ``on``, deterministic from that column (use a
    high-cardinality row attribute, e.g. the row's natural id — NOT the hot
    key itself): reproducible, oracle-checkable. With ``on=None``, a seeded
    ``rand`` — for rows with no natural salt column (join results are
    identical either way; only the shuffle distribution differs)."""
    if on is None:
        return (F.rand(seed=7) * n).cast("int")
    c = F.col(on) if isinstance(on, str) else on
    return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    salt_on: str,
    n: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-stage skew-proof sum/count/avg by ``group_cols``.

    Stage 1 shuffles on (keys + salt) — ≤ n partitions share any hot key —
    stage 2 shuffles the n-row-per-key partials on the keys alone (tiny).
    Returns columns: group_cols, n_rows, total, mean.
    """
    stage1 = (
        df.withColumn("_salt", salt_col(salt_on, n))
        .groupBy(*group_cols, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(value_col).alias("_s"),
        )
    )
    return (
        stage1.groupBy(*group_cols)
        .agg(F.sum("_n").alias("n_rows"), F.sum("_s").alias("total"))
        .withColumn("mean", F.col("total") / F.col("n_rows"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_on: str | None = None,
    n: int = DEFAULT_SALT_BUCKETS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot values of ``key``: the small side is
    replicated n× (one copy per salt), the big side salted
    deterministically on ``salt_on``; joining on (key, salt) spreads each
    hot key across n tasks. Small side grows n× — keep n × |small| well
    under the broadcast threshold when a broadcast join is intended."""
    salts = F.array(*[F.lit(i) for i in range(n)])
    small_rep = small.withColumn("_salt", F.explode(salts))
    big_s = big.withColumn("_salt", salt_col(salt_on, n))
    return big_s.join(small_rep, on=[key, "_salt"], how=how).drop("_salt")
