"""Advanced analytics shapes: graph motifs (triangles, BFS), sweep-line
interval concurrency, positional TVFs, LATERAL subqueries, and frequent
itemset mining — the analytical patterns a complete engine runs beyond plain
relational queries (SURVEY.md §2.3-§2.5 gap categories, north-star scale ops).

All queries derive their graphs from the fixture star schema (co-purchase:
two parts are connected when they appear in the same order ≥2 times), so
every result is value-checkable against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_etl_project_spark.functions.text import tokens
from fraud_detection_etl_project_spark.plans.llm_queries import TOKS_SQL
from fraud_detection_etl_project_spark.plans.registry import query
from fraud_detection_etl_project_spark.sources.parquet import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Canonical co-purchase edges: (src < dst) part pairs co-ordered in >= 2
# distinct orders. The support threshold is what keeps the graph sparse at
# scale — raw pair counts grow ~quadratically in lines-per-order, but
# support>=2 pairs grow near-linearly with orders (random pairs don't
# repeat). Mirrored verbatim in the oracles below.
_EDGE_SUPPORT = 2

_EDGES_SQL = f"""
SELECT a.l_partkey AS src, b.l_partkey AS dst
FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= {_EDGE_SUPPORT}
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, (a["k"] == b["k"]) & (F.col("src") < F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _EDGE_SUPPORT)
        .select("src", "dst")
    )


@query(
    "copurchase_triangle_count",
    oracle=f"""
WITH e AS ({_EDGES_SQL}),
tri AS (SELECT count(*) AS n_triangles
        FROM e e1 JOIN e e2 ON e1.dst = e2.src
                  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst)
SELECT CAST((SELECT count(*) FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST(tri.n_triangles AS BIGINT) AS n_triangles
FROM tri
""",
)
def copurchase_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the co-purchase graph — the standard graph
    motif/clustering primitive, as two distributed joins.

    Scale plan: edges are canonically oriented (src < dst), so each
    triangle is counted exactly once and the wedge join's fan-out is
    bounded by out-degree under the orientation (the classic
    degree-orientation trick — hub nodes' wedges split across their
    low-id side). Wedge build = edges⋈edges on the middle vertex, close =
    one more equi-join against the edge set; both are plain shuffled hash
    joins on int keys, no driver-side adjacency. The support>=2 edge
    derivation keeps the graph near-linear in orders (see _EDGE_SUPPORT)."""
    e = _copurchase_edges(spark, sf_dir)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b2"), F.col("dst").alias("c"))
    wedges = e1.join(e2, F.col("b") == F.col("b2")).select("a", "b", "c")
    tri = wedges.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("c")), ["a", "c"], "inner"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    nodes = e.select(F.col("src").alias("v")).union(e.select("dst")).distinct()
    stats = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes")).crossJoin(
        e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    )
    return stats.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


@query(
    "part_bfs_2hop",
    oracle=f"""
WITH e AS ({_EDGES_SQL}),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
d0 AS (SELECT DISTINCT p_partkey AS node FROM part WHERE p_brand = 'Brand#1'),
d1 AS (SELECT DISTINCT s.dst AS node FROM sym s JOIN d0 ON s.src = d0.node
       WHERE s.dst NOT IN (SELECT node FROM d0)),
d2 AS (SELECT DISTINCT s.dst AS node FROM sym s JOIN d1 ON s.src = d1.node
       WHERE s.dst NOT IN (SELECT node FROM d0)
         AND s.dst NOT IN (SELECT node FROM d1))
SELECT node, CAST(0 AS INT) AS dist FROM d0
UNION ALL SELECT node, 1 FROM d1
UNION ALL SELECT node, 2 FROM d2
""",
)
def part_bfs_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop BFS reachability from one brand's parts across the
    co-purchase graph (operators/graph.bfs_khop): per-node minimum hop
    distance — the bounded-traversal shape of "related items" expansion.

    Scale: each hop joins only the NEW frontier against the edge list
    (left-anti against settled nodes), so work per hop is bounded by newly
    discovered adjacency, not graph size; min-distance falls out of
    first-discovery order with no per-node aggregation. Fixed k=2 keeps
    the plan shallow (no checkpoint needed; the unrolled-CTE oracle
    mirrors hop by hop)."""
    from fraud_detection_etl_project_spark.operators.graph import bfs_khop

    seeds = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select(F.col("p_partkey").alias("node"))
    )
    return bfs_khop(seeds, _copurchase_edges(spark, sf_dir), k=2)


_SESSIONS_SQL = """
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end
FROM (SELECT user_id, ts, event_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                             (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                             OR epoch_us(CAST(ts AS TIMESTAMP))
                                - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                                  (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                                > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events))
GROUP BY user_id, sid
"""


@query(
    "session_concurrency_hourly",
    oracle=f"""
WITH s AS ({_SESSIONS_SQL}),
deltas AS (
  SELECT date_trunc('hour', session_start) AS hour, 1 AS starts, 0 AS ends FROM s
  UNION ALL
  SELECT date_trunc('hour', session_end), 0, 1 FROM s
),
hourly AS (SELECT hour, CAST(sum(starts) AS BIGINT) AS n_starts,
                  CAST(sum(ends) AS BIGINT) AS n_ends
           FROM deltas GROUP BY 1)
SELECT hour, n_starts, n_ends,
       CAST(sum(n_starts - n_ends) OVER (ORDER BY hour
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS active_at_hour_end
FROM hourly
""",
)
def session_concurrency_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap concurrency via the sweep-line trick: how many user
    sessions are live at each hour boundary. Sessions (gap-based, shared
    derivation with user_sessions_batch) become +1/-1 boundary deltas; the
    answer is a running sum — NO interval self-join anywhere.

    Scale: the naive formulation (sessions ⋈ sessions ON overlap) is
    O(n²) in concurrent intervals and unshippable at 100 TB; the
    sweep-line is two grouped aggregations plus a prefix sum. The prefix
    sum runs as an unpartitioned window — safe ONLY because it runs over
    hour-grain rows (one per hour, ~9k/year regardless of raw volume),
    i.e. the two-phase pattern: reduce raw data per bucket in parallel
    first, order only the tiny bucket frame."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    sessions = (
        e.withColumn("new_s", F.when(prev.isNull() | ((us - prev) > 1_800_000_000), 1).otherwise(0))
        .withColumn("sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"))
    )
    deltas = sessions.select(
        F.date_trunc("hour", "session_start").alias("hour"),
        F.lit(1).alias("starts"),
        F.lit(0).alias("ends"),
    ).union(
        sessions.select(
            F.date_trunc("hour", "session_end").alias("hour"),
            F.lit(0).alias("starts"),
            F.lit(1).alias("ends"),
        )
    )
    hourly = deltas.groupBy("hour").agg(
        F.sum("starts").cast("bigint").alias("n_starts"),
        F.sum("ends").cast("bigint").alias("n_ends"),
    )
    run = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return hourly.withColumn(
        "active_at_hour_end",
        F.sum(F.col("n_starts") - F.col("n_ends")).over(run).cast("bigint"),
    )


@query(
    "doc_token_positions",
    oracle=f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
SELECT doc_id, CAST(0 AS INT) AS pos, toks[1] AS tok FROM t WHERE len(toks) >= 1
UNION ALL SELECT doc_id, 1, toks[2] FROM t WHERE len(toks) >= 2
UNION ALL SELECT doc_id, 2, toks[3] FROM t WHERE len(toks) >= 3
""",
)
def doc_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional table-valued generator (§2.8/§2.10 surface): posexplode
    the token array, keep the first three positions per document — the
    prefix-token shape used for title/lead extraction.

    Scale: posexplode is a JVM-side Generate operator (no Python);
    filtering pos < 3 immediately after keeps the exploded row count at
    3×docs regardless of document length. (With column pruning the
    generator only materializes the token column.)"""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    )
    return d.filter(F.col("pos") < 3)


@query(
    "customer_order_stats_lateral",
    oracle="""
SELECT c.c_custkey, s.n_orders, s.max_price
FROM customer c, LATERAL (
  SELECT CAST(count(*) AS BIGINT) AS n_orders, max(o_totalprice) AS max_price
  FROM orders o WHERE o.o_custkey = c.c_custkey
) s
""",
)
def customer_order_stats_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL API surface): per-customer order
    stats via a lateral aggregate — the same ANSI LATERAL text DuckDB
    runs as the oracle.

    Scale: Catalyst decorrelates the lateral aggregate into a left outer
    aggregate join (one custkey shuffle) — per-row subquery execution
    never survives the optimizer, so LATERAL is declarative sugar, not a
    driver loop. count(*) over an empty correlated group correctly
    decorrelates to 0 (the classic COUNT-bug case the rewrite handles)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, s.n_orders, s.max_price
        FROM customer c, LATERAL (
          SELECT CAST(count(*) AS BIGINT) AS n_orders, max(o_totalprice) AS max_price
          FROM orders o WHERE o.o_custkey = c.c_custkey
        ) s
        """
    )


@query(
    "frequent_part_pairs",
    oracle="""
SELECT a.l_partkey AS src, b.l_partkey AS dst,
       CAST(count(*) AS BIGINT) AS support
FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= 3
ORDER BY support DESC, src, dst
""",
)
def frequent_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-itemset pairs (market-basket mining, the A-Priori 2-pass):
    part pairs co-ordered in ≥3 distinct orders, ranked by support.

    Scale plan: the pair generation self-joins the DISTINCT (order, part)
    projection on orderkey — fan-out is lines-per-order choose 2, bounded
    by basket size, not catalog size. At scale the A-Priori prune applies:
    a pair can only reach support s if both parts individually do
    (monotonicity), so semi-joining items to support>=s singletons first
    cuts the self-join input with zero effect on results — at this
    fixture's uniform part distribution every part clears the bar, so the
    prune is left out of the plan rather than adding a no-op pass; the
    support>=3 HAVING runs map-side-combined either way. Total order
    (support desc, src, dst) keeps top ranking engine-stable."""
    items = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = items.select(F.col("l_orderkey").alias("k2"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, (F.col("k") == F.col("k2")) & (F.col("src") < F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .filter(F.col("support") >= 3)
        .orderBy(F.col("support").desc(), "src", "dst")
    )


@query(
    "heavy_hitter_users",
    oracle="""
WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, t.n_total
FROM events, t
GROUP BY user_id, t.n_total
HAVING count(*) * 1000 >= t.n_total * 8
""",
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (frequent-element detection) as the two-pass
    sketch-then-verify pattern: candidate generation with
    ``DataFrame.freqItems`` (the Karp/Misra-Gries streaming summary —
    single pass, bounded memory, NO false negatives above the support
    level), then one exact filtered count over the candidates. The final
    output is therefore EXACT (every user with ≥0.8% of all events),
    which is what makes a value-level oracle possible for an
    approximate-algorithm query.

    Scale: the sketch pass aggregates per-partition summaries of ≤1/s
    entries each — the collected candidate list is parameters-sized
    (≤200 items at support=0.005), like ivf_centroids. The verify pass is
    a broadcast-filtered groupBy on the candidate set only. The threshold
    comparison is exact integer cross-multiplication (n·1000 ≥ total·8) —
    no float shares. On this fixture's ~uniform 150 users the candidate
    set is all users (1/s exceeds the cardinality), so the prune is a
    no-op pass-through — the machinery still runs; on a skewed 100 TB
    keyspace it is what caps the verify join."""
    e = _t(spark, sf_dir, "events").select("user_id")
    total = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    cands = [r for r in e.freqItems(["user_id"], support=0.005).collect()[0][0]]
    return (
        e.filter(F.col("user_id").isin(cands))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_events") * 1000 >= F.col("n_total") * 8)
    )
