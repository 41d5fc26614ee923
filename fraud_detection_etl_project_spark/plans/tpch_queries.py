"""Deep TPC-H query-shape coverage: Q2, Q4, Q6, Q7, Q8, Q9, Q11, Q12, Q13,
Q15, Q16, Q17, Q19, Q20, Q21, Q22 adapted to the fixture star schema —
together with Q1/Q3/Q5/Q10/Q14/Q18 elsewhere in the registry, ALL 22 TPC-H
query archetypes are represented and oracle-checked.

These close the remaining classic analytical join/filter shapes the earlier
rounds didn't name: EXISTS counted per group (Q4), pure scan-filter-aggregate
(Q6), two-sided dimension pair disjunction (Q7), conditional CASE aggregation
over a join (Q12), count-of-counts distribution with a zero bucket (Q13),
derived view + scalar max subquery (Q15), correlated per-group average
threshold (Q17), multi-clause disjunctive join predicates (Q19),
EXISTS/NOT-EXISTS chains with self-joins (Q21), and scalar-subquery
threshold + anti-join (Q22). The reference engine's query surface is filter/
project/aggregate (SURVEY.md §2.2-§2.4); these are the §2.3/§2.4 gap-category
shapes a complete relational engine must run.

Adaptations to the fixture schema (no l_shipmode/l_receiptdate/partsupp/
c_phone): Q12 classifies by l_returnflag, Q21's "kept waiting" becomes "sole
supplier with returned ('R') lines on a multi-supplier order", Q22's country
code is the last digit of c_name and "no orders" becomes "no orders in the
last 18 months of the data window" (every fixture customer has ≥1 lifetime
order). The plan shapes — which is what this module adds — are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_etl_project_spark.functions.rounding import cents_sum, cents_sum_sql
from fraud_detection_etl_project_spark.plans.registry import query
from fraud_detection_etl_project_spark.sources.parquet import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_Q7_NATIONS = ("NATION_3", "NATION_7")


@query(
    "q7_nation_trade_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       {cents_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = '{_Q7_NATIONS[0]}' AND n2.n_name = '{_Q7_NATIONS[1]}')
    OR (n1.n_name = '{_Q7_NATIONS[1]}' AND n2.n_name = '{_Q7_NATIONS[0]}'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between a nation pair, both directions,
    by shipment year.

    Scale plan: the two-nation filter lands on the 25-row nation dim and is
    broadcast into supplier and customer BEFORE the fact joins, so the
    lineitem stream is cut to the 2/25 of suppliers (and orders to 2/25 of
    customers) that can possibly match — the disjunctive pair condition
    then runs on two already-tiny joined columns, never widening the fact.
    Ship-date range prunes the lineitem scan (row-group stats). Two fact
    shuffles (suppkey is carried by the lineitem⋈orders orderkey shuffle's
    output), one final grouped agg on a 3-column low-cardinality key."""
    pair = list(_Q7_NATIONS)
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "supp_nation")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q12_priority_by_returnflag",
    oracle="""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY 1
""",
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional CASE counts over a fact-fact join —
    how many high- vs low-priority orders ship under each return class in
    one year (fixture stand-in for shipmode).

    Scale plan: the year filter prunes the lineitem scan; the join carries
    only (orderkey, returnflag) vs (orderkey, priority) — two columns a
    side; the CASE runs inside the partial aggregate (map-side combine),
    so the single orderkey shuffle is the only data movement and the final
    key is 6 rows. The conditional-sum-inside-agg is the pattern, not a
    filter-then-count double scan."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q19_CLAUSES = (
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#2", 1, 25, 10, 30),
    ("Brand#3", 1, 35, 20, 40),
)


@query(
    "q19_disjunctive_revenue",
    bench=True,
    oracle=f"""
SELECT {cents_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = '{_Q19_CLAUSES[0][0]}' AND p.p_size BETWEEN {_Q19_CLAUSES[0][1]} AND {_Q19_CLAUSES[0][2]}
       AND l.l_quantity BETWEEN {_Q19_CLAUSES[0][3]} AND {_Q19_CLAUSES[0][4]})
   OR (p.p_brand = '{_Q19_CLAUSES[1][0]}' AND p.p_size BETWEEN {_Q19_CLAUSES[1][1]} AND {_Q19_CLAUSES[1][2]}
       AND l.l_quantity BETWEEN {_Q19_CLAUSES[1][3]} AND {_Q19_CLAUSES[1][4]})
   OR (p.p_brand = '{_Q19_CLAUSES[2][0]}' AND p.p_size BETWEEN {_Q19_CLAUSES[2][1]} AND {_Q19_CLAUSES[2][2]}
       AND l.l_quantity BETWEEN {_Q19_CLAUSES[2][3]} AND {_Q19_CLAUSES[2][4]})
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a join whose predicate is a disjunction of
    conjunctions mixing both sides' columns — the classic test of
    disjunctive predicate handling.

    Scale plan: the query is written as the single OR predicate and left to
    Catalyst, which (a) extracts the common p_partkey equi-condition so
    this stays a hash join, never a nested-loop, and (b) derives the
    one-side implications of the disjunction — p_brand IN (…) AND p_size
    ≤ max bound onto the part scan, l_quantity range onto the lineitem
    scan — so both scans prune before the join (visible as PushedFilters).
    Hand-splitting the OR into three unioned joins would scan the fact
    three times; expressing it declaratively scans once."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    clause = None
    for brand, smin, smax, qmin, qmax in _Q19_CLAUSES:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & F.col("l_quantity").between(qmin, qmax)
        )
        clause = c if clause is None else (clause | c)
    return (
        li.join(p, (F.col("p_partkey") == F.col("l_partkey")) & clause)
        .agg(
            cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


@query(
    "q21_sole_return_supplier",
    bench=True,
    oracle="""
WITH l1 AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM l1) l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
""",
)
def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS chain over self-joins of the
    fact table — suppliers who were the ONLY supplier with returned lines
    on a finalized multi-supplier order.

    Scale plan: the candidate set (distinct (orderkey, suppkey) with 'R'
    lines on 'F' orders) shrinks first — both status filters push into the
    scans before the orders join. The EXISTS becomes a left-semi and the
    NOT EXISTS a left-anti join, both against the slim (orderkey, suppkey)
    projection of lineitem, equi-keyed on orderkey with the suppkey
    inequality as a residual — all three legs shuffle on orderkey once and
    co-partition (Spark reuses the exchange). No correlated per-row
    subquery execution survives: the plan is three hash joins + one
    grouped count + TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        "l_returnflag",
    )
    cond = (F.col("l_orderkey") == F.col("x_orderkey")) & (
        F.col("l_suppkey") != F.col("x_suppkey")
    )
    waited = (
        l1.join(others.select("x_orderkey", "x_suppkey"), cond, "left_semi")
        .join(others.filter(F.col("l_returnflag") == "R").select("x_orderkey", "x_suppkey"),
              cond, "left_anti")
    )
    return (
        waited.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


@query(
    "q22_idle_customer_balance",
    oracle="""
WITH pos AS (
  SELECT CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
         CAST(count(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT substring(c.c_name, length(c.c_name), 1) AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       sum(CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT)) / 100.0 AS totacctbal
FROM customer c, pos
WHERE substring(c.c_name, length(c.c_name), 1) IN ('1', '3', '5', '7', '9')
  AND CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) * pos.n > pos.sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
ORDER BY 1
""",
)
def q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (global positive-balance
    average) + anti-join (customers with no recent orders), grouped by a
    derived code.

    Scale plan: the global average is computed as ONE aggregate row
    (sum_cents, n) and broadcast via crossJoin — parameters, not data; the
    above-average comparison is the exact integer cross-multiplication
    cents(bal)·n > sum_cents, so Spark and the oracle agree bit-for-bit
    (no float average). The recent-orders probe is a left-anti join on
    custkey against the date-pruned orders scan. One fact shuffle (the
    anti join); the grouped result is ≤5 rows."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    cents = F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("bigint")
    pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(cents).cast("bigint").alias("sum_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    code = F.substring(F.col("c_name"), -1, 1)
    return (
        c.withColumn("cntrycode", code)
        .filter(F.col("cntrycode").isin("1", "3", "5", "7", "9"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .crossJoin(F.broadcast(pos))
        .filter(cents * F.col("n") > F.col("sum_cents"))
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            cents_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q4_priority_order_check",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1 ORDER BY 1
""",
)
def q4_priority_order_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS against the fact table, counted per
    priority — one quarter's orders having at least one line shipped
    more than 60 days after the order date (fixture stand-in for the
    commit<receipt lateness test).

    Scale plan: the EXISTS is a left-semi join on orderkey (first match
    wins — no row multiplication, no distinct needed); the date filter
    prunes the orders scan before the join; the lateness condition rides
    as a residual on the semi join. One orderkey shuffle + a 5-row
    grouped count."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT sum(CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5) AS BIGINT)) / 100.0 AS promo_revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate query — revenue
    effect of discount changes, no join anywhere.

    Scale plan: ALL three predicates push to the parquet scan (date +
    discount range + quantity bound — row-group stats prune), the
    product aggregates map-side, and the result is one row: the query
    that measures raw scan bandwidth. This is the shape where columnar
    pruning matters most — 4 of 11 lineitem columns read."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        cents_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("promo_revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY 1
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: count-of-counts distribution — how many customers
    placed N qualifying orders each, including the zero bucket (the LEFT
    join is what keeps order-less customers in the histogram; an inner
    join silently drops the most interesting bar).

    Scale plan: the priority filter lands on the orders scan INSIDE the
    join condition (left-join semantics: filtering before the join is
    required, a WHERE after it would turn the join inner); first
    aggregation shuffles on custkey, the count-of-counts re-shuffles
    only the (custkey-count, 1) pairs — second shuffle is
    distribution-sized, not customer-sized."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_cents / 100.0 AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_cents = (SELECT max(total_cents) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived revenue view + scalar subquery on its own
    maximum — the supplier(s) with peak quarterly revenue. The max
    comparison runs on exact integer cents, so "equals the max" is
    engine-stable (a float revenue tie would be ulp-fragile).

    Scale plan: one quarter-pruned fact aggregation builds the revenue
    frame ONCE (cached implicitly by reuse through the self-referencing
    max — Spark plans the max as a separate aggregation of the same
    frame; both legs are supplier-cardinality, cheap); the max is a
    1-row broadcast crossed into the filter; supplier joins in as a
    broadcast dim."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + 0.5).cast(
                "bigint"
            )
        ).alias("total_cents")
    )
    mx = revenue.agg(F.max("total_cents").alias("max_cents"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("max_cents"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", (F.col("total_cents") / F.lit(100.0)).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
WITH pavg AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
         CAST(count(*) AS BIGINT) AS qty_n
  FROM lineitem GROUP BY 1
)
SELECT sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0 AS avg_yearly_cents_sum,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN pavg p ON p.l_partkey = l.l_partkey
WHERE CAST(l.l_quantity AS BIGINT) * 5 * p.qty_n < p.qty_sum
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group average threshold — revenue
    from lineitems whose quantity is below 20% of their part's average
    quantity (the small-lot analysis). The correlated avg decorrelates to
    one grouped aggregate joined back to the fact; the threshold
    comparison is the exact integer cross-multiplication
    qty·5·n < Σqty (fixture quantities are whole numbers), so no float
    average exists to disagree on.

    Scale plan: two passes over lineitem (the per-part aggregate, then
    the probe join) — both shuffle on partkey and AQE reuses the
    exchange; the per-part aggregate is part-cardinality (a dimension-
    sized build side)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    pavg = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty_sum"),
        F.count(F.lit(1)).cast("bigint").alias("qty_n"),
    )
    return (
        li.join(pavg, F.col("l_partkey") == F.col("p_key"))
        .filter(F.col("l_quantity").cast("bigint") * 5 * F.col("qty_n") < F.col("qty_sum"))
        .agg(
            (
                F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint"))
                / F.lit(100.0)
            ).alias("avg_yearly_cents_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


@query(
    "q9_product_type_profit",
    oracle=f"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       {cents_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type LIKE 'STA%' OR p.p_type LIKE '%OMO'
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and order
    year, selecting parts by LIKE patterns (prefix + suffix — fixture
    p_type is single-word, so 'STA%'/'%OMO' stand in for Q9's
    '%green%'). No ps_supplycost in the fixture ⇒ profit reduces to
    discounted revenue; the 5-way join + two-level rollup IS the shape.

    Scale plan: the LIKE disjunction pushes into the part scan as
    StartsWith/EndsWith parquet filters (plan-tested — the pushdown
    class this query exists to pin), cutting the build side before the
    fact join; supplier/nation broadcast; lineitem⋈orders is the one
    fact-fact shuffle; the rollup key is (25 nations × ~6 years)."""
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_type").like("STA%") | F.col("p_type").like("%OMO")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("profit"))
        .orderBy("nation", "o_year")
    )


@query(
    "q2_min_price_supplier",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2
),
keyed AS (
  SELECT l_partkey, l_suppkey,
         (sum_cents * 10000) // n AS avg_units
  FROM ps
),
best AS (
  SELECT l_partkey,
         arg_min(l_suppkey, avg_units * 100000 + l_suppkey) AS best_supp,
         min(avg_units) AS best_avg_units
  FROM keyed GROUP BY 1
)
SELECT p.p_partkey, p.p_brand, s.s_name AS cheapest_supplier,
       b.best_avg_units / 10000.0 AS cheapest_avg_price
FROM best b
JOIN part p ON p.p_partkey = b.l_partkey
JOIN supplier s ON s.s_suppkey = b.best_supp
WHERE p.p_size <= 5
ORDER BY p.p_partkey
""",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group minimum with the argument joined back —
    each small part's cheapest supplier by average sale price (fixture
    stand-in for ps_supplycost). The average is exact integer units
    (cents·1e4 floor-divided by count — both engines' integer division
    agrees), and the min carries a suppkey tiebreak in one scalar key, so
    "the" cheapest supplier is a total order, not an engine accident.

    Scale plan: one (part, supplier) aggregate over the fact, one
    part-keyed min_by — no correlated per-part subquery survives; the
    size filter prunes via the broadcast part dim at the end (cheap
    either way; at TPC-H cardinalities part⋈best is dim-sized)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint")).alias("sum_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    keyed = ps.select(
        "l_partkey",
        "l_suppkey",
        F.expr("sum_cents * 10000 div n").alias("avg_units"),
    )
    best = keyed.groupBy("l_partkey").agg(
        F.min_by("l_suppkey", F.col("avg_units") * F.lit(100_000) + F.col("l_suppkey")).alias(
            "best_supp"
        ),
        F.min("avg_units").alias("best_avg_units"),
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5).select("p_partkey", "p_brand")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("best_supp") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            F.col("s_name").alias("cheapest_supplier"),
            (F.col("best_avg_units") / F.lit(10_000.0)).alias("cheapest_avg_price"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q8_nation_market_share",
    oracle="""
WITH rev AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5) AS BIGINT) AS cents,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       floor(sum(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END) * 1000000.0
             / sum(cents) + 0.5) / 1000000.0 AS mkt_share
FROM rev GROUP BY 1 ORDER BY 1
""",
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share — one nation's slice of a region's
    yearly import revenue, the conditional-numerator / full-denominator
    fraction computed inside a single aggregate pass (never two scans).
    Numerator and denominator are exact integer cents; the share divides
    once and quantizes at 1e-6.

    Scale plan: region filter cuts the customer dim before the fact
    joins (broadcast chain region→nation→customer semi); supplier nation
    broadcasts in for the CASE; the single grouped agg keys on ~6 years.
    One orderkey and one custkey shuffle — identical movement to Q5."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    nc = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cnk"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("cnk"), "left_semi")
        .select("c_custkey")
    )
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("snk"))
        .select("s_suppkey", "supp_nation")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + 0.5
    ).cast("bigint")
    nation_cents = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", cents).otherwise(F.lit(0))
    ).cast("bigint")
    total_cents = F.sum(cents).cast("bigint")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            nation_cents.alias("nation_cents"),
            total_cents.alias("total_cents"),
            (
                F.floor(nation_cents * F.lit(1_000_000.0) / total_cents + F.lit(0.5))
                / F.lit(1_000_000.0)
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
WITH excluded AS (
  SELECT s_suppkey FROM supplier WHERE s_name LIKE '%0'
),
pairs AS (
  SELECT DISTINCT l.l_partkey, l.l_suppkey
  FROM lineitem l
  WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
)
SELECT p.p_brand, CAST(p.p_size // 10 AS INT) AS size_decade,
       CAST(count(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs pr
JOIN part p ON p.p_partkey = pr.l_partkey
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p.p_brand, size_decade
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    bucket, with a NOT IN exclusion subquery (complaint suppliers →
    fixture stand-in: names ending in '0').

    Scale plan: the NOT IN becomes a left-anti join against the tiny
    excluded set BEFORE the distinct — the exclusion prunes the
    (part, supplier) pair space first; count(DISTINCT) then runs on
    already-distinct pairs (the explicit distinct makes the partial
    aggregation two-phase-safe); part attributes broadcast in."""
    excluded = _t(spark, sf_dir, "supplier").filter(F.col("s_name").like("%0")).select(
        "s_suppkey"
    )
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .distinct()
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    return (
        pairs.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.expr("p_size div 10").cast("int").alias("size_decade"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "size_decade")
    )


@query(
    "q20_heavy_shippers_of_brand",
    oracle="""
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
    AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey
  HAVING sum(CAST(l.l_quantity AS BIGINT)) > 100
)
ORDER BY s.s_name
""",
)
def q20_heavy_shippers_of_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN chains with a grouped HAVING inside —
    suppliers who shipped more than 100 units of one brand's parts in a
    year (the promotion-candidate screen; fixture has no partsupp
    availability, so the half-of-stock threshold becomes an absolute
    quantity bar — integer sum, engine-exact).

    Scale plan: innermost IN = broadcast semi of the brand's parts onto
    the date-pruned lineitem scan; the HAVING aggregate reduces to
    qualifying suppkeys (a parameter-sized set); the outer IN is a semi
    join of supplier against that set; nation broadcasts for the label.
    Every IN collapses to a semi join — no correlated execution."""
    brand_parts = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    return (
        s.join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "nation")
        .orderBy("s_name")
    )


@query(
    "q11_important_part_values",
    oracle="""
WITH pv AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS part_cents
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(sum(part_cents) AS BIGINT) AS total_cents,
               CAST(count(*) AS BIGINT) AS n_parts FROM pv)
SELECT pv.l_partkey AS p_partkey, pv.part_cents / 100.0 AS part_value
FROM pv, tot
WHERE pv.part_cents * tot.n_parts * 10 > tot.total_cents * 12
ORDER BY pv.part_cents DESC, pv.l_partkey
""",
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups retained only when their share of the
    GLOBAL total clears a fraction threshold (important-stock scan).
    TPC-H scales the fraction by 1/SF; the portable equivalent here is
    "above 1.2× the average part value" — part_cents·n·10 >
    total_cents·12, an exact integer cross-multiplication with no float
    fraction, so the boundary is bit-stable in both engines and the
    result is non-trivial at every scale factor.

    Scale plan: one part-keyed aggregate over the fact; the global total
    re-aggregates the part-level partials (part-cardinality input, not a
    second fact scan) and broadcasts as one row into the filter. Ordered
    by the exact cents with a partkey tiebreak — a total order."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint")).alias("part_cents")
    )
    tot = pv.agg(
        F.sum("part_cents").cast("bigint").alias("total_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("part_cents") * F.col("n_parts") * 10 > F.col("total_cents") * 12)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("part_cents") / F.lit(100.0)).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )
