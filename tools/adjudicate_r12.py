"""Quiet-box re-adjudication of the three r11 rewrites the driver's r11
record contradicted (VERDICT r11, Next round #1): copurchase edge build
(triangle count + clustering coefficients), nb_lang_confusion, and
tfidf_top_terms.

Times the CURRENT (r11) implementation against an inline reconstruction
of the r10 shape (taken verbatim from git 85144d8), INTERLEAVED in one
session — warmup pass each, then N alternating timed noop-sink passes,
min reported — so box drift cannot favour either side. Probe the
sentinels (region_customer_rollup ~0.2 s, flagship ~0.5 s isolated)
before trusting a run.

Usage: python tools/adjudicate_r12.py [sf_dir] [n_passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _old_copurchase_edges(spark, sf_dir):
    """r10 shape: distinct + order-keyed pair self-join (git 85144d8)."""
    from fraud_detection_etl_project_spark.plans.advanced_queries import _EDGE_SUPPORT, _t

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


def _old_tfidf_top_terms(spark, sf_dir):
    """r10 shape: 3 explode passes + doc_id join-back (git 85144d8)."""
    from pyspark.sql import Window

    from fraud_detection_etl_project_spark.functions import text as T
    from fraud_detection_etl_project_spark.functions.rounding import fxr
    from fraud_detection_etl_project_spark.plans.llm_queries import _t

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(T.normalized(F.col("text")), " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfq = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("dfc"))
    nn = d.agg(F.count(F.lit(1)).alias("nd"))
    idf = fxr(F.log((F.col("nd") + F.lit(1.0)) / (F.col("dfc") + F.lit(1.0))), 6)
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfq), "tok")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "tok",
            fxr((F.col("c").cast("double") / F.col("n")) * idf, 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return scored.withColumn("rn", F.row_number().over(w).cast("int")).filter(F.col("rn") <= 5)


def _old_nb_lang_confusion(spark, sf_dir):
    """r10 shape: vocab = countDistinct over raw occurrences (85144d8)."""
    from pyspark.sql import Window

    from fraud_detection_etl_project_spark.functions.text import normalized
    from fraud_detection_etl_project_spark.plans.ml_queries import _qln, _t

    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 5 != 0)
    test = d.filter(F.col("doc_id") % 5 == 0)
    tr = train.select("lang", F.explode(F.split(normalized(F.col("text")), " ")).alias("tok"))
    cnt = tr.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    totc = cnt.groupBy("lang").agg(F.sum("n").alias("tot"))
    v = tr.agg(F.countDistinct("tok").alias("vsz"))
    prior = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nd"))
        .crossJoin(F.broadcast(train.agg(F.count(F.lit(1)).alias("ntrain"))))
        .select("lang", _qln(F.col("nd").cast("double") / F.col("ntrain")).alias("pq"))
    )
    te = test.select("doc_id", F.explode(F.split(normalized(F.col("text")), " ")).alias("tok"))
    grid = te.crossJoin(F.broadcast(totc.crossJoin(v)))
    lp = grid.join(cnt, ["lang", "tok"], "left").select(
        "doc_id",
        "lang",
        _qln((F.coalesce(F.col("n"), F.lit(0)) + F.lit(1)).cast("double") / (F.col("tot") + F.col("vsz"))).alias("lpq"),
    )
    score = lp.groupBy("doc_id", "lang").agg(F.sum("lpq").alias("s"))
    final = score.join(F.broadcast(prior), "lang").withColumn("sc", F.col("s") + F.col("pq"))
    w = Window.partitionBy("doc_id").orderBy(F.col("sc").desc(), F.col("lang").asc())
    pred = final.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        pred.join(test.select("doc_id", F.col("lang").alias("actual")), "doc_id")
        .groupBy("actual", F.col("lang").alias("predicted"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.1"
    n = int(args.pop(0)) if args else 5

    from fraud_detection_etl_project_spark.plans import REGISTRY, advanced_queries
    from fraud_detection_etl_project_spark.session import get_spark

    spark = get_spark(
        app_name="adjudicate-r12",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).count()

    new_edges = advanced_queries._copurchase_edges

    def with_old_edges(qname):
        def run():
            advanced_queries._copurchase_edges = _old_copurchase_edges
            try:
                return REGISTRY[qname].fn(spark, sf_dir)
            finally:
                advanced_queries._copurchase_edges = new_edges
        return run

    cases = {
        "copurchase_triangle_count": (
            with_old_edges("copurchase_triangle_count"),
            lambda: REGISTRY["copurchase_triangle_count"].fn(spark, sf_dir),
        ),
        "part_clustering_coefficients": (
            with_old_edges("part_clustering_coefficients"),
            lambda: REGISTRY["part_clustering_coefficients"].fn(spark, sf_dir),
        ),
        "nb_lang_confusion": (
            lambda: _old_nb_lang_confusion(spark, sf_dir),
            lambda: REGISTRY["nb_lang_confusion"].fn(spark, sf_dir),
        ),
        "tfidf_top_terms": (
            lambda: _old_tfidf_top_terms(spark, sf_dir),
            lambda: REGISTRY["tfidf_top_terms"].fn(spark, sf_dir),
        ),
    }

    def isolate():
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    def one(build):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        isolate()
        return round(dt, 3)

    for name, (old_b, new_b) in cases.items():
        spark.sparkContext.setJobDescription(f"adjudicate {name}")
        one(old_b)  # warmups, untimed
        one(new_b)
        olds, news = [], []
        for _ in range(n):
            olds.append(one(old_b))
            news.append(one(new_b))
        print(
            f"{name}: old(r10) min={min(olds)} {olds} | "
            f"new(r11/12) min={min(news)} {news} | "
            f"speedup={round(min(olds) / min(news), 2)}x"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
