"""File-sink behavior: partitioned layout, pruning, atomic-append contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fraud_detection_etl_project_spark import sinks
from fraud_detection_etl_project_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_write_parquet_partitioned_layout_and_pruning(spark, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = load_table(spark, SF, "orders")
    sinks.write_parquet(orders, out, partition_by=["o_orderstatus"])

    # Hive-style directory layout, one dir per status value.
    dirs = sorted(d for d in os.listdir(out) if d.startswith("o_orderstatus="))
    assert dirs == [f"o_orderstatus={v}" for v in ("F", "O", "P")]

    # Round-trip row count, and a status predicate prunes to one partition.
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    pruned = back.filter(F.col("o_orderstatus") == "O")
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "O").count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus=O" in plan or "PartitionFilters" in plan


def test_write_csv_roundtrip(spark, tmp_path):
    out = str(tmp_path / "nation_csv")
    nation = load_table(spark, SF, "nation")
    sinks.write_csv(nation, out)
    back = (
        spark.read.option("header", True)
        .schema(nation.schema)
        .csv(out)
    )
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )


def test_jdbc_atomic_append_swap_contract(spark):
    """No database in this container: verify the staging-swap DDL the helper
    would execute (single transaction: INSERT ... SELECT + DROP)."""
    issued = []

    class FakeWriteError(Exception):
        pass

    # Intercept at the DataFrameWriter boundary — swap SQL must not run if
    # the staging write fails.
    df = load_table(spark, SF, "nation")
    try:
        sinks.jdbc_atomic_append(
            df, "jdbc:postgresql://nowhere/db", "target", {}, run_ddl=issued.append
        )
    except Exception:
        pass
    assert issued == []  # write failed -> swap never issued

    # With a successful write (monkeypatched), the swap is one transaction.
    class W:
        def __init__(self):
            self.calls = []

        def mode(self, m):
            self.calls.append(("mode", m))
            return self

        def option(self, k, v):
            self.calls.append(("option", k, v))
            return self

        def jdbc(self, url, table, properties=None):
            self.calls.append(("jdbc", url, table))

    fake_writer = W()

    class FakeDF:
        write = fake_writer

    staging = sinks.jdbc_atomic_append(
        FakeDF(), "jdbc:postgresql://nowhere/db", "target", {}, run_ddl=issued.append
    )
    assert staging.startswith("target_stage_")
    assert len(issued) == 1
    swap = issued[0]
    assert swap.startswith("BEGIN;") and swap.endswith("COMMIT;")
    assert f"INSERT INTO target SELECT * FROM {staging}" in swap
    assert f"DROP TABLE {staging}" in swap


def test_write_orc_roundtrip(spark, tmp_path):
    out = str(tmp_path / "nation_orc")
    nation = load_table(spark, SF, "nation")
    sinks.write_orc(nation, out, partition_by=["n_regionkey"])
    back = spark.read.orc(out)
    assert back.count() == nation.count()
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, x double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, v string, x double"
    )
    merged = {r.k: (r.v, r.x) for r in sinks.merge_upsert(target, updates, ["k"]).collect()}
    assert merged == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_jsonl_sink_roundtrip(spark, tmp_path):
    from fraud_detection_etl_project_spark.sinks import write_jsonl

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, v double"
    )
    out = str(tmp_path / "jl")
    write_jsonl(df, out)
    back = spark.read.json(out)
    assert sorted((r["id"], r["name"], r["v"]) for r in back.collect()) == [
        (1, "a", 1.5),
        (2, "b", 2.5),
    ]


def test_write_range_sorted_layout(spark, tmp_path):
    """Range-partitioned + sorted parquet: files carry disjoint value
    ranges and monotone row-group stats (what enables file- and
    row-group-level pruning on range predicates)."""
    import glob

    import pyarrow.parquet as pq

    from fraud_detection_etl_project_spark.sinks import write_range_sorted

    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    out = str(tmp_path / "ranged")
    write_range_sorted(df, out, "k", n_files=4)

    spans = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        # row groups sorted within the file
        assert mins == sorted(mins) and maxs == sorted(maxs)
        spans.append((min(mins), max(maxs)))
    assert len(spans) == 4
    # files cover disjoint ranges
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    # round-trip completeness
    assert spark.read.parquet(out).count() == 10_000


def test_apply_cdc_semantics(spark):
    from fraud_detection_etl_project_spark.sinks import apply_cdc

    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, price double"
    )
    feed = spark.createDataFrame(
        [
            (2, "U", 21.0, 1),   # update key 2
            (3, "U", 31.0, 1),   # update then delete key 3: delete wins
            (3, "D", None, 2),
            (4, "I", 40.0, 1),   # fresh insert
            (5, "D", None, 1),   # delete of a key not in the snapshot: no row
        ],
        "k long, op string, price double, seq long",
    )
    out = {r["k"]: r for r in apply_cdc(snap, feed, "k", "seq").collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["price"] == 10.0 and out[1]["last_op"] == "N"
    assert out[2]["price"] == 21.0 and out[2]["last_op"] == "U"
    assert out[4]["price"] == 40.0 and out[4]["last_op"] == "I"


def test_compact_parquet(spark, tmp_path):
    """Small-files compaction rewrites to ~target-sized files, atomically,
    without changing the data."""
    import glob

    from fraud_detection_etl_project_spark.sinks import compact_parquet

    out = str(tmp_path / "frag")
    spark.range(0, 50_000).repartition(40).write.parquet(out)
    before = len(glob.glob(f"{out}/part-*.parquet"))
    assert before == 40
    n = compact_parquet(spark, out, target_file_bytes=1024 * 1024)
    after = glob.glob(f"{out}/part-*.parquet")
    assert len(after) == n < before
    df = spark.read.parquet(out)
    assert df.count() == 50_000
    assert df.selectExpr("sum(id)").collect()[0][0] == 49_999 * 50_000 // 2
