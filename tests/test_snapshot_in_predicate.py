"""IN-predicate file skipping (round 11): ``("col", "in", values)`` as a
first-class predicate across every pruning layer — the DataSource V2 ``In``
filter shape, the enabler for multi-key point lookups (the streaming-ingest
band-index probe). Covers: the driver stat rule, partition pruning with
per-bucket value restriction, blooms, the sharded-stats Spark path, scan
correctness, and the empty-list degenerate."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

import fraud_detection_etl_project_spark.snapshot as S


def _kv(spark, n=400):
    # string keys (the band-index shape) + a long value
    return spark.range(0, n).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
        (F.col("id") * 7 % 1000).alias("v"),
        F.col("id").alias("id"),
    )


def test_in_scan_matches_isin_filter(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(
        _kv(spark), t,
        bloom_columns=["key"],
        partition_spec=[{"column": "key", "transform": "bucket", "n": 8}],
    )
    probes = ["k3", "k77", "k399", "k_nothere"]
    got = sorted(r["id"] for r in S.scan(spark, t, [("key", "in", probes)]).collect())
    want = sorted(
        r["id"] for r in S.read(spark, t).filter(F.col("key").isin(probes)).collect()
    )
    assert got == want == [3, 77, 399]


def test_in_prunes_buckets_and_blooms(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(
        _kv(spark), t,
        bloom_columns=["key"],
        partition_spec=[{"column": "key", "transform": "bucket", "n": 8}],
    )
    # grow the table: 5 appends inherit the spec and the blooms
    for i in range(5):
        S.append(
            _kv(spark).withColumn("id", F.col("id") + (i + 1) * 1000)
            .withColumn("key", F.concat(F.lit("x"), F.col("id").cast("string"))),
            t, bloom_columns=["key"],
        )
    kept, total = S.plan_files(t, [("key", "in", ["k3", "k77"])], spark=spark)
    # two probe keys live in at most two buckets of the FIRST commit only;
    # the appended x-key files must be bloom/bucket-pruned
    assert total >= 12
    assert len(kept) <= 4
    got = sorted(
        r["id"] for r in S.scan(spark, t, [("key", "in", ["k3", "k77"])]).collect()
    )
    assert got == [3, 77]


def test_in_per_bucket_value_restriction(spark, tmp_path, monkeypatch):
    """The per-file stat rule must see only the value slice hashing to the
    file's bucket — a wide IN probe would otherwise defeat the blooms by
    accumulated false positives."""
    t = str(tmp_path / "tbl")
    S.overwrite(
        _kv(spark), t,
        bloom_columns=["key"],
        partition_spec=[{"column": "key", "transform": "bucket", "n": 8}],
    )
    seen: list[int] = []
    real = S._keep_by_stats

    def counting(file_stats, predicates):
        for col, op, val in predicates:
            if op == "in":
                seen.append(len(list(val)))
        return real(file_stats, predicates)

    monkeypatch.setattr(S, "_keep_by_stats", counting)
    probes = [f"k{i}" for i in range(100)]
    S.plan_files(t, [("key", "in", probes)], spark=spark)
    assert seen, "stat rule never consulted"
    # every per-file evaluation saw a bucket-restricted slice, not all 100
    assert max(seen) < 100
    # the slices must cover the probe list across the 8 buckets
    assert sum(set(seen)) <= 100


def test_in_empty_list_prunes_everything(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark), t, bloom_columns=["key"])
    kept, total = S.plan_files(t, [("key", "in", [])], spark=spark)
    assert kept == [] and total >= 1
    assert S.scan(spark, t, [("key", "in", [])]).count() == 0


def test_in_on_unpartitioned_bloom_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark).repartition(6), t, bloom_columns=["key", "id"])
    kept, total = S.plan_files(t, [("id", "in", [5, 250])], spark=spark)
    assert total == 6 and len(kept) <= total
    got = sorted(r["id"] for r in S.scan(spark, t, [("id", "in", [5, 250])]).collect())
    assert got == [5, 250]


def test_in_mixed_type_values_conservative(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark), t, bloom_columns=["id"])
    # a string probe against the long column must not wrongly prune the
    # int probes riding in the same list
    got = sorted(
        r["id"] for r in S.scan(spark, t, [("id", "in", [5, "250"])]).collect()
    )
    assert 5 in got


def test_in_sharded_stats_path(spark, tmp_path, monkeypatch):
    """Force NDJSON stat shards (the 10^6-file posture) and check the
    Spark-side IN evaluation agrees with the driver rule."""
    monkeypatch.setattr(S, "_INLINE_STATS_MAX", 0)
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark).repartition(8), t, bloom_columns=["key"])
    m = S.read_manifest(t, 1)
    assert m.get("stats_shards"), "fixture must exercise the shard path"
    probes = ["k3", "k77", "k399"]
    kept, total = S.plan_files(t, [("key", "in", probes)], spark=spark)
    assert total == 8
    # parity with the driver rule evaluated on re-derived stats
    got = sorted(r["id"] for r in S.scan(spark, t, [("key", "in", probes)]).collect())
    assert got == [3, 77, 399]
    # at least one of the 8 random-split files should be bloom-prunable
    assert len(kept) <= total


def test_in_all_null_partition_prunes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(0, 10).select(
        F.when(F.col("id") < 5, F.concat(F.lit("k"), F.col("id"))).alias("key"),
        F.col("id"),
    )
    S.overwrite(
        df, t, partition_spec=[{"column": "key", "transform": "identity"}]
    )
    m = S.read_manifest(t, 1)
    null_files = set()
    for key, fl in m["partition_index"].items():
        if json.loads(key)["identity_key"] is None:
            null_files.update(fl)
    assert null_files, "fixture needs an all-NULL partition"
    kept, _ = S.plan_files(t, [("key", "in", ["k1", "k3"])], spark=spark)
    assert not (set(kept) & null_files)
    got = sorted(
        r["id"] for r in S.scan(spark, t, [("key", "in", ["k1", "k3"])]).collect()
    )
    assert got == [1, 3]
