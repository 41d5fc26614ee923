"""Snapshot-versioned parquet table: atomic commits, time travel,
compaction, vacuum, optimistic concurrency."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from fraud_detection_etl_project_spark import snapshot as S
from fraud_detection_etl_project_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _nums(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("n"))


def test_overwrite_append_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = S.overwrite(_nums(spark, 0, 10), t)
    assert v1 == 1 and S.current_version(t) == 1
    v2 = S.append(_nums(spark, 100, 105), t)
    assert v2 == 2 and S.current_version(t) == 2

    # CURRENT sees both commits; v1 still reads the original rows only
    assert S.read(spark, t).count() == 15
    assert sorted(r["n"] for r in S.read(spark, t, version=1).collect()) == list(range(10))

    # a later overwrite replaces the listing but not history
    v3 = S.overwrite(_nums(spark, 500, 502), t)
    assert v3 == 3
    assert sorted(r["n"] for r in S.read(spark, t).collect()) == [500, 501]
    assert S.read(spark, t, version=2).count() == 15


def test_commit_is_manifest_swap_not_directory_state(spark, tmp_path):
    """A reader that planned against v1 keeps its file set even after a
    new commit — and the data dir contains both versions' files (commits
    add, never delete)."""
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 10), t)
    df_v1 = S.read(spark, t, version=1)
    S.overwrite(_nums(spark, 50, 60), t)
    # pinned plan unaffected by the new current version
    assert sorted(r["n"] for r in df_v1.collect()) == list(range(10))
    m1 = S.read_manifest(t, 1)["files"]
    m2 = S.read_manifest(t, 2)["files"]
    assert not set(m1) & set(m2), "versions must not share mutated files"
    data = set(os.listdir(os.path.join(t, "data")))
    assert set(m1) <= data and set(m2) <= data


def test_compact_reduces_files_same_rows(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 1000).repartition(8), t)
    assert len(S.read_manifest(t, 1)["files"]) == 8
    v2 = S.compact(spark, t, n_files=2)
    assert v2 == 2
    assert len(S.read_manifest(t, 2)["files"]) == 2
    assert S.read(spark, t).count() == 1000
    # old version still has 8 files and still reads
    assert len(S.read_manifest(t, 1)["files"]) == 8
    assert S.read(spark, t, version=1).count() == 1000


def test_vacuum_deletes_only_unreferenced(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 10).repartition(2), t)
    S.overwrite(_nums(spark, 10, 20).repartition(2), t)
    S.append(_nums(spark, 20, 25), t)  # v3 references v2's files + new
    deleted = S.vacuum(t, keep_versions=2)
    # v1's two files are unreferenced by v2/v3 and must be gone
    assert len(deleted) == 2
    assert S.read(spark, t).count() == 15
    assert S.read(spark, t, version=2).count() == 10
    with pytest.raises(FileNotFoundError):
        S.read_manifest(t, 1)
        S.read(spark, t, version=1)


def test_optimistic_conflict_detected(spark, tmp_path, monkeypatch):
    """A writer whose parent moved underneath it must fail, not clobber."""
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 5), t)

    real_stage = S._stage_data_files

    def stage_and_race(df, table_path):
        files = real_stage(df, table_path)
        # another writer commits between this writer's stage and publish
        if not getattr(stage_and_race, "raced", False):
            stage_and_race.raced = True
            S.overwrite(_nums(spark, 90, 95), t)
        return files

    monkeypatch.setattr(S, "_stage_data_files", stage_and_race)
    with pytest.raises(S.SnapshotConflictError):
        S.append(_nums(spark, 10, 15), t)
    # the racing writer's commit is intact
    assert sorted(r["n"] for r in S.read(spark, t).collect()) == [90, 91, 92, 93, 94]


def test_snapshot_of_fixture_table_pushdown_intact(spark, tmp_path):
    """Predicate pushdown survives the explicit-file-list read path."""
    t = str(tmp_path / "orders_snap")
    orders = load_table(spark, SF, "orders")
    S.overwrite(orders, t)
    df = S.read(spark, t).filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)" in plan
    assert df.count() == orders.filter(F.col("o_orderstatus") == "O").count()
