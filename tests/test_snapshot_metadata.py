"""Metadata tables (snapshot.metadata_table): the table's own
bookkeeping — files / history / snapshots / partitions / refs — as
queryable DataFrames (the Iceberg `tbl.files` inspection surface)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fraud_detection_etl_project_spark import snapshot as S


def _nums(spark, lo, hi, mod=2):
    return spark.range(lo, hi).select(
        F.col("id").alias("n"), (F.col("id") % mod).cast("string").alias("grp")
    )


def test_files_view_seq_and_counts(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 10).coalesce(1), t)
    S.append(_nums(spark, 100, 105).coalesce(1), t)

    files = S.metadata_table(spark, t, "files").collect()
    assert len(files) == 2
    by_seq = {r["seq"]: r for r in files}
    assert set(by_seq) == {1, 2}
    assert by_seq[1]["record_count"] == 10
    assert by_seq[2]["record_count"] == 5
    # unpartitioned table: no spec/tuple
    assert all(r["spec_id"] is None and r["partition"] is None for r in files)

    # version pin: the v1 view has only the first file
    v1 = S.metadata_table(spark, t, "files", version=1).collect()
    assert [r["record_count"] for r in v1] == [10]


def test_partitions_view_matches_data(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(
        _nums(spark, 0, 20, mod=3),
        t,
        partition_spec=[{"column": "grp", "transform": "identity"}],
    )
    S.append(_nums(spark, 100, 120, mod=3), t)

    got = {
        r["partition"]: (r["file_count"], r["record_count"])
        for r in S.metadata_table(spark, t, "partitions").collect()
    }
    want = {
        f'{{"identity_grp": "{g}"}}': c
        for g, c in S.read(spark, t).groupBy("grp").count().rdd.map(tuple).collect()
    }
    assert {k: v[1] for k, v in got.items()} == want
    assert all(fc >= 1 for fc, _ in got.values())


def test_history_follows_branch_lineage_snapshots_see_all(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 5), t)  # v1
    S.create_branch(t, "wap")
    S.append(_nums(spark, 10, 15), t, branch="wap")  # v2, parent v1
    S.append(_nums(spark, 20, 25), t)  # v3 on main, parent v1

    hist = S.metadata_table(spark, t, "history").collect()
    assert [r["version"] for r in hist] == [1, 3]
    assert {r["operation"] for r in hist} == {"overwrite", "append"}

    snaps = {r["version"]: r for r in S.metadata_table(spark, t, "snapshots").collect()}
    assert set(snaps) == {1, 2, 3}
    assert snaps[2]["is_ancestor"] is False and snaps[2]["parent"] == 1
    assert snaps[3]["is_ancestor"] is True

    branch_hist = S.metadata_table(spark, t, "history", ref="wap").collect()
    assert [r["version"] for r in branch_hist] == [1, 2]


def test_refs_view(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 5), t)
    S.create_branch(t, "audit")
    S.create_tag(t, "release-1")
    S.append(_nums(spark, 10, 12), t, branch="audit")

    refs = {r["name"]: (r["kind"], r["version"]) for r in S.metadata_table(spark, t, "refs").collect()}
    assert refs["CURRENT"] == ("branch", 1)
    assert refs["audit"] == ("branch", 2)
    assert refs["release-1"] == ("tag", 1)


def test_files_view_reads_sharded_stats(spark, tmp_path, monkeypatch):
    # force every commit's stats into NDJSON shards: the files view must
    # recover record counts through the distributed shard read
    monkeypatch.setattr(S, "_INLINE_STATS_MAX", 0)
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 30).repartition(3), t)
    m = S.read_manifest(t, 1)
    assert m.get("stats_shards") and not m.get("stats")

    files = S.metadata_table(spark, t, "files").collect()
    assert sum(r["record_count"] for r in files) == 30
    assert all(r["record_count"] is not None for r in files)

    parts = S.metadata_table(spark, t, "partitions").collect()
    assert len(parts) == 1 and parts[0]["record_count"] == 30


def test_files_view_on_spec_evolved_table(spark, tmp_path):
    # after evolve_partition_spec, each file's row must carry the spec it
    # was WRITTEN under (old files spec 0, new files spec 1), and the
    # partitions view must aggregate per (spec_id, tuple)
    t = str(tmp_path / "tbl")
    S.overwrite(
        _nums(spark, 0, 12, mod=2),
        t,
        partition_spec=[{"column": "grp", "transform": "identity"}],
    )
    S.evolve_partition_spec(t, [{"column": "n", "transform": "bucket", "n": 2}])
    S.append(_nums(spark, 100, 112, mod=2), t)

    files = S.metadata_table(spark, t, "files").collect()
    specs = {r["spec_id"] for r in files}
    assert len(specs) == 2  # one id per spec era (ids are spec-registry keys)
    assert all(r["partition"] is not None for r in files)
    old = [r for r in files if "identity_grp" in r["partition"]]
    new = [r for r in files if "bucket" in r["partition"]]
    assert {r["spec_id"] for r in old} != {r["spec_id"] for r in new}
    assert sum(r["record_count"] for r in old) == 12
    assert sum(r["record_count"] for r in new) == 12
    assert all("identity_grp" in r["partition"] for r in old)
    assert all("bucket" in r["partition"] for r in new)

    parts = S.metadata_table(spark, t, "partitions").collect()
    assert {r["spec_id"] for r in parts} == specs
    assert sum(r["record_count"] for r in parts) == 24


def test_rollback_restores_content_as_new_commit(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 10), t)  # v1
    S.append(_nums(spark, 100, 105), t)  # v2
    v3 = S.rollback(t, 1)
    assert v3 == 3 and S.current_version(t) == 3
    assert sorted(r["n"] for r in S.read(spark, t).collect()) == list(range(10))
    # history-preserving: the restore is a commit, intermediate reads work
    ops = [r["operation"] for r in S.metadata_table(spark, t, "history").collect()]
    assert ops == ["overwrite", "append", "rollback"]
    assert S.read(spark, t, version=2).count() == 15
    # no-op: rolling back to the head returns it without a commit
    assert S.rollback(t, 3) == 3
    assert S.current_version(t) == 3


def test_rollback_carries_partition_metadata(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(
        _nums(spark, 0, 20, mod=3),
        t,
        partition_spec=[{"column": "grp", "transform": "identity"}],
    )
    S.append(_nums(spark, 100, 140, mod=3), t)
    S.rollback(t, 1)
    # the restored manifest still partition-prunes: a grp='1' scan plans
    # only that tuple's files
    kept, total = S.plan_files(t, [("grp", "=", "1")])
    assert 0 < len(kept) < total
    got = sorted(r["n"] for r in S.scan(spark, t, [("grp", "=", "1")]).collect())
    assert got == [n for n in range(0, 20) if n % 3 == 1]


def test_rollback_validation(spark, tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        S.rollback(t, 1)  # nothing committed
    S.overwrite(_nums(spark, 0, 3), t)
    with pytest.raises(ValueError, match="not an ancestor"):
        S.rollback(t, 99)  # unreachable target


def test_bad_kind_and_ref_validation(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 3), t)
    with pytest.raises(ValueError, match="unknown metadata table"):
        S.metadata_table(spark, t, "nope")
    with pytest.raises(ValueError, match="no such ref"):
        S.metadata_table(spark, t, "files", ref="ghost")
    with pytest.raises(ValueError, match="at most one"):
        S.metadata_table(spark, t, "files", version=1, ref="x")
