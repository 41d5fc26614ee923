"""Deletion vectors (position deletes) on the snapshot table — the
Iceberg-v3 / Delta DV model: DELETE WHERE commits (file, row position)
pairs instead of rewriting files OR requiring key columns. Position
semantics are the contract under test: re-appended equal values
survive, CoW rewrites must not resurrect DV-hidden rows, compaction
materializes and retires DVs, and the change feed can emit the FULL
deleted row images (positions name physical rows)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import fraud_detection_etl_project_spark.snapshot as S


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("n"), (F.col("id") % 7).alias("g")
    )


def test_dv_delete_hides_exact_positions_without_rewrite(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 100).repartitionByRange(4, "n"), t)
    v1_files = S.read_manifest(t, 1)["files"]
    v2 = S.delete_where_dv(spark, t, [("n", "<", 10)])
    m2 = S.read_manifest(t, v2)
    # no data file rewritten; one DV entry recorded
    assert m2["files"] == v1_files
    assert len(m2["dv_files"]) >= 1
    assert S.read(spark, t).count() == 90
    assert sorted(r["n"] for r in S.scan(spark, t, [("n", "<", 12)]).collect()) == [10, 11]
    # time travel to v1 still sees everything
    assert S.read(spark, t, version=1).count() == 100


def test_dv_is_position_not_value_semantics(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 20), t)
    S.delete_where_dv(spark, t, [("n", "<", 5)])
    S.append(_kv(spark, 0, 5), t)  # same VALUES, new positions
    got = sorted(r["n"] for r in S.read(spark, t).collect())
    assert got == sorted(list(range(5, 20)) + list(range(5)))
    assert len(got) == 20


def test_cow_delete_and_merge_do_not_resurrect_dv_rows(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 40).repartitionByRange(2, "n"), t)
    S.delete_where_dv(spark, t, [("n", "=", 3)])
    # CoW delete rewrites the candidate file containing n=3's positions;
    # the rewrite source must be the LIVE rows
    S.delete(spark, t, [("n", ">=", 30)])
    got = sorted(r["n"] for r in S.read(spark, t).collect())
    assert got == [n for n in range(30) if n != 3]
    # merge touching the same file must not bring n=3 back either
    S.merge(spark, t, spark.createDataFrame([(5, 999)], "n: long, g: long"), on=["n"])
    got = {r["n"]: r["g"] for r in S.read(spark, t).collect()}
    assert 3 not in got and got[5] == 999 and len(got) == 29


def test_compact_materializes_and_retires_dvs(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 50).repartitionByRange(4, "n"), t)
    S.delete_where_dv(spark, t, [("n", "<", 7)])
    v = S.compact(spark, t, n_files=2)
    m = S.read_manifest(t, v)
    assert not m.get("dv_files")
    assert len(m["files"]) <= 2
    assert S.read(spark, t).count() == 43
    # a later DV delete starts a fresh log against the compacted files
    S.delete_where_dv(spark, t, [("n", "=", 10)])
    assert S.read(spark, t).count() == 42


def test_change_feed_emits_full_deleted_rows(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.append(_kv(spark, 0, 10), t)                      # v1
    S.delete_where_dv(spark, t, [("n", ">=", 8)])       # v2
    S.append(_kv(spark, 20, 22), t)                     # v3
    ch = S.read_changes(spark, t, from_version=1).collect()
    dels = sorted((r["n"], r["g"]) for r in ch if r["_change_type"] == "delete")
    ins = sorted(r["n"] for r in ch if r["_change_type"] == "insert")
    # full row images, not just keys: g rides along
    assert dels == [(8, 1), (9, 2)]
    assert ins == [20, 21]


def test_dv_stacks_with_equality_deletes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 30), t)
    S.delete_keys_mor(spark, t, spark.createDataFrame([(1,), (2,)], "n: long"))
    S.delete_where_dv(spark, t, [("n", ">=", 28)])
    got = sorted(r["n"] for r in S.read(spark, t).collect())
    assert got == [n for n in range(28) if n not in (1, 2)]


def test_vacuum_keeps_live_dv_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 30), t)
    S.delete_where_dv(spark, t, [("n", "<", 3)])
    S.append(_kv(spark, 100, 103), t)
    S.vacuum(t, keep_versions=1)
    assert sorted(r["n"] for r in S.read(spark, t).collect()) == list(range(3, 30)) + [100, 101, 102]


def test_dv_delete_matching_nothing_is_a_clean_commit(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 10), t)
    v = S.delete_where_dv(spark, t, [("n", ">", 10_000)])
    assert S.read(spark, t).count() == 10
    # stat pruning found no candidate files: a pure metadata commit
    assert S.read_manifest(t, v).get("dv_files", []) == []


def test_dv_rollback_restores_dv_state(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 10), t)                   # v1
    v2 = S.delete_where_dv(spark, t, [("n", "<", 4)])   # v2
    S.compact(spark, t, 1)                              # v3: DVs materialized
    S.rollback(t, v2)                                   # v4 == v2's state
    assert S.read(spark, t).count() == 6
    assert S.read_manifest(t, S.current_version(t))["dv_files"]


def test_overlapping_dv_deletes_emit_each_row_once(spark, tmp_path):
    # exactly-once CDC (round-7 fix): the second predicate re-matches rows
    # the first DV already hides — positions are computed on LIVE rows, so
    # the v3 DV must not re-mark n<5 and the feed emits each delete ONCE.
    t = str(tmp_path / "tbl")
    S.append(_kv(spark, 0, 20), t)                      # v1
    S.delete_where_dv(spark, t, [("n", "<", 5)])        # v2: deletes 0-4
    S.delete_where_dv(spark, t, [("n", "<", 8)])        # v3: only 5-7 are live
    assert S.read(spark, t).count() == 12
    ch = S.read_changes(spark, t, from_version=1).collect()
    dels = sorted((r["n"], r["_commit_version"]) for r in ch if r["_change_type"] == "delete")
    assert dels == [(0, 2), (1, 2), (2, 2), (3, 2), (4, 2), (5, 3), (6, 3), (7, 3)]


def test_dv_overlapping_equality_delete_not_reemitted(spark, tmp_path):
    # a row hidden by a MoR equality delete must not reappear as a DV
    # 'delete' change event when a later predicate matches it again
    t = str(tmp_path / "tbl")
    S.append(_kv(spark, 0, 10), t)                       # v1
    S.delete_keys_mor(spark, t, spark.createDataFrame([(2,)], "n: long"))  # v2
    S.delete_where_dv(spark, t, [("n", "<", 4)])         # v3: 0,1,3 live-match
    assert S.read(spark, t).count() == 6
    ch = S.read_changes(spark, t, from_version=2).collect()
    dv_dels = sorted(r["n"] for r in ch if r["_change_type"] == "delete")
    assert dv_dels == [0, 1, 3]
