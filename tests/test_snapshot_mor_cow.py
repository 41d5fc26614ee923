"""Copy-on-write MERGE / DELETE on tables with LIVE merge-on-read
equality deletes (round 7 — previously refused with 'run compact()
first', a wall the streaming-CDC-then-batch-backfill user hits
immediately). The contract under test:

- the rewrite source is the LIVE rows, so equality deletes are
  materialized into rewritten files exactly like deletion vectors;
- delete files that still target an untouched carried file are RETAINED
  (they must keep hiding rows at read time — untouched files keep their
  parent file_seq);
- delete files whose every remaining target was rewritten are dropped
  from the new manifest (inert: new files enter at the new commit's
  seq, above every existing delete's);
- sequence semantics survive: appending a deleted key AFTER the rewrite
  still resurrects it exactly once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import fraud_detection_etl_project_spark.snapshot as S


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("n"), (F.col("id") % 7).alias("g")
    )


def _keys(spark, *ns):
    return spark.createDataFrame([(n,) for n in ns], "n: long")


def test_merge_with_live_mor_deletes_applies_and_retains(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 40).repartitionByRange(4, "n"), t)   # v1
    S.delete_keys_mor(spark, t, _keys(spark, 1, 35))               # v2
    src = spark.createDataFrame([(5, 999), (100, 100)], "n: long, g: long")
    v3 = S.merge(spark, t, src, on=["n"])
    got = {r["n"]: r["g"] for r in S.read(spark, t).collect()}
    assert 1 not in got and 35 not in got          # deletes still applied
    assert got[5] == 999 and got[100] == 100       # update + insert landed
    assert len(got) == 40 - 2 + 1
    # untouched files still carry seq < delete seq: delete file retained
    m3 = S.read_manifest(t, v3)
    assert m3["delete_files"]
    # sequence rule survives the rewrite: re-appending key 1 resurrects it
    S.append(spark.createDataFrame([(1, 77)], "n: long, g: long"), t)
    got = {r["n"]: r["g"] for r in S.read(spark, t).collect()}
    assert got[1] == 77 and len(got) == 40


def test_merge_full_rewrite_drops_inert_delete_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 10).coalesce(1), t)                  # v1: 1 file
    S.delete_keys_mor(spark, t, _keys(spark, 2))                   # v2
    src = spark.createDataFrame([(3, 999)], "n: long, g: long")
    v3 = S.merge(spark, t, src, on=["n"])                          # rewrites the file
    got = {r["n"]: r["g"] for r in S.read(spark, t).collect()}
    assert 2 not in got and got[3] == 999 and len(got) == 9
    # every target of the delete file was rewritten: entry dropped
    assert S.read_manifest(t, v3)["delete_files"] == []
    # the historical version still lists it (manifests are immutable)
    assert S.read_manifest(t, 2)["delete_files"]


def test_cow_delete_with_live_mor_deletes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 40).repartitionByRange(4, "n"), t)   # v1
    S.delete_keys_mor(spark, t, _keys(spark, 1))                   # v2
    v3 = S.delete(spark, t, [("n", ">=", 30)])                     # CoW rewrite
    got = sorted(r["n"] for r in S.read(spark, t).collect())
    assert got == [n for n in range(30) if n != 1]
    assert S.read_manifest(t, v3)["delete_files"]   # untouched files remain
    # time travel: the pre-rewrite version still reads with its delete
    assert S.read(spark, t, version=2).count() == 39


def test_merge_skips_file_whose_only_match_is_deleted(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 20).repartitionByRange(2, "n"), t)   # v1: 2 files
    v1_files = set(S.read_manifest(t, 1)["files"])
    S.delete_keys_mor(spark, t, _keys(spark, 3))                   # v2
    src = spark.createDataFrame([(3, 777)], "n: long, g: long")
    v3 = S.merge(spark, t, src, on=["n"])
    # key 3's only occurrence was equality-deleted: no LIVE match, so no
    # data file is rewritten — the source row is a pure insert
    m3 = S.read_manifest(t, v3)
    assert v1_files <= set(m3["files"])
    got = {r["n"]: r["g"] for r in S.read(spark, t).collect()}
    # the inserted row enters at seq v3 > the delete's seq: visible
    assert got[3] == 777 and len(got) == 20


def test_dv_and_mor_deletes_survive_merge_together(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_kv(spark, 0, 40).repartitionByRange(4, "n"), t)   # v1
    S.delete_keys_mor(spark, t, _keys(spark, 1))                   # v2
    S.delete_where_dv(spark, t, [("n", "=", 12)])                  # v3
    src = spark.createDataFrame([(5, 999)], "n: long, g: long")
    S.merge(spark, t, src, on=["n"])                               # v4
    got = {r["n"]: r["g"] for r in S.read(spark, t).collect()}
    assert 1 not in got and 12 not in got and got[5] == 999
    assert len(got) == 38
