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


def test_zorder_compact_enables_two_column_skipping(spark, tmp_path):
    """After a Z-order compact, file stats prune on EITHER clustered
    column; a layout range-partitioned on x alone prunes nothing for a
    y predicate. Same rows, same answers, different file bounds."""
    t = str(tmp_path / "tbl")
    grid = (
        spark.range(0, 64 * 64)
        .select((F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y"))
    )
    S.overwrite(grid.repartitionByRange(16, "x"), t)
    kept_y_before, total = S.plan_files(t, [("y", "<", 8)])
    assert total == 16 and len(kept_y_before) == 16  # x-sorted: y prunes nothing
    v2 = S.compact(spark, t, n_files=16, zorder_by=["x", "y"])
    assert v2 == 2
    kept_y, total2 = S.plan_files(t, [("y", "<", 8)])
    kept_x, _ = S.plan_files(t, [("x", "<", 8)])
    assert total2 == 16 and len(kept_y) <= 8 and len(kept_x) <= 8, (
        len(kept_y), len(kept_x))
    # correctness unchanged by layout
    assert S.scan(spark, t, [("y", "<", 8)]).count() == 64 * 8
    assert S.scan(spark, t, [("x", "<", 8)]).count() == 64 * 8
    assert S.read(spark, t).count() == 64 * 64


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


def test_model_based_op_sequence_fuzz(spark, tmp_path):
    """Model-based check: a seeded random sequence of overwrite / append
    / merge / delete / compact must keep the table equal to a plain
    dict model after EVERY commit, keep a pinned early version
    readable and unchanged throughout, and survive a final vacuum."""
    import random

    rng = random.Random(20260814)
    t = str(tmp_path / "tbl")

    def kv(pairs):
        return spark.createDataFrame(sorted(pairs.items()), "k long, v long")

    model: dict[int, int] = {i: i * 7 for i in range(20)}
    S.overwrite(kv(model), t)
    pinned = dict(model)  # snapshot v1 must always read as this
    for step in range(10):
        op = rng.choice(["append", "merge", "delete", "compact", "overwrite"])
        if op == "append":
            lo = 100 + step * 10
            new = {k: k for k in range(lo, lo + rng.randint(1, 4))}
            assert not set(new) & set(model)
            S.append(kv(new), t)
            model.update(new)
        elif op == "merge":
            upd = {k: model[k] + 1000 for k in rng.sample(sorted(model), min(3, len(model)))}
            ins = {5000 + step: step}
            S.merge(spark, t, kv({**upd, **ins}), on=["k"])
            model.update(upd)
            model.update(ins)
        elif op == "delete":
            cut = rng.choice(sorted(model))
            S.delete(spark, t, [("k", "<", cut)])
            model = {k: v for k, v in model.items() if not k < cut}
        elif op == "compact":
            S.compact(spark, t, n_files=rng.randint(1, 3))
        else:
            model = {k: k * 13 for k in range(step, step + 15)}
            S.overwrite(kv(model), t)
        got = {r["k"]: r["v"] for r in S.read(spark, t).collect()}
        assert got == model, f"step {step} op {op}"
        got1 = {r["k"]: r["v"] for r in S.read(spark, t, version=1).collect()}
        assert got1 == pinned, f"step {step}: pinned v1 drifted"
    S.vacuum(t, keep_versions=2)
    assert {r["k"]: r["v"] for r in S.read(spark, t).collect()} == model


def test_concurrent_appenders_with_retry_lose_nothing(spark, tmp_path):
    """Two threads racing appends with a conflict-retry loop: the
    optimistic check may force retries, but every row lands exactly
    once."""
    import threading

    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 1), t)
    errors: list[Exception] = []

    def appender(lo: int):
        for i in range(3):
            df = _nums(spark, lo + i * 10, lo + i * 10 + 5)
            for _attempt in range(25):
                try:
                    S.append(df, t)
                    break
                except S.SnapshotConflictError:
                    continue
            else:
                errors.append(RuntimeError(f"append {lo}+{i} never succeeded"))

    threads = [threading.Thread(target=appender, args=(lo,)) for lo in (100, 200)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    got = sorted(r["n"] for r in S.read(spark, t).collect())
    want = [0] + [lo + i * 10 + j for lo in (100, 200) for i in range(3) for j in range(5)]
    assert got == sorted(want)


def test_optimistic_conflict_detected(spark, tmp_path, monkeypatch):
    """A writer whose parent moved underneath it must fail, not clobber."""
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 5), t)

    real_stage = S._stage_data_files

    def stage_and_race(df, table_path, bloom_columns=None):
        files = real_stage(df, table_path, bloom_columns)
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


def test_manifest_stats_and_file_skipping(spark, tmp_path):
    """Footer stats land in the manifest; a range predicate over a
    range-partitioned layout prunes files at PLAN time, and scan()'s
    result is identical to the unpruned filter."""
    t = str(tmp_path / "tbl")
    S.overwrite(
        _nums(spark, 0, 1000).repartitionByRange(8, "n"), t
    )
    m = S.read_manifest(t, 1)
    assert len(m["files"]) == 8
    for f in m["files"]:
        st = m["stats"][f]
        assert st["rows"] > 0 and "n" in st["columns"]
    kept, total = S.plan_files(t, [("n", "<=", 100)])
    assert total == 8 and 1 <= len(kept) < 8, (len(kept), total)
    got = sorted(r["n"] for r in S.scan(spark, t, [("n", "<=", 100)]).collect())
    assert got == list(range(101))
    # equality and lower-bound ops
    assert S.scan(spark, t, [("n", "=", 999)]).count() == 1
    assert S.scan(spark, t, [("n", ">", 990)]).count() == 9
    # empty post-prune set: correct empty frame, schema preserved
    none_df = S.scan(spark, t, [("n", ">", 10_000)])
    assert none_df.count() == 0 and none_df.columns == ["n"]


def test_skipping_is_never_a_filter(spark, tmp_path):
    """A manifest with no stats (old format / exotic types) keeps every
    file — pruning degrades to a no-op, not to wrong answers."""
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 100).repartition(4), t)
    mdir = os.path.join(t, "_manifests")
    import json

    with open(os.path.join(mdir, "v00001.json")) as f:
        m = json.load(f)
    m.pop("stats")
    with open(os.path.join(mdir, "v00001.json"), "w") as f:
        json.dump(m, f)
    kept, total = S.plan_files(t, [("n", "<", 10)])
    assert kept and len(kept) == total == 4
    assert S.scan(spark, t, [("n", "<", 10)]).count() == 10


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    S.overwrite(base.repartitionByRange(4, "k"), t)
    v1_files = set(S.read_manifest(t, 1)["files"])
    # update two keys in the low range, insert two new keys
    src = spark.createDataFrame(
        [(5, -1), (7, -2), (1000, 1), (1001, 2)], "k long, v long"
    )
    v2 = S.merge(spark, t, src, on=["k"])
    assert v2 == 2
    rows = {r["k"]: r["v"] for r in S.read(spark, t).collect()}
    assert len(rows) == 402
    assert rows[5] == -1 and rows[7] == -2 and rows[1000] == 1 and rows[6] == 60
    # CoW at file granularity: the three untouched range files carry over
    v2_files = S.read_manifest(t, 2)["files"]
    carried = [f for f in v2_files if f in v1_files]
    assert len(carried) == 3, (len(carried), len(v2_files))
    # time travel unaffected
    assert S.read(spark, t, version=1).count() == 400
    # duplicate source keys are ambiguous
    dup = spark.createDataFrame([(5, 1), (5, 2)], "k long, v long")
    with pytest.raises(ValueError, match="duplicate keys"):
        S.merge(spark, t, dup, on=["k"])


def test_delete_rewrites_only_stat_candidate_files(spark, tmp_path):
    """DELETE WHERE n < 100 over a range-partitioned layout: files whose
    stat range is entirely >= 100 carry over by name; only candidate
    files are rewritten, and NULL predicate values are kept (SQL DELETE
    semantics)."""
    t = str(tmp_path / "tbl")
    df = spark.range(0, 800).select(
        F.when(F.col("id") == 400, None).otherwise(F.col("id")).alias("n")
    )
    S.overwrite(df.repartitionByRange(8, "id"), t)
    v1_files = set(S.read_manifest(t, 1)["files"])
    v2 = S.delete(spark, t, [("n", "<", 100)])
    assert v2 == 2
    got = [r["n"] for r in S.read(spark, t).collect()]
    assert len(got) == 700 and None in got and min(x for x in got if x is not None) == 100
    carried = [f for f in S.read_manifest(t, 2)["files"] if f in v1_files]
    assert len(carried) >= 6, len(carried)  # non-candidate files untouched
    assert S.read(spark, t, version=1).count() == 800  # time travel intact


def test_schema_evolution_add_column(spark, tmp_path):
    """Appending a frame with a new column evolves the table schema;
    old files project NULL for it; incompatible retypes are rejected."""
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 5), t)
    S.append(
        spark.range(5, 8).select(F.col("id").alias("n"), F.lit("x").alias("tag")), t
    )
    cur = S.read(spark, t)
    assert cur.columns == ["n", "tag"]
    rows = {r["n"]: r["tag"] for r in cur.collect()}
    assert rows[0] is None and rows[5] == "x" and len(rows) == 8
    # v1 keeps its original 1-column schema
    assert S.read(spark, t, version=1).columns == ["n"]
    # merge and scan see the evolved schema too
    src = spark.createDataFrame([(0, "upd")], "n long, tag string")
    S.merge(spark, t, src, on=["n"])
    assert {r["tag"] for r in S.read(spark, t).filter("n = 0").collect()} == {"upd"}
    assert S.scan(spark, t, [("n", "<=", 0)]).columns == ["n", "tag"]
    with pytest.raises(ValueError, match="incompatible schema change"):
        S.append(spark.range(1).select(F.lit("s").alias("n")), t)


def test_version_numbers_past_five_digits(spark, tmp_path):
    """%05d zero-pads but does not cap: version 123456 must round-trip
    through naming, CURRENT parsing, and read_manifest (a per-minute
    streaming append passes 99999 in ~10 weeks)."""
    import json
    import os as _os

    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 3), t)
    mdir = _os.path.join(t, "_manifests")
    big = S._manifest_name(123456)
    assert big == "v123456.json"
    with open(_os.path.join(mdir, "v00001.json")) as f:
        m = json.load(f)
    m["version"], m["parent"] = 123456, None
    with open(_os.path.join(mdir, big), "w") as f:
        json.dump(m, f)
    with open(_os.path.join(mdir, "CURRENT"), "w") as f:
        f.write(big)
    assert S.current_version(t) == 123456
    assert S.read(spark, t).count() == 3
    assert S.append(_nums(spark, 3, 5), t) == 123457
    assert S.read(spark, t).count() == 5


def test_delete_everything_leaves_readable_empty_table(spark, tmp_path):
    """A DELETE matching every row yields an EMPTY version, not a broken
    one: read() returns a zero-row frame with the table schema, scan()
    and merge() still work, and the pre-delete version time-travels."""
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 20), t)
    S.delete(spark, t, [("n", "<", 100)])  # everything matches
    empty = S.read(spark, t)
    assert empty.count() == 0 and empty.columns == ["n"]
    assert S.scan(spark, t, [("n", ">", 0)]).count() == 0
    assert S.read(spark, t, version=1).count() == 20
    # merge into the empty table = pure insert
    S.merge(spark, t, _nums(spark, 5, 8), on=["n"])
    assert sorted(r["n"] for r in S.read(spark, t).collect()) == [5, 6, 7]


def test_append_batch_id_is_idempotent(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.append(_nums(spark, 0, 5), t, batch_id="stream-0")
    v = S.append(_nums(spark, 0, 5), t, batch_id="stream-0")  # replay
    assert v == 1 and S.read(spark, t).count() == 5
    S.append(_nums(spark, 5, 8), t, batch_id="stream-1")
    assert S.read(spark, t).count() == 8
    assert S.committed_batch_ids(t) == {"stream-0", "stream-1"}


def test_foreach_batch_writer_exactly_once(spark, tmp_path):
    """Drive a real file stream through foreachBatch into the snapshot
    table, then hand-replay batch 0 (the crash-between-commit-and-
    checkpoint case): the table must not double-count."""
    src = tmp_path / "src"
    src.mkdir()
    _nums(spark, 0, 20).coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))
    t = str(tmp_path / "tbl")
    writer = S.foreach_batch_writer(t)
    stream = (
        spark.readStream.schema("n long")
        .parquet(str(src / "f1"))
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(120)
    assert S.read(spark, t).count() == 20
    # replayed micro-batch: identical batch_id -> no-op
    writer(_nums(spark, 0, 20), 0)
    assert S.read(spark, t).count() == 20
    # a genuinely new batch still lands
    writer(_nums(spark, 100, 103), 1)
    assert S.read(spark, t).count() == 23


def test_change_feed_over_append_only_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 10), t)          # v1
    S.append(_nums(spark, 10, 15), t)            # v2
    S.append(_nums(spark, 15, 17), t)            # v3
    feed = S.read_changes(spark, t, from_version=1)
    rows = [(r["n"], r["_commit_version"], r["_change_type"]) for r in feed.collect()]
    assert len(rows) == 7 and all(ct == "insert" for _, _, ct in rows)
    assert {v for _, v, _ in rows} == {2, 3}
    assert sorted(n for n, v, _ in rows if v == 3) == [15, 16]
    # bounded upper end
    assert S.read_changes(spark, t, 1, to_version=2).count() == 5
    # empty range after the newest commit -> empty frame, feed schema
    empty = S.read_changes(spark, t, from_version=3)
    assert empty.count() == 0 and "_commit_version" in empty.columns
    # a CoW rewrite in range must refuse, not fabricate row-level changes
    S.delete(spark, t, [("n", "<", 2)])          # v4
    with pytest.raises(ValueError, match="append-only"):
        S.read_changes(spark, t, from_version=1)


def test_snapshot_of_fixture_table_pushdown_intact(spark, tmp_path):
    """Predicate pushdown survives the explicit-file-list read path."""
    t = str(tmp_path / "orders_snap")
    orders = load_table(spark, SF, "orders")
    S.overwrite(orders, t)
    df = S.read(spark, t).filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)" in plan
    assert df.count() == orders.filter(F.col("o_orderstatus") == "O").count()


def test_bloom_point_lookup_skipping(spark, tmp_path):
    """Per-file bloom filters prune point lookups that min/max cannot:
    keys hash-distributed across files make every file's [min, max]
    cover every probe, yet the bloom skips all files but the ones that
    really hold the key — and never skips a file that does hold it
    (exhaustive check over the full key domain)."""
    t = str(tmp_path / "tbl")
    # hash-distribute keys so every file's min/max spans ~the full range
    df = _nums(spark, 0, 2000).repartition(8, "n")
    S.overwrite(df, t, bloom_columns=["n"])
    m = S.read_manifest(t, 1)
    assert len(m["files"]) == 8
    for f in m["files"]:
        assert "n" in m["stats"][f]["bloom"]
    # min/max alone cannot prune a mid-range probe; bloom must
    kept, total = S.plan_files(t, [("n", "=", 777)])
    assert total == 8 and len(kept) < 8, (len(kept), total)
    # correctness across the whole domain: the owning file is never pruned
    for probe in range(0, 2000, 97):
        assert S.scan(spark, t, [("n", "=", probe)]).count() == 1, probe
    # absent key: still zero rows (post-prune filter is authoritative)
    assert S.scan(spark, t, [("n", "=", 99_999)]).count() == 0
    # non-equality ops ignore the bloom (stats path unchanged)
    assert S.scan(spark, t, [("n", "<", 10)]).count() == 10


def test_bloom_string_keys_and_unsupported_probe(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(0, 400).select(
        F.concat(F.lit("user-"), F.col("id").cast("string")).alias("k")
    ).repartition(4, "k")
    S.overwrite(df, t, bloom_columns=["k"])
    kept, total = S.plan_files(t, [("k", "=", "user-123")])
    assert total == 4 and len(kept) < 4
    assert S.scan(spark, t, [("k", "=", "user-123")]).count() == 1
    # probing a bloom'd string column with a non-str value: never prunes
    kept2, _ = S.plan_files(t, [("k", "=", 123)])
    assert len(kept2) == 4


def test_bloom_absent_column_is_unprunable(spark, tmp_path):
    """bloom_columns naming a float column records nothing (floats are
    not bloom keys), and lookups on it keep every file."""
    t = str(tmp_path / "tbl")
    df = _nums(spark, 0, 100).select(
        "n", (F.col("n").cast("double") / 7.0).alias("x")
    ).repartition(4, "n")
    S.overwrite(df, t, bloom_columns=["x"])
    m = S.read_manifest(t, 1)
    for f in m["files"]:
        assert "x" not in m["stats"][f].get("bloom", {})


def test_bloom_missing_column_degrades_not_crashes(spark, tmp_path):
    """bloom_columns naming a column absent from the frame must commit
    fine (absent -> un-prunable), not abort inside staging."""
    t = str(tmp_path / "tbl")
    S.overwrite(_nums(spark, 0, 50).repartition(2, "n"), t, bloom_columns=["n", "typo"])
    m = S.read_manifest(t, 1)
    for f in m["files"]:
        bl = m["stats"][f].get("bloom", {})
        assert "n" in bl and "typo" not in bl
    kept, total = S.plan_files(t, [("typo", "=", 7)])
    assert len(kept) == total == 2
    assert S.scan(spark, t, [("n", "=", 7)]).count() == 1
