"""Semantic fuzz for the round-9 merge surface: seeded random CDC
batches (upserts, deletes, update_set clauses, gated updates) applied to
a snapshot table via merge/merge_cdc, mirrored into a plain Python dict
model — final states must match exactly, every version must time-travel
back to its recorded model snapshot, and the change history must stay
readable. Complements the commit-protocol linearizability fuzz (which
exercises concurrency) with single-writer SEMANTIC coverage of the
clause matrix."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from fraud_detection_etl_project_spark import snapshot as S


def _model_rows(model):
    return sorted(model.items())


def _table_rows(spark, t, version=None):
    return sorted(
        (r["k"], (r["v"], r["tag"]))
        for r in S.read(spark, t, version=version).collect()
    )


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_merge_clause_matrix_matches_dict_model(spark, seed, tmp_path):
    rng = random.Random(seed)
    t = str(tmp_path / f"tbl{seed}")
    model: dict[int, tuple[int, str]] = {k: (k * 10, "base") for k in range(40)}
    S.overwrite(
        spark.createDataFrame(
            [(k, v, g) for k, (v, g) in model.items()], "k long, v long, tag string"
        ).repartition(4),
        t,
    )
    snapshots = {1: _model_rows(model)}
    for step in range(10):
        kind = rng.choice(
            ["cdc", "replace", "update_set", "gated", "nbs_delete", "nbs_update"]
        )
        keys = rng.sample(range(60), rng.randint(1, 6))
        if kind == "cdc":
            # per-key op: delete if present (else the delete is a no-op),
            # otherwise upsert with fresh values
            rows, ops = [], {}
            for k in keys:
                op = rng.choice(["D", "U"])
                ops[k] = op
                rows.append(
                    (k, None, None, "D") if op == "D" else (k, step, f"s{step}", "U")
                )
            feed = spark.createDataFrame(rows, "k long, v long, tag string, op string")
            S.merge_cdc(spark, t, feed, on=["k"])
            for k, op in ops.items():
                if op == "D":
                    model.pop(k, None)
                else:
                    model[k] = (step, f"s{step}")
        elif kind == "replace":
            src = spark.createDataFrame(
                [(k, step * 100 + k, f"r{step}") for k in keys],
                "k long, v long, tag string",
            )
            S.merge(spark, t, src, on=["k"])
            for k in keys:
                model[k] = (step * 100 + k, f"r{step}")
        elif kind == "update_set":
            src = spark.createDataFrame(
                [(k, 7, f"u{step}") for k in keys], "k long, v long, tag string"
            )
            S.merge(spark, t, src, on=["k"], update_set={"v": "t.v + s.v"})
            for k in keys:
                if k in model:
                    model[k] = (model[k][0] + 7, model[k][1])  # tag untouched
                else:
                    model[k] = (7, f"u{step}")  # unmatched: full insert
        elif kind == "nbs_delete":
            # full-snapshot sync: source rows replace/insert, target rows
            # key-absent from the source (optionally gated on the TARGET
            # row) are deleted in the same commit
            cond = rng.choice([True, "t.v % 2 = 0"])
            src = spark.createDataFrame(
                [(k, step * 100 + k, f"n{step}") for k in keys],
                "k long, v long, tag string",
            )
            S.merge(spark, t, src, on=["k"], not_matched_by_source_delete=cond)
            pre = dict(model)
            for k in keys:
                model[k] = (step * 100 + k, f"n{step}")
            for k, (v, _g) in pre.items():
                if k not in keys and (cond is True or v % 2 == 0):
                    model.pop(k, None)
        elif kind == "nbs_update":
            # not-matched-by-source UPDATE SET over the t alias only,
            # optionally gated; matched rows replace wholesale
            cond = rng.choice([None, "t.v % 3 = 0"])
            src = spark.createDataFrame(
                [(k, step * 100 + k, f"m{step}") for k in keys],
                "k long, v long, tag string",
            )
            S.merge(
                spark, t, src, on=["k"],
                not_matched_by_source_set={"tag": "concat(t.tag, '!')"},
                not_matched_by_source_condition=cond,
            )
            pre = dict(model)
            for k in keys:
                model[k] = (step * 100 + k, f"m{step}")
            for k, (v, g) in pre.items():
                if k not in keys and (cond is None or v % 3 == 0):
                    model[k] = (v, g + "!")
        else:  # gated update: only rows whose target v is even take it
            src = spark.createDataFrame(
                [(k, 1, f"g{step}") for k in keys], "k long, v long, tag string"
            )
            S.merge(
                spark, t, src, on=["k"],
                update_set={"v": "t.v + s.v", "tag": "s.tag"},
                match_condition="t.v % 2 = 0",
            )
            for k in keys:
                if k in model:
                    v, g = model[k]
                    if v % 2 == 0:
                        model[k] = (v + 1, f"g{step}")
                else:
                    model[k] = (1, f"g{step}")
        snapshots[S.current_version(t)] = _model_rows(model)
        assert _table_rows(spark, t) == _model_rows(model), f"step {step} ({kind})"
    # every committed version time-travels back to its model snapshot
    for ver, expected in snapshots.items():
        assert _table_rows(spark, t, version=ver) == expected, f"version {ver}"
    # the history metadata stays coherent: one row per committed version
    hist = S.metadata_table(spark, t, "history")
    assert hist.count() == len(snapshots)
    assert {r["operation"] for r in hist.collect()} <= {"overwrite", "merge"}
