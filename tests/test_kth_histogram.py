"""Recursive histogram-rank selection (_kth_smallest_histogram).

Round-6 verdict #1: phase 2 was unbounded when residuals concentrate in
one histogram cell — exactly what a well-fit model produces. These tests
pin the round-7 fix: cell widths derive from the observed min/max
(structural — no per-caller width knob), the selected cell is recursed
until the in-cell rank is <= _CF_TAKE_BOUND, and an all-ties cell returns
a literal with no sort at all. Correctness oracle: Python sorted() on the
same values.
"""

from __future__ import annotations

import re

from fraud_detection_etl_project_spark.plans.ml_queries import (
    _CF_HIST_CELLS,
    _CF_TAKE_BOUND,
    _derive_width,
    _kth_smallest_histogram,
)


def _kth_oracle(vals: list[int]) -> int:
    n = len(vals)
    k = ((n + 1) * 9 + 9) // 10
    return sorted(vals)[k - 1]


def _make(spark, vals: list[int]):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "tie bigint, r_q bigint"
    )


def _take_ordered_limits(df) -> list[int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [int(m) for m in re.findall(r"TakeOrderedAndProject\(limit=(\d+)", plan)]


def test_concentrated_residuals_bounded_takeordered(spark):
    # The well-fit-model case: every residual inside ONE old-default-width
    # (2^22) cell, n large enough that rank k > _CF_TAKE_BOUND. The derived
    # width must rebalance so the final TakeOrdered pulls <= the bound.
    vals = [(i * 7919) % 3001 for i in range(6000)]  # all in [0, 3000]
    n = len(vals)
    k = ((n + 1) * 9 + 9) // 10
    assert k > _CF_TAKE_BOUND  # the round-6 shape WOULD have collected k rows
    q = _kth_smallest_histogram(_make(spark, vals), "r_q", "tie")
    limits = _take_ordered_limits(q)
    assert all(lim <= _CF_TAKE_BOUND for lim in limits), limits
    assert q.collect()[0]["q"] == _kth_oracle(vals)


def test_all_ties_returns_literal_no_sort(spark):
    # min == max: the k-th IS that value — literal frame, zero TakeOrdered.
    vals = [42] * 10000
    q = _kth_smallest_histogram(_make(spark, vals), "r_q", "tie")
    assert _take_ordered_limits(q) == []
    assert q.collect()[0]["q"] == 42


def test_outlier_plus_concentration_returns_literal(spark):
    # 9999 zeros + one huge outlier: the span is 1e9 so the zero cell holds
    # ~all of n, but its per-cell min == max short-circuits to a literal.
    vals = [0] * 9999 + [10**9]
    q = _kth_smallest_histogram(_make(spark, vals), "r_q", "tie")
    assert _take_ordered_limits(q) == []
    assert q.collect()[0]["q"] == _kth_oracle(vals) == 0


def test_recursion_into_dense_cell(spark):
    # Force a genuine level-1 recursion: a wide span (2^40) puts 15000 of
    # 20000 rows into one level-0 cell with bmin < bmax and in-cell rank
    # 13001 > _CF_TAKE_BOUND, so the cell is re-histogrammed with a width
    # derived from its own exact span.
    hi = 1 << 40
    dense = [hi - 1000 + ((i * 31) % 1001) for i in range(15000)]
    sparse = [(i * 104729) % (1 << 30) for i in range(5000)]
    vals = sparse + dense
    n = len(vals)
    k = ((n + 1) * 9 + 9) // 10
    assert k > len(sparse)  # rank k lands inside the dense cell
    assert k - len(sparse) > _CF_TAKE_BOUND  # and exceeds the take bound
    q = _kth_smallest_histogram(_make(spark, vals), "r_q", "tie")
    limits = _take_ordered_limits(q)
    assert all(lim <= _CF_TAKE_BOUND for lim in limits), limits
    assert q.collect()[0]["q"] == _kth_oracle(vals)


def test_empty_calibration_empty_frame(spark):
    q = _kth_smallest_histogram(_make(spark, []), "r_q", "tie")
    assert q.collect() == []
    assert [f.name for f in q.schema.fields] == ["q"]


def test_derived_width_cell_count_invariant():
    # Structural width guard (verdict #8): for ANY integer span, the
    # derived width yields between 2 and _CF_HIST_CELLS+1 cells — a
    # bounded driver collect by construction. Sweep every power of two up
    # to 63 bits plus the two real caller domains (events micro-unit
    # residuals ~4e8; the [0, 1e6] risk lattice that round 6 mis-widthed).
    spans = [1 << e for e in range(64)] + [4 * 10**8, 10**6, 245, 3]
    for span in spans:
        w = _derive_width(0, span)
        ncells = span // w + 1
        assert 2 <= ncells <= _CF_HIST_CELLS + 1, (span, w, ncells)
    assert _derive_width(5, 5) == 1  # degenerate span: width floor of 1
