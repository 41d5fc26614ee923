"""Property-based differential tests for the set-similarity family vs
pure-Python oracles (SURVEY.md §5.2 model: same query, independent
engine).

The r10 row-local verify rewrite (`operators/dedup.py`: candidate rows
carry distinct-element arrays, overlap counted with ``array_intersect``
in codegen instead of an explode-join + groupBy) changed the PHYSICAL
shape of every verifier while claiming identical semantics. The fixture
oracles prove it on fixture text; these tests prove it on adversarial
corpora hypothesis finds: duplicate tokens within a doc (array_distinct
boundary), empty and single-token docs, docs sharing everything (J = 1),
docs sharing nothing (the n_inter > 0 filter's edge), stopword-heavy
docs where every prefix trick could break, and exact rational-threshold
boundaries (J == t exactly).

Oracles are set arithmetic on CPython frozensets — no Spark, no DuckDB.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fraud_detection_etl_project_spark.operators.dedup import (
    allpairs_jaccard_join,
    char_ngram_jaccard,
    jaccard_token_similarity,
)

# Small token alphabet => dense overlap structure: hypothesis reliably
# produces pairs at and around the 3/5 threshold, including exact hits.
_TOKENS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

_doc_text = st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=10).map(" ".join)

_corpus = st.lists(_doc_text, min_size=0, max_size=12).map(
    lambda texts: [(i, t) for i, t in enumerate(texts)]
)


def _norm(text: str) -> str:
    return " ".join(text.split()).lower()


def _tokset(text: str) -> frozenset[str]:
    # Mirrors the Spark side exactly: split("", " ") yields [""] on both
    # engines, so an empty doc's token set is {""} — not empty.
    return frozenset(_norm(text).split(" "))


def _grams(text: str, n: int = 3) -> frozenset[str]:
    t = _norm(text)
    if len(t) >= n:
        return frozenset(t[i : i + n] for i in range(len(t) - n + 1))
    return frozenset([t])


def _fxr(x: float, places: int) -> float:
    scale = 10.0**places
    return math.floor(x * scale + 0.5) / scale


@pytest.fixture(scope="session")
def spark_session(spark):
    return spark


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        [(int(i), str(t)) for i, t in rows], "doc_id long, text string"
    )


def _all_candidate_pairs(spark, rows):
    ids = sorted(i for i, _ in rows)
    pairs = [(a, b) for ai, a in enumerate(ids) for b in ids[ai + 1 :]]
    return spark.createDataFrame(pairs or [], "doc_a long, doc_b long")


@given(_corpus)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_allpairs_jaccard_matches_set_oracle(spark_session, rows):
    """allpairs_jaccard_join == brute-force all-pairs set Jaccard at
    t = 3/5 — completeness (prefix filter drops no true pair) AND
    precision (verify passes no false pair), exact n_inter included."""
    df = _mkdocs(spark_session, rows)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard"])
        for r in allpairs_jaccard_join(df, t_num=3, t_den=5).collect()
    }
    sets = {i: _tokset(t) for i, t in rows}
    want = {}
    ids = sorted(sets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter * 5 >= union * 3:
                want[(a, b)] = (inter, _fxr(inter / union, 6))
    assert got == want


@given(_corpus)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_token_jaccard_verify_matches_set_oracle(spark_session, rows):
    """jaccard_token_similarity over EVERY id pair == set Jaccard for
    pairs sharing >= 1 token (the old inner-join contract the row-local
    rewrite must preserve: zero-intersection candidates never surface)."""
    df = _mkdocs(spark_session, rows)
    pairs = _all_candidate_pairs(spark_session, rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_token_similarity(df, pairs).collect()
    }
    sets = {i: _tokset(t) for i, t in rows}
    want = {}
    ids = sorted(sets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                want[(a, b)] = _fxr(inter / len(sets[a] | sets[b]), 4)
    assert got == want


@given(_corpus)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_char_ngram_jaccard_matches_set_oracle(spark_session, rows):
    """char_ngram_jaccard over EVERY id pair == 3-gram set Jaccard for
    pairs sharing >= 1 gram; short docs (< 3 chars, incl. empty) gram to
    the whole text, exactly like the Spark side's char_ngrams."""
    df = _mkdocs(spark_session, rows)
    pairs = _all_candidate_pairs(spark_session, rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard3"]
        for r in char_ngram_jaccard(df, pairs).collect()
    }
    gsets = {i: _grams(t) for i, t in rows}
    want = {}
    ids = sorted(gsets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            inter = len(gsets[a] & gsets[b])
            if inter:
                want[(a, b)] = _fxr(inter / len(gsets[a] | gsets[b]), 4)
    assert got == want
