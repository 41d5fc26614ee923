"""Exact invariants on the shard-replicated scale dataset.

tools/gen_scale.py builds the ~Nx dataset as N disjoint key universes of
the base fixture (shared dims single-copy). For key-structured operators
that is not just "more data": every per-shard subgraph/sub-star is
isomorphic to the base, so counts and exact-integer aggregates must come
out EXACTLY N times the base values. Asserting that both validates the
generator (no key collisions, no lost rows) and proves the operators are
shard-independent — no hidden global state, no cross-key leakage.

(Content-perturbed columns — salted text, rotated embeddings — are
deliberately NOT asserted here: their per-shard results are only
approximately isomorphic by design.)
"""

from __future__ import annotations

import pytest

from fraud_detection_etl_project_spark.plans.advanced_queries import (
    copurchase_triangle_count,
)
from fraud_detection_etl_project_spark.plans.relational_queries import (
    pricing_summary,
    region_customer_rollup,
)

BASE = "/root/testdata/sf0.001"
SHARDS = 3


@pytest.fixture(scope="module")
def scale_dir(spark):
    from tools.gen_scale import generate

    return generate(spark, base_dir=BASE, shards=SHARDS)


def test_triangle_count_scales_exactly(spark, scale_dir):
    base = copurchase_triangle_count(spark, BASE).collect()[0]
    big = copurchase_triangle_count(spark, scale_dir).collect()[0]
    assert big["n_nodes"] == SHARDS * base["n_nodes"]
    assert big["n_edges"] == SHARDS * base["n_edges"]
    assert big["n_triangles"] == SHARDS * base["n_triangles"]


def test_pricing_summary_groups_scale_exactly(spark, scale_dir):
    """Same group keys, every count and exact-cents sum exactly N-fold —
    integer-cents arithmetic makes this a bit-exact assertion, no float
    tolerance needed."""
    base = {tuple(r[k] for k in ("l_returnflag", "l_linestatus")): r
            for r in pricing_summary(spark, BASE).collect()}
    big = {tuple(r[k] for k in ("l_returnflag", "l_linestatus")): r
           for r in pricing_summary(spark, scale_dir).collect()}
    assert set(big) == set(base)
    for key, b in base.items():
        g = big[key]
        assert g["count_order"] == SHARDS * b["count_order"]
        assert round(g["sum_qty"] * 100) == SHARDS * round(b["sum_qty"] * 100)
        # compare in integer cents: the sums are exact there, while
        # SHARDS * <double> re-rounds in the last ulp
        assert round(g["sum_base_price"] * 100) == SHARDS * round(b["sum_base_price"] * 100)


def test_region_rollup_scales_exactly(spark, scale_dir):
    base = {(r["r_name"], r["n_name"]): r
            for r in region_customer_rollup(spark, BASE).collect()}
    big = {(r["r_name"], r["n_name"]): r
           for r in region_customer_rollup(spark, scale_dir).collect()}
    assert set(big) == set(base)
    for k in base:
        assert big[k]["n_customers"] == SHARDS * base[k]["n_customers"]
