"""Scale-up fixture generator: shard-replicate sf0.1 into an ~sf1 dataset.

Produces a 10x (configurable) dataset in /tmp by unioning SHARDS disjoint
key universes of the base fixture — the standard way to scale a star
schema without distorting per-entity distributions: every replica is a
self-consistent copy whose synthetic keys are offset by ``shard * OFF``,
so join fan-outs, group cardinalities per entity, and selectivities match
the base exactly while total volume grows linearly. Shared dimensions
(region, nation) stay single-copy, as they would in production.

Payload columns are perturbed per shard so content-addressed operators
scale realistically instead of seeing 10 exact copies of everything:

- ``documents.text``: a shard token is interleaved every 4th word, so
  every 5-gram shingle differs across shards (cross-shard Jaccard ~ 0) —
  near-dup clusters keep their base-corpus size instead of becoming
  10x viral clusters (which is a different, adversarial workload —
  covered by tests/test_operators.py's salted-join fixture).
- ``embeddings.embedding``: circularly rotated by shard positions, so
  cross-shard cosine is ~random and ANN/SemDeDup cluster sizes scale
  linearly. ``n_chars`` is recomputed after salting.

Shard 0 is byte-identical to the base (offset 0, no perturbation), so
queries that pin ids (vec_id = 0, doc_id < 150 caps) keep their exact
base-selectivity anchors.

Output is content-addressed on the base dir's file identities + shard
count; regeneration is skipped when the marker file is present.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Key offset between shards — far above any base key at these SFs.
OFF = 1_000_000_000

_KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_SHARED_DIMS = ["region", "nation"]


def _tag(base_dir: str, shards: int) -> str:
    parts = [os.path.abspath(base_dir), str(shards), "v1"]
    for t in sorted(list(_KEYED) + _SHARED_DIMS):
        p = os.path.join(base_dir, f"{t}.parquet")
        st = os.stat(p)
        parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
    return hashlib.md5("\n".join(parts).encode()).hexdigest()[:12]


def _salt_text(shard_col, text_col):
    """Interleave a per-shard token every 4th word (JVM-side: split →
    indexed transform → flatten → concat_ws). Shard 0 is untouched."""
    toks = F.split(text_col, " ")
    tokened = F.flatten(
        F.transform(
            toks,
            lambda t, j: F.when(
                (shard_col > 0) & (j % 4 == 0),
                F.array(F.concat(F.lit("s"), shard_col.cast("string")), t),
            ).otherwise(F.array(t)),
        )
    )
    return F.concat_ws(" ", tokened)


def _rotate_array(shard_col, arr_col, dim: int = 64):
    """Circular rotation by shard positions: element i of the output is
    element (i + shard) mod dim of the input (1-based element_at)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.element_at(arr_col, ((i + shard_col) % dim + 1).cast("int")),
    )


def generate(spark: SparkSession, base_dir: str = "/root/testdata/sf0.1", shards: int = 10) -> str:
    """Write the sharded dataset; returns its directory (cached)."""
    out = os.path.join(tempfile.gettempdir(), f"sparkgraft_scale_{_tag(base_dir, shards)}")
    marker = os.path.join(out, "_SCALED_OK")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    shard = F.col("shard")
    srange = F.explode(F.sequence(F.lit(0), F.lit(shards - 1))).alias("shard")
    for t in _SHARED_DIMS:
        base = spark.read.parquet(os.path.join(base_dir, f"{t}.parquet"))
        base.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    for t, keys in _KEYED.items():
        base = spark.read.parquet(os.path.join(base_dir, f"{t}.parquet"))
        rep = base.select("*", srange)
        cols = []
        for name in rep.columns:
            if name == "shard":
                continue
            c = F.col(name)
            if name in keys:
                c = (c + shard.cast("long") * F.lit(OFF).cast("long")).alias(name)
            elif t == "documents" and name == "text":
                c = _salt_text(shard, c).alias(name)
            elif t == "documents" and name == "n_chars":
                # recomputed after salting so length-derived ops stay honest
                c = F.length(_salt_text(shard, F.col("text"))).cast("long").alias(name)
            elif t == "embeddings" and name == "embedding":
                c = _rotate_array(shard, c).cast("array<float>").alias(name)
            cols.append(c)
        # one output file per shard-ish: keep file counts proportional
        rep.select(*cols).repartition(shards * 2).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    with open(marker, "w") as f:
        f.write("ok")
    return out


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from fraud_detection_etl_project_spark.session import get_spark

    print(generate(get_spark(app_name="gen-scale")))
