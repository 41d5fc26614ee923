"""Vector math over ``array<float>`` embedding columns.

Everything here is built from Spark higher-order functions (``zip_with``,
``aggregate``, ``transform``) — they execute inside the JVM against the
array's packed representation, so there is no Python/Arrow round-trip in the
hot path. A Pandas-UDF variant would only win once per-row vectors are large
enough for BLAS to matter (thousands of dims); at 64-dim fixture scale and at
cluster scale alike, staying JVM-side avoids serializing 100 TB of vectors
through Python.

Elements are cast to double before multiply-accumulate so results are
bit-comparable with double-precision oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Dot product of two array columns, accumulated in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, z: acc + z)


def squared_norm(a) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))


def norm(a) -> Column:
    return F.sqrt(squared_norm(a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
