"""Registry plumbing for the query inventory."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered fixture views
    bench: bool = False  # include in bench.py's headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, bench=bench, doc=fn.__doc__ or "")
        return fn

    return deco


def BENCH_QUERIES() -> dict[str, QuerySpec]:
    return {n: s for n, s in REGISTRY.items() if s.bench}
