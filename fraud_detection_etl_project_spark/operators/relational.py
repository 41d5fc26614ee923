"""Relational composites Spark lacks as single primitives (SURVEY.md §2.3-2.6).

The reference has no joins/windows/sorts at all (single-table pipeline), so
these exist for the engine's full analytics surface. Each is a composition of
built-in DataFrame ops — Catalyst still sees the whole logical plan, so
pushdown/pruning/AQE apply as usual.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_name: str = "rn",
) -> DataFrame:
    """Per-group top-k via ``row_number`` over a window.

    Scale: one shuffle on the partition keys; within each partition the sort
    is local. Callers must make ``order_cols`` a total order (unique
    tiebreaker last) for deterministic output.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rank_name, F.row_number().over(w)).filter(F.col(rank_name) <= k)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the nearest right row within the same
    ``on`` key — ``direction="backward"`` (default) takes the latest right
    with ``right_ts <= left_ts``; ``direction="forward"`` the earliest
    right with ``right_ts >= left_ts``.

    Implemented with the union-tag + ``last/first(ignorenulls)``
    running-window trick rather than a join: both sides are unioned, sorted
    once per key by (ts, side), and each left row picks up the nearest
    right payload in the chosen direction. This costs ONE shuffle on the
    key — no join blow-up, no broadcast-nested-loop — and is the
    formulation that survives 100 TB (a naive ``l.ts >= r.ts`` join is
    O(|L|·|R|) per key).

    Right-side ties on the same (key, ts) resolve to the row that sorts last
    in input order of the union; pass pre-deduplicated right sides for strict
    determinism. ``tolerance``: optional max age (|left_ts - right_ts|) as an
    interval/double column-compatible literal; matches outside it are nulled.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    lcols = left.columns
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in payload]).alias("s")).schema["s"].dataType
        ).alias("__rrow"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        F.struct(*[F.col(c) for c in payload]).alias("__rrow"),
    )
    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right (0) sorts before left (1) at equal ts => "<=" as-of semantics
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
        age = F.col("__ts") - F.col("__match_ts")
    else:
        # left (1) sorts before right (0) at equal ts so the window
        # [current, following] still sees an equal-ts right row => ">="
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
        age = F.col("__match_ts") - F.col("__ts")
    matched = unioned.withColumn("__match", pick(F.col("__rrow"))).withColumn(
        "__match_ts", pick(F.when(F.col("__is_left") == 0, F.col("__ts")))
    )
    out = matched.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        out = out.withColumn("__match", F.when(age <= tolerance, F.col("__match")))
    sel = [F.col(f"__lrow.{c}").alias(c) for c in lcols]
    sel += [F.col(f"__match.{c}").alias(f"asof_{c}") for c in payload]
    return out.select(*sel)


def range_join(
    facts: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Band/range join: fact.value in [bucket.lo, bucket.hi).

    The bucket side is broadcast — for dimension-style band tables (the
    common case) this makes the join a map-side nested loop with zero
    shuffle. For two large interval sets, pre-bucket both sides onto a
    common grid and equi-join the grid key first (not needed here).
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(buckets), cond, "inner")


def salted_join(
    large: DataFrame,
    skewed_small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join — compatibility alias for
    ``operators.skew.salted_join`` (the canonical implementation; this
    signature salts the large side with a seeded ``rand``). AQE's
    skew-join handles moderate skew automatically; salting is for
    pathological hot keys (e.g. one merchant receiving 1% of all 100 TB
    of transactions)."""
    from fraud_detection_etl_project_spark.operators.skew import salted_join as _salted

    return _salted(large, skewed_small, key=key, salt_on=None, n=salt_buckets)
