"""Cross-engine-stable rounding.

Two engines rounding the same double can disagree: Spark's ``round`` is
decimal-exact (BigDecimal HALF_UP on the binary value), DuckDB's multiplies
by 10^p and rounds — off-by-one-cent on ~1 in 10^4 values. For oracle-checked
outputs we therefore round with an explicit formula whose IEEE operations are
identical in any engine::

    floor(x * 10^p + 0.5) / 10^p

Given identical input bits, this yields identical output bits everywhere.

Placement rule used across plans/:
- row-level computed values -> 2-4 places (bits are identical by
  construction, any place count is parity-safe);
- grouped SUMs of money -> 2 places (fp noise ~1e-9 vs a half-cent
  boundary distance of 5e-3: safe even though engines sum in different
  orders);
- DIVIDED aggregates (avg, ratios, interpolated percentiles) -> 6 places:
  their true values often sit exactly ON a half-cent (e.g. avg of two
  cents values), where different summation order straddles the boundary;
  at 6 places the boundary moves 5e-7 away from such values.

The *semantic* rounding of the reference pipeline (pandas HALF_EVEN) is a
different concern — that is ``F.bround`` in pipeline.py, not this.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fxr(col: Column | str, places: int = 2) -> Column:
    """Engine-portable round-half-up(-toward-+inf) to ``places`` decimals."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**places)
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def fxr_sql(expr: str, places: int = 2) -> str:
    """The same formula as SQL text (for DuckDB oracles)."""
    scale = f"{10**places}.0"
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
