"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG are order-dependent: a 32-partition Spark sum and
a DuckDB single-thread sum can differ in the last ulp, which breaks
exact value-hash comparison (and, at 100 TB, makes results
non-reproducible run to run). The fix: cast to DECIMAL before
aggregating — decimal addition is exact and associative, so every
partitioning/ordering yields bit-identical results — then cast the final
value back to DOUBLE for a stable output type.

Precisions are chosen so products stay exact (never hit the 38-digit
cap, where Spark and DuckDB apply different scale-reduction rules).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column, precision: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dbl(x: Column, scale: int) -> Column:
    """DECIMAL -> DOUBLE identically across engines.

    A direct CAST(decimal AS DOUBLE) is NOT portable: DuckDB computes
    double(unscaled) * 10^-scale (two roundings, and 10^-scale is itself
    inexact), while Spark's BigDecimal.doubleValue is correctly rounded —
    they differ in the last ulp for wide values. Going through the
    unscaled BIGINT — round to `scale`, multiply by 10^scale (exact
    integer-valued decimal), cast to BIGINT (exact), cast to DOUBLE
    (one correctly-rounded conversion in both engines), divide by the
    exactly-representable double 10^scale (one more identical rounding)
    — gives bit-identical doubles. SQL twin: sql_dbl()."""
    m = 10**scale
    return (F.round(x, scale) * F.lit(m)).cast("long").cast("double") / F.lit(float(m))


def sql_dbl(expr: str, scale: int) -> str:
    """SQL twin of dbl(). Contract: `expr`'s decimal type needs `scale`
    digits of precision headroom for the *10^scale step (DuckDB keeps
    the input precision through the multiply and overflows otherwise).
    SUM() results satisfy this automatically — DuckDB widens sums to
    DECIMAL(38,s) — which is the pattern every registry query uses; for
    a bare CAST use a precision ≥ digits(value) + 2*scale."""
    m = 10**scale
    return f"(CAST(CAST(ROUND({expr}, {scale}) * {m} AS BIGINT) AS DOUBLE) / {m}.0)"


def dsum(col: str | Column, precision: int = 12, scale: int = 2) -> Column:
    """Exact sum of a double column via decimal, returned as double."""
    return dbl(F.sum(dec(col, precision, scale)), scale)


def sql_dsum(col: str, precision: int = 12, scale: int = 2) -> str:
    return sql_dbl(f"SUM(CAST({col} AS DECIMAL({precision},{scale})))", scale)
