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


_TWO32 = 4_294_967_296


def dbl_wide(x: Column, scale: int) -> Column:
    """dbl() for unscaled magnitudes past BIGINT (|x|*10^scale >= 2^63
    — e.g. sums of squared prices at sf1+): split the exact unscaled
    decimal at 2^32 (hi = (u - u%2^32) / 2^32, lo = u % 2^32) and
    recombine in double — double(hi)*2^32 + double(lo), then /10^scale.
    Every step is the identical IEEE op on identical integers in both
    engines, so the result is BIT-IDENTICAL cross-engine (for u > 2^53
    it may differ from dbl()'s single correctly-rounded conversion by
    an ulp, which is why a query must use the same width on BOTH sides
    — never mix).

    Contract: |u| < 10^27 (a LOUD decimal overflow otherwise). The
    cap is what keeps the split exact on the Spark side: a
    decimal(27,0) dividend divides at result precision 38 WITHOUT
    Spark's silent 38-cap scale reduction (a decimal(38,0) dividend
    does not — observed as 1-2 ulp drift), and the quotient of an
    exact 2^32-multiple is integer-valued, hence exact at any scale.
    10^27 still covers ~6e25, the squared-price second moment of a
    100 TB lineitem. SQL twin: sql_dbl_wide() (DuckDB divides
    decimals in DOUBLE, so the twin uses integral `//`, exact on an
    exact multiple)."""
    m = 10**scale
    u = (F.round(x, scale) * F.lit(m)).cast("decimal(27,0)")
    r = u % F.lit(_TWO32)
    hi = ((u - r) / F.lit(_TWO32)).cast("long")
    lo = r.cast("long")
    return (
        (hi.cast("double") * F.lit(float(_TWO32)) + lo.cast("double")) / F.lit(float(m))
    )


def sql_dbl_wide(expr: str, scale: int) -> str:
    """SQL twin of dbl_wide(): same remainder split, same op order."""
    m = 10**scale
    u = f"CAST(ROUND({expr}, {scale}) * {m} AS DECIMAL(27,0))"
    r = f"({u} % {_TWO32})"
    hi = f"CAST(({u} - {r}) // {_TWO32} AS BIGINT)"
    lo = f"CAST({r} AS BIGINT)"
    return (
        f"((CAST({hi} AS DOUBLE) * {float(_TWO32)} + CAST({lo} AS DOUBLE)) / {m}.0)"
    )


def dsum(col: str | Column, precision: int = 12, scale: int = 2) -> Column:
    """Exact sum of a double column via decimal, returned as double."""
    return dbl(F.sum(dec(col, precision, scale)), scale)


def sql_dsum(col: str, precision: int = 12, scale: int = 2) -> str:
    return sql_dbl(f"SUM(CAST({col} AS DECIMAL({precision},{scale})))", scale)
