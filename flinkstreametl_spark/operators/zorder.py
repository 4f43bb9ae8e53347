"""[EXT] Z-order (Morton) clustering keys for multi-dimensional data
skipping.

A 100 TB table is usually filtered on MORE than one column (customer
AND date; language AND source). Sorting the layout by one column makes
min/max skipping perfect on it and useless on the others; interleaving
the bits of both dimensions into one Morton key and range-partitioning
by it gives every file a small rectangle of the 2-D key space — min/max
(or partition) pruning then cuts reads on EITHER predicate. This is the
layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`; here it is
plain integer arithmetic + `repartitionByRange`, engine-neutral.

The interleave is pure shifts/masks (identical in Spark and DuckDB, so
the key computation is oracle-verified bit-for-bit), and
`tests/test_zorder.py` proves the CLUSTERING CLAIM quantitatively:
after a z-range write, each file's min/max span on each dimension is a
small fraction of that dimension's full range — i.e., a single-column
predicate still prunes most files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 10  # 2 × 10 bits -> 20-bit Morton key, 1024 cells per axis


def interleave_bits_sql(a: str, b: str, bits: int = BITS) -> str:
    """The Morton interleave as portable SQL text (same string runs in
    Spark and DuckDB): bit i of `a` lands at 2i, bit i of `b` at 2i+1."""
    terms = [
        f"((({a} >> {i}) & 1) << {2 * i}) + ((({b} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_key(a: Column | str, b: Column | str, bits: int = BITS) -> Column:
    """Column form of the interleave for DataFrame pipelines."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftleft(F.shiftright(ca.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i))
            + (F.shiftleft(F.shiftright(cb.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def write_zordered(df: DataFrame, path: str, a: str, b: str, n_files: int, bits: int = BITS) -> None:
    """Range-partition by the Morton key and write: each output file
    covers a compact z-range = a small rectangle in (a, b) space. One
    range exchange (sampled bounds), no global sort needed — files only
    need DISJOINT key ranges for min/max skipping, not internal order."""
    keyed = df.withColumn("_z", zorder_key(a, b, bits))
    keyed.repartitionByRange(n_files, "_z").drop("_z").write.mode("overwrite").parquet(path)
