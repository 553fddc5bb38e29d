"""Data-layout operators — multi-dimensional clustering for scan pruning.

At 100 TB the scan is the query: parquet/Iceberg prune row groups by
min/max stats, and stats are only selective if the data is CLUSTERED on
the filtered column. Range-partitioning clusters ONE column; a Z-order
(Morton) key interleaves the bits of two columns so range-partitioning on
the key clusters BOTH — predicates on either column skip most files (the
technique behind Delta/Iceberg's OPTIMIZE ZORDER).

Everything is Column bit math (fully codegen'd) and the key is
engine-neutral — an external oracle recomputes it with the same shifts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative int
    columns: bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Inputs are masked to ``bits`` first (callers bucket/rank wider domains
    down — Z-ordering needs bounded, roughly-uniform key spaces)."""
    if bits > 31:
        raise ValueError("bits > 31 would overflow the 63-bit positive long range")
    a = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        key = key.bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return key


def zorder_layout(
    df: DataFrame, col_a: str, col_b: str, n_ranges: int, bits: int = 16
) -> DataFrame:
    """Cluster the frame into ``n_ranges`` contiguous Z-order ranges
    (repartitionByRange on the Morton key): each output file covers a small
    bounding box in (col_a, col_b) space, so min/max stats prune scans
    filtered on EITHER column. Write the result with .write.parquet — the
    sort key column is dropped from the output."""
    keyed = df.withColumn("__zkey", zorder_key(F.col(col_a), F.col(col_b), bits))
    return keyed.repartitionByRange(n_ranges, "__zkey").sortWithinPartitions("__zkey").drop(
        "__zkey"
    )
