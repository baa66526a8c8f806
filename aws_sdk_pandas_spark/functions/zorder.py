"""Z-order (Morton) clustering key for multi-dimensional data skipping.

At 100 TB, parquet min/max row-group stats only prune on the sort
dimension; sorting by an interleaved-bit key clusters *several* dimensions
at once so range predicates on any of them skip files (the technique Delta
OPTIMIZE ZORDER BY popularized — here as a plain column expression plus a
range-partitioned sorted write, nothing engine-specific).

The key is a pure JVM-side expression (shift/and/or chains inside one
whole-stage-codegen span, no UDF) and is deliberately SQL-portable: the
identical unrolled formula runs on any engine with ``& << >>``, which is
what the DuckDB oracle executes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into a Morton key.

    Columns must already be non-negative integers scaled to ``[0, 2**bits)``
    — apply ``pmod``/range normalization first.  With ``d`` columns the key
    has ``d * bits`` bits; keep ``d * bits <= 62``.
    """
    if not cols:
        raise ValueError("zorder_key requires at least one column")
    d = len(cols)
    if d * bits > 62:
        raise ValueError(f"{d} cols x {bits} bits exceeds a signed 64-bit key")
    cs = [(F.col(c) if isinstance(c, str) else c).cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    return z


def zorder_key_sql(col_names: list[str], bits: int = 16) -> str:
    """The same Morton key as a portable SQL expression (unrolled)."""
    d = len(col_names)
    terms = [
        f"((({c} >> {i}) & 1) << {i * d + j})"
        for i in range(bits)
        for j, c in enumerate(col_names)
    ]
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    num_files: int = 200,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols``.

    ``repartitionByRange`` on the key gives globally disjoint key ranges
    per file (one shuffle with a sampled range partitioner — the same cost
    profile as any global sort), then an in-partition sort makes row-group
    stats tight.  Columns are min-normalized and masked into the key; the
    raw columns are written unchanged.
    """
    key = zorder_key(
        [F.pmod(F.col(c), F.lit(1 << bits)) for c in cols], bits=bits
    )
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )
