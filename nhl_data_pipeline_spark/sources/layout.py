"""Z-order (Morton) data layout for multi-column scan pruning.

The write-time lever `sources/bucketed.py` doesn't cover: bucketing
co-locates JOINS on one key; Z-ordering clusters FILES so that parquet
min/max footer stats prune multi-dimensional range/point predicates
(user × time, team × season). A range sort on a single column prunes only
that column; interleaving the bits of k columns gives every file a tight
bounding box in all k dimensions, so a scan with predicates on ANY subset
of them skips most files. This is what proprietary table formats sell as
OPTIMIZE ZORDER BY; on plain parquet it is exactly three declarative
steps, all engine-native:

  1. min-max bin each column to ``bits``-bit integers (table stats — one
     tiny agg, k doubles to the driver);
  2. interleave the bits in whole-stage codegen (shift/or fold — no UDF);
  3. repartitionByRange(z) + sortWithinPartitions(z): the range exchange
     puts disjoint z-ranges in separate files, the sort tightens each
     file's bounding box further (row-group-level pruning).

At 100 TB this is the difference between "point query reads the table"
and "point query reads ~1/files_per_dim of it" for workloads that filter
on more than one column; the cost is one shuffle at write time, same as
any clustering. Effectiveness is MEASURED (sf0.1 events, 16 files,
(user_id, ts) boxes, footer stats via tests/test_layout.py helpers):
a hash layout reads 16/16 files for EVERY predicate; same-run paired
comparison of the two curves —

  box predicate        morton   hilbert
  corner 25%×25%        2/16     1/16
  quadrant-local 25%    5/16     4/16
  center-seam 25%       7/16     4/16
  centered 10%          7/16     4/16

Morton (default) is the cheaper expression and generalizes to k columns;
its weakness is the top-bit discontinuity (boxes straddling the center
seam of both dims). The Hilbert curve (`with_hilbert`, 2-D) is
continuous and strictly dominated Morton at every measured predicate —
choose it for seam-heavy 2-D workloads via ``curve="hilbert"``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_bin(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by min-max scaling. ``lo``/
    ``hi`` come from table stats (one agg); values at/beyond hi clamp to
    the top bin so new out-of-range rows never overflow the bit budget."""
    span = (hi - lo) or 1.0
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(2**bits)
    return F.least(
        F.greatest(F.floor(scaled).cast("bigint"), F.lit(0)),
        F.lit(2**bits - 1),
    )


def zvalue(binned: list[Column], bits: int) -> Column:
    """Morton interleave of k ``bits``-bit integer columns, built as a
    shift/or expression tree — pure whole-stage codegen, no UDF. Bit b of
    column j lands at position b*k + j, so k*bits must stay ≤ 63."""
    k = len(binned)
    if k * bits > 63:
        raise ValueError("k*bits must fit a signed 64-bit z-value")
    terms = [
        F.shiftleft(
            F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + j
        )
        for j, c in enumerate(binned)
        for b in range(bits)
    ]
    return reduce(Column.bitwiseOR, terms).alias("z")


def with_hilbert(
    df: DataFrame, x: Column, y: Column, bits: int, out: str = "z"
) -> DataFrame:
    """Append the 2-D Hilbert index of two ``bits``-bit integer columns
    (the standard xy2d bit-rotation walk, public domain). Unlike Morton,
    the Hilbert curve is continuous — no center-seam discontinuity — so
    box predicates straddling the midlines of both dimensions prune
    better (measured in the module docstring).

    The per-level rotation is stateful, and naively nesting the levels
    into one Column triples the expression tree per level (3^bits nodes —
    the first attempt OOMed the ANALYZER at bits=10). Instead each level
    is projected to named intermediate columns, so every level references
    the previous one by ATTRIBUTE and the plan stays O(bits) — a chain of
    projections Catalyst collapses into one codegen stage, no UDF."""
    if 2 * bits > 62:
        raise ValueError("2*bits must fit a signed 64-bit value")
    d = df.withColumns(
        {
            "_hd": F.lit(0).cast("bigint"),
            "_hx": x.cast("bigint"),
            "_hy": y.cast("bigint"),
        }
    )
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        rx = F.shiftright(F.col("_hx"), lvl).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), lvl).bitwiseAND(F.lit(1))
        flip = rx == 1
        fx = F.when(flip, F.lit(s - 1) - F.col("_hx")).otherwise(F.col("_hx"))
        fy = F.when(flip, F.lit(s - 1) - F.col("_hy")).otherwise(F.col("_hy"))
        keep = ry == 1
        d = d.withColumns(
            {
                "_hd": F.col("_hd")
                + F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry),
                # rotate: swap after flip
                "_hx": F.when(keep, F.col("_hx")).otherwise(fy),
                "_hy": F.when(keep, F.col("_hy")).otherwise(fx),
            }
        )
    return d.withColumnRenamed("_hd", out).drop("_hx", "_hy")


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    *,
    bits: int = 12,
    n_files: int = 32,
    curve: str = "morton",
    drop: list[str] | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Morton (default) or
    Hilbert (2 columns only) order of ``zcols``.

    Stats, binning, interleave, range-partition, sort, write — the z
    column is dropped before writing (it is layout, not data), as are any
    ``drop`` columns (derived numeric layout keys, e.g. a date projected
    to epoch days, that shouldn't land in the files). One range exchange;
    everything else is a map.
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in zcols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in zcols],
    ).collect()[0]
    binned = [
        minmax_bin(F.col(c), stats[f"lo_{c}"], stats[f"hi_{c}"], bits)
        for c in zcols
    ]
    if curve == "hilbert":
        if len(zcols) != 2:
            raise ValueError("hilbert layout supports exactly 2 columns")
        staged = with_hilbert(df, binned[0], binned[1], bits, out="_z")
    elif curve == "morton":
        staged = df.withColumn("_z", zvalue(binned, bits))
    else:
        raise ValueError(f"unknown curve {curve!r}")
    (
        staged
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *(drop or []))
        .write.mode("overwrite")
        .parquet(path)
    )


def file_bounding_boxes(path: str, cols: list[str]) -> list[dict]:
    """Per-parquet-file min/max for ``cols`` read from the footers (what a
    scan's file-level pruning sees). Used to MEASURE layout quality."""
    from pathlib import Path

    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        box: dict = {"file": f.name}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    if col.path_in_schema == c and col.statistics is not None:
                        s = col.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            box[c] = (lo, hi)
        out.append(box)
    return out


def files_intersecting(
    boxes: list[dict], predicate: dict[str, tuple]
) -> int:
    """How many files a footer-pruning scan must read for a box predicate
    {col: (lo, hi)} — the number whose bounding box intersects it."""
    n = 0
    for box in boxes:
        hit = True
        for c, (plo, phi) in predicate.items():
            lo, hi = box[c]
            if lo is None or hi < plo or lo > phi:
                hit = False
                break
        n += hit
    return n
