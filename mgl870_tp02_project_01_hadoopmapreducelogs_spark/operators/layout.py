"""Data-layout clustering primitives: Morton (Z-order) interleaving
and equal-size file packing via a DISTRIBUTED prefix sum.

This is the write-side machinery behind lakehouse `OPTIMIZE ZORDER`:
sort rows along a space-filling curve, then cut the sorted cell
sequence into files of a target row count so every file gets a tight
per-column min/max bounding box (what parquet footers carry and scan
planners prune with). The reference has no analogue — single-machine
pandas never prunes I/O.

Scale design: the prefix sum that turns cell counts into file offsets
is computed in TWO levels so no unbounded data ever crosses a
single-partition boundary — an intra-super-cell running sum windowed
by (layout, super-cell), plus a super-cell offset windowed by
(layout) over the super-cell totals table (bounded by the cell-grid
geometry, never by the data volume). The resulting (cell -> file)
map is grid-bounded and broadcast back onto the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Morton-interleave width per dimension (z fits 2*MORTON_BITS bits)
MORTON_BITS = 16


def morton_sql(xe: str, ye: str, bits: int = MORTON_BITS) -> str:
    """Bit-interleave SQL valid in BOTH Spark and DuckDB (``>> & <<``
    only): x on even bits, y on odd — the Morton/Z curve. Pass COLUMN
    names, not expensive expressions: the x/y terms are referenced
    ``bits`` times each (Catalyst does not CSE into the expansion).
    Inputs are widened to BIGINT first: at bits=16 the top term is a
    ``<< 31``, which silently wraps negative in 32-bit arithmetic."""
    xb, yb = f"cast(({xe}) as bigint)", f"cast(({ye}) as bigint)"
    return " + ".join(
        f"((({xb} >> {i}) & 1) << {2 * i}) + "
        f"((({yb} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )


def pack_cells_into_files(
    hist: DataFrame, rows_per_file: int, super_shift: int
) -> DataFrame:
    """Equal-size file assignment over a (layout, cell, cnt) histogram:
    cells are packed in cell order into files of ~``rows_per_file``
    rows (cell-aligned, so a cell never splits across files — file
    sizes land within ±(max cell size - 1) of the target; a cell
    bigger than the target becomes its own file).

    ``file = floor(cum_before / rows_per_file)`` where ``cum_before``
    is the running row count of all earlier cells in the layout,
    computed as a two-level distributed prefix sum:

    - level 1 (parallel): running sum within (layout, super) where
      ``super = cell >> super_shift`` — partition count scales with
      the grid, each partition holds <= 2^super_shift cells;
    - level 2 (bounded): running sum of super-cell TOTALS within
      layout — the windowed table has one row per occupied super-cell,
      bounded by grid geometry regardless of data volume.

    Returns (layout, cell, file).
    """
    # the histogram is consumed TWICE below (level-1 windows and the
    # super-cell totals); it is grid/vocab-bounded by contract, so
    # materialize it once rather than re-running the (potentially
    # corpus-sized) upstream aggregate per consumer
    hist = hist.localCheckpoint(eager=False)
    sup = F.shiftright("cell", super_shift).alias("super")
    h = hist.select("layout", "cell", "cnt", sup)
    w_intra = (
        Window.partitionBy("layout", "super")
        .orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    h = h.withColumn(
        "intra", F.coalesce(F.sum("cnt").over(w_intra), F.lit(0))
    )
    w_sup = (
        Window.partitionBy("layout")
        .orderBy("super")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sup_off = (
        hist.select("layout", "cnt", sup)
        .groupBy("layout", "super")
        .agg(F.sum("cnt").alias("scnt"))
        .withColumn(
            "sup_off", F.coalesce(F.sum("scnt").over(w_sup), F.lit(0))
        )
        .select("layout", "super", "sup_off")
    )
    return h.join(sup_off, ["layout", "super"]).select(
        "layout",
        "cell",
        # integer `div`, not double `/`+floor: exact past 2^53 rows
        F.expr(f"(intra + sup_off) div {int(rows_per_file)}")
        .cast("long")
        .alias("file"),
    )
