"""Data-layout keys for multi-column pruning (Z-order / Morton).

At 100 TB the cheapest rows are the ones never read: parquet keeps
min/max stats per row group, and a reader's pushed range predicate
skips groups whose stats cannot match. Sorting by ONE column makes
one predicate selective and leaves any other column's stats spanning
the whole domain; interleaving the bits of several columns' ranks
(Z-order — the curve Delta/Iceberg OPTIMIZE ZORDER BY uses) keeps
EVERY interleaved column locally clustered, so multi-dimensional box
predicates prune on all of them at once.

No reference counterpart (Logprep has no storage layer); public
technique (Morton 1966; Databricks/Iceberg docs describe the same
write path: compute the curve key, range-repartition + sort by it,
write).

Usage::

    key = zorder_key([F.col("user_id"), F.col("value")], bits=12)
    df.repartitionByRange(n, key).sortWithinPartitions(key).write...

Everything is native Catalyst expressions — rank bucketing via
exact percent-rank over a sample-free window is deliberately NOT
used (a global window serializes the write); instead callers pass
pre-scaled integer columns or use :func:`scale_to_bits` with known
domain bounds (the broadcast-model discipline: compute bounds in one
tiny agg, attach as literals).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scale_to_bits(col: Column, lo: float, hi: float, bits: int = 12) -> Column:
    """Affine-map ``col`` from [lo, hi] to the integer grid
    [0, 2^bits): the per-column rank proxy feeding the interleave.
    Bounds come from a prior 1-row agg (broadcast-model pattern) or
    domain knowledge; values outside clamp to the edge cells."""
    cells = (1 << bits) - 1
    unit = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(unit, F.lit(0.0)), F.lit(1.0))
    return F.round(clamped * cells).cast("long")


def zorder_key(cols: list[Column], bits: int = 12) -> Column:
    """Morton/Z-order key: bit-interleave ``cols`` (already integer
    grid coordinates in [0, 2^bits), e.g. from :func:`scale_to_bits`).
    Bit b of column c lands at position b·len(cols)+c — a pure
    shift/or expression tree (2·bits·len(cols) native ops, codegen
    folds it into one stage; no UDF, no shuffle)."""
    n = len(cols)
    if not n:
        raise ValueError("zorder_key needs at least one column")
    out = F.lit(0).cast("long")
    for b in range(bits):
        for c, col in enumerate(cols):
            bit = F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + c))
    return out


def with_hilbert_key(
    df,
    x: Column,
    y: Column,
    bits: int = 12,
    out_col: str = "_hilbert",
):
    """Append a 2-D Hilbert-curve index column (the curve Morton
    approximates: no diagonal jumps, so range boxes map to fewer,
    longer runs of the key — usually a little more pruning at equal
    sort cost). Inputs are integer grid coordinates in [0, 2^bits)
    (see :func:`scale_to_bits`).

    Implementation note: the classic xy2d loop REWRITES x and y each
    level (rotate/reflect), so a pure Column composition would double
    its expression tree per level (2^bits blowup — the Catalyst
    lesson from embed_truncation_fidelity). Returning a DataFrame
    lets each level STAGE its rotated coordinates as real columns:
    ``bits`` chained projections, each O(1) expressions, all fused by
    whole-stage codegen into one narrow map."""
    cx, cy, acc = "__hx", "__hy", "__hd"
    out = df.withColumn(cx, x.cast("long")).withColumn(cy, y.cast("long")).withColumn(
        acc, F.lit(0).cast("long")
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.shiftright(F.col(cx), level).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col(cy), level).bitwiseAND(F.lit(1))
        d_inc = F.lit(s) * F.lit(s) * ((F.lit(3) * rx).bitwiseXOR(ry))
        # rotate/reflect the sub-quadrant (only when ry == 0)
        nx = (
            F.when(ry == 0, F.when(rx == 1, F.lit(s - 1) - F.col(cy)).otherwise(F.col(cy)))
            .otherwise(F.col(cx))
        )
        ny = (
            F.when(ry == 0, F.when(rx == 1, F.lit(s - 1) - F.col(cx)).otherwise(F.col(cx)))
            .otherwise(F.col(cy))
        )
        out = out.select(
            *[c for c in out.columns if c not in (cx, cy, acc)],
            nx.alias(cx),
            ny.alias(cy),
            (F.col(acc) + d_inc).alias(acc),
        )
    return out.withColumnRenamed(acc, out_col).drop(cx, cy)


def layout_pruning_stats(
    df,
    cx_col: str,
    cy_col: str,
    id_col: str,
    n_files: int = 16,
    x_probe: tuple[int, int] = (1843, 2252),
    y_probe: tuple[int, int] = (1843, 2252),
    bits: int = 12,
    with_hilbert: bool = False,
):
    """Measure what Z-ordering buys BEFORE rewriting a table: assign
    rows to ``n_files`` equal-count files under (a) the linear layout
    (sorted by cx, then cy) and (b) the Z-order layout (sorted by the
    Morton key), collect per-file min/max of both dimensions — the
    stats a parquet footer would carry — and count the files a range
    probe cannot skip on each dimension and on the 2-D box. The
    linear layout prunes its leading column and NOTHING else (every
    file spans the full cy domain); Z-order prunes on both at once —
    this frame is that claim, measured, as data.

    Inputs are integer grid coordinates (see :func:`scale_to_bits` /
    the integer-exact inline variant in the catalog row) plus a
    unique ``id_col`` tie-break so the file assignment is a total
    order — deterministic in any engine, which is what lets the
    whole report hash-compare against a SQL replica.

    File assignment is ntile SEMANTICS realized by the r12 two-pass
    global rank + driver-side ntile arithmetic (plans/ranks.py —
    range shuffle + broadcast partition-count model; bit-identical to
    ``ntile().over(Window.orderBy(...))``, so the file boundaries and
    hence the report stay bit-stable), which is also the SAME
    physical layout production writes use (``repartitionByRange(n,
    key)`` + ``sortWithinPartitions(key)``, module docstring — read
    the REAL footer stats back with tools/layout_report.py). The r11
    "gate-scale honesty" caveat about the serialized ntile sort is
    gone with the window."""
    from pyspark.sql import functions as F

    from logprep_spark.plans.ranks import ntile_from_rank, with_global_rank

    z = df.select(
        F.col(id_col).alias("_id"),
        F.col(cx_col).cast("long").alias("_cx"),
        F.col(cy_col).cast("long").alias("_cy"),
    ).withColumn("_zk", zorder_key([F.col("_cx"), F.col("_cy")], bits))

    def one(layout: str, order_cols: list, frame=None):
        ranked, n_rows = with_global_rank(
            z if frame is None else frame, order_cols, rank_col="_rk"
        )
        files = ranked.withColumn(
            "_f", ntile_from_rank("_rk", n_rows, n_files)
        )
        per = files.groupBy("_f").agg(
            F.min("_cx").alias("_xlo"),
            F.max("_cx").alias("_xhi"),
            F.min("_cy").alias("_ylo"),
            F.max("_cy").alias("_yhi"),
        )
        hit_x = (F.col("_xlo") <= x_probe[1]) & (F.col("_xhi") >= x_probe[0])
        hit_y = (F.col("_ylo") <= y_probe[1]) & (F.col("_yhi") >= y_probe[0])
        as_cnt = lambda c: F.sum(c.cast("long")).cast("long")  # noqa: E731
        return per.agg(
            F.count(F.lit(1)).alias("n_files"),
            as_cnt(hit_x).alias("files_hit_x"),
            as_cnt(hit_y).alias("files_hit_y"),
            as_cnt(hit_x & hit_y).alias("files_hit_box"),
        ).select(F.lit(layout).alias("layout"), "*")

    out = one("linear", [F.col("_cx"), F.col("_cy"), F.col("_id")]).unionAll(
        one("zorder", [F.col("_zk"), F.col("_id")])
    )
    if with_hilbert:
        nonlocal_z = with_hilbert_key(
            z, F.col("_cx"), F.col("_cy"), bits=bits, out_col="_hk"
        )
        hrow = one(
            "hilbert", [F.col("_hk"), F.col("_id")], frame=nonlocal_z
        )
        out = out.unionAll(hrow)
    return out
