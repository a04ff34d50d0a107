"""Z-order layout (functions/layout.py): Morton-key correctness and
REAL row-group pruning evidence — parquet footer min/max stats are the
mechanism 100 TB readers skip data with, so the assertion counts
candidate row groups straight from the footers (not a proxy metric)."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from logprep_spark.functions.layout import scale_to_bits, zorder_key


def test_zorder_key_interleaves_bits(spark):
    # (x=0b11, y=0b00) -> bits of x at even positions: 0b0101
    # (x=0b00, y=0b11) -> bits of y at odd positions:  0b1010
    rows = spark.createDataFrame(
        [(3, 0), (0, 3), (3, 3), (2, 1)], "x long, y long"
    ).select(
        zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
    )
    assert [r.z for r in rows.collect()] == [0b0101, 0b1010, 0b1111, 0b0110]


def test_zorder_key_is_codegen_native(spark):
    df = spark.range(10).select(
        zorder_key([F.col("id"), F.col("id")], bits=8).alias("z")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_layout_prunes_row_groups(spark, tmp_path):
    """Two independent uniform dims, one 2-D box predicate. A layout
    sorted by ONE dim leaves the other's per-row-group min/max
    spanning the whole domain (every group is a candidate on that
    dim); the Z-ordered layout clusters BOTH, so the box touches a
    fraction of the groups. Counted from the parquet footers."""
    n = 200_000
    df = (
        spark.range(n)
        .select(
            (F.xxhash64(F.col("id")) % 1024).alias("a"),
            (F.xxhash64(F.col("id"), F.lit(1)) % 1024).alias("b"),
        )
        .select(F.abs("a").alias("a"), F.abs("b").alias("b"))
    )
    small_groups = {"parquet.block.size": str(64 * 1024)}

    df.repartition(1).sortWithinPartitions("a").write.options(
        **small_groups
    ).parquet(str(tmp_path / "bydim"))

    key = zorder_key(
        [
            scale_to_bits(F.col("a"), 0, 1023, 10),
            scale_to_bits(F.col("b"), 0, 1023, 10),
        ],
        bits=10,
    )
    df.withColumn("_z", key).repartition(1).sortWithinPartitions("_z").drop(
        "_z"
    ).write.options(**small_groups).parquet(str(tmp_path / "zorder"))

    def candidates(path, alo, ahi, blo, bhi):
        total = cand = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(len(md.schema))}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                sa = g.column(names["a"]).statistics
                sb = g.column(names["b"]).statistics
                total += 1
                if (
                    sa.min <= ahi
                    and sa.max >= alo
                    and sb.min <= bhi
                    and sb.max >= blo
                ):
                    cand += 1
        return cand, total

    lo, hi = 100, 250  # ~15% of each dim
    # the killer case: a predicate on the NON-sort dim. The
    # single-dim layout prunes NOTHING (every group's b stats span
    # the domain); z-order keeps b locally clustered too.
    cb1, t1 = candidates(str(tmp_path / "bydim"), 0, 1023, lo, hi)
    cbz, tz = candidates(str(tmp_path / "zorder"), 0, 1023, lo, hi)
    assert t1 >= 8 and tz >= 8  # enough groups for the claim to mean anything
    assert cb1 == t1  # sort-by-a: zero pruning on b
    assert cbz <= int(0.40 * tz)  # z-order: most groups skipped
    # and the 2-D box is at least as good as the best single-dim case
    c1, _ = candidates(str(tmp_path / "bydim"), lo, hi, lo, hi)
    cz, _ = candidates(str(tmp_path / "zorder"), lo, hi, lo, hi)
    assert cz <= c1 and cz <= int(0.15 * tz)


def _xy2d_ref(n, x, y):
    """Independent reference Hilbert xy2d (Wikipedia formulation)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference(spark):
    import random

    from logprep_spark.functions.layout import with_hilbert_key

    rng = random.Random(7)
    bits = 8
    pts = [(rng.randrange(1 << bits), rng.randrange(1 << bits)) for _ in range(200)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = with_hilbert_key(df, F.col("x"), F.col("y"), bits=bits, out_col="h")
    got = {(r.x, r.y): r.h for r in out.collect()}
    for x, y in pts:
        assert got[(x, y)] == _xy2d_ref(1 << bits, x, y), (x, y)


def test_hilbert_layout_prunes_like_zorder(spark, tmp_path):
    """The Hilbert layout must prune at least as well as the baseline
    claim made for z-order: a non-sort-dim predicate touches well
    under half the row groups."""
    import glob

    from logprep_spark.functions.layout import with_hilbert_key

    n = 200_000
    df = (
        spark.range(n)
        .select(
            F.abs(F.xxhash64(F.col("id")) % 1024).alias("a"),
            F.abs(F.xxhash64(F.col("id"), F.lit(1)) % 1024).alias("b"),
        )
    )
    keyed = with_hilbert_key(df, F.col("a"), F.col("b"), bits=10, out_col="_h")
    keyed.repartition(1).sortWithinPartitions("_h").drop("_h").write.options(
        **{"parquet.block.size": str(64 * 1024)}
    ).parquet(str(tmp_path / "hilbert"))

    total = cand = 0
    for f in glob.glob(str(tmp_path / "hilbert") + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(len(md.schema))}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sb = g.column(names["b"]).statistics
            total += 1
            if sb.min <= 250 and sb.max >= 100:
                cand += 1
    assert total >= 8
    assert cand <= int(0.40 * total)


def test_layout_report_span_ratios(spark, tmp_path):
    """tools/layout_report.py: the span-ratio diagnostic separates a
    clustered column (ratio << 1) from an unclustered one (~1) in the
    same dataset."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from layout_report import span_ratios

    df = spark.range(100_000).select(
        F.col("id").alias("sorted_col"),
        F.abs(F.xxhash64("id") % 1000).alias("random_col"),
    )
    df.repartition(1).sortWithinPartitions("sorted_col").write.options(
        **{"parquet.block.size": str(64 * 1024)}
    ).parquet(str(tmp_path / "d"))
    out = span_ratios(str(tmp_path / "d"), ["sorted_col", "random_col"])
    r_sorted, n = out["sorted_col"]
    r_random, _ = out["random_col"]
    assert n >= 5
    assert r_sorted < 0.35
    assert r_random > 0.9


def test_layout_pruning_stats_grid(spark):
    """16x16 uniform grid, 16 files of 16 rows: Morton order makes
    each file EXACTLY one 4x4 block (the low 4 interleaved bits
    enumerate a 4x4 sub-square), while the linear layout makes each
    file one full cx column. Hand-derived hits for a one-block probe
    (4..7): linear prunes x (4 files) but never y (all 16); Z-order
    hits 4/4, and the 2-D box collapses to ONE file."""
    from logprep_spark.functions.layout import layout_pruning_stats

    rows = [(16 * j + i, i, j) for i in range(16) for j in range(16)]
    df = spark.createDataFrame(rows, ["id", "cx", "cy"])
    got = {
        r["layout"]: r
        for r in layout_pruning_stats(
            df, "cx", "cy", "id",
            n_files=16, x_probe=(4, 7), y_probe=(4, 7), bits=4,
        ).collect()
    }
    lin, zo = got["linear"], got["zorder"]
    assert lin["n_files"] == zo["n_files"] == 16
    assert lin["files_hit_x"] == 4
    assert lin["files_hit_y"] == 16  # every file spans the cy domain
    assert lin["files_hit_box"] == 4
    assert zo["files_hit_x"] == 4
    assert zo["files_hit_y"] == 4
    assert zo["files_hit_box"] == 1  # the multi-dim win, exactly

    # repartition invariance: file assignment is a total order
    sh = spark.createDataFrame(rows[::-1], ["id", "cx", "cy"]).repartition(7)
    again = {
        r["layout"]: r
        for r in layout_pruning_stats(
            sh, "cx", "cy", "id",
            n_files=16, x_probe=(4, 7), y_probe=(4, 7), bits=4,
        ).collect()
    }
    assert again == got


def test_layout_pruning_hilbert_grid(spark):
    """Same 16x16 grid as the Morton test, Hilbert included: on a
    2^k grid the Hilbert curve also fills each 4x4 quadrant before
    leaving it (16 points per file = one quadrant), so the box probe
    collapses to ONE file — and Hilbert's continuity means every
    file's span is a connected region, never worse than Morton on
    the single-dimension probes here."""
    from logprep_spark.functions.layout import layout_pruning_stats

    rows = [(16 * j + i, i, j) for i in range(16) for j in range(16)]
    df = spark.createDataFrame(rows, ["id", "cx", "cy"])
    got = {
        r["layout"]: r
        for r in layout_pruning_stats(
            df, "cx", "cy", "id",
            n_files=16, x_probe=(4, 7), y_probe=(4, 7), bits=4,
            with_hilbert=True,
        ).collect()
    }
    hi = got["hilbert"]
    assert hi["n_files"] == 16
    assert hi["files_hit_box"] == 1
    assert hi["files_hit_x"] <= got["zorder"]["files_hit_x"] + 1
    assert hi["files_hit_y"] <= got["zorder"]["files_hit_y"] + 1
