"""Two-pass global rank — the scale-safe replacement for a
partition-less Window.

``row_number().over(Window.orderBy(...))`` funnels the WHOLE frame
through one task: Spark's WindowExec requires all rows in a single
partition when PARTITION BY is empty, so the planner inserts
``Exchange SinglePartition`` and the job serializes however many
executors the cluster has. Fine for a bounded report frame (a K-row
shard summary, a |V|-row degree table); fatal for a corpus — the exact
defect class the r11 verdict flagged behind the dead global-window
lint check.

The classic distributed fix (TeraSort lineage — the same layout a
global sort produces) is two passes, both embarrassingly parallel:

1. **range-shuffle** the frame on the order keys
   (``repartitionByRange`` — parallel sampling-based range
   partitioner, the identical shuffle a global ORDER BY would plan),
   then **sort within partitions** (narrow, spillable, no exchange);
2. count rows per physical partition — a ``#partitions``-row model
   **collected to the driver** (the bounded-model-fetch discipline of
   the k-means/logreg rows: O(partitions) bytes, never O(rows)) — and
   add each partition's prefix-sum offset to the row's local position.

The local position comes from ``monotonically_increasing_id()`` taken
*after* the within-partition sort: Spark defines it as
``partition_id * 2^33 + row_index_within_partition`` where the row
index follows iteration order, i.e. the sorted order we just pinned.
That makes pass 2 a pure projection — no second exchange, no window —
so the whole rank costs exactly ONE shuffle, the theoretical minimum.
An eager ``localCheckpoint`` pins a single materialization so the
count model and the rank projection see identical partitioning.

The result is bit-identical to the global window's ``row_number``
whenever the order is total (pass a unique tiebreaker column — every
caller in this repo does); tests/unit/test_global_rank.py asserts the
equality witness against the window form at test scale.

No reference counterpart (Logprep has no ranking engine); the pattern
is public Spark folklore (RangePartitioner + zipWithIndex lineage).

**Eager-execution contract** (both helpers): the partition-offset
model requires running Spark jobs AT CONSTRUCTION TIME — an eager
``localCheckpoint`` pins the shuffled layout, then a bounded
``collect`` reads the per-partition model — and the offsets are baked
into the returned plan as literals. Consequences callers must own:

- building the frame twice executes the upstream twice — compose
  several of these on one input by CHAINING them (feed the returned
  frame back in, as events_lorenz_curve does), never by calling each
  on the raw input;
- the returned frame is a snapshot: it does NOT go stale-safe if the
  source table changes after construction (the literals would
  describe the old layout) — rebuild after any source mutation;
- ``localCheckpoint`` blocks are stored on executors, not reliable
  storage: an executor loss after construction loses the pinned
  partitions and the job fails rather than silently recomputing into
  a layout the literals no longer match — acceptable for the bounded
  report frames these rank, use checkpoint-to-storage for
  long-lived frames.
"""

from __future__ import annotations

from pyspark.sql import functions as F

#: monotonically_increasing_id packs (partition_id << 33) | local_index
_MID_PARTITION_SHIFT = 33
_MID_LOCAL_MASK = (1 << _MID_PARTITION_SHIFT) - 1


def with_global_rank(df, order_cols, rank_col="r", num_partitions=None):
    """Attach a dense 1-based global rank over ``order_cols`` without a
    partition-less window.

    Parameters
    ----------
    df : DataFrame
    order_cols : list of Column/str — the sort keys; include a unique
        tiebreaker for a total order (bit-parity with ``row_number``).
    rank_col : output column name (long, 1-based).
    num_partitions : range-shuffle width; defaults to the session's
        ``spark.sql.shuffle.partitions``.

    Returns ``(ranked_df, total_rows)`` — the row count is a free
    byproduct of the partition-count model and saves callers a second
    pass when they need ``n`` (ntile boundaries, percentile cutoffs).
    """
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    parts = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        # pin ONE materialization: the count model below and the rank
        # projection must observe the same partition layout
        .localCheckpoint(eager=True)
    )
    counts = parts.groupBy(
        (F.shiftright("_mid", _MID_PARTITION_SHIFT)).alias("_pid")
    ).agg(F.count(F.lit(1)).alias("_c")).collect()
    offsets: list = []
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.extend([F.lit(int(row["_pid"])), F.lit(acc)])
        acc += row["_c"]
    pid = F.shiftright("_mid", _MID_PARTITION_SHIFT)
    local = F.col("_mid").bitwiseAND(F.lit(_MID_LOCAL_MASK))
    # empty frame: no offsets to look up (and an argless create_map is
    # void-typed) — any constant offset is vacuously correct
    off = F.create_map(*offsets)[pid] if offsets else F.lit(0)
    ranked = parts.withColumn(
        rank_col, (off + local + F.lit(1)).cast("long")
    ).drop("_mid")
    return ranked, acc


def ntile_from_rank(rank_col, n_rows: int, n_tiles: int):
    """Exact ``ntile(n_tiles)`` phase from a 1-based global rank and a
    known row count — the broadcast-model replacement for
    ``ntile().over(Window.orderBy(...))``.

    Spark/ANSI ntile semantics: with ``n_rows`` rows the first
    ``n_rows % n_tiles`` tiles get ``n_rows div n_tiles + 1`` rows and
    the rest get ``n_rows div n_tiles`` — reproduced here as integer
    arithmetic on driver-side literals, so the assignment is a narrow
    projection (verified bit-identical to the window ntile in
    tests/unit/test_global_rank.py).
    """
    base = n_rows // n_tiles
    rem = n_rows % n_tiles
    r0 = f"({rank_col} - 1)"  # 0-based position
    head = rem * (base + 1)  # rows covered by the (base+1)-sized tiles
    if base == 0:
        # degenerate n_rows < n_tiles: first n_rows tiles get one row
        return F.expr(f"CAST({rank_col} AS INT)")
    return F.expr(
        f"CAST(CASE WHEN {r0} < {head} THEN {r0} div {base + 1} "
        f"ELSE {rem} + ({r0} - {head}) div {base} END + 1 AS INT)"
    )


def with_running_sums(df, order_cols, sums, num_partitions=None):
    """Attach inclusive prefix sums over a total order without a
    partition-less window — the cumulative-SUM sibling of
    ``with_global_rank`` (which only covers position; a weighted
    running sum has no rank identity).

    ``sums`` is a list of ``(out_col, src_col)`` pairs; each gains an
    inclusive BIGINT cumulative sum of ``src_col`` in ``order_cols``
    order. ``order_cols`` must be a total order (unique keys — every
    caller here feeds a DISTINCT-value tally keyed by the order
    column), which makes the result bit-identical to
    ``sum().over(Window.orderBy(...))``; the equality witness lives in
    tests/unit/test_global_rank.py.

    Shape — two balanced exchanges, zero single-task funnels:

    1. **range-shuffle** on the order keys (``repartitionByRange`` —
       the sampling-based range partitioner a global ORDER BY plans)
       and pin ONE materialization (eager localCheckpoint) so the
       model below and the projection see the same layout;
    2. per-partition TOTALS of each summed column — a
       ``#partitions``-row model collected to the driver (bounded
       model fetch: O(partitions·columns) bytes) — become broadcast
       prefix-offset literals;
    3. the within-partition running sum is a window PARTITIONED BY
       the pinned physical partition id: its required distribution is
       hash(_pid), a second exchange, but each hash group is exactly
       one range partition — parallelism equals the range-shuffle
       width and no task ever sees more than one partition's rows.

    Returns ``(df_with_cums, totals)`` where ``totals`` maps
    ``out_col`` to the frame-wide sum as a Python int — callers that
    need grand totals (KS's n0/n1) get them free from the offset
    model instead of a second aggregate pass.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    parts = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    model = parts.groupBy("_pid").agg(
        *[
            F.coalesce(F.sum(src).cast("long"), F.lit(0)).alias(f"_t{i}")
            for i, (_, src) in enumerate(sums)
        ]
    ).collect()
    offsets: dict[int, list] = {i: [] for i in range(len(sums))}
    totals: dict[str, int] = {}
    acc = [0] * len(sums)
    for row in sorted(model, key=lambda r: r["_pid"]):
        for i in range(len(sums)):
            offsets[i].extend([F.lit(int(row["_pid"])), F.lit(acc[i])])
            acc[i] += int(row[f"_t{i}"])
    for i, (out, _) in enumerate(sums):
        totals[out] = acc[i]
    w = Window.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = parts
    for i, (out, src) in enumerate(sums):
        off = (
            F.create_map(*offsets[i])[F.col("_pid")]
            if offsets[i]
            else F.lit(0)
        )
        cum = cum.withColumn(
            out, (off + F.coalesce(F.sum(src).over(w), F.lit(0))).cast("long")
        )
    return cum.drop("_pid"), totals
