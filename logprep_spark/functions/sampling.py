"""Deterministic corpus sampling (training-data pipelines).

`randomSplit`/`sample` are seed- and partitioning-dependent: the same
document can land in different samples across runs, engines, or
repartitions — poison for reproducible dataset builds. Everything
here keys decisions off a hash of the document id instead, so any
engine that can compute md5 reproduces the sample bit-for-bit (the
DuckDB oracles do exactly that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logprep_spark.functions.dedup import h60


def hash_bucket(id_col: Column, buckets: int = 1000, salt: str = "sample") -> Column:
    """Stable bucket in [0, buckets) from a salted id hash. The salt
    decorrelates independent sampling decisions on the same corpus
    (a doc's split-bucket says nothing about its sample-bucket)."""
    return h60(F.concat(F.lit(salt + ":"), id_col.cast("string"))) % buckets


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic downsampling — the standard
    data-mixing move (e.g. cap the dominant language, keep all of the
    rare ones). ``fractions`` maps stratum value -> keep fraction in
    [0, 1]; missing strata are DROPPED (explicit mixing beats silent
    passthrough). Milli-resolution: fraction 0.1234 rounds to 123.

    Entirely narrow: the per-row decision is a hash compare against a
    literal CASE map — no shuffle, no sampling state, and the filter
    composes with pushdown. At 100 TB this costs one map stage fused
    into the scan."""
    bucket = hash_bucket(F.col(id_col), 1000, salt)
    threshold = None
    for value, frac in sorted(fractions.items()):
        milli = int(round(1000 * frac))
        cond = F.col(strata_col) == value
        threshold = (
            F.when(cond, F.lit(milli))
            if threshold is None
            else threshold.when(cond, F.lit(milli))
        )
    threshold = threshold.otherwise(F.lit(0)) if threshold is not None else F.lit(0)
    return df.filter(bucket < threshold)


def pack_sequences(
    df,
    capacity_tokens: int = 2048,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Greedy sequence packing for training-batch assembly: documents
    are packed in deterministic (group, id) order into fixed-capacity
    token bins — the sample-packing step that turns a cleaned corpus
    into dense training sequences (padding waste ∝ unpacked tails).
    pack_id = floor(running-token-total / capacity) per group; docs
    longer than the capacity get a bin of their own chunk-sequence
    (they still advance the running total, matching how packers split
    oversize docs across consecutive sequences).

    Distributed shape: packing is per-GROUP (a global greedy order
    would serialize the corpus through one partition — the reason
    real packers shard first and pack within shards): one group-keyed
    window carries the running token sum; everything else is narrow.
    Deterministic: integer token counts, integer division, total
    order (group, id)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from logprep_spark.functions.text import token_count

    win = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    toks = df.select(
        F.col(group_col), F.col(id_col), token_count(F.col(text_col)).alias("n_tokens")
    )
    return (
        toks.withColumn("_cum", F.sum("n_tokens").over(win))
        .select(
            group_col,
            id_col,
            "n_tokens",
            # a doc starts in the bin its first token lands in
            F.expr(f"(_cum - n_tokens) div {capacity_tokens}").alias("pack_id"),
            F.expr(f"(_cum - n_tokens) % {capacity_tokens}").alias("offset_in_pack"),
        )
    )


def domain_token_sampling(
    df: DataFrame,
    budget_num: int = 2,
    budget_den: int = 5,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "ds",
) -> DataFrame:
    """Per-domain temperature sampling curve — the step AFTER
    computing temperature mix weights (text.mix_weights): turn the
    α=0.5 weights into concrete per-domain TOKEN BUDGETS and pick the
    documents deterministically. Total budget = budget_num/budget_den
    of the corpus's token count (default 40% — binding at any SF);
    each domain's share is budget · weight_milli ÷ 1000; within a
    domain, docs are taken in salted-hash order (the A27 rate-limit
    machinery: re-partitioned reruns keep the SAME docs, arrival-order
    sampling cannot promise that) until the next doc would START past
    the budget — the pack_sequences boundary convention.

    Head domains get flattened (sqrt weights give them a budget far
    under their raw share) while tail domains keep ~all their tokens:
    the summary row per domain reports budget vs kept so the curve is
    visible. All integers (exact long token sums, integer division) —
    bit-identical in any engine.

    Distributed shape: weights/budgets come from mix_weights' tiny
    domain-keyed agg (broadcast back); the corpus shuffles ONCE on the
    domain key for the running-token window; the kept-set summary agg
    re-groups only the SURVIVORS. A per-domain total order serializes
    each domain through one task — acceptable while domains are few
    and budgeting is per-domain; at 100 TB with huge domains you shard
    the order (domain × hash-bucket sub-windows, then a hierarchical
    prefix over per-shard token totals — the same two-phase shape as
    heavy hitters) or pre-compute a hash THRESHOLD from the budget and
    filter narrowly; the greedy-prefix semantics here is the exact
    reference both approximations are audited against."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    from logprep_spark.functions.text import mix_weights, token_count

    from pyspark.storagelevel import StorageLevel

    # weights is <= #domains rows but its subtree scans the corpus;
    # both budgets and the total consume it — persist so the corpus
    # is aggregated once, not twice
    weights = mix_weights(df, group_col=group_col, text_col=text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    total = weights.agg(F.sum("n_tokens").alias("_total"))
    budgets = weights.crossJoin(broadcast(total)).select(
        "domain",
        "weight_milli",
        F.expr(
            f"((_total * {budget_num}) div {budget_den}) * weight_milli div 1000"
        ).alias("budget_tokens"),
    )
    toks = df.select(
        F.col(group_col).alias("domain"),
        F.col(id_col),
        token_count(F.col(text_col)).alias("_t"),
    )
    win = (
        Window.partitionBy("domain")
        .orderBy(h60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    kept = (
        toks.withColumn("_cum", F.sum("_t").over(win))
        .join(broadcast(budgets), "domain")
        .filter(F.col("_cum") - F.col("_t") < F.col("budget_tokens"))
    )
    return kept.groupBy("domain", "weight_milli", "budget_tokens").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("_t").alias("kept_tokens"),
    )


def mix_allocate(
    df: DataFrame,
    budget_num: int = 1,
    budget_den: int = 1,
    max_epochs_milli: int = 1500,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """EPOCH-CAPPED token allocation over the temperature mix — the
    step between computing mix weights (text.mix_weights) and
    selecting documents (domain_token_sampling): temperature
    upweights small domains, but a real mixture caps repetition
    (training a 2-epoch-max policy cannot grant a tiny domain the 4
    epochs its sqrt share asks for). Round 1 gives every domain
    budget · weight_milli ÷ 1000 capped at n_tokens ·
    max_epochs_milli ÷ 1000; ONE redistribution round hands the
    capped domains' leftover to the uncapped ones by the same
    weights (capped again). ``residual_shortfall`` = budget − Σ
    allocated rides every row: 0 when two rounds placed the whole
    budget, positive when even the redistribution hit caps (or as
    floor dust) — the honest single-redistribution witness instead
    of a hidden waterfill loop. ``epochs_milli`` per domain ≤
    max_epochs_milli by construction, gated.

    All arithmetic is exact long math on the mix_weights outputs —
    bit-identical cross-engine (Python int floor-div ≡ Spark div ≡
    DuckDB // on the non-negative operands every step produces).

    Distributed shape (r13 BNLJ burndown, r12 verdict #5): the corpus
    scans ONCE into the tiny domain-keyed agg; that |domains|-row
    frame is a bounded MODEL, collected to the driver (the ranks.py /
    k-means / BPE model-fetch discipline — O(domains) bytes, never
    O(rows)), and the whole budget → cap → redistribute → shortfall
    chain runs as exact Python ints. The old in-plan form chained
    four scalar crossJoins whose subtrees compound (1 → 3 → 7 → 15
    BroadcastNestedLoopJoins per plan, PLANS/LINT.txt); the result
    frame is now a literal — zero BNLJ, zero corpus re-read, same
    values."""
    from logprep_spark.functions.text import token_count

    # the corpus-scanning part of mix_weights, WITHOUT its 1-row
    # normalizing crossJoin — the normalization joins the driver-side
    # arithmetic below (same milli-fixed sqrt discipline)
    per = (
        df.select(
            F.col(group_col).alias("domain"),
            token_count(F.col(text_col)).alias("_t"),
        )
        .groupBy("domain")
        .agg(F.sum("_t").alias("n_tokens"))
        .withColumn("_s", F.round(F.sqrt("n_tokens") * 1000).cast("long"))
    )
    rows = sorted(per.collect(), key=lambda r: r["domain"])
    tot_s = sum(int(r["_s"]) for r in rows)
    budget = sum(int(r["n_tokens"]) for r in rows) * budget_num // budget_den
    model = []
    for r in rows:
        w = 1000 * int(r["_s"]) // tot_s if tot_s else 0
        req = budget * w // 1000
        cap = int(r["n_tokens"]) * max_epochs_milli // 1000
        model.append(
            {
                "domain": r["domain"],
                "n_tokens": int(r["n_tokens"]),
                "w": w,
                "req": req,
                "cap": cap,
                "a1": min(req, cap),
            }
        )
    leftover = budget - sum(m["a1"] for m in model)
    wu = sum(m["w"] for m in model if m["a1"] < m["cap"])
    for m in model:
        if m["a1"] < m["cap"] and wu > 0:
            m["alloc"] = min(m["a1"] + leftover * m["w"] // wu, m["cap"])
        else:
            m["alloc"] = m["a1"]
    shortfall = budget - sum(m["alloc"] for m in model)
    return df.sparkSession.createDataFrame(
        [
            (
                m["domain"],
                m["n_tokens"],
                m["w"],
                m["req"],
                m["alloc"],
                m["alloc"] * 1000 // m["n_tokens"] if m["n_tokens"] else 0,
                shortfall,
            )
            for m in model
        ],
        "domain string, n_tokens long, weight_milli long, "
        "requested_tokens long, allocated_tokens long, "
        "epochs_milli long, residual_shortfall long",
    )


def mix_materialize(
    df: DataFrame,
    alloc: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mx",
) -> DataFrame:
    """Materialize a token allocation into per-doc COPY COUNTS — the
    "write the training set" step that closes the mixing arc
    (mix_weights → mix_allocate → THIS): each domain repeats every
    doc ``allocated div n_tokens`` times (the full epochs) and grants
    ONE extra copy to the deterministic salted-hash-ordered prefix
    whose running token sum covers the remainder (the
    domain_token_sampling boundary convention: a doc joins the
    partial epoch iff its tokens START before the remainder budget —
    so the materialized total can overshoot by at most one document,
    never undershoot by more than the boundary doc).

    ``alloc`` is the mix_allocate output (domain, n_tokens,
    allocated_tokens, ...). All integer arithmetic on exact token
    counts → bit-identical anywhere. Distributed shape: the tiny
    alloc frame broadcasts; the corpus shuffles ONCE on the domain
    key for the running-token window (shard the order for huge
    domains — the domain_token_sampling scale note). Returns one row
    per doc: (domain, doc_id, n_tokens, n_copies) — n_copies = 0
    docs (beyond both the full epochs and the prefix) stay in the
    frame, honestly zero."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    from logprep_spark.functions.text import token_count

    toks = df.select(
        F.col(group_col).alias("domain"),
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    win = (
        Window.partitionBy("domain")
        .orderBy(
            h60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            id_col,
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    a = alloc.select(
        "domain",
        F.col("n_tokens").alias("_dom_tokens"),
        F.col("allocated_tokens").alias("_alloc"),
    )
    return (
        toks.withColumn("_cum", F.sum("n_tokens").over(win))
        .join(broadcast(a), "domain")
        .select(
            "domain",
            id_col,
            "n_tokens",
            (
                F.expr("_alloc div _dom_tokens")
                + F.when(
                    F.col("_cum") - F.col("n_tokens")
                    < F.expr("_alloc % _dom_tokens"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_copies"),
        )
    )


def domain_token_sample_docs(
    df: DataFrame,
    budget_num: int = 2,
    budget_den: int = 5,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "ds",
) -> DataFrame:
    """The per-document view of :func:`domain_token_sampling` — the
    SELECTED rows with all their original columns, for use as a
    pipeline step (the summary variant reports the curve instead).
    Same budgets, same hash order, same boundary convention."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast
    from pyspark.storagelevel import StorageLevel

    from logprep_spark.functions.text import mix_weights, token_count

    weights = mix_weights(df, group_col=group_col, text_col=text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    total = weights.agg(F.sum("n_tokens").alias("_total"))
    budgets = weights.crossJoin(broadcast(total)).select(
        F.col("domain").alias(group_col),
        F.expr(
            f"((_total * {budget_num}) div {budget_den}) * weight_milli div 1000"
        ).alias("_budget"),
    )
    win = (
        Window.partitionBy(group_col)
        .orderBy(h60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = df.withColumn("_t", token_count(F.col(text_col))).withColumn(
        "_cum", F.sum("_t").over(win)
    )
    return (
        staged.join(broadcast(budgets), group_col)
        .filter(F.col("_cum") - F.col("_t") < F.col("_budget"))
        .drop("_t", "_cum", "_budget")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirtakis
    2006, A-Res): each row gets priority ``ln(u) / weight`` with
    ``u = (h60('ws:' || id) + 1) / 2^60`` and the n largest
    priorities are the sample — equivalent to drawing n items
    sequentially with probability proportional to weight. The
    importance-sampling primitive that pairs with DSIR / temperature
    mix weights: build the weights once, then take a reproducible
    quality-weighted subsample of any size.

    Deterministic: u comes from the salted id hash, not a seed — the
    same doc gets the same priority in any engine, run, or
    partitioning (the module contract). The SELECTED SET is therefore
    engine-exact; the float priority itself is dropped from the
    output (ln may differ in the last ulp across libm
    implementations, which could flip the ORDER of two adjacent
    picks but flips set membership only when the n-th and (n+1)-th
    priorities collide within ~1 ulp — vanishing for continuous
    hash-derived u; the oracle gate would catch it).

    Scale shape: priority is one narrow projection (no shuffle);
    the top-n is TakeOrderedAndProject — per-partition top-n, then a
    single merge of n rows per partition. Weights <= 0 are excluded
    (A-Res domain)."""
    u = (
        h60(F.concat(F.lit("ws:"), F.col(id_col).cast("string"))) + 1
    ) / F.lit(_WS_H_MAX)
    pri = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_pri", pri)
        .orderBy(F.desc("_pri"))
        .limit(n)
        .drop("_pri")
    )


_WS_H_MAX = float(1 << 60)


def weighted_sample_per_group(
    df: DataFrame,
    weight_col: str,
    group_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum A-Res (see :func:`weighted_sample`): the n largest
    ``ln(u)/weight`` priorities WITHIN each group — the shape a
    production corpus mix actually runs (sample k docs per domain /
    language / quality bin in one pass, not one global top-n that a
    heavy domain swallows). Same determinism contract: u from the
    salted id hash, priority dropped from the output, the per-group
    SELECTED SET is engine-exact.

    Scale shape: ONE window shuffle on the group key (row_number
    over priority), no per-group jobs, no driver loop — 10⁶ strata
    cost the same single exchange; skewed strata are one hot
    partition each, the bound a global top-n cannot give."""
    from pyspark.sql import Window

    u = (
        h60(F.concat(F.lit("ws:"), F.col(id_col).cast("string"))) + 1
    ) / F.lit(_WS_H_MAX)
    pri = F.log(u) / F.col(weight_col)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("_pri"), F.col(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_pri", pri)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_pri", "_rn")
    )


_PB_THRESHOLDS = None


def poisson_bootstrap_thresholds() -> list[int]:
    """Poisson(1) CDF cut points in 2^60-hash units, computed once in
    Python and inlined as literals in BOTH engines — the query-time
    arithmetic is pure integer comparison."""
    global _PB_THRESHOLDS
    if _PB_THRESHOLDS is None:
        import math

        cdf, term, c = [], math.exp(-1.0), math.exp(-1.0)
        for k in range(7):
            cdf.append(c)
            term = term / (k + 1)
            c += term
        _PB_THRESHOLDS = [int(x * (1 << 60)) for x in cdf]
    return _PB_THRESHOLDS


def poisson_bootstrap_mean(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_resamples: int = 40,
    salt: str = "pb",
) -> DataFrame:
    """Bootstrap confidence band for a mean in ONE PASS over the data
    (Poisson bootstrap — the resampling scheme built for data too
    large to draw B multinomial resamples from: per (row, b) an
    INDEPENDENT Poisson(1) weight approximates the multinomial count,
    so all B resamples ride one scan). Weights come from the salted
    md5 hash pushed through the Poisson(1) inverse CDF (cut points
    precomputed in Python, inlined in both engines) — NOT an RNG, so
    the band is reproducible in any engine, run, or partitioning and
    the whole readout hash-gates.

    Output: n, n_resamples, the exact point mean (milli), and the
    [min, max] of the B resample means as the ~(1/(B+1),
    B/(B+1))-coverage band (B = 40 -> ~2.4%/97.6%; raise B for
    tighter tail conventions). Scale: the explode is B rows per
    input row feeding ONE map-side-combining agg on b (B keys);
    nothing else shuffles."""
    th = poisson_bootstrap_thresholds()
    case = " ".join(
        f"WHEN _h < {t} THEN {i}" for i, t in enumerate(th)
    )
    obs = df.select(
        F.col(id_col).alias("_id"), F.col(value_col).alias("_vm")
    )
    pairs = (
        obs.select(
            "_id", "_vm",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_resamples - 1))
            ).alias("_b"),
        )
        .withColumn(
            "_h",
            h60(
                F.concat(
                    F.lit(f"{salt}:"),
                    F.col("_id").cast("string"),
                    F.lit(":"),
                    F.col("_b").cast("string"),
                )
            ),
        )
        .withColumn("_w", F.expr(f"CASE {case} ELSE 7 END"))
    )
    per_b = pairs.groupBy("_b").agg(
        F.expr(
            "CAST(sum(_w * _vm) AS BIGINT)"
            " div greatest(CAST(sum(_w) AS BIGINT), 1)"
        ).alias("_mean")
    )
    means = per_b.agg(
        F.sort_array(F.collect_list("_mean")).alias("_ms")
    )
    pt = obs.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(_vm) AS BIGINT) div count(1)").alias(
            "point_mean_milli"
        ),
    )
    return pt.crossJoin(F.broadcast(means)).select(
        "n",
        F.lit(n_resamples).cast("long").alias("n_resamples"),
        "point_mean_milli",
        F.expr("element_at(_ms, 1)").alias("boot_lo_milli"),
        F.expr(f"element_at(_ms, {n_resamples})").alias("boot_hi_milli"),
    )
