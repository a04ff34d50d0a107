"""Similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline; the scale path
is random-hyperplane LSH bucketing (deterministic md5-derived planes)
so the join touches buckets, not the full n^2 cross product.

No UDFs: dot products are ``zip_with``/``aggregate`` higher-order
functions, fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from logprep_spark.functions.dedup import cosine_sim, h60


def planes_for(corpus_rows: int, target_bucket_rows: int = 5000) -> int:
    """Scale the hyperplane count with corpus size: expected bucket
    occupancy is ``corpus_rows / 2**n_planes``, so n_planes =
    ceil(log2(n / target)) keeps candidate-set cost per query bounded
    as the corpus grows. Settings ladder (documented in SURVEY §4):
    sf0.1 (~10k vecs) → 4-6 planes; 1B vectors → 18; a 100 TB corpus
    (~25B 1k-dim float vectors) → ~23 planes, with multi-probe (flip
    one sign bit) to recover recall lost to finer buckets.

    Floor of 4 keeps tiny corpora from degenerating into one bucket.
    """
    import math

    if corpus_rows <= target_bucket_rows:
        return 4
    return max(4, math.ceil(math.log2(corpus_rows / target_bucket_rows)))


def _plane_weight(p: int, i: int) -> float:
    """Weight of plane p for dimension i: md5(p:i) → [-1, 1].
    Deterministic across engines (same formula as the DuckDB oracle's
    ``_sql_bucket``); computed driver-side so the executor never
    hashes."""
    import hashlib

    h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def hyperplane_bucket(
    vec: Column, n_planes: int = 8, dim: int | None = None, max_dim: int = 512
) -> Column:
    """Sign-bit bucket id from ``n_planes`` pseudo-random hyperplanes.

    Plane p's weight for dimension i is derived from md5(p:i) mapped
    into [-1, 1] — deterministic across engines and runs, no stored
    model. sign(dot(w_p, v)) becomes bit p of the bucket id.

    The weight vectors are LITERAL arrays baked into the plan: an
    earlier shape computed the md5 inside the zip_with lambda — rows x
    dims x planes digest calls per pass (measured ~25% slower
    end-to-end even at sf0.1's tiny 2000x64 corpus; the digest count
    scales linearly with corpus size, so the gap widens at scale).
    Driver-side it is dims x planes once per plan. Pass ``dim`` (cheap
    one-row probe: ``probe_dim``) to bake exact-length arrays;
    otherwise a ``max_dim``-wide array is sliced to the vector length
    per row (the slice allocates per row — prefer the probe)."""
    def weights_expr(p: int, n: int):
        # ONE parsed SQL literal per plane: n F.lit()/F.array() Column
        # objects cost a py4j round-trip each (~0.8 s of plan build for
        # 6 planes x 64 dims x corpus+query sides); repr() round-trips
        # doubles exactly, so values are unchanged
        return F.expr(
            "array(" + ",".join(f"{_plane_weight(p, i)!r}D" for i in range(n)) + ")"
        )

    bits = []
    for p in range(n_planes):
        if dim is not None:
            weights = weights_expr(p, dim)
        else:
            weights = F.slice(weights_expr(p, max_dim), 1, F.size(vec))
        proj = F.aggregate(
            F.zip_with(vec, weights, lambda v, w: v.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if dim is None:
            # a vector longer than max_dim would zip_with null weights
            # and silently project null -> every sign bit false; fail
            # loudly instead of bucketing wrong
            proj = F.when(
                F.size(vec) > max_dim,
                F.raise_error(
                    F.concat(
                        F.lit(f"hyperplane_bucket: vector dim exceeds max_dim={max_dim}: "),
                        F.size(vec).cast("string"),
                    )
                ).cast("double"),
            ).otherwise(proj)
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for bit in bits[1:]:
        out = out + bit
    return out


def probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Embedding dimensionality from one row (None on empty input).
    One tiny single-column job at plan-build time — worth it to bake
    exact-length weight literals into every executor's codegen."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).first()
    return row["d"] if row else None


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Plan: broadcast the (small) query set against the corpus — a
    map-side nested loop with NO corpus shuffle and no corpus
    broadcast (the corpus is the unbounded side at 100 TB; only the
    query set must fit in a broadcast). After scoring, only narrow
    (query_id, nbr_id, cosine) tuples shuffle for the final per-query
    top-k window."""
    corpus = df.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"))
    qs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
    sim = F.round(cosine_sim(F.col("query_vec"), F.col("nbr_vec")), 6)
    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", sim.alias("cosine"))
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    multi_probe: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's hyperplane
    bucket, then exact cosine re-rank. The bucket join replaces the
    cross join — the 1000-executor path for big corpora.

    The query side is broadcast: an equi-join on ``bucket`` would
    otherwise shuffle the ENTIRE corpus on a ≤2^n_planes-cardinality
    key (massively skewed at scale). Broadcast keeps the corpus
    partition-local; bucket pruning happens map-side.

    ``multi_probe``: additionally probe the buckets reached by
    flipping each of the first ``multi_probe`` sign bits (the probes
    most likely to hold near neighbors lost to quantization). This is
    how recall is recovered at scale when ``planes_for`` picks fine
    buckets (~23 planes at 25B vectors): the query side explodes
    ``1 + multi_probe`` ways — still tiny and broadcast — while the
    corpus stays partition-local with exactly one bucket per row."""
    dim = probe_dim(df, vec_col)
    corpus = df.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    bucket_q = hyperplane_bucket(F.col(vec_col), n_planes, dim)
    if multi_probe > 0:
        bucket_q = F.explode(
            F.array(bucket_q, *[bucket_q.bitwiseXOR(1 << p) for p in range(multi_probe)])
        )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        bucket_q.alias("bucket"),
    )
    sim = F.round(cosine_sim(F.col("query_vec"), F.col("nbr_vec")), 6)
    scored = (
        corpus.join(F.broadcast(qs), "bucket")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", sim.alias("cosine"))
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


# --- IVF (inverted-file) ANN ------------------------------------------


def ivf_centroids(
    df: DataFrame, n_centroids: int = 16, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[list[float]]:
    """Deterministic centroid sample: the ``n_centroids`` vectors with
    the smallest md5-derived key of their id (a hash-ordered sample —
    no RNG, any engine reproduces it). Driver-side collect of a tiny
    model — the IVF equivalent of broadcasting k-means centroids."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(h60(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    return [[float(x) for x in r[1]] for r in rows]


def _centroid_literals(cvecs: list[list[float]]):
    """(2-D centroid array, norm array) as plan literals parsed from
    ONE SQL string each: composing them from ~n_centroids·dim
    F.lit()/F.array() Column objects costs a py4j round-trip per node
    (~0.9 s of plan-BUILD time per invocation at 16×64 centroids);
    repr() round-trips doubles exactly, so values are unchanged."""
    import math

    carr = F.expr(
        "array(" + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")" for c in cvecs
        ) + ")"
    )
    cnorms = F.expr(
        "array(" + ",".join(
            f"{math.sqrt(sum(x * x for x in c))!r}D" for c in cvecs
        ) + ")"
    )
    return carr, cnorms


def _cos_to_centroid(vec: Column, cvec: list[float]) -> Column:
    """Rounded cosine of a vector column against a LITERAL centroid
    (centroid norm precomputed driver-side; same fold order as the
    DuckDB oracle so ties round identically)."""
    import math

    dot = F.aggregate(
        F.zip_with(vec, F.array(*[F.lit(x) for x in cvec]), lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    vnorm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return F.round(dot / (vnorm * F.lit(math.sqrt(sum(x * x for x in cvec)))), 6)


def ivf_assign(
    df: DataFrame,
    cvecs: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_id: str = "nbr_id",
    out_vec: str = "nbr_vec",
    out_norm: str | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid bucket (argmax
    cosine, ties → lowest centroid id). Centroids are PLAN LITERALS,
    so this is a zero-shuffle narrow map over the corpus — the shared
    first stage of IVF ANN probing and SemDeDup-style semantic dedup.

    Expression shape: the vector's norm is staged ONCE (`_vn`) and the
    k cosines come from a single `transform` over a literal 2-D
    centroid array + literal norm array — per-centroid dot folds keep
    the exact left-to-right operand order of the per-centroid
    expression they replace (values bit-identical), but the Catalyst
    tree is k× smaller: 16 unrolled zip_with/aggregate folds each
    re-deriving the norm measured ~2.4 s of codegen+eval at sf0.1
    where this form is sub-second. ``out_norm`` optionally exposes the
    staged norm so pair-verify consumers (SemDeDup) don't recompute
    norms per PAIR."""
    vec = F.col(vec_col)
    carr, cnorms = _centroid_literals(cvecs)
    vnorm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    staged = df.select(F.col(id_col).alias(out_id), vec.alias(out_vec), vnorm.alias("_vn"))
    svec = F.col(out_vec)
    scores = F.transform(
        F.sequence(F.lit(1), F.lit(len(cvecs))),
        lambda i: F.round(
            F.aggregate(
                F.zip_with(
                    svec, F.element_at(carr, i), lambda a, b: a.cast("double") * b
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / (F.col("_vn") * F.element_at(cnorms, i)),
            6,
        ),
    )
    keep_norm = [F.col("_vn").alias(out_norm)] if out_norm else []
    return staged.select(out_id, out_vec, scores.alias("_scores"), *keep_norm).select(
        out_id,
        out_vec,
        F.array_position(F.col("_scores"), F.array_max("_scores")).alias("bucket"),
        *([out_norm] if out_norm else []),
    )


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: corpus vectors are assigned to their nearest centroid
    (bucket); each query probes its ``n_probe`` nearest centroids and
    exact-reranks inside those buckets.

    Scale shape: centroid scores are computed against PLAN-LITERAL
    centroids, so corpus assignment is a zero-shuffle narrow map (the
    argmax is `array_position(scores, array_max(scores))` per row —
    first-match tie-break = lowest centroid id, matching the oracle's
    ORDER BY). Queries explode to n_probe rows and broadcast; the
    corpus never shuffles. At 100 TB you'd persist the assignment as a
    bucketed table and train real k-means centroids — the plan shape
    is identical."""
    cvecs = ivf_centroids(df, n_centroids, vec_col, id_col)
    vec = F.col(vec_col)
    corpus = ivf_assign(df, cvecs, vec_col, id_col)
    # per-query top-n_probe centroid ids: sort (−score, id) structs.
    # Same staged-norm + literal-2D-array shape as ivf_assign — the
    # per-centroid cosine keeps its fold order (values unchanged) but
    # the plan builds in one py4j call instead of n_centroids folds.
    carr, cnorms = _centroid_literals(cvecs)
    qvnorm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    qstage = queries.select(
        F.col(id_col).alias("query_id"), vec.alias("query_vec"), qvnorm.alias("_qvn")
    )
    qvec = F.col("query_vec")
    ranked = F.transform(
        F.array_sort(
            F.transform(
                F.sequence(F.lit(1), F.lit(len(cvecs))),
                lambda i: F.struct(
                    (
                        -F.round(
                            F.aggregate(
                                F.zip_with(
                                    qvec,
                                    F.element_at(carr, i),
                                    lambda a, b: a.cast("double") * b,
                                ),
                                F.lit(0.0),
                                lambda acc, v: acc + v,
                            )
                            / (F.col("_qvn") * F.element_at(cnorms, i)),
                            6,
                        )
                    ).alias("ns"),
                    i.alias("i"),
                ),
            )
        ),
        lambda s: s.getField("i"),
    )
    qs = qstage.select(
        "query_id",
        "query_vec",
        F.explode(F.slice(ranked, 1, n_probe)).alias("bucket"),
    )
    sim = F.round(cosine_sim(F.col("query_vec"), F.col("nbr_vec")), 6)
    scored = (
        corpus.join(F.broadcast(qs), "bucket")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", sim.alias("cosine"))
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def recall_eval(
    exact: DataFrame, approx: DataFrame, k: int, queries: DataFrame | None = None
) -> DataFrame:
    """Recall@k of an approximate ANN result against the exact one —
    the evaluation loop a production ANN deployment runs whenever
    bucketing parameters change. Both inputs are (query_id, nbr_id,
    ...) top-k frames; output is (query_id, n_hits, recall_milli),
    integer milli-units for exact cross-engine hashing.

    Scale shape: a (query_id, nbr_id)-keyed left-semi join with the
    exact list BROADCAST — both frames are k rows per query (bounded
    by the evaluated query set, tiny next to the corpus that produced
    them), so neither side should ride an exchange; the query-lint
    broadcast advisor flagged the unhinted form on all three recall
    queries (r6). Then a per-query count with map-side partial agg.
    ``queries`` pins the output to every evaluated query id so a
    zero-recall query surfaces as 0, not as a missing row.
    """
    hits = (
        approx.select("query_id", "nbr_id")
        .join(
            F.broadcast(exact.select("query_id", "nbr_id")),
            ["query_id", "nbr_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = (
        queries.select(F.col("query_id"))
        if queries is not None
        else exact.select("query_id").distinct()
    )
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.expr(f"1000 * coalesce(n_hits, 0) div {k}").alias("recall_milli"),
    )


# --- distributed k-means (integer-exact Lloyd's) ----------------------


def micro_vec(vec: Column) -> Column:
    """Fix a float vector to integer MICRO units. Exact-.5 ties ARE
    reachable (x = k/2^7 gives x·1e6 = k·7812.5 exactly), but both
    engines round doubles half-AWAY-FROM-ZERO (probed: Spark ROUND and
    DuckDB round() each give ±7813 for ±7812.5), so the fix is
    bit-identical cross-engine. All downstream k-means arithmetic
    is exact long math, so the clustering is bit-identical in any
    engine and under any partitioning — a float Lloyd's iteration
    sums coordinates in partition order and is neither."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * 1_000_000).cast("long"))


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column, run for a
    FIXED number of iterations from a deterministic hash-ordered seed
    sample (the ivf_centroids policy) — the clustering step behind
    SemDeDup-at-scale, IVF index training, and corpus topic bucketing.

    Exactness: vectors are micro-fixed longs; distances are exact
    long squared-euclidean (|x| ≤ ~2·10⁶ micro ⇒ d² ≤ 64·1.6·10¹³ ≈
    10¹⁵ < 2⁶³); centroid updates are per-dimension long sums with
    integer division by cluster size. Every step is order-independent.

    Distributed shape — the centroid set is a MODEL, not data: k·dim
    longs, fetched driver-side per round (the ivf_centroids precedent,
    similarity.py:199) and baked into the next round's plan as
    LITERALS. Assignment is therefore a zero-shuffle narrow map — the
    corpus never shuffles and never joins for assignment; the ONLY
    wide op per round is the centroid-update agg, whose map-side
    partial combine collapses every task to ≤ k rows of (count, dim
    sums) before a k-key shuffle. The final assignment pass is pure
    narrow codegen. Assignment ties break to the lowest centroid id
    (array_min over (dist, cid) structs). An emptied cluster keeps
    its previous centroid (standard Lloyd's repair). Returns
    (vec_id, cluster, dist2) for the final assignment."""
    vm = df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("v"))
    seed_rows = (
        vm.orderBy(h60(F.col(id_col).cast("string")), F.col(id_col)).limit(k).collect()
    )
    cvecs: list[list[int]] = [[int(x) for x in r["v"]] for r in seed_rows]
    return _kmeans_from_seeds(df, cvecs, iters, vec_col, id_col)


def _best_dc(vcol: str, cvs: list[list[int]]) -> Column:
    """(dist2, cid) of the closest literal centroid to ``vcol`` —
    array_min compares lexicographically: min dist, ties to lowest
    cid. Built as ONE parsed SQL string (the plan-build discipline,
    see hyperplane_bucket): the Column-composition form costs a py4j
    round-trip per centroid component — at PQ scale (m=16 subspaces
    x 16 centroids x 4 dims) that alone was ~14 s of driver-side
    plan build; one F.expr call is milliseconds. Values are exact
    integer literals, so plans and results are unchanged."""
    structs = ",".join(
        "struct(aggregate(zip_with({v}, array({lits}),"
        " (a, b) -> (a - b) * (a - b)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS d,"
        " {cid} AS cid)".format(
            v=vcol,
            lits=",".join(f"{int(c)}L" for c in cv),
            cid=cid + 1,
        )
        for cid, cv in enumerate(cvs)
    )
    return F.expr(f"array_min(array({structs}))")


def _lloyd_centroids(
    vm: DataFrame, cvecs: list[list[int]], iters: int, dim: int
) -> list[list[int]]:
    """``iters - 1`` integer-exact Lloyd update rounds over a
    micro-fixed frame with column ``v``; returns the final centroid
    list (the MODEL — k·dim longs, fetched driver-side per round and
    baked into the next plan as literals). Emptied clusters keep
    their previous centroid (standard Lloyd's repair)."""
    for _ in range(iters - 1):
        assigned = vm.select(
            "v", _best_dc("v", cvecs).getField("cid").alias("cluster")
        )
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.sum(F.element_at("v", i + 1)).alias(f"_s{i}") for i in range(dim)],
            )
            .collect()
        )
        updated = dict(enumerate(cvecs))  # cid-1 -> old centroid (empty-cluster repair)
        for r in stats:
            updated[r["cluster"] - 1] = [
                int(r[f"_s{i}"]) // r["_n"]
                if r[f"_s{i}"] >= 0
                else -((-int(r[f"_s{i}"])) // r["_n"])
                for i in range(dim)
            ]
        cvecs = [updated[i] for i in range(len(cvecs))]
    return cvecs


def _kmeans_from_seeds(
    df: DataFrame,
    cvecs: list[list[int]],
    iters: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's iterations + zero-shuffle final assignment from any
    seed set (hash sample or :func:`gonzalez_seeds`)."""
    dim = probe_dim(df, vec_col) or 0
    vm = df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("v"))
    cvecs = _lloyd_centroids(vm, cvecs, iters, dim)
    # stage the struct in its own select so the two getFields read one
    # computed value (k distance folds once per row, not twice)
    return vm.select(F.col(id_col), _best_dc("v", cvecs).alias("_dc")).select(
        id_col,
        F.col("_dc.cid").alias("cluster"),
        F.col("_dc.d").alias("dist2"),
    )


def kmeans_silhouette(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cluster SIMPLIFIED-silhouette quality readout for the same
    Lloyd's run as :func:`kmeans` — the cluster-quality eval that
    belongs beside inertia (inertia always improves with k; the
    silhouette exposes overlapping clusters): per point, a² = squared
    distance to its own centroid, b² = squared distance to the
    nearest OTHER centroid, score = (b² − a²)/max(a², b²). This is
    the Hruschka et al. 2004 centroid-based simplification — O(n·k)
    where the classic Rousseeuw silhouette's mean-pairwise distances
    are O(n²), which is the whole reason it's the one a 100 TB
    pipeline can run — computed on SQUARED distances so everything
    stays exact long math (milli scores by integer floor division; no
    sqrt, no float drift; (b²−a²)·1000 ≤ 10¹⁸ < 2⁶³ at micro-fixed
    64-dim). Because assignment IS argmin over the same centroids,
    a² ≤ b² always: scores live in [0, 1000] milli — well-separated
    points ≈ 1000, boundary points ≈ 0 (the negative band of the
    classic formulation is unreachable by construction; stated here
    so the readout isn't misread). Duplicate-centroid degenerate case
    (a² = b² = 0) scores 0.

    Distributed shape: identical to kmeans' final pass — centroids
    are plan literals, the per-point sorted distance array is one
    narrow codegen map (zero corpus shuffles), and the only wide op
    is the final k-key agg. Returns one row per cluster:
    (cluster, n_members, mean_sil_milli, min_sil_milli)."""
    if k < 2:
        # the nearest-OTHER-centroid read (_ds[1]) needs a second
        # centroid; with k=1 it would be NULL and silently propagate
        # NULL scores — fail loudly instead (the dhash
        # band-divisibility discipline). Duplicate centroids from a
        # degenerate Lloyd collapse still yield k structs (score 0),
        # so k >= 2 is the only unrepresentable configuration.
        raise ValueError(f"kmeans_silhouette requires k >= 2, got {k}")
    vm = df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("v"))
    seed_rows = (
        vm.orderBy(h60(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    cvecs = [[int(x) for x in r["v"]] for r in seed_rows]
    dim = probe_dim(df, vec_col) or 0
    cvecs = _lloyd_centroids(vm, cvecs, iters, dim)
    structs = ",".join(
        "struct(aggregate(zip_with({v}, array({lits}),"
        " (a, b) -> (a - b) * (a - b)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS d,"
        " {cid} AS cid)".format(
            v="v",
            lits=",".join(f"{int(c)}L" for c in cv),
            cid=cid + 1,
        )
        for cid, cv in enumerate(cvecs)
    )
    # sorted (d, cid) structs: [0] = own cluster (argmin), [1] =
    # nearest other — staged in its own select so the three reads
    # share one computed array (the _kmeans_from_seeds discipline)
    pt = vm.select(
        F.expr(f"array_sort(array({structs}))").alias("_ds")
    ).select(
        F.expr("_ds[0].cid").alias("cluster"),
        F.expr("_ds[0].d").alias("_a2"),
        F.expr("_ds[1].d").alias("_b2"),
    )
    scored = pt.select(
        "cluster",
        F.when(F.greatest("_a2", "_b2") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr("(_b2 - _a2) * 1000L div greatest(_a2, _b2)")
        )
        .alias("_s"),
    )
    return scored.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.expr("sum(_s) div count(1)").alias("mean_sil_milli"),
        F.min("_s").alias("min_sil_milli"),
    )


def embed_diversity_gram(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Mean pairwise dot product per label — the corpus DIVERSITY /
    cluster-cohesion readout — in ONE PASS via the Gram identity:
    Σ_{i≠j} vᵢ·vⱼ = ‖Σv‖² − Σ‖v‖², so the number everyone computes
    with an O(n²) pair join falls out of a single per-label aggregate
    (per-dim sums + self-norm sum), and a 100 TB corpus's diversity
    costs one map-side-combining agg — no pairs ever materialize.
    THE ORACLE IS THE O(n²) BRUTE FORCE, so the gate literally proves
    the identity on real data.

    Exactness: micro-fixed integer vectors; per-dim sums and their
    squares carried in DECIMAL(38,0) (the gini discipline — ‖Σv‖²
    wraps int64 near a billion rows per label); the mean readouts are
    one floor on a double built from those exact integers (the CUPED
    discipline — identical term structure in the oracle; floor, not
    integer div, because a centered corpus makes the pair sum
    NEGATIVE and trunc-vs-floor would diverge between engines there).
    A corpus-wide row (label = -1) rides along: within-label cohesion
    vs global diversity in the same frame. Returns (label, n_vecs,
    n_pairs, mean_self_dot, mean_pair_dot); single-vector labels emit
    n_pairs = 0 and a NULL mean_pair_dot (stated, not silent)."""
    dim = probe_dim(df, vec_col) or 0
    d38 = "decimal(38,0)"
    vm = df.select(
        F.col(label_col).cast("long").alias("label"),
        micro_vec(F.col(vec_col)).alias("v"),
    )

    def block(grouped) -> DataFrame:
        agg = grouped.agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                F.expr(
                    "aggregate(v, CAST(0 AS BIGINT),"
                    " (acc, x) -> acc + x * x)"
                )
            )
            .cast(d38)
            .alias("_self"),
            *[
                F.sum(F.element_at("v", i + 1))
                .cast(d38)
                .alias(f"_s{i}")
                for i in range(dim)
            ],
        )
        sum_norm2 = " + ".join(f"_s{i} * _s{i}" for i in range(dim))
        return agg.select(
            "label",
            "n_vecs",
            (F.col("n_vecs") * (F.col("n_vecs") - 1))
            .cast("long")
            .alias("n_pairs"),
            F.expr(
                "CAST(floor(CAST(_self AS DOUBLE) / n_vecs) AS BIGINT)"
            ).alias("mean_self_dot"),
            F.expr(
                f"CAST(floor(CAST(({sum_norm2}) - _self AS DOUBLE)"
                " / nullif(n_vecs * (n_vecs - 1), 0)) AS BIGINT)"
            ).alias("mean_pair_dot"),
        )

    per_label = block(vm.groupBy("label"))
    global_row = block(
        vm.select(F.lit(-1).cast("long").alias("label"), "v").groupBy(
            "label"
        )
    )
    return per_label.unionByName(global_row)


def center_normalize(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Mean-center and L2-renormalize an embedding corpus — the
    standard preprocessing before cosine ANN/clustering (uncentred
    embedding spaces concentrate around a dominant direction; recall
    and cluster balance both improve after centering).

    Exactness contract: the corpus mean is computed on micro-fixed
    longs (exact sums, integer division — partition-order-free), so
    the centered vector is integer subtraction; only the final
    normalization divides in doubles (per-row, fixed operand order)
    and rounds to 6dp. Distributed shape: the per-dim mean is ONE agg
    collapsing map-side to dim cells; the mean vector broadcasts as a
    1-row frame; centering + renormalizing is a narrow map."""
    from pyspark.sql.functions import broadcast

    dim = probe_dim(df, vec_col) or 0
    vm = df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("_v"))
    mean = vm.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(F.element_at("_v", i + 1)).alias(f"_s{i}") for i in range(dim)],
    ).select(
        F.array(*[F.expr(f"_s{i} div _n") for i in range(dim)]).alias("_mu")
    )
    centered = F.zip_with("_v", "_mu", lambda a, b: (a - b).cast("double"))
    norm = F.sqrt(
        F.aggregate(
            F.zip_with("_v", "_mu", lambda a, b: ((a - b) * (a - b)).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # stage centered + norm per row BEFORE the element-wise divide: an
    # expression referenced inside a transform lambda is re-evaluated
    # per ELEMENT, so an unstaged norm would re-run the dim-wide fold
    # 64x per row (lambdas also block common-subexpression elimination)
    return (
        vm.crossJoin(broadcast(mean))
        .select(F.col(id_col), centered.alias("_c"), norm.alias("_norm"))
        .select(
            id_col,
            F.transform("_c", lambda x: F.round(x / F.col("_norm"), 6)).alias("centered"),
        )
    )


def gonzalez_seeds(
    df: DataFrame, k: int = 8, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[list[int]]:
    """Farthest-first (Gonzalez 1985) seed selection on micro-fixed
    vectors — the deterministic counterpart of k-means++ (D² sampling
    needs randomness; farthest-first is its derandomized cousin with
    a 2-approximation guarantee for k-center). Seed 0 is the
    hash-order minimum (the ivf_centroids policy); each next seed
    maximizes the minimum exact long distance to the chosen set, ties
    to the lowest id.

    Each round is a NARROW map against plan-literal chosen seeds plus
    one 1-row argmax fetch (max_by over (dist, -id)) — k driver
    round-trips of one row each, the iterative-model pattern of
    :func:`kmeans`."""
    vm = df.select(F.col(id_col).alias("_id"), micro_vec(F.col(vec_col)).alias("v"))
    first = (
        vm.orderBy(h60(F.col("_id").cast("string")), F.col("_id")).limit(1).collect()[0]
    )
    chosen: list[list[int]] = [[int(x) for x in first["v"]]]

    def dist_to(cv: list[int]) -> Column:
        return F.aggregate(
            F.zip_with("v", F.array(*[F.lit(c) for c in cv]), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    for _ in range(k - 1):
        mind = F.least(*[dist_to(c) for c in chosen]) if len(chosen) > 1 else dist_to(chosen[0])
        row = (
            vm.select("_id", "v", mind.alias("_d"))
            .orderBy(F.col("_d").desc(), F.col("_id").asc())
            .limit(1)
            .collect()[0]
        )
        chosen.append([int(x) for x in row["v"]])
    return chosen


def kmeans_gonzalez(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """:func:`kmeans` with farthest-first seeds instead of the hash
    sample — better-spread initial centroids, same integer-exact
    Lloyd's iterations and zero-shuffle final assignment."""
    seeds = gonzalez_seeds(df, k, vec_col, id_col)
    return _kmeans_from_seeds(df, seeds, iters, vec_col, id_col)


def top_component(
    df: DataFrame,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Dominant principal direction of the (centered) embedding corpus
    via INTEGER-EXACT power iteration — the first step of PCA
    whitening / ABTT ("all-but-the-top") embedding post-processing,
    and the measurement behind "our embedding space has a dominant
    direction" (the reason center_normalize exists).

    Exactness contract: vectors micro-fix to longs; the iterate v
    lives in MILLI units renormalized each round by max|w| (an exact
    integer max — no sqrt, no float norm), so every step is long
    arithmetic: d_i = Σ_j c_ij·v_j, scaled d'_i = d_i div 10⁶,
    w_j = Σ_i d'_i·c_ij, v'_j = (w_j·1000) div max|w|. Bit-identical
    in any engine / any partitioning — a float power iteration sums
    in partition order and is not. Output is the iterate after
    ``iters`` rounds (deterministic by definition; convergence to the
    true eigenvector is the usual power-iteration story and is
    pytest-gated on an anisotropic fixture).

    Magnitudes: |c| ≤ 2·10⁶, |v| ≤ 10³ → |d| ≤ dim·2·10⁹ ≈ 1.3·10¹¹,
    |d'| ≤ 1.3·10⁵, per-term |d'·c| ≤ 2.6·10¹¹ → safe to ~10⁷ rows in
    one partial sum; beyond that, re-scale d' (one more div) or
    hierarchical partial aggregation — same recurrence.

    Distributed shape: mean + each w are ONE map-side-collapsing agg
    over dim cells; v and the mean broadcast as 1-row frames; nothing
    but 1-row frames ever crosses the wire after the per-dim sums."""
    from pyspark.sql.functions import broadcast

    dim = probe_dim(df, vec_col) or 0
    # every multi-column builder below is an F.expr STRING (one py4j
    # parse each) — composing 64-column aggs from Column objects cost
    # ~3.4 s of plan-build per invocation (the ivf_assign lesson)
    vm = df.select(micro_vec(F.col(vec_col)).alias("_v"))
    mean = vm.agg(
        F.expr("count(1) AS _n"),
        *[F.expr(f"sum(element_at(_v, {i + 1})) AS _s{i}") for i in range(dim)],
    ).selectExpr(
        "array(" + ",".join(f"_s{i} div _n" for i in range(dim)) + ") AS _mu"
    )
    c = vm.crossJoin(broadcast(mean)).selectExpr(
        "zip_with(_v, _mu, (a, b) -> a - b) AS _c"
    )
    from pyspark.storagelevel import StorageLevel

    c = c.persist(StorageLevel.MEMORY_AND_DISK)
    v = mean.selectExpr(
        "array(" + ",".join("CAST(1000 AS BIGINT)" for _ in range(dim)) + ") AS _vec"
    )
    for _ in range(iters):
        scored = c.crossJoin(broadcast(v)).selectExpr(
            "_c",
            "aggregate(zip_with(_c, _vec, (a, b) -> a * b),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x) div 1000000 AS _d",
        )
        w = scored.agg(
            F.expr(f"sum(_d * element_at(_c, 1)) AS _w0"),
            *[
                F.expr(f"sum(_d * element_at(_c, {i + 1})) AS _w{i}")
                for i in range(1, dim)
            ],
        )
        v = w.selectExpr(
            "array(" + ",".join(f"_w{i}" for i in range(dim)) + ") AS _w",
            "greatest(" + ",".join(f"abs(_w{i})" for i in range(dim)) + ") AS _m",
        ).selectExpr("transform(_w, a -> (a * 1000) div _m) AS _vec")
    return v.select(F.col("_vec").alias("component_milli"))


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Linear int8 quantization of the embedding corpus — the 4x
    memory cut that makes billion-vector ANN serveable (float32 →
    int8 codes + one per-dim affine model). Per dim: scale by the
    corpus [min, max] into [-127, 127]; the model is a 2·dim-number
    broadcast. Output per vector: the int8 code array plus the exact
    micro reconstruction error (max |x − dequant(x)| over dims), the
    in-query accuracy witness.

    Exactness: min/max come from micro-fixed longs (exact, order-
    free); codes are integer arithmetic on micros: code =
    round_half_away((x−mn)·254 / span) − 127 implemented as integer
    ((x−mn)·254·2 + span) div (2·span) — no float, bit-identical
    anywhere. Dequant and the error are integers too. Constant dims
    (span 0) code to 0 with error = 0 by convention.

    Distributed shape: ONE map-side-collapsing per-dim min/max agg →
    1-row broadcast model → narrow quantize map. The expression
    builders are parsed SQL strings (the plan-build discipline)."""
    from pyspark.sql.functions import broadcast

    dim = probe_dim(df, vec_col) or 0
    vm = df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("_v"))
    model = vm.agg(
        *[F.expr(f"min(element_at(_v, {i + 1})) AS _mn{i}") for i in range(dim)],
        *[F.expr(f"max(element_at(_v, {i + 1})) AS _mx{i}") for i in range(dim)],
    ).selectExpr(
        "array(" + ",".join(f"_mn{i}" for i in range(dim)) + ") AS _mn",
        "array(" + ",".join(f"_mx{i} - _mn{i}" for i in range(dim)) + ") AS _span",
    )
    staged = vm.crossJoin(broadcast(model))
    # integer round-half-up division of non-negatives: (2a+b) div (2b)
    code = (
        "zip_with(zip_with(_v, _mn, (x, m) -> x - m), _span,"
        " (d, s) -> CASE WHEN s = 0 THEN CAST(0 AS BIGINT)"
        " ELSE (2 * d * 254 + s) div (2 * s) - 127 END)"
    )
    # dequant micro = mn + round((c+127)·span / 254); all operands
    # non-negative, so the same half-up integer division applies
    dequant = (
        "zip_with(zip_with(code, _mn, (c, m) ->"
        " struct(c AS c, m AS m)), _span,"
        " (cm, s) -> cm.m + (2 * (cm.c + 127) * s + 254) div 508)"
    )
    return (
        staged.selectExpr(id_col, f"{code} AS code", "_v", "_mn", "_span")
        .selectExpr(id_col, "code", f"{dequant} AS _dq", "_v")
        .selectExpr(
            id_col,
            "CAST(code AS array<int>) AS code_int8",
            "array_max(zip_with(_v, _dq, (x, d) -> abs(x - d)))"
            " AS max_err_micro",
        )
    )


def matryoshka_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    dims: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Truncated-PREFIX exact top-k — the Matryoshka-representation
    serving mode (Kusupati et al. 2022: a nested-trained embedding's
    first d components are themselves a usable embedding, so serving
    truncates to cut memory/compute and recall_eval against the
    full-dim search measures what the truncation costs): rank by
    cosine over ``F.slice(vec, 1, dims)`` only.

    Plan: identical to :func:`brute_force_topk` on the sliced frames
    — the slice is a narrow map fused into the scan (column pruning
    unchanged: same one array column read), the query side still
    broadcasts, the corpus never shuffles, and the scored tuples that
    do shuffle are the same narrow (query_id, nbr_id, cosine) rows.
    At 100 TB the dims sweep re-reads the corpus per setting; a
    production eval would stage the sliced prefixes once."""
    sliced = F.slice(F.col(vec_col), 1, dims)
    return brute_force_topk(
        df.withColumn(vec_col, sliced),
        queries.withColumn(vec_col, sliced),
        k=k,
        vec_col=vec_col,
        id_col=id_col,
    )


def int8_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k over the DEQUANTIZED int8 corpus — the eval loop
    :func:`quantize_int8` was missing (the silhouette discipline:
    the code array and its reconstruction error are gated, but what
    a deployment serves is SEARCH over the codes — this measures the
    quantization-induced ranking loss via recall_eval against the
    float search): both sides quantize under the corpus per-dim
    affine model, decode back to micro integers, and rank by the
    cosine of the dequantized vectors.

    Exactness: dequantized components are micro LONGS (the
    quantize_int8 integer round-half-up arithmetic), so the dot and
    both self-norms are exact 64-bit sums (|micro| <= ~2^21 keeps
    the 64-dim dot under 2^49); the one double step is
    dot / (sqrt(qq) * sqrt(nn)) on exactly-representable integers —
    bit-identical cross-engine, then round 6.

    Plan: the 1-row model broadcast + narrow dequant map, then the
    brute_force_topk shape (queries broadcast, corpus unshuffled,
    narrow scored tuples to the per-query top-k window)."""
    from pyspark.sql.functions import broadcast

    dim = probe_dim(df, vec_col) or 0
    vm = df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("_v"))
    model = vm.agg(
        *[F.expr(f"min(element_at(_v, {i + 1})) AS _mn{i}") for i in range(dim)],
        *[F.expr(f"max(element_at(_v, {i + 1})) AS _mx{i}") for i in range(dim)],
    ).selectExpr(
        "array(" + ",".join(f"_mn{i}" for i in range(dim)) + ") AS _mn",
        "array(" + ",".join(f"_mx{i} - _mn{i}" for i in range(dim)) + ") AS _span",
    )
    # code then decode in one expression: dequant micro =
    # mn + round_half_up((code+127)·span / 254) with the same
    # integer divisions as quantize_int8 — bit-identical to storing
    # the codes and decoding at serve time
    code = (
        "zip_with(zip_with(_v, _mn, (x, m) -> x - m), _span,"
        " (d, s) -> CASE WHEN s = 0 THEN CAST(0 AS BIGINT)"
        " ELSE (2 * d * 254 + s) div (2 * s) - 127 END)"
    )
    dequant = (
        "zip_with(zip_with(code, _mn, (c, m) ->"
        " struct(c AS c, m AS m)), _span,"
        " (cm, s) -> cm.m + (2 * (cm.c + 127) * s + 254) div 508)"
    )

    def dq(frame: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        staged = frame.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("_v"))
        return (
            staged.crossJoin(broadcast(model))
            .selectExpr(id_col, f"{code} AS code", "_mn", "_span")
            .selectExpr(f"{id_col} AS {out_id}", f"{dequant} AS {out_vec}")
        )

    corpus = dq(df, "nbr_id", "_nv")
    qs = dq(queries, "query_id", "_qv")
    intdot = F.expr(
        "aggregate(zip_with(_qv, _nv, (a, b) -> a * b),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    norm = (
        "sqrt(CAST(aggregate(transform({v}, x -> x * x),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS DOUBLE))"
    )
    cos = F.round(
        intdot.cast("double")
        / (F.expr(norm.format(v="_qv")) * F.expr(norm.format(v="_nv"))),
        6,
    )
    scored = (
        corpus.crossJoin(broadcast(qs))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", cos.alias("cosine"))
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def pq_encode(
    df: DataFrame,
    m: int = 4,
    ncodes: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product quantization (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): split each vector into ``m``
    subvectors, train an independent ``ncodes``-centroid codebook per
    subspace (integer-exact Lloyd's — the :func:`kmeans` machinery),
    and encode every vector as ``m`` small code ids. The memory
    story IVF/int8 can't tell: dim·4 bytes → m·log2(ncodes) bits per
    vector (64-dim float32 = 256 B → 4 codes = 3 B here), while ADC
    distance tables keep search cheap. Output per vector: the m code
    ids (scalar columns) + the exact squared micro reconstruction
    error — the in-query accuracy witness next to the codes.

    Determinism: one hash-ordered seed sample (the ivf_centroids
    policy) supplies all m subspace seed sets — micro-fixed longs,
    integer Lloyd updates, floor-division centroids; every step is
    order-independent, so codebooks AND codes are bit-identical in
    any engine and the DuckDB oracle replicates the full construction.

    Distributed shape: the corpus never shuffles — per training round
    each subspace contributes one map-side-collapsing (cluster, dim
    sums) agg over ncodes keys; codebooks are a MODEL (m·ncodes·d
    longs) baked into the encode plan as literals, so encoding is a
    single zero-shuffle narrow map emitting all m codes + the error
    in one pass. The micro frame persists once and feeds every
    subspace round (m·(iters−1)+1 bounded scans of the cached frame,
    never the parquet)."""
    from pyspark.storagelevel import StorageLevel

    vm, codebooks, d = _pq_train(df, m, ncodes, iters, vec_col, id_col)
    m = len(codebooks)
    staged = vm.select(
        F.col(id_col),
        *[F.slice("v", j * d + 1, d).alias(f"_sv{j}") for j in range(m)],
    ).select(
        F.col(id_col),
        *[
            _best_dc(f"_sv{j}", codebooks[j]).alias(f"_dc{j}")
            for j in range(m)
        ],
    )
    total = F.col("_dc0.d")
    for j in range(1, m):
        total = total + F.col(f"_dc{j}.d")
    return staged.select(
        F.col(id_col),
        *[F.col(f"_dc{j}.cid").alias(f"code_{j + 1}") for j in range(m)],
        total.alias("recon_dist2"),
    )


def _pq_train(
    df: DataFrame,
    m: int,
    ncodes: int,
    iters: int,
    vec_col: str,
    id_col: str,
):
    """Shared PQ training: persist the micro frame, hash-order ONE
    seed sample whose subvectors seed every subspace, run the
    integer-exact Lloyd rounds per subspace. Returns (persisted micro
    frame, per-subspace codebooks, sub-dim)."""
    from pyspark.storagelevel import StorageLevel

    dim = probe_dim(df, vec_col) or 0
    if m <= 0 or dim % m:
        raise ValueError(f"pq_encode: dim {dim} not divisible by m={m}")
    d = dim // m
    vm = df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("v"))
    vm = vm.persist(StorageLevel.MEMORY_AND_DISK)
    codebooks = _pq_train_micro(vm, m, ncodes, iters, d, id_col)
    return vm, codebooks, d


def _pq_train_micro(
    vm: DataFrame, m: int, ncodes: int, iters: int, d: int, id_col: str
):
    """PQ codebook training over an ALREADY micro-fixed frame with
    column ``v`` (raw vectors for pq_encode, coarse-cell residuals
    for ivfpq) — see :func:`_pq_train` for the job-shape notes."""
    seed_rows = (
        vm.orderBy(h60(F.col(id_col).cast("string")), F.col(id_col))
        .limit(ncodes)
        .collect()
    )
    codebooks: list[list[list[int]]] = [
        [[int(x) for x in r["v"][j * d : (j + 1) * d]] for r in seed_rows]
        for j in range(m)
    ]
    # ONE update job per Lloyd round for ALL m subspaces — the
    # subspace id is DATA, not a Python loop: each row explodes to m
    # (j, cluster_j, subvector) structs (narrow), then a single
    # (j, cluster)-keyed agg with map-side combine collapses every
    # task to <= m*ncodes rows of (count, d dim-sums). A per-subspace
    # loop would run m sequential jobs per round (measured 16 jobs /
    # ~20 s at m=16 on sf0.1 before this shape; one job after).
    # Arithmetic is identical to _lloyd_centroids, so codebooks are
    # bit-equal either way.
    for _ in range(iters - 1):
        staged = vm.select(
            *[F.slice("v", j * d + 1, d).alias(f"_sv{j}") for j in range(m)]
        )
        stacked = staged.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _best_dc(f"_sv{j}", codebooks[j])
                            .getField("cid")
                            .alias("cluster"),
                            F.col(f"_sv{j}").alias("sv"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("x")
        ).select("x.j", "x.cluster", "x.sv")
        stats = (
            stacked.groupBy("j", "cluster")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at("sv", i + 1)).alias(f"_s{i}")
                    for i in range(d)
                ],
            )
            .collect()
        )
        updated = {
            (j, cid): cv
            for j, book in enumerate(codebooks)
            for cid, cv in enumerate(book)
        }  # empty-cluster repair: keep the previous centroid
        for r in stats:
            updated[(r["j"], r["cluster"] - 1)] = [
                int(r[f"_s{i}"]) // r["_n"]
                if r[f"_s{i}"] >= 0
                else -((-int(r[f"_s{i}"])) // r["_n"])
                for i in range(d)
            ]
        codebooks = [
            [updated[(j, c)] for c in range(ncodes)] for j in range(m)
        ]
    return codebooks


def brute_force_topk_l2(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by squared euclidean distance over MICRO-fixed
    vectors — the integer-exact L2 ground truth for the PQ/ADC eval
    (PQ approximates L2, so the cosine baseline of brute_force_topk
    would conflate metric mismatch with quantization loss). Same
    scale shape as brute_force_topk: queries broadcast, corpus never
    shuffles, only (query_id, nbr_id, dist2) tuples reach the
    per-query top-k window. All-long arithmetic -> bit-identical
    ranking in any engine."""
    corpus = df.select(
        F.col(id_col).alias("nbr_id"), micro_vec(F.col(vec_col)).alias("nv")
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), micro_vec(F.col(vec_col)).alias("qv")
    )
    dist2 = F.aggregate(
        F.zip_with("qv", "nv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", dist2.alias("dist2"))
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "dist2", "rank")
    )


def pq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 4,
    ncodes: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k by PQ ASYMMETRIC DISTANCE (ADC, Jégou et al.
    2011 §III): the corpus is stored only as m code ids per vector;
    a query scores a vector as the sum over subspaces of the exact
    squared distance between the query's subvector and the CENTROID
    its code names. The memory story at billions of vectors: search
    touches 3 bytes + m centroid lookups per candidate, never the
    float vector.

    Distributed shape: codebooks are plan-literal models, so corpus
    encoding AND the per-candidate ADC sum are one narrow map over
    the broadcast query set — the corpus never shuffles; only
    (query_id, nbr_id, adc_dist2) tuples reach the per-query top-k
    window (the brute_force_topk discipline). ``element_at`` on a
    literal ncodes-array replaces the per-query distance table — the
    same lookups, resolved by Catalyst constant folding.

    Integer-exact end to end (micro vectors, long sums), so the
    approximate RANKING is bit-identical cross-engine and the recall
    row hash-gates against a DuckDB replica."""
    vm, codebooks, d = _pq_train(df, m, ncodes, iters, vec_col, id_col)
    m = len(codebooks)
    codes = vm.select(
        F.col(id_col),
        *[F.slice("v", j * d + 1, d).alias(f"_sv{j}") for j in range(m)],
    ).select(
        F.col(id_col).alias("nbr_id"),
        *[
            _best_dc(f"_sv{j}", codebooks[j]).getField("cid").alias(f"_c{j}")
            for j in range(m)
        ],
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), micro_vec(F.col(vec_col)).alias("qv")
    ).select(
        "query_id",
        *[F.slice("qv", j * d + 1, d).alias(f"_q{j}") for j in range(m)],
    )

    def cb_literal(j: int) -> Column:
        # ONE parsed SQL literal per subspace codebook (the plan-build
        # discipline): ncodes x d longs as a nested array
        inner = ",".join(
            "array(" + ",".join(f"{c}L" for c in cv) + ")"
            for cv in codebooks[j]
        )
        return F.expr(f"array({inner})")

    def adc(j: int) -> Column:
        centroid = F.element_at(cb_literal(j), F.col(f"_c{j}"))
        return F.aggregate(
            F.zip_with(F.col(f"_q{j}"), centroid, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    total = adc(0)
    for j in range(1, m):
        total = total + adc(j)
    scored = (
        codes.crossJoin(F.broadcast(qs))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", total.alias("adc_dist2"))
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist2").asc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "adc_dist2", "rank")
    )


def ivfpq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 4,
    ncodes: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ approximate top-k — the billion-scale ANN architecture
    (FAISS IndexIVFPQ; Jégou et al. 2011 §V): a coarse quantizer
    partitions the corpus into ``nlist`` cells, PQ encodes each
    vector's RESIDUAL against its cell centroid (residuals are far
    more compact than raw vectors, so the same codebook budget buys
    much finer quantization), and a query scans only its ``nprobe``
    nearest cells, scoring candidates by ADC between the query's
    per-cell residual and the residual codebooks.

    Distributed shape — the index IS the DataFrame: (nbr_id, cell,
    m codes) built in one narrow map (coarse centroids and residual
    codebooks are plan-literal models; the only training shuffles are
    the per-round <= nlist-row and <= m*ncodes-row stat aggs). Search
    joins the corpus to the BROADCAST exploded query-probe frame on
    ``cell`` — the corpus stays partition-local (no shuffle on the
    skewed cell key), candidates prune map-side to the probed cells,
    and only (query_id, nbr_id, adc_dist2) survivors reach the
    per-query top-k window. At 25B vectors this is the shape that
    works: 3-byte codes + cell id per row, nprobe/nlist of the corpus
    touched per query, zero corpus shuffles.

    Integer-exact end to end (micro vectors, long residuals, long
    ADC sums) -> bit-identical rankings in any engine; the recall row
    hash-gates the full construction against a DuckDB replica."""
    dim = probe_dim(df, vec_col) or 0
    if m <= 0 or dim % m:
        raise ValueError(f"ivfpq_topk: dim {dim} not divisible by m={m}")
    d = dim // m
    from pyspark.storagelevel import StorageLevel

    vm = df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("v"))
    vm = vm.persist(StorageLevel.MEMORY_AND_DISK)
    # coarse quantizer: nlist centroids over the full vectors
    seed_rows = (
        vm.orderBy(h60(F.col(id_col).cast("string")), F.col(id_col))
        .limit(nlist)
        .collect()
    )
    coarse = _lloyd_centroids(
        vm.select("v"), [[int(x) for x in r["v"]] for r in seed_rows], iters, dim
    )
    coarse_lit = "array(" + ",".join(
        "array(" + ",".join(f"{int(c)}L" for c in cv) + ")" for cv in coarse
    ) + ")"
    # residuals against the assigned cell centroid (narrow, exact)
    res = vm.select(
        F.col(id_col),
        _best_dc("v", coarse).getField("cid").alias("cell"),
        F.col("v"),
    ).select(
        id_col,
        "cell",
        F.expr(
            f"zip_with(v, element_at({coarse_lit}, cell), (a, b) -> a - b)"
        ).alias("v"),
    )
    res = res.persist(StorageLevel.MEMORY_AND_DISK)
    codebooks = _pq_train_micro(res, m, ncodes, iters, d, id_col)
    index = res.select(
        F.col(id_col).alias("nbr_id"),
        "cell",
        *[F.slice("v", j * d + 1, d).alias(f"_sv{j}") for j in range(m)],
    ).select(
        "nbr_id",
        "cell",
        *[
            _best_dc(f"_sv{j}", codebooks[j]).getField("cid").alias(f"_c{j}")
            for j in range(m)
        ],
    )
    # query probes: nprobe nearest cells, each with the query's
    # per-cell residual subvectors (exploded -> still tiny, broadcast)
    probes_expr = (
        "slice(array_sort(transform(sequence(1, {nlist}), c -> "
        "named_struct('d', aggregate(zip_with(qv, element_at({lit}, c), "
        "(a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), "
        "(acc, x) -> acc + x), 'cell', c))), 1, {nprobe})"
    ).format(nlist=nlist, lit=coarse_lit, nprobe=nprobe)
    qs = (
        queries.select(
            F.col(id_col).alias("query_id"),
            micro_vec(F.col(vec_col)).alias("qv"),
        )
        .select(
            "query_id",
            "qv",
            F.explode(F.expr(probes_expr)).alias("_p"),
        )
        .select("query_id", "qv", F.col("_p.cell").alias("cell"))
        .select(
            "query_id",
            "cell",
            F.expr(
                f"zip_with(qv, element_at({coarse_lit}, cell), (a, b) -> a - b)"
            ).alias("qres"),
        )
        .select(
            "query_id",
            "cell",
            *[F.slice("qres", j * d + 1, d).alias(f"_q{j}") for j in range(m)],
        )
    )

    def cb_literal(j: int) -> Column:
        inner = ",".join(
            "array(" + ",".join(f"{int(c)}L" for c in cv) + ")"
            for cv in codebooks[j]
        )
        return F.expr(f"array({inner})")

    def adc(j: int) -> Column:
        centroid = F.element_at(cb_literal(j), F.col(f"_c{j}"))
        return F.aggregate(
            F.zip_with(F.col(f"_q{j}"), centroid, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    total = adc(0)
    for j in range(1, m):
        total = total + adc(j)
    scored = (
        index.join(F.broadcast(qs), "cell")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", total.alias("adc_dist2"))
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist2").asc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "adc_dist2", "rank")
    )


def ivfpq_rerank_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cand: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 4,
    ncodes: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Two-stage retrieval — the shape a production vector search
    actually runs (FAISS IndexIVFPQ + refine / every RAG stack):
    stage 1 pulls ``n_cand`` candidates per query by compressed ADC
    over the probed cells (:func:`ivfpq_topk` — n_probe/nlist of the
    corpus touched, 3-byte codes scored); stage 2 RE-RANKS only those
    candidates by exact L2 on the raw vectors. Rerank repairs
    QUANTIZATION error (an ADC mis-ordering inside the candidate set)
    for the cost of n_cand raw-vector reads per query; probe misses
    (true neighbor in an unprobed cell) are n_probe's job, not
    rerank's — the recall row reports both stages so the two failure
    modes stay separable.

    Scale shape: the candidate frame is n_cand rows per query (tiny);
    the rerank join fetches exactly those raw vectors by id
    (AQE-splittable equi-join against the corpus — at 25B vectors
    this is the point: raw vectors are read for candidates ONLY).
    Integer-exact end to end -> hash-gates cross-engine. Pass
    ``candidates`` (a (query_id, nbr_id, ...) frame) to rerank an
    ALREADY-BUILT candidate set instead of re-running stage 1 — the
    catalog row scores both stages off one index build this way."""
    cands = candidates
    if cands is None:
        cands = ivfpq_topk(
            df, queries, k=n_cand, nlist=nlist, nprobe=nprobe, m=m,
            ncodes=ncodes, iters=iters, vec_col=vec_col, id_col=id_col,
        )
    corpus = df.select(
        F.col(id_col).alias("nbr_id"), micro_vec(F.col(vec_col)).alias("nv")
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), micro_vec(F.col(vec_col)).alias("qv")
    )
    dist2 = F.aggregate(
        F.zip_with("qv", "nv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        cands.select("query_id", "nbr_id")
        .join(corpus, "nbr_id")
        .join(F.broadcast(qs), "query_id")
        .select("query_id", "nbr_id", dist2.alias("dist2"))
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("dist2").asc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "dist2", "rank")
    )


# --- Johnson–Lindenstrauss random projection ---------------------------


def mmr_diversify(
    df: DataFrame,
    queries: DataFrame,
    k_final: int = 5,
    k_pool: int = 10,
    lambda_milli: int = 700,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversification pass between retrieval and a RAG
    context window: from each query's ``k_pool`` exact candidates,
    greedily select ``k_final`` maximizing λ·relevance −
    (1−λ)·max-similarity-to-already-selected, so near-duplicate
    passages stop crowding out coverage.

    Exactness: relevance and candidate-pair similarities are cosine
    MICRO-fixed to longs once (round(cos·10⁶) — the micro_vec
    rounding contract), so every greedy round is an INTEGER argmax
    (λ_milli·rel − (1000−λ_milli)·max_sim, ties to the lowest id) —
    the whole selection is bit-identical across engines, runs, and
    partitionings, and the oracle unrolls the same k_final rounds.

    Distributed shape: candidates come from :func:`brute_force_topk`
    (queries broadcast, corpus unshuffled); the pairwise-similarity
    frame is candidates ⋈ candidates WITHIN a query — k_pool² rows
    per query, bounded by the evaluated query set, never the corpus;
    each greedy round is one query-keyed agg + one per-query argmax
    window over ≤ k_pool rows. Returns (query_id, pick_rank, nbr_id,
    mmr_score_nano — micro-cosine × milli-λ units)."""
    cands = brute_force_topk(
        df, queries, k=k_pool, vec_col=vec_col, id_col=id_col
    ).select(
        "query_id",
        "nbr_id",
        F.round(F.col("cosine") * 1_000_000).cast("long").alias("_rel"),
    ).localCheckpoint()
    vecs = df.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("_v"))
    a = cands.select("query_id", F.col("nbr_id").alias("_a")).join(
        vecs.select(F.col("nbr_id").alias("_a"), F.col("_v").alias("_va")),
        "_a",
    )
    b = cands.select("query_id", F.col("nbr_id").alias("_b")).join(
        vecs.select(F.col("nbr_id").alias("_b"), F.col("_v").alias("_vb")),
        "_b",
    )
    from logprep_spark.functions.dedup import cosine_sim

    pairsim = (
        a.join(b, "query_id")
        .filter(F.col("_a") != F.col("_b"))
        .select(
            "query_id",
            "_a",
            "_b",
            F.round(cosine_sim(F.col("_va"), F.col("_vb")) * 1_000_000)
            .cast("long")
            .alias("_sim"),
        )
        .localCheckpoint()
    )
    lam, mu = lambda_milli, 1000 - lambda_milli
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("nbr_id").asc()
    )
    selected = (
        cands.withColumn("_score", F.col("_rel") * lam)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "query_id",
            F.lit(1).alias("pick_rank"),
            "nbr_id",
            F.col("_score").alias("mmr_score_nano"),
        )
        .localCheckpoint()
    )
    for r in range(2, k_final + 1):
        remaining = cands.join(
            selected.select("query_id", "nbr_id"),
            ["query_id", "nbr_id"],
            "left_anti",
        )
        maxsim = (
            pairsim.join(
                selected.select(
                    "query_id", F.col("nbr_id").alias("_b")
                ),
                ["query_id", "_b"],
            )
            .groupBy("query_id", F.col("_a").alias("nbr_id"))
            .agg(F.max("_sim").alias("_ms"))
        )
        pick = (
            remaining.join(maxsim, ["query_id", "nbr_id"])
            .withColumn(
                "_score", F.col("_rel") * lam - F.col("_ms") * mu
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "query_id",
                F.lit(r).alias("pick_rank"),
                "nbr_id",
                F.col("_score").alias("mmr_score_nano"),
            )
        )
        selected = selected.unionByName(pick).localCheckpoint()
    return selected


def contrastive_mine(
    docs: DataFrame,
    emb: DataFrame,
    k_neg: int = 3,
    k_pool: int = 8,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Contrastive TRAINING-PAIR MINING — the data-prep step an
    embedding-model trainer (SimCSE/E5/GTR-style) runs over a corpus:
    POSITIVES are verified text near-dup pairs (MinHash->LSH->verify
    — text-level ground truth, independent of the embedding being
    trained), HARD NEGATIVES are the anchor's nearest EMBEDDING
    neighbors that are NOT in its near-dup cluster — the
    looks-close-in-vector-space-but-not-a-true-paraphrase examples
    that make the contrastive objective informative (random negatives
    are too easy; cluster members would be false negatives).

    Anchor = the lower id of each verified pair; the anchor's whole
    near-dup CLUSTER is excluded from its negative pool (a transitive
    twin is still a positive, never a negative — the
    split_leakage_free atomicity discipline applied to pair mining).
    Deterministic: cosine rounded to 6, ties to the lowest id.

    Distributed shape: the pair/cluster side is the dedup pipeline
    already being run; the negative pool is brute_force_topk over the
    ANCHOR set only (anchors broadcast, corpus unshuffled); the
    cluster-exclusion is two narrow left joins on bounded frames.
    Returns (anchor_id, positive_id, negative_id, neg_rank,
    neg_cosine)."""
    from logprep_spark.functions import dedup as dd

    pairs = dd.minhash_dedup(
        docs, text_col, id_col, threshold
    ).localCheckpoint()
    clusters = dd.dup_clusters(pairs)
    anchors = pairs.select(F.col("id_a").alias(vec_id_col)).distinct()
    anchor_vecs = emb.join(anchors, vec_id_col, "left_semi")
    pool = brute_force_topk(
        emb, anchor_vecs, k=k_pool, vec_col=vec_col, id_col=vec_id_col
    )
    qc = clusters.select(
        F.col(id_col).alias("query_id"), F.col("cluster_id").alias("_qc")
    )
    nc = clusters.select(
        F.col(id_col).alias("nbr_id"), F.col("cluster_id").alias("_nc")
    )
    negs = (
        pool.join(qc, "query_id")
        .join(nc, "nbr_id", "left")
        .filter(F.col("_nc").isNull() | (F.col("_nc") != F.col("_qc")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    topneg = (
        negs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_neg)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("nbr_id").alias("negative_id"),
            F.col("_rn").alias("neg_rank"),
            F.col("cosine").alias("neg_cosine"),
        )
    )
    return (
        pairs.select(
            F.col("id_a").alias("anchor_id"),
            F.col("id_b").alias("positive_id"),
        )
        .join(topneg, "anchor_id")
        .select(
            "anchor_id",
            "positive_id",
            "negative_id",
            F.col("neg_rank").cast("long").alias("neg_rank"),
            "neg_cosine",
        )
    )


def jl_signs(m: int, d: int) -> list[list[int]]:
    """Deterministic ±1 projection matrix (Achlioptas 2001: sign
    entries preserve the JL guarantee of Gaussian ones): sign(k, j)
    from the parity of the md5-derived 60-bit hash of ``jl:k:j`` —
    NOT a seeded RNG, so any engine (and the DuckDB oracle) rebuilds
    the identical matrix from the string alone."""
    import hashlib

    def sgn(k: int, j: int) -> int:
        h = int(hashlib.md5(f"jl:{k}:{j}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    return [[sgn(k, j) for j in range(d)] for k in range(m)]


def jl_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 16,
    d: int = 64,
) -> DataFrame:
    """Project micro-fixed vectors to ``m`` dims: out_k = Σ_j
    sign(k,j)·v_j — ALL-INTEGER (the 1/√m normalization is folded
    into downstream ratio arithmetic instead of scaling the stored
    values), so projections are bit-identical cross-engine. The sign
    matrix inlines as a plan literal (m·d ints — the broadcast-model
    discipline; zero joins, zero shuffle: projection is a narrow
    map fused into the scan)."""
    signs = jl_signs(m, d)
    mat = (
        "array("
        + ",".join(
            "array(" + ",".join(str(s) for s in row) + ")" for row in signs
        )
        + ")"
    )
    vm = df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("_v"))
    # a vector whose dim differs from d would zip_with null-padded
    # signs and null-poison the aggregate fold into a silent NULL
    # projection — fail loudly instead (the hyperplane_bucket
    # discipline)
    vm = vm.withColumn(
        "_v",
        F.when(
            F.size("_v") == d, F.col("_v")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"jl_project: vector dim != d={d}: "),
                    F.size("_v").cast("string"),
                )
            ).cast("array<long>")
        ),
    )
    return vm.withColumn(
        "_p",
        F.expr(
            f"transform({mat}, sr -> aggregate(zip_with(sr, _v,"
            " (s, x) -> s * x), CAST(0 AS BIGINT), (a, b) -> a + b))"
        ),
    )


def jl_distortion_report(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 16,
    d: int = 64,
    sample_mod: int = 16,
) -> DataFrame:
    """Measured JL distortion on a deterministic id-hash pair sample:
    for each sampled pair, ratio_milli = 1000·‖Δproj‖² div (m·‖Δ‖²)
    — expectation exactly 1000 under the sign projection — reported
    as one row (n_pairs, mean/min/max ratio, count within ±20%).
    EVERY number is exact 64-bit integer arithmetic (micro vectors,
    integer signs, integer floor divisions): the whole report
    hash-compares against the SQL replica bit-for-bit, unlike any
    float-Gaussian projection. Scale: the projection is a zero-
    shuffle map; only the ~(n/sample_mod)² sampled pairs meet in the
    (broadcast) pair join — the same witness discipline as
    embed_truncation_fidelity."""
    pr = jl_project(df, vec_col, id_col, m, d).filter(
        h60(F.concat(F.lit("jl:"), F.col(id_col).cast("string")))
        % sample_mod
        == 0
    )
    a = pr.select(
        F.col(id_col).alias("_ia"), F.col("_v").alias("_va"),
        F.col("_p").alias("_pa"),
    )
    b = pr.select(
        F.col(id_col).alias("_ib"), F.col("_v").alias("_vb"),
        F.col("_p").alias("_pb"),
    )
    sq = (
        "CAST(aggregate(zip_with({x}, {y}, (p, q) -> (p - q) * (p - q)),"
        " CAST(0 AS BIGINT), (acc, t) -> acc + t) AS BIGINT)"
    )
    pairs = (
        a.join(F.broadcast(b), F.col("_ib") > F.col("_ia"))
        .withColumn("_d0", F.expr(sq.format(x="_va", y="_vb")))
        .withColumn("_dp", F.expr(sq.format(x="_pa", y="_pb")))
        .select(
            F.expr(
                f"CASE WHEN _d0 = 0 THEN CAST(1000 AS BIGINT)"
                f" ELSE 1000 * _dp div ({m} * _d0) END"
            ).alias("_rm")
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("sum(_rm) div count(*)").alias("mean_ratio_milli"),
        F.min("_rm").alias("min_ratio_milli"),
        F.max("_rm").alias("max_ratio_milli"),
        F.sum(
            (F.abs(F.col("_rm") - 1000) <= 200).cast("long")
        ).cast("long").alias("n_within_20pct"),
    )


# --- ranked-retrieval evaluation: NDCG -------------------------------


def ndcg_weights_micro(k: int) -> dict[int, int]:
    """Integer micro log-discount table w_i = round(1e6/log2(i+1)) —
    the ONE place floats touch NDCG; both engines consume the same
    literal table, so DCG sums are exact 64-bit integers."""
    import math

    return {i: round(1_000_000 / math.log2(i + 1)) for i in range(1, k + 1)}


def ndcg_at_k(approx: DataFrame, truth: DataFrame, k: int = 10) -> DataFrame:
    """NDCG@k of an approximate ranking against an exact one — the
    GRADED member of the retrieval-eval family (recall@k counts hits,
    MRR scores the first hit, NDCG scores the whole ranked list with
    position discounts: the metric that distinguishes 'found them
    all, in the wrong order' from 'nailed the head').

    Inputs are (query_id, nbr_id, rank) frames, rank 1-based; truth
    supplies graded relevance rel = k+1-rank (top truth hit worth k,
    the k-th worth 1; absent pairs worth 0). DCG_micro =
    Σ rel·w_rank over the approx list with the integer weight table
    above; IDCG is the same sum over a perfect ranking — a Python
    int constant. Per query: ndcg_milli = 1000·DCG div IDCG, plus
    the n_overlap witness. Everything after the rank windows is one
    ≤k-rows-per-query left join + a group-by: the eval costs nothing
    at any corpus size."""
    w = ndcg_weights_micro(k)
    idcg = sum((k + 1 - i) * w[i] for i in range(1, k + 1))
    wexpr = (
        "CASE rank "
        + " ".join(f"WHEN {i} THEN {v}" for i, v in w.items())
        + " ELSE 0 END"
    )
    t = truth.filter(F.col("rank") <= k).select(
        "query_id", "nbr_id",
        (F.lit(k + 1) - F.col("rank")).cast("long").alias("_rel"),
    )
    j = (
        approx.filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank")
        .join(t, ["query_id", "nbr_id"], "left")
        .select(
            "query_id",
            F.coalesce(F.col("_rel"), F.lit(0)).alias("_rel"),
            F.expr(wexpr).alias("_w"),
        )
    )
    return (
        j.groupBy("query_id")
        .agg(
            F.sum(F.col("_rel") * F.col("_w")).alias("_dcg"),
            F.sum((F.col("_rel") > 0).cast("long")).cast("long").alias(
                "n_overlap"
            ),
        )
        .select(
            "query_id",
            "n_overlap",
            F.expr(f"1000 * _dcg div {idcg}").alias("ndcg_milli"),
        )
    )


def remove_top_component(
    df: DataFrame,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int = 16,
) -> DataFrame:
    """All-but-the-top embedding post-processing (Mu & Viswanath
    2018): center the corpus and subtract each vector's projection
    onto the dominant direction — the cheap isotropy fix that
    measurably improves similarity tasks on anisotropic embedding
    spaces (the condition embed_top_component measures). Composes
    :func:`top_component` (integer-exact power iteration) with an
    integer projection: with centered c (micro) and component u
    (milli), num = Σc·u, den = Σu², c'_j = c_j − (num·u_j) div den —
    pure long arithmetic per row (|num·u| ≤ ~2.6e14), so the
    projected vectors are bit-identical cross-engine.

    Output (driver-hash discipline: scalars only): one row per
    (sampled id, dim) with the post-removal micro value, plus the
    vector's residual dot product with u — ≤ 64·1000 from truncation
    alone vs ~1e11 before removal: the witness that the direction
    is actually GONE rides in the hashed frame.

    Distributed shape: everything model-sized broadcasts (mean,
    component, den are 1-row frames); the projection is a narrow
    map; only the hash-sampled ids explode to rows."""
    from pyspark.sql.functions import broadcast

    dim = probe_dim(df, vec_col) or 0
    comp = top_component(df, iters, vec_col, id_col).selectExpr(
        "component_milli AS _u",
        "aggregate(zip_with(component_milli, component_milli,"
        " (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        " AS _den",
    )
    vm = df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("_v"))
    mean = vm.agg(
        F.expr("count(1) AS _n"),
        *[
            F.expr(f"sum(element_at(_v, {i + 1})) AS _s{i}")
            for i in range(dim)
        ],
    ).selectExpr(
        "array(" + ",".join(f"_s{i} div _n" for i in range(dim)) + ") AS _mu"
    )
    centered = vm.crossJoin(broadcast(mean)).select(
        id_col, F.expr("zip_with(_v, _mu, (a, b) -> a - b)").alias("_c")
    )
    proj = (
        centered.filter(F.col(id_col) % sample_mod == 0)
        .crossJoin(broadcast(comp))
        .withColumn(
            "_num",
            F.expr(
                "aggregate(zip_with(_c, _u, (a, b) -> a * b),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ),
        )
        .withColumn(
            "_p", F.expr("zip_with(_c, _u, (a, b) -> a - (_num * b) div _den)")
        )
        .withColumn(
            "resid_dot",
            F.expr(
                "aggregate(zip_with(_p, _u, (a, b) -> a * b),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x) div 1000"
            ),
        )
    )
    return proj.select(
        F.col(id_col), F.posexplode("_p").alias("dim", "value_micro"),
        "resid_dot",
    ).select(
        id_col,
        (F.col("dim") + 1).cast("long").alias("dim"),
        "value_micro",
        "resid_dot",
    )


# the 1-bit quantization rule both binary ops share: bit_i =
# [v_i > corpus mean_i] as the cross-multiplied integer comparison
# v_i * n > sum_i (no mean ever divides). Applied to a `_v` micro-vec
# column beside a broadcast (_n, _s) model row.
_BINARY_BITS_EXPR = (
    "zip_with(_v, _s, (x, s) ->"
    " CASE WHEN x * _n > s THEN CAST(1 AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END)"
)


def _binary_model(df: DataFrame, vec_col: str) -> DataFrame:
    """The corpus per-dim-sum model (one row: ``_n`` count, ``_s``
    per-dim sum array) that :func:`quantize_binary` and
    :func:`binary_topk` both quantize under — factored out (r12, the
    r11 advice) so binary_topk aggregates the corpus ONCE instead of
    re-deriving the same model for its query side."""
    dim = probe_dim(df, vec_col) or 0
    vm = df.select(micro_vec(F.col(vec_col)).alias("_v"))
    return vm.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        *[
            F.expr(f"CAST(sum(element_at(_v, {i + 1})) AS BIGINT) AS _s{i}")
            for i in range(dim)
        ],
    ).selectExpr(
        "_n",
        "array(" + ",".join(f"_s{i}" for i in range(dim)) + ") AS _s",
    )


def quantize_binary(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """1-bit-per-dimension BINARY quantization — the most aggressive
    rung of the quantization ladder (float32 -> int8 -> PQ -> this;
    64 dims collapse to 8 bytes): bit_i = [v_i > corpus mean_i],
    computed EXACTLY as the cross-multiplied integer comparison
    v_i * n > sum_i (no mean ever divides — the per-dim sums are the
    whole model). Returns (id, bits array<long> of 0/1, n_set).
    Scale: one per-dim-sum agg (1-row broadcast model) + a narrow
    map; the bit arrays are the stored artifact a vector store keeps
    in RAM for the Hamming pre-filter."""
    from pyspark.sql.functions import broadcast

    vm = df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("_v"))
    model = _binary_model(df, vec_col)
    return (
        vm.crossJoin(broadcast(model))
        .selectExpr(id_col, f"{_BINARY_BITS_EXPR} AS bits")
        .selectExpr(
            id_col,
            "bits",
            "CAST(aggregate(bits, CAST(0 AS BIGINT), (a, x) -> a + x)"
            " AS BIGINT) AS n_set",
        )
    )


def binary_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by HAMMING distance over the binary-quantized corpus —
    the search loop :func:`quantize_binary` exists for (the int8_topk
    discipline: what a deployment serves is search over the codes).
    Both sides quantize under the corpus per-dim-sum model; distance
    is the exact integer bit-disagreement count; ties break
    (hamming asc, nbr_id asc). Plan: 1-row model broadcast + narrow
    bit map, then the brute-force shape (queries broadcast, corpus
    unshuffled, per-query top-k window over narrow tuples). At scale
    the Hamming scan is the cheap pre-filter an exact rerank follows
    — ann_binary_recall measures exactly what that costs."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    # ONE corpus model aggregation (r12, the r11 advice: this used to
    # run the per-dim-sum agg twice — once inside quantize_binary for
    # the corpus side, once re-derived for the query side). The 1-row
    # model pins eagerly so both quantization branches read the same
    # computed row instead of re-executing the agg subtree.
    model = _binary_model(df, vec_col).localCheckpoint(eager=True)
    corpus = (
        df.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("_v"))
        .crossJoin(broadcast(model))
        .selectExpr(f"{id_col} AS nbr_id", f"{_BINARY_BITS_EXPR} AS _cb")
    )
    # queries quantize under the CORPUS model (df), not their own
    qb = (
        queries.select(F.col(id_col), micro_vec(F.col(vec_col)).alias("_v"))
        .crossJoin(broadcast(model))
        .selectExpr(f"{id_col} AS query_id", f"{_BINARY_BITS_EXPR} AS _qb")
    )
    hamming = F.expr(
        "CAST(aggregate(zip_with(_qb, _cb, (a, b) ->"
        " CASE WHEN a = b THEN CAST(0 AS BIGINT)"
        " ELSE CAST(1 AS BIGINT) END),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)"
    )
    scored = (
        corpus.crossJoin(broadcast(qb))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", hamming.alias("hamming"))
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "hamming", "rank")
    )
