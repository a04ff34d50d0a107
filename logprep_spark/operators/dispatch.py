"""Many-rules dispatch — the reference ``framework/rule_tree/``
re-expressed for Catalyst (r13 verdict ask #1).

Why the reference grew a rule tree (rule_tree.py:59): evaluating every
rule's filter per event dies at production rule counts — SIEM
deployments run hundreds-to-thousands of sigma rules per processor.
Its answer is a shared-predicate dispatch tree walked once per event
(``get_matching_rules``), with matching computed ONCE against the
event state at processor entry (abc/processor.py:213
``_process_rule_tree_once``), then the matching rules applied in
order.

The Spark failure mode is different and WORSE than per-row cost — it
is per-PLAN, and we measured it (tools/rule_scale_probe.py):

* ``Processor.transform`` chains staged-cond ``withColumn`` +
  ``apply_rule`` + ``drop`` per rule: ~3N plan nodes. Build/analyze
  cost is linear and survivable to hundreds of rules…
* …but any DOWNSTREAM FILTER on a rule-written column is pushed down
  through the chain by Catalyst, substituting each projection's
  expression into the predicate. A rule whose write references the
  previous value k times (array unions reference it ~3×; nested
  struct rebuilds ~8×) makes the substituted predicate grow ~k^N:
  measured 16 s at SIX labeler rules and unrunnable (>450 s) at
  eight, on 6,000 rows. Not an efficiency gap — a cliff.

The cure is structural, and it is exactly the rule tree's semantics:

1. **Match once** (:func:`stage_conditions`): compile every rule's
   filter against the INPUT frame and stage all N verdicts as one
   flat ``array<boolean>`` column — ONE projection, N independent
   expressions, no chaining. This is ``get_matching_rules`` as a
   projection; sharing of common sub-predicates across rules is
   Catalyst subexpression elimination's job (the tree's shared-prefix
   trick, done by the compiler instead of a hand-built trie).
2. **Apply flat**: per-rule contributions are expressions of the
   input + the staged verdict array only — never of each other — so
   predicate substitution bottoms out after one hop. Same-target
   rule families (labels, tags, detections) merge all contributions
   in ONE write per target (:func:`labeler_bulk`), or dispatch the
   payload through a broadcast join (:func:`pre_detector_alerts` —
   one scan + one broadcast hash join replaces the naive N-scan
   union).

Semantics scope, stated: match-once equals the sequential path
whenever no rule's filter reads a field the SAME processor writes —
the reference accepts the identical divergence between its rule-tree
path and its ``_bypass_rule_tree`` sequential path. The labeler and
pre_detector families never self-read, so their bulk paths are exact.

Scale: the staged projection is O(N) flat expressions inside
whole-stage codegen (Spark splits generated code across methods —
flat is fine, nested is fatal); the payload join broadcasts an N-row
rule table. 1000 rules is a wide-but-shallow plan: measured in
tests/unit/test_rule_dispatch.py (600 rules compile + plan in
seconds, plan nodes bounded by a constant, downstream filters safe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld

#: staged verdict-array column name
COND_COL = "__rule_conds__"


def stage_conditions(
    processor, df: DataFrame, col_name: str = COND_COL
) -> DataFrame:
    """Compile every rule's filter against the INPUT frame and stage
    the N verdicts as one ``array<boolean>`` column — the reference's
    match-once ``get_matching_rules`` as a single flat projection.
    Null verdicts (missing fields) coalesce to False, the staged-cond
    convention of ``Processor.transform``."""
    conds = [
        F.coalesce(processor.condition(df, rule), F.lit(False))
        for rule in processor.rules
    ]
    return df.withColumn(col_name, F.array(*conds))


def matched_ids(n_rules: int, col_name: str = COND_COL) -> Column:
    """``array<int>`` of matching rule indices from the staged verdict
    array — ``zip_with`` the verdicts against their positions, then
    compact. Flat; no per-rule plan nodes."""
    idx = F.array(*[F.lit(i) for i in range(n_rules)])
    return F.array_compact(
        F.zip_with(
            F.col(col_name), idx, lambda c, i: F.when(c, i)
        )
    )


def transform_once(processor, df: DataFrame) -> DataFrame:
    """Generic match-once transform: stage all conditions in ONE
    projection, then run each rule's ``apply_rule`` against its staged
    verdict. Mirrors reference ``_process_rule_tree_once``: conditions
    see the processor-entry state, mutations apply in rule order.

    vs ``Processor.transform`` this removes the per-rule cond
    staging/drop (3 plan ops → 1) and — because every verdict is a
    bare column reference, not an expression of earlier rules'
    writes — keeps downstream predicate substitution from compounding
    through the condition logic. Rules that write the SAME field
    still chain their writes; use a family bulk path
    (:func:`labeler_bulk`, :func:`pre_detector_alerts`) for
    same-target corpora."""
    staged = stage_conditions(processor, df)
    for i, rule in enumerate(processor.rules):
        processor._current_rule = rule
        staged = processor.apply_rule(
            staged, F.col(COND_COL)[i], rule.config
        )
    return staged.drop(COND_COL)


def labeler_bulk(labeler, df: DataFrame) -> DataFrame:
    """All N labeler rules in ONE write per category — the dispatch
    path for the verdict's 1000-rule sigma deployment.

    Per category, rule payloads live in a literal ``array<array
    <string>>`` indexed by rule position; the event's additions are
    ``flatten(zip_with(payloads, verdicts, keep-if-matched))`` — an
    expression of the staged verdict array and constants only, so the
    category column is written ONCE however many rules exist, and a
    downstream filter substitutes through exactly one projection.
    Matches the sequential path bit-for-bit on non-self-reading rules
    (every label write is a sorted-distinct union — order-insensitive,
    so one merged union equals N chained unions;
    tests/unit/test_rule_dispatch.py asserts the equality witness)."""
    from pyspark.sql import types as T

    n = len(labeler.rules)
    if not n:
        return df
    staged = stage_conditions(labeler, df)
    # category -> {rule index -> sorted label values}
    cats: dict[str, dict[int, list[str]]] = {}
    for i, rule in enumerate(labeler.rules):
        for cat, values in rule.config.get("label", {}).items():
            cats.setdefault(cat, {})[i] = sorted(values)

    top_type = fld.field_type(staged.schema, "label")
    existing_struct = isinstance(top_type, T.StructType)
    base = (
        F.coalesce(F.col("label"), fld._null_struct(top_type))
        if existing_struct
        else None
    )

    values: dict[str, Column] = {}
    any_add = F.lit(False)
    for cat, idx_map in sorted(cats.items()):
        payload = F.array(
            *[
                F.array(*[F.lit(v) for v in idx_map.get(i, [])])
                for i in range(n)
            ]
        )
        adds = F.flatten(
            F.zip_with(
                payload,
                F.col(COND_COL),
                lambda p, c: F.when(c, p).otherwise(F.array()),
            )
        )
        existing = (
            base.getField(cat)
            if existing_struct and fld.has_field(top_type, cat)
            else None
        )
        if existing is None:
            value = F.when(
                F.size(adds) > 0, F.array_sort(F.array_distinct(adds))
            )
        else:
            value = F.when(
                F.size(adds) > 0,
                F.array_sort(
                    F.array_distinct(
                        F.concat(F.coalesce(existing, F.array()), adds)
                    )
                ),
            ).otherwise(existing)
        values[cat] = value
        any_add = any_add | (F.size(adds) > 0)

    # ONE write builds the whole container: chained withField over a
    # single coalesced base (one reference to col('label') however
    # many categories), mirroring fields.set_field's null model —
    # container non-null iff it was non-null or something was written
    if existing_struct:
        updated = base
        for cat, value in values.items():
            updated = updated.withField(cat, value)
        guarded = F.when(F.col("label").isNotNull() | any_add, updated)
        staged = staged.withColumn("label", guarded)
    else:
        fresh = F.when(
            any_add,
            F.struct(*[v.alias(cat) for cat, v in values.items()]),
        )
        staged = staged.withColumn("label", fresh)
    return staged.drop(COND_COL)


def pre_detector_alerts(
    pre_detector, df: DataFrame, timestamp_field: str = "@timestamp"
) -> DataFrame:
    """All N pre_detector rules' alert side-outputs in ONE scan — the
    dispatch rewrite of ``PreDetector.detections`` (whose naive form
    unions N filtered projections: N FileScans of the input, a
    1000-branch plan at SIEM rule counts).

    Shape: match-once staging → ``explode(matched_ids)`` (events
    matching no rule vanish with their empty array; an event matching
    k rules emits k alert rows, the naive union's semantics) → one
    BROADCAST hash join against the N-row rule-payload table — the
    rule tree as a dispatch TABLE, the generic_resolver/
    list_comparison map shape the verdict prescribes. Per-rule
    event-field copies (ip_fields / copy_fields_to_detection_event)
    become per-OUTPUT-column conditionals over the handful of rules
    that define each column — flat in the rule count.

    Column parity with ``detections``: same names; ``mitre`` is an
    empty array (never null) for rules without it, matching the
    naive path's ``F.array()`` literal."""
    rules = pre_detector.rules
    if not rules:
        raise ValueError("pre_detector has no rules")
    spark = df.sparkSession
    staged = stage_conditions(pre_detector, df)
    exploded = staged.withColumn(
        "_ri", F.explode(matched_ids(len(rules)))
    ).drop(COND_COL)

    payload_rows = []
    for i, rule in enumerate(rules):
        cfg = rule.config
        payload_rows.append(
            (
                i,
                str(cfg.get("id", "")),
                str(cfg.get("title", "")),
                str(cfg.get("severity", "")),
                str(cfg.get("case_condition", "directly")),
                [str(m) for m in cfg.get("mitre", [])],
                str(cfg["link"]) if cfg.get("link") else None,
            )
        )
    payload = spark.createDataFrame(
        payload_rows,
        "_ri int, rule_id string, title string, severity string,"
        " case_condition string, mitre array<string>, link string",
    )
    joined = exploded.join(F.broadcast(payload), "_ri")

    ids = [fld.get_field(joined, f) for f in pre_detector.id_fields]
    ids = [c.cast("string") for c in ids if c is not None]
    cols = [
        F.sha2(
            F.concat_ws("|", F.col("rule_id"), *ids), 256
        ).alias("pre_detection_id"),
        F.col("rule_id"),
        F.col("title"),
        F.col("severity"),
        F.col("case_condition"),
        F.col("mitre"),
    ]
    if any(r.config.get("link") for r in rules):
        cols.append(F.col("link"))
    ts = fld.get_field(joined, timestamp_field)
    if ts is not None:
        cols.append(ts.cast("string").alias("@timestamp"))
    # per-output-column source maps: det_field -> {rule idx -> source
    # Column}; each renders as a flat conditional over the few rules
    # that define it (null for the rest — unionByName semantics)
    out_fields: dict[str, dict[int, Column]] = {}
    for i, rule in enumerate(rules):
        cfg = rule.config
        for host_field in cfg.get("ip_fields", []):
            col = fld.get_field(joined, host_field)
            if col is not None:
                out_fields.setdefault(
                    host_field.replace(".", "_"), {}
                )[i] = col
        for src_field, det_field in (
            cfg.get("copy_fields_to_detection_event") or {}
        ).items():
            col = fld.get_field(joined, src_field)
            if col is not None:
                out_fields.setdefault(det_field, {})[i] = col
    for det_field, by_rule in out_fields.items():
        expr = None
        for i, col in by_rule.items():
            expr = (
                F.when(F.col("_ri") == i, col)
                if expr is None
                else expr.when(F.col("_ri") == i, col)
            )
        cols.append(expr.alias(det_field))
    return joined.select(*cols)


def transform_fixpoint(processor, df: DataFrame, max_rounds: int = 4):
    """Reference ``apply_multiple_times`` semantics
    (abc/processor.py:203 ``_process_rule_tree_multiple_times``):
    match against the CURRENT event state, apply the matching rules
    in order, then RE-match — a rule whose filter only becomes true
    after another rule's write fires in a later round — until no rule
    newly matches (each rule applies at most once per event, the
    reference's ``applied_rules`` set).

    Spark realization: the applied set is an ``array<boolean>``
    column; each round stages fresh verdicts ``cond AND NOT applied``
    in ONE flat projection (the match-once discipline per round),
    applies the newly-matching rules, folds them into the applied
    array, and localCheckpoints — the per-round lineage cut of every
    iterative operator here (dup_clusters, pagerank). Convergence is
    a bounded driver-side ANY-aggregate per round; ``max_rounds``
    caps the walk (the reference can loop forever on a rule that
    keeps re-matching — the cap is the distributed-safety addition,
    and hitting it raises so a cyclic corpus is a loud error, not a
    silent partial application).

    Returns the transformed frame."""
    n = len(processor.rules)
    if not n:
        return df
    applied_col = "__rules_applied__"
    fresh_col = "__rules_fresh__"
    out = df.withColumn(
        applied_col, F.array(*[F.lit(False)] * n)
    )
    for _ in range(max_rounds):
        conds = [
            F.coalesce(processor.condition(out, rule), F.lit(False))
            for rule in processor.rules
        ]
        out = out.withColumn(
            fresh_col,
            F.zip_with(
                F.array(*conds),
                F.col(applied_col),
                lambda c, a: c & ~a,
            ),
        )
        any_fresh = out.agg(
            F.max(F.exists(fresh_col, lambda x: x)).alias("f")
        ).first()["f"]
        if not any_fresh:
            return out.drop(applied_col, fresh_col)
        for i, rule in enumerate(processor.rules):
            processor._current_rule = rule
            out = processor.apply_rule(
                out, F.col(fresh_col)[i], rule.config
            )
        out = out.withColumn(
            applied_col,
            F.zip_with(
                F.col(applied_col), F.col(fresh_col), lambda a, f: a | f
            ),
        ).drop(fresh_col).localCheckpoint(eager=True)
    # one final match to certify convergence at the cap
    conds = [
        F.coalesce(processor.condition(out, rule), F.lit(False))
        for rule in processor.rules
    ]
    leftovers = out.withColumn(
        fresh_col,
        F.zip_with(
            F.array(*conds), F.col(applied_col), lambda c, a: c & ~a
        ),
    )
    if leftovers.agg(
        F.max(F.exists(fresh_col, lambda x: x)).alias("f")
    ).first()["f"]:
        raise RuntimeError(
            f"transform_fixpoint: rules still matching after "
            f"{max_rounds} rounds — cyclic rule corpus?"
        )
    return out.drop(applied_col)
