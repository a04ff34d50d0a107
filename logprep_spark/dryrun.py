"""Rule dry-run + auto rule testing — the pre-deployment workflow.

Reference parity: /root/reference/logprep/util/rule_dry_runner.py (run
a config against sample events, show what changed) and
/root/reference/logprep/util/auto_rule_tester/ (rule files carry
``tests:`` specs of raw input and expected processed output; every rule
is checked before deployment).

Spark realization: the dry-run diff is computed column-wise on the
cluster — a row id is attached up front, the pipeline (a narrow
projection chain) carries it through, and one join brings the before
image next to the after image; each differing field explodes into a
(row_id, field, before, after) row. No collect of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dry_run(transformer, df: DataFrame) -> DataFrame:
    """Diff a processor/pipeline/config against a sample DataFrame.

    Returns (row_id, field, before, after) for every top-level field a
    rule changed, added, or dropped; values are JSON-encoded so nested
    structs diff cleanly. ``transformer`` is anything with
    ``.transform(df)`` (Processor, Pipeline, PipelineConfig).
    """
    src = df.withColumn("_row_id", F.monotonically_increasing_id())
    out = transformer.transform(src)
    before_cols = [c for c in src.columns if c != "_row_id"]
    after_cols = [c for c in out.columns if c != "_row_id"]
    all_cols = sorted(set(before_cols) | set(after_cols))

    before = src.select(
        "_row_id", *[F.to_json(F.struct(F.col(c).alias("v"))).alias(f"_b_{c}") for c in before_cols]
    )
    after = out.select(
        "_row_id", *[F.to_json(F.struct(F.col(c).alias("v"))).alias(f"_a_{c}") for c in after_cols]
    )
    joined = before.join(after, "_row_id")

    entries = [
        F.struct(
            F.lit(c).alias("field"),
            (F.col(f"_b_{c}") if c in before_cols else F.lit(None)).alias("before"),
            (F.col(f"_a_{c}") if c in after_cols else F.lit(None)).alias("after"),
        )
        for c in all_cols
    ]
    return (
        joined.select("_row_id", F.explode(F.array(*entries)).alias("d"))
        .filter(~F.col("d.before").eqNullSafe(F.col("d.after")))
        .select(
            F.col("_row_id").alias("row_id"),
            F.col("d.field").alias("field"),
            F.col("d.before").alias("before"),
            F.col("d.after").alias("after"),
        )
    )


def auto_test(processor_cls, rules: list[dict], spark) -> list[dict]:
    """Run the ``tests:`` specs embedded in rule dicts (reference
    auto_rule_tester format: each test has ``raw`` input fields and the
    expected ``processed`` event). Returns one result dict per test:
    ``{rule_index, test_index, passed, diff}``.

    Driver-side by design: rule tests are a handful of synthetic
    events; building one-row DataFrames keeps the exact same plan path
    the production pipeline uses.
    """
    results: list[dict] = []
    for rule_idx, rule in enumerate(rules):
        for test_idx, spec in enumerate(rule.get("tests", []) or []):
            raw, expected = spec.get("raw", {}), spec.get("processed", {})
            proc = processor_cls([{k: v for k, v in rule.items() if k != "tests"}])
            df = spark.createDataFrame([raw])
            got = {
                k: v
                for k, v in proc.transform(df).first().asDict(recursive=True).items()
                if k in expected
            }
            diff = {
                k: {"expected": expected[k], "got": got.get(k)}
                for k in expected
                if got.get(k) != expected[k]
            }
            results.append(
                {
                    "rule_index": rule_idx,
                    "test_index": test_idx,
                    "passed": not diff,
                    "diff": diff,
                }
            )
    return results
