"""Measure the many-rules plan blowup (r13 verdict ask #1 — the
reference ``framework/rule_tree/`` gap).

Logprep grew a shared-predicate dispatch tree (rule_tree.py:59)
because evaluating every rule's filter per event dies at production
rule counts (SIEM deployments run hundreds-to-thousands of sigma
rules). The Spark re-expression moves that cost from per-ROW to
per-PLAN: ``Processor.transform`` chains a staged-cond withColumn +
apply_rule + drop per rule, so N rules compile a ~3N-stage plan
prefix and Catalyst analysis/codegen pays superlinearly.

This probe MEASURES that curve — construction (Python plan build),
analysis+optimization+codegen (executedPlan force), plan size (node
lines), and execution on real data — for the naive sequential path
and the dispatch path (operators/dispatch.py), at growing rule
counts.

Usage: python tools/rule_scale_probe.py [naive|dispatch|both] [counts...]
Emits one JSON line per (path, n_rules).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

EVENT_TYPES = [
    "click", "view", "purchase", "signup", "error",
    "login", "logout", "search",
]


def make_rules(n: int) -> list[dict]:
    """n sigma-style labeler rules over the events table: every rule
    is a conjunction of a low-cardinality equality (the shared
    predicate a rule tree would hoist) and a narrower range/equality —
    the shape of a real SIEM corpus (many rules share
    ``winlog.event_id: X`` and differ in the tail)."""
    rules = []
    for i in range(n):
        et = EVENT_TYPES[i % len(EVENT_TYPES)]
        lo = (i * 37) % 900
        hi = lo + 60 + (i % 40)
        rules.append(
            {
                "filter": f"event_type:{et} AND user_id:[{lo} TO {hi}]",
                "labeler": {"label": {"action": [f"L{i:04d}"]}},
            }
        )
    return rules


def plan_stats(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = [l for l in plan.split("\n") if l.strip()]
    depth = max(
        (len(l) - len(l.lstrip(" +-:*()0123456789"))) for l in lines
    ) if lines else 0
    return {"plan_nodes": len(lines), "plan_chars": len(plan), "indent": depth}


def probe(path: str, n: int, spark, events) -> dict:
    from logprep_spark.operators import Labeler

    rules = make_rules(n)
    t0 = time.perf_counter()
    proc = Labeler(rules=rules)
    if path == "naive":
        out = proc.transform(events)
    else:
        out = proc.transform_bulk(events)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    out._jdf.queryExecution().executedPlan()  # force analyze+optimize+plan
    t_analyze = time.perf_counter() - t0

    stats = plan_stats(out)

    t0 = time.perf_counter()
    n_labeled = out.where("label is not null").count()  # force codegen+run
    t_exec = time.perf_counter() - t0
    return {
        "path": path,
        "n_rules": n,
        "build_s": round(t_build, 3),
        "analyze_s": round(t_analyze, 3),
        "exec_s": round(t_exec, 3),
        "labeled_rows": n_labeled,
        **stats,
    }


def main():
    args = sys.argv[1:]
    mode = args[0] if args and args[0] in ("naive", "dispatch", "both") else "both"
    counts = [int(a) for a in args[1:] if a.isdigit()] or [50, 100, 200, 400]

    from logprep_spark.session import get_spark

    spark = get_spark("rule-scale-probe")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    paths = ["naive", "dispatch"] if mode == "both" else [mode]
    for n in counts:
        for path in paths:
            print(json.dumps(probe(path, n, spark, events)), flush=True)


if __name__ == "__main__":
    main()
