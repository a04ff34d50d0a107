"""Snapshot canonicalized physical plans for every headline query.

The r5→r6 bench-drift forensics (BENCH_FORENSICS_r6.md) needed git
worktrees at old commits to prove plans hadn't changed; committing the
canonicalized plan text per round makes the next drift question a
`git diff PLANS/` instead. Expression ids (`#N`) and plan ids are
normalized so the diff is structural.

Usage: python tools/save_plans.py   # writes PLANS/<query>.txt
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def canonicalize(plan: str) -> str:
    plan = re.sub(r"#\d+L?", "#X", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"\[id=#\d+\]", "[id=#N]", plan)
    return plan


def main() -> None:
    import bench
    from logprep_spark.plans import catalog
    from logprep_spark.session import get_spark

    spark = get_spark("save-plans")
    qs = catalog.queries()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "PLANS")
    os.makedirs(out_dir, exist_ok=True)
    tpch = sorted(
        (n for n in qs if n.startswith("tpch_q")),
        key=lambda n: int(n.split("tpch_q")[1]),
    )
    names = list(dict.fromkeys([*bench.HEADLINE, *tpch]))
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(canonicalize(plan))
        print(f"wrote PLANS/{name}.txt")


if __name__ == "__main__":
    main()
