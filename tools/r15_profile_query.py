"""r15 measurement harness: decompose a catalog query's bench cost
into CONSTRUCTION (plan build, driver-side) vs EXECUTION (noop sink),
iteration by iteration, in a fresh session — the bench times
construct+execute fused, so regressions need this split to attribute.

Usage: python tools/r15_profile_query.py <query> [--n 3] [--profile]
  --profile  cProfile the FIRST construction, print top py4j/analysis
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n = int(args[args.index("--n") + 1]) if "--n" in args else 3
    if "--n" in args:
        i = args.index("--n")
        args = args[:i] + args[i + 2 :]
    do_profile = "--profile" in args
    names = [a for a in args if not a.startswith("--")]

    from logprep_spark.plans import catalog
    from logprep_spark.session import get_spark

    spark = get_spark("logprep-spark-r15-profile")
    qs = catalog.queries()
    catalog.tables(spark, SF_DIR)

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        for it in range(n):
            if do_profile and it == 0:
                import cProfile
                import pstats

                pr = cProfile.Profile()
                pr.enable()
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                t1 = time.time()
                pr.disable()
                stats = pstats.Stats(pr)
                stats.sort_stats("cumulative")
                print(f"--- cProfile of {name} construction ---")
                stats.print_stats(18)
            else:
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            print(
                f"{name} iter{it}: construct {t1 - t0:.3f}s "
                f"execute {t2 - t1:.3f}s total {t2 - t0:.3f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
