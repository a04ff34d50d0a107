"""TPC-H power + throughput run: every one of the 22 adapted query
shapes timed at sf0.1 (median of 3, JIT-warmed at sf0.001) with the
classic geometric mean, then a THROUGHPUT test — N concurrent query
streams, each a different rotation of the 22, as concurrent action
threads sharing one session (the multi-tenant shape a shared cluster
actually runs; FIFO job scheduling still overlaps stages whenever
cores are free). Writes TPCH_POWER.md.

Not an audited TPC-H result (driver-schema adaptations, local[32],
derived data) — the point is one comparable whole-suite number per
round now that coverage is 22/22 (r6).

Usage: python tools/tpch_power.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


N_STREAMS = int(os.environ.get("SPARK_GRAFT_TPCH_STREAMS", "2"))


def main() -> None:
    from logprep_spark.plans import catalog
    from logprep_spark.session import get_spark

    spark = get_spark("logprep-spark-tpch-power")
    qs = catalog.queries()
    names = sorted(
        (n for n in qs if n.startswith("tpch_q")),
        key=lambda n: int(n.split("tpch_q")[1]),
    )
    assert len(names) == 22, names
    catalog.tables(spark, SF_DIR)
    for n in names:  # codegen warmup off the timed data
        qs[n](spark, WARM_DIR).write.format("noop").mode("overwrite").save()

    rows = []
    for n in names:
        ts = []
        for _ in range(3):
            t0 = time.time()
            qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        rows.append((n, round(sorted(ts)[1], 3)))

    geomean = round(math.exp(sum(math.log(t) for _, t in rows) / len(rows)), 3)
    total = round(sum(t for _, t in rows), 3)

    # throughput: N concurrent streams, each a rotation of the suite
    import threading

    def run_stream(offset: int) -> None:
        seq = names[offset:] + names[:offset]
        for n in seq:
            qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    threads = [
        threading.Thread(target=run_stream, args=(i * 7 % 22,))
        for i in range(N_STREAMS)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    tput_wall = round(time.time() - t0, 3)
    qph = round(N_STREAMS * 22 * 3600.0 / tput_wall, 1)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = [
        "# TPCH_POWER — full 22-query power run",
        "",
        f"sf dir: `{SF_DIR}` on local[32]; per-query MEDIAN of 3 after",
        "sf0.001 codegen warmup. Driver-schema adaptations (no partsupp /",
        "shipmode — see catalog.py docstrings); not an audited TPC-H result.",
        "",
        "| query | median s |",
        "|---|---:|",
        *[f"| {n} | {t} |" for n, t in rows],
        "",
        f"**geomean {geomean} s · total {total} s · 22/22 queries**",
        "",
        f"Throughput: {N_STREAMS} concurrent streams (each a",
        f"rotation of the 22) finished in **{tput_wall} s** = **{qph}",
        "queries/hour** on local[32].",
    ]
    with open(os.path.join(root, "TPCH_POWER.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"geomean {geomean} total {total} tput_wall {tput_wall} qph {qph}")


if __name__ == "__main__":
    main()
