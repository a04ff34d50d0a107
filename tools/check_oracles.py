"""Local replica of the driver's t2 correctness gate: run every
catalog query on Spark AND its DuckDB oracle at sf0.01; compare row
count, sorted column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(value) -> str:
    if value is None:
        return "∅"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        # cross-engine float text: 17 sig digits round-trip
        return repr(value)
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(canon(v) for v in value) + "]"
    if isinstance(value, dict):
        return "{" + ",".join(f"{k}:{canon(v)}" for k, v in sorted(value.items())) + "}"
    if isinstance(value, bytes):
        return value.hex()
    return str(value)


def frame_hash(columns, rows) -> tuple[int, str, str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), ",".join(sorted(columns)), digest


def main():
    only = set(sys.argv[1:])
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    import duckdb

    from logprep_spark.plans import catalog
    from logprep_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows={len(srows)} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            orows = [tuple(r) for r in rel.fetchall()]
            ocols = [d[0] for d in rel.description]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        sh = frame_hash(scols, srows)
        oh = frame_hash(ocols, orows)
        status = "PASS" if sh == oh else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status}  {name}: spark={sh} duck={oh} [{time.time()-t0:.1f}s]")
        if status == "FAIL" and len(srows) < 30 and len(orows) < 30:
            print("   spark:", sorted(srows)[:8])
            print("   duck :", sorted(orows)[:8])
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
