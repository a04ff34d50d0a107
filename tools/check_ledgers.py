"""Ledger-count gate (r12 verdict ask #1: "a tools/ check that fails
when len(catalog.queries()) != the ledger counts would end the
class"): the committed evidence ledgers must describe the CURRENT
catalog. Run before committing any catalog change; the full-suite
pytest also runs it, so a stale ledger fails the tree.

Checks:
  * LOCAL_CORRECTNESS.md — its table must carry exactly one row per
    catalog query (same names, no extras/missing) and its header
    count must match;
  * PLANS/LINT.txt — its trailing "# N plan(s) linted" must say N =
    len(catalog.queries()) and report 0 errors.

Exit 0 clean, 1 with a named diff otherwise.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check(root: str | None = None) -> list[str]:
    from logprep_spark.plans import catalog

    root = root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    names = set(catalog.queries())
    problems: list[str] = []

    lc = os.path.join(root, "LOCAL_CORRECTNESS.md")
    with open(lc) as f:
        text = f.read()
    rows = dict(re.findall(r"^\| (\S+) \| (\S+) \|", text, re.M))
    missing = sorted(names - set(rows))
    extra = sorted(set(rows) - names - {"query"})
    if missing:
        problems.append(
            f"LOCAL_CORRECTNESS.md missing {len(missing)} catalog "
            f"queries (stale sweep): {missing[:6]}..."
        )
    if extra:
        problems.append(
            f"LOCAL_CORRECTNESS.md has {len(extra)} rows for queries "
            f"no longer in the catalog: {extra[:6]}..."
        )
    m = re.search(r"out of (\d+) queries", text)
    if not m or int(m.group(1)) != len(names):
        problems.append(
            f"LOCAL_CORRECTNESS.md header says {m.group(1) if m else '?'} "
            f"queries; catalog has {len(names)}"
        )
    fails = [n for n, st in rows.items() if st == "FAIL"]
    if fails:
        problems.append(f"LOCAL_CORRECTNESS.md records FAILs: {fails}")

    lint = os.path.join(root, "PLANS", "LINT.txt")
    with open(lint) as f:
        tail = f.read().strip().splitlines()[-1]
    m = re.search(r"# (\d+) plan\(s\) linted, (\d+) errors", tail)
    if not m:
        problems.append(f"PLANS/LINT.txt has no count line (got {tail!r})")
    else:
        if int(m.group(1)) != len(names):
            problems.append(
                f"PLANS/LINT.txt says {m.group(1)} plans linted; "
                f"catalog has {len(names)}"
            )
        if int(m.group(2)) != 0:
            problems.append(f"PLANS/LINT.txt records {m.group(2)} errors")
    return problems


def main() -> int:
    problems = check()
    for p in problems:
        print(f"STALE-LEDGER: {p}")
    if not problems:
        from logprep_spark.plans import catalog

        print(
            f"ledgers current: {len(catalog.queries())} catalog queries "
            "== sweep rows == linted plans, 0 FAIL, 0 lint errors"
        )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
