"""Generate docs/QUERIES.md — one line per catalog query: name, gate
(sql-oracle / rows-only), and the first sentence of its docstring (or
of its plan function's module object). Keeps the 192-query catalog
navigable for reviewers without opening catalog.py.

Usage: python tools/gen_query_index.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".) ", ": "):
        idx = text.find(stop)
        if 0 < idx < 220:
            return text[: idx + 1]
    return text[:220]


def main() -> None:
    from logprep_spark.plans import catalog

    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    lines = [
        "# Query catalog index",
        "",
        f"{len(qs)} queries; `sql` = DuckDB-oracle hash-gated, `rows` ="
        " rows-only (engine-specific output, bounds in pytest).",
        "",
        "| query | gate | what |",
        "|---|---|---|",
    ]
    for name in sorted(qs):
        gate = "sql" if name in oracles else "rows"
        desc = first_sentence(qs[name].__doc__).replace("|", "\\|")
        lines.append(f"| `{name}` | {gate} | {desc} |")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, "docs"), exist_ok=True)
    with open(os.path.join(root, "docs", "QUERIES.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote docs/QUERIES.md ({len(qs)} rows)")


if __name__ == "__main__":
    main()
