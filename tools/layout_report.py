"""Clustering-health report for a parquet dataset: per column, how
tightly row groups are clustered, measured straight from the footer
min/max stats — the number that predicts multi-dimensional pruning
before you run a single query (companion to functions/layout.py).

Per column: span_ratio = mean over row groups of
(group_max − group_min) / (global_max − global_min). 1.0 = every
group spans the whole domain (a point predicate touches EVERY group);
1/n_groups = perfectly clustered. Z-order/Hilbert layouts push the
ratio down on ALL interleaved columns at once.

Usage: python tools/layout_report.py <parquet_dir_or_file> col [col...]
"""

from __future__ import annotations

import glob
import os
import sys


def span_ratios(path: str, cols: list[str]) -> dict[str, tuple[float, int]]:
    import pyarrow.parquet as pq

    files = (
        [path]
        if os.path.isfile(path)
        else sorted(glob.glob(os.path.join(path, "*.parquet")))
    )
    stats: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(len(md.schema))}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in cols:
                s = g.column(names[c]).statistics
                if s is None or s.min is None:
                    continue
                stats[c].append((float(s.min), float(s.max)))
    out = {}
    for c, spans in stats.items():
        if not spans:
            out[c] = (float("nan"), 0)
            continue
        lo = min(s[0] for s in spans)
        hi = max(s[1] for s in spans)
        width = (hi - lo) or 1.0
        out[c] = (
            sum((s[1] - s[0]) / width for s in spans) / len(spans),
            len(spans),
        )
    return out


def main() -> None:
    path, cols = sys.argv[1], sys.argv[2:]
    for c, (ratio, n) in span_ratios(path, cols).items():
        print(f"{c}\tspan_ratio={ratio:.3f}\trow_groups={n}")


if __name__ == "__main__":
    main()
