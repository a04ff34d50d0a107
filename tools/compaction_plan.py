"""Small-files compaction planner for a parquet dataset.

The silent killer at 100 TB isn't one big query — it's a landing zone
of 4 KB files: every scan pays per-file open/footer costs, the driver
pays per-file listing, and row-group pruning has nothing to prune.
This tool reads ACTUAL file sizes (no data read) and emits a
first-fit-decreasing bin packing into target-size output files — the
plan `spark.read.parquet(paths).repartition(n).write` executes, one
bin per output file.

FFD is the classic 11/9·OPT+1 guarantee (Johnson 1973): sort
descending, place each file into the first bin it fits; oversized
files get a bin of their own (they are already healthy).

Usage: python tools/compaction_plan.py <dir> [target_mb]
Prints one JSON line: {"files": N, "bins": M, "target_bytes": T,
"small_files": S, "bins_detail": [...]} — M is the post-compaction
file count.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def ffd_pack(sizes: list[int], target: int) -> list[list[int]]:
    """First-fit-decreasing bin packing of ``sizes`` (bytes) into
    bins of capacity ``target``. Returns bins as lists of INDICES
    into the input list (order-stable for the caller's path lookup).
    Items >= target get singleton bins — they're already at or above
    the healthy size and must not absorb siblings."""
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    bins: list[list[int]] = []
    room: list[int] = []
    for i in order:
        s = sizes[i]
        if s >= target:
            bins.append([i])
            room.append(0)
            continue
        for b, r in enumerate(room):
            if r >= s:
                bins[b].append(i)
                room[b] = r - s
                break
        else:
            bins.append([i])
            room.append(target - s)
    return bins


def plan(path: str, target_bytes: int) -> dict:
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    sizes = [os.path.getsize(f) for f in files]
    bins = ffd_pack(sizes, target_bytes)
    small = sum(1 for s in sizes if s < target_bytes // 4)
    return {
        "files": len(files),
        "bins": len(bins),
        "target_bytes": target_bytes,
        "small_files": small,
        "bins_detail": [
            {
                "paths": [os.path.basename(files[i]) for i in b],
                "bytes": sum(sizes[i] for i in b),
            }
            for b in bins
        ],
    }


def main() -> None:
    path = sys.argv[1]
    target_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(json.dumps(plan(path, target_mb * 1024 * 1024)))


if __name__ == "__main__":
    main()
