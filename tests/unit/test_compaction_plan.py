"""FFD compaction planner: packing invariants + a real-dir smoke."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tools"))

from compaction_plan import ffd_pack, plan  # noqa: E402


def test_ffd_invariants():
    sizes = [700, 300, 300, 200, 200, 100, 50, 50, 1200]
    target = 1000
    bins = ffd_pack(sizes, target)
    flat = sorted(i for b in bins for i in b)
    assert flat == list(range(len(sizes)))            # partition, no loss
    for b in bins:
        total = sum(sizes[i] for i in b)
        if len(b) > 1:
            assert total <= target                    # capacity respected
    # the oversized 1200 file sits alone
    (big,) = [b for b in bins if 8 in b]
    assert big == [8]
    # FFD packs this instance tightly: 700+300, 300+200+200+100+50+50+... 
    assert len(bins) <= 4


def test_ffd_all_tiny_collapses():
    bins = ffd_pack([10] * 100, 1000)
    assert len(bins) == 1
    assert sum(1 for _ in bins[0]) == 100


def test_plan_on_real_dataset(tmp_path):
    # fabricate a small-files directory
    for i in range(20):
        (tmp_path / f"part-{i:05d}.parquet").write_bytes(b"x" * (1000 + i))
    out = plan(str(tmp_path), target_bytes=10_000)
    assert out["files"] == 20
    assert out["bins"] < 20                            # compaction happens
    assert out["small_files"] == 20
    assert sum(len(b["paths"]) for b in out["bins_detail"]) == 20
