"""Probe: first_fit_packing placement cost per stream (r15 VERDICT
item 4).  Times the EXACT per-stream placement loop first_fit_packing
runs inside applyInPandas — (n DESC, id ASC) sort then leftmost-fit via
_LeftmostFitTree — against the r15 linear scan, at growing docs-per-
stream, on a deterministic synthetic length distribution (uniform
1..budget/4, the many-small-docs shape that maximizes bins and was the
r15 O(docs*bins) blow-up).  Results go to SCALE.md.

Run: python scripts/probe_ffd_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from arcane_stream_parquet_spark.operators.packing import _LeftmostFitTree

BUDGET = 2048


def det_lengths(n: int) -> list[int]:
    # deterministic LCG, uniform-ish in 1..budget/4 — small docs, many
    # bins per stream (the adversarial shape for the linear scan)
    out, x = [], 123456789
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(1 + x % (BUDGET // 4))
    return out


def tree_pack(lengths: list[int]) -> int:
    tree = _LeftmostFitTree()
    fills: list[int] = []
    for nt in lengths:
        bi = tree.find(nt)
        if bi >= 0:
            fills[bi] += nt
            tree.place(bi, BUDGET - fills[bi])
        else:
            tree.open_bin(BUDGET - nt)
            fills.append(nt)
    return len(fills)


def linear_pack(lengths: list[int]) -> int:
    fills: list[int] = []
    for nt in lengths:
        for bi, f in enumerate(fills):
            if f + nt <= BUDGET:
                fills[bi] = f + nt
                break
        else:
            fills.append(nt)
    return len(fills)


def main() -> None:
    print(f"budget={BUDGET}, FFD order (n DESC) applied before timing")
    for n in (10_000, 50_000, 100_000, 200_000):
        lengths = sorted(det_lengths(n), reverse=True)
        t0 = time.perf_counter()
        bins_t = tree_pack(lengths)
        tree_s = time.perf_counter() - t0
        if n <= 50_000:
            t0 = time.perf_counter()
            bins_l = linear_pack(lengths)
            lin_s = time.perf_counter() - t0
            assert bins_l == bins_t
            lin = f"{lin_s:8.2f}s"
        else:
            lin = "   (skip)"
        print(
            f"docs/stream={n:>7,}  bins={bins_t:>6,}  "
            f"tree={tree_s:6.2f}s  linear={lin}"
        )


if __name__ == "__main__":
    main()
