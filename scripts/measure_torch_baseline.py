"""Regenerate the pinned torch-CPU baseline constant in bench.py.

Runs bench.bench_torch() N times under as-idle-as-possible conditions and
prints the best (the pin shields bench.py's vs_baseline from machine load;
see VERDICT round-1 weak #8).  Update bench.PINNED_TORCH_CPU_FPS with the
printed best when the host environment changes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_torch


def main(reps: int = 10):
    vals = []
    for i in range(reps):
        v = bench_torch()
        vals.append(v)
        print(f"run {i + 1}/{reps}: {v:.0f} frames/s")
    print(f"best-of-{reps}: {max(vals):.0f} frames/s "
          f"(median {sorted(vals)[len(vals) // 2]:.0f})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
