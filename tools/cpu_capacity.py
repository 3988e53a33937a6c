"""Measure this host's REAL aggregate compute vs process count.

The N->4N scaling proxy is only meaningful if both levels sit within the
machine's physical capacity; on shared VMs, vCPU count can exceed the
deliverable cycles (host steal / SMT).  This prints the capacity curve
used to pick the bench's scaling levels.

Usage: python tools/cpu_capacity.py
"""

from __future__ import annotations

import multiprocessing as mp
import time

import numpy as np


def burn(_):
    a = np.arange(100_000)
    t_end = time.time() + 3.0
    iters = 0
    while time.time() < t_end:
        int(np.sum(a * 3 % 7))
        iters += 1
    return iters


def main():
    base = None
    for procs in (1, 2, 4, 8, 12, 16, 24, 32):
        with mp.Pool(procs) as p:
            total = sum(p.map(burn, range(procs)))
        if base is None:
            base = total
        print(
            f"procs={procs:3d}: {total:7d} units "
            f"(x{total / base:.2f} vs 1 proc, {total / procs:.0f}/proc)"
        )


if __name__ == "__main__":
    main()
