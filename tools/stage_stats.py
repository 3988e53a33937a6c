"""Per-stage wall-time report via Dataset.stats() — the measure-don't-
guess loop for individual queries.

Usage: python tools/stage_stats.py [query_name ...] [sf_dir]
Runs each named query (default: the slowest suite members) at sf_dir
(default sf0.1), consumes it, and prints the operator-level breakdown
Ray's streaming executor recorded, trimmed to the lines that matter.
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT_QUERIES = ["minhash_groups", "emb_dups", "join_agg", "pip_admin"]


def trim_stats(stats: str) -> str:
    """Keep operator headers + wall-time/row lines from Dataset.stats()."""
    out = []
    for line in stats.splitlines():
        s = line.strip()
        if (
            s.startswith("Operator")
            or "Remote wall time" in s
            or "Output rows per task" in s
            or s.startswith("* Total time")
        ):
            out.append(line.rstrip())
    return "\n".join(out)


def main(argv):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    names = [a for a in argv if not a.startswith("/")] or DEFAULT_QUERIES
    sf = next((a for a in argv if a.startswith("/")), "/root/testdata/sf0.1")
    qs = entrymod.queries()
    for name in names:
        ds = qs[name](sf)
        t0 = time.time()
        ds = ds.materialize()
        wall = time.time() - t0
        print(f"\n=== {name}: {wall:.2f}s total, {ds.count()} rows ===")
        print(trim_stats(ds.stats()))
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
