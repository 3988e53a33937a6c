"""Stack / mosaic / dedup — order-sensitive grouped reduces (ops #7, #8).

Reference semantics:
* ``StackSTACStacker`` (``/root/reference/zen3geo/datapipes/stackstac.py:106-187``)
  aligns scenes sharing a grid and stacks them along time;
* ``StackSTACMosaicker`` (``stackstac.py:16-103``) flattens by **first
  valid pixel**, which silently depends on input order (:19-21).

Distributed recast: order-dependence becomes key-dependence — every group
is explicitly sorted by (``order_cols``) before the reduce, so any
partitioning (and any retry) yields identical output (SURVEY §7.4
"order-dependence → key-dependence"; deterministic tie-break on
(warc_ts, url)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def stack_series(ds, key_cols: list[str], order_cols: list[str],
                 value_col: str, list_col: str | None = None,
                 n_buckets: int = 64):
    """One row per key with the values stacked as a list, sorted by
    order_cols (the stacker recast: rows sharing a spatial key become one
    (key, [values...]) tensor row).  Executes via coarse-bucket groups
    (stages/bucketed.py) so millions of keys cost B Python calls, not
    |keys|."""
    from .bucketed import stack_per_key

    return stack_per_key(ds, key_cols, order_cols, value_col, list_col, n_buckets)


def first_valid_mosaic(ds, key_cols: list[str], order_cols: list[str],
                       value_cols: list[str], n_buckets: int = 64):
    """First non-null value per (key, value_col) in order_cols order (the
    mosaicker recast, order made explicit)."""
    from .bucketed import first_valid_per_key

    return first_valid_per_key(ds, key_cols, order_cols, value_cols, n_buckets)


def dedup_first(ds, key_cols: list[str], order_cols: list[str],
                n_buckets: int = 64):
    """Exact dedup keeping the first row per key in order_cols order
    (per-url dedup for the byte-identity contract: first (warc_ts, url)
    wins, independent of partitioning — FIXTURES.md F6)."""
    from .bucketed import first_per_key

    return first_per_key(ds, key_cols, order_cols, n_buckets)


def split_by_time(ds, ts_col: str, cutoff, before_name="pre", after_name="post"):
    """Pre/post-event split (``docs/stacking.md:468-487``): adds a
    ``phase`` column instead of forking the stream (fork = reuse the same
    Dataset in two filtered pipelines)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        ph = pc.if_else(
            pc.less(t.column(ts_col), pa.scalar(cutoff)),
            pa.scalar(before_name),
            pa.scalar(after_name),
        )
        return t.append_column("phase", ph)

    return ds.map_batches(tag, batch_format="pyarrow")
