"""Event-time windowing over the ordered-log model (SURVEY §2.3
streaming semantics).

Ray Data has no watermarks; the engine treats a stream table as a
partitioned log — partition by key, order by ts within key — and
implements windows as keyed batch transforms:

* tumbling — pure arithmetic bucketing (see queries.q_events_hourly);
* sliding  — each row fans out to the ``size/step`` windows containing
  it (vectorized repeat), then a partial→final count;
* session  — gap-based sessionization per key via the coarse-bucket
  pattern (sort per key, new-session flags, cumulative sum) — the
  gaps-and-islands construction, restated in the SQL oracle with
  LAG + windowed SUM.

All window ids are integer epoch units so oracle comparison is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketed import bucketed_groupby


def ts_to_unit(ts: np.ndarray, unit_us: int) -> np.ndarray:
    return ts.astype("datetime64[us]").astype(np.int64) // unit_us


def sliding_window_expand(batch: pa.Table, *, ts_col: str, size_units: int,
                          unit_us: int, keep_cols: list[str]) -> pa.Table:
    """Fan each row out to every window (by start unit) that contains it:
    row at unit u belongs to windows u-size+1 .. u (step = 1 unit)."""
    ts = batch.column(ts_col).to_numpy(zero_copy_only=False)
    u = ts_to_unit(ts, unit_us)
    n = len(u)
    offs = np.arange(size_units)
    win = (u[:, None] - offs[None, :]).reshape(-1)
    idx = np.repeat(np.arange(n), size_units)
    out = batch.select(keep_cols).take(pa.array(idx))
    return out.append_column("window", pa.array(win, pa.int64()))


def sliding_count(ds, *, ts_col: str, key_col: str, size_units: int,
                  unit_us: int):
    """Per (key, window-start) count over sliding windows of
    ``size_units`` x ``unit_us`` stepping one unit."""
    from .zonal import zonal_aggregate

    expanded = ds.map_batches(
        lambda b: sliding_window_expand(
            b, ts_col=ts_col, size_units=size_units, unit_us=unit_us,
            keep_cols=[key_col],
        ),
        batch_format="pyarrow",
    )
    return zonal_aggregate(expanded, [key_col, "window"], {})


def sessionize(ds, *, key_col: str, ts_col: str, gap_us: int,
               n_buckets: int = 64):
    """Gap-based sessions per key.  Output: one row per session with
    (key, session_idx, n_events, start_us, end_us) — session_idx is the
    0-based session ordinal within the key (deterministic)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        key = g[key_col].to_numpy()
        new_key = np.concatenate([[True], key[1:] != key[:-1]])
        gap = np.concatenate([[True], (ts[1:] - ts[:-1]) > gap_us])
        new_session = new_key | gap
        # session ordinal within key: cumsum of new_session reset per key
        sid_global = np.cumsum(new_session) - 1
        first_of_key = np.where(new_key, sid_global, 0)
        key_base = np.maximum.accumulate(first_of_key)
        sid = sid_global - key_base
        out = pd.DataFrame(
            {key_col: key, "session_idx": sid, "ts_us": ts}
        )
        agg = out.groupby([key_col, "session_idx"], sort=False).agg(
            n_events=("ts_us", "size"),
            start_us=("ts_us", "min"),
            end_us=("ts_us", "max"),
        )
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg.reset_index()

    return bucketed_groupby(ds, [key_col], fn, n_buckets)


def keyed_ordered_fold(ds, *, key_col: str, order_cols: list[str], fold_fn,
                       n_buckets: int = 64):
    """Generic stateful per-key ordered fold — the actor-state streaming
    window expressed Dataset-first.

    Every row of a key lands in one coarse bucket (hash-partitioned), the
    bucket's rows arrive SORTED by ``order_cols`` within each key, and
    ``fold_fn(key_df) -> state_df`` runs once per bucket over the ordered
    frame (vectorize per key inside: cumsum/cummax/shift cover most state
    machines without a Python loop).  This is semantically an actor
    holding per-key state fed in event-time order; expressing it as a
    keyed batch transform lets the streaming executor schedule and retry
    it like any other stage instead of pinning actor pools.
    """

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        return fold_fn(g)

    return bucketed_groupby(ds, [key_col], fn, n_buckets)


def running_peak(ds, *, key_col: str, order_cols: list[str], value_col: str,
                 n_buckets: int = 64):
    """Per-key running-sum peak (cumulative fold state: the running sum;
    emitted state: its maximum + the final total).  Integer-exact when
    ``value_col`` is integer — mirror float columns to cents first."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        run = g.groupby(key_col, sort=False)[value_col].cumsum()
        tmp = pd.DataFrame({key_col: g[key_col], "_run": run,
                            "_v": g[value_col]})
        agg = tmp.groupby(key_col, sort=False).agg(
            peak=("_run", "max"), total=("_v", "sum")
        )
        return agg.reset_index()

    return keyed_ordered_fold(ds, key_col=key_col, order_cols=order_cols,
                              fold_fn=fold, n_buckets=n_buckets)


def sliding_agg(ds, *, ts_col: str, key_col: str, value_col: str,
                size_units: int, unit_us: int, aggs: list[str]):
    """Sliding-window VALUE aggregate per (key, window-start): same
    fan-out shape as ``sliding_count`` but carrying the value column into
    the partial→final aggregate (sum/min/max; integer values stay
    oracle-exact)."""
    from .zonal import zonal_aggregate

    expanded = ds.map_batches(
        lambda b: sliding_window_expand(
            b, ts_col=ts_col, size_units=size_units, unit_us=unit_us,
            keep_cols=[key_col, value_col],
        ),
        batch_format="pyarrow",
    )
    return zonal_aggregate(expanded, [key_col, "window"], {value_col: aggs})
