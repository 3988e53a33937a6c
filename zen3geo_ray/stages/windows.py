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
    oracle-exact).

    NOTE: each event fans out to ``size_units`` rows — fine for small
    windows, O(window) blowup for day-long ones.  ``sliding_agg_dense``
    computes the identical result with NO fan-out (prefix sums + sparse-
    table range-min/max over per-unit partials) and is the default used
    by the query suite.
    """
    from .zonal import zonal_aggregate

    expanded = ds.map_batches(
        lambda b: sliding_window_expand(
            b, ts_col=ts_col, size_units=size_units, unit_us=unit_us,
            keep_cols=[key_col, value_col],
        ),
        batch_format="pyarrow",
    )
    return zonal_aggregate(expanded, [key_col, "window"], {value_col: aggs})


def _rmq_levels(arr: np.ndarray, max_len: int, ufunc):
    """Sparse-table doubling levels: levels[j][p] = fold of arr[p:p+2^j].
    Built with log2(max_len) vectorized passes (the segment-tree-merge
    shape for big windows — no O(window) work per query)."""
    levels = [arr]
    j = 1
    while (1 << j) <= max_len and len(levels[-1]) > (1 << (j - 1)):
        h = 1 << (j - 1)
        prev = levels[-1]
        levels.append(ufunc(prev[: len(prev) - h], prev[h:]))
        j += 1
    return levels


def _rmq_query(levels, a: np.ndarray, b: np.ndarray, ufunc):
    """Vectorized fold over [a, b] (inclusive, a <= b) via two
    overlapping power-of-two blocks per query."""
    lens = b - a + 1
    _, e = np.frexp(lens.astype(np.float64))
    j = e.astype(np.int64) - 1          # 2^j <= len < 2^(j+1)
    out = np.empty(len(a), dtype=levels[0].dtype)
    for jj in np.unique(j):
        sel = j == jj
        lv = levels[jj]
        out[sel] = ufunc(lv[a[sel]], lv[b[sel] - (1 << jj) + 1])
    return out


def sliding_count_dense(ds, *, ts_col: str, key_col: str, size_units: int,
                        unit_us: int, n_buckets: int = 64):
    """``sliding_count`` without the per-event fan-out — the dense path
    restricted to counts (value_col-free)."""
    return sliding_agg_dense(
        ds, ts_col=ts_col, key_col=key_col, value_col=None,
        size_units=size_units, unit_us=unit_us, aggs=[],
        n_buckets=n_buckets,
    )


def sliding_agg_dense(ds, *, ts_col: str, key_col: str,
                      value_col: str | None, size_units: int, unit_us: int,
                      aggs: list[str], n_buckets: int = 64):
    """Sliding-window VALUE aggregate WITHOUT the per-event fan-out —
    identical output to ``sliding_agg`` at any window size.

    Shape: (1) map_batches pre-aggregates each batch to per-(key, unit)
    partials (count/sum/min/max — all associative), so the ONE shuffle
    moves at most #distinct-units rows per key per batch, independent of
    ``size_units``; (2) a coarse-bucket reduce combines partials, lays
    each key's units on a dense concatenated axis, and answers every
    window with prefix-sum differences (count/sum) and sparse-table
    range-min/max queries (two O(1) lookups per window after log(window)
    vectorized build passes) — the segment-tree-merge alternative to
    fanning each event into ``size_units`` copies.  Windows with no
    events are skipped, matching the fan-out semantics.
    """
    want = set(aggs)
    bad = want - {"sum", "min", "max"}
    if bad:
        raise ValueError(f"unsupported aggs {sorted(bad)}")
    if want and value_col is None:
        raise ValueError("value aggs need value_col")
    size = int(size_units)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False)
        u = ts_to_unit(ts, unit_us)
        df = pd.DataFrame({key_col: batch.column(key_col).to_pandas(),
                           "_u": u})
        if value_col is not None:
            df["_v"] = batch.column(value_col).to_numpy(zero_copy_only=False)
        spec = {"n": ("_u", "size")}
        if "sum" in want:
            spec["s"] = ("_v", "sum")
        if "min" in want:
            spec["mn"] = ("_v", "min")
        if "max" in want:
            spec["mx"] = ("_v", "max")
        out = df.groupby([key_col, "_u"], sort=False).agg(**spec).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    I64_MAX = np.iinfo(np.int64).max
    I64_MIN = np.iinfo(np.int64).min

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        spec = {"n": ("n", "sum")}
        if "sum" in want:
            spec["s"] = ("s", "sum")
        if "min" in want:
            spec["mn"] = ("mn", "min")
        if "max" in want:
            spec["mx"] = ("mx", "max")
        g = g.groupby([key_col, "_u"], sort=False).agg(**spec).reset_index()
        g = g.sort_values([key_col, "_u"], kind="mergesort")
        keys = g[key_col].to_numpy()
        u = g["_u"].to_numpy(dtype=np.int64)
        newk = np.concatenate([[True], keys[1:] != keys[:-1]])
        # split each key at unit gaps >= size: no window can span such a
        # gap (a window starting at or before the gap's left edge ends
        # before the right edge), so segments are EXACTLY independent —
        # and the dense axis is sized by per-segment spans, never by a
        # sparse key's full time range (a key with two events years
        # apart would otherwise materialize the whole span)
        gap = np.concatenate([[True], (u[1:] - u[:-1]) >= size])
        newk = newk | gap
        key_first = np.flatnonzero(newk)
        key_last = np.concatenate([key_first[1:] - 1, [len(g) - 1]])
        u_min, u_max = u[key_first], u[key_last]
        span = u_max - u_min + 1
        seg_start = np.concatenate([[0], np.cumsum(span)[:-1]])
        L = int(span.sum())
        key_of_row = np.cumsum(newk) - 1
        pos = seg_start[key_of_row] + (u - u_min[key_of_row])
        n_d = np.zeros(L, dtype=np.int64)
        n_d[pos] = g["n"].to_numpy()
        # candidate windows: starts u_min-size+1 .. u_max per key
        nw = span + size - 1
        w_start = np.concatenate([[0], np.cumsum(nw)[:-1]])
        W = int(nw.sum())
        kidx = np.repeat(np.arange(len(span)), nw)
        local = np.arange(W) - np.repeat(w_start, nw)
        w_val = u_min[kidx] - (size - 1) + local
        a = seg_start[kidx] + np.maximum(w_val - u_min[kidx], 0)
        b = (seg_start[kidx]
             + np.minimum(w_val + size - 1, u_max[kidx]) - u_min[kidx])
        Pn = np.concatenate([[0], np.cumsum(n_d)])
        n_w = Pn[b + 1] - Pn[a]
        keep = n_w > 0
        a, b, kidx, w_val, n_w = a[keep], b[keep], kidx[keep], w_val[keep], n_w[keep]
        out = {key_col: keys[key_first][kidx], "window": w_val, "n": n_w}
        if "sum" in want:
            s_d = np.zeros(L, dtype=np.int64)
            s_d[pos] = g["s"].to_numpy()
            Ps = np.concatenate([[0], np.cumsum(s_d)])
            out[f"{value_col}_sum"] = Ps[b + 1] - Ps[a]
        if "min" in want:
            mn_d = np.full(L, I64_MAX, dtype=np.int64)
            mn_d[pos] = g["mn"].to_numpy()
            out[f"{value_col}_min"] = _rmq_query(
                _rmq_levels(mn_d, size, np.minimum), a, b, np.minimum
            )
        if "max" in want:
            mx_d = np.full(L, I64_MIN, dtype=np.int64)
            mx_d[pos] = g["mx"].to_numpy()
            out[f"{value_col}_max"] = _rmq_query(
                _rmq_levels(mx_d, size, np.maximum), a, b, np.maximum
            )
        return pd.DataFrame(out)

    return bucketed_groupby(parts, [key_col], bucket_fn, n_buckets)


def cusum_changepoint(ds, key_col: str, order_cols: list[str],
                      value_col: str, *, id_col: str | None = None,
                      n_buckets: int = 32):
    """Per-key CUSUM CHANGEPOINT detection — the max-deviation scan
    statistic in EXACT integer form: with per-key prefix sums S_i over
    the (order_cols)-sorted values and total S_n,

        G_i = |n·S_i − i·S_n|        (scaled CUSUM, all int64)

    the changepoint is the position maximizing G_i (smallest i on
    ties).  Output: one row per key — (key, n, cp_i, cp_id, g_max)
    where cp_id is ``id_col`` at the changepoint (or omitted).

    ONE bucketed shuffle by key; inside each bucket the scan is fully
    segmented-vectorized (cumsum with segment reset, reduceat argmax)
    — no per-key Python loop.  |n·S_i| must stay below 2^63: holds
    until a single key carries ~10^9 rows of ~10^9-scale values.
    """

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols,
                          kind="mergesort").reset_index(drop=True)
        u = g[key_col].to_numpy()
        v = g[value_col].to_numpy().astype(np.int64)
        m = len(g)
        if m == 0:
            cols = {key_col: [], "n": [], "cp_i": [], "g_max": []}
            if id_col:
                cols["cp_id"] = []
            return pd.DataFrame(cols)
        starts = np.flatnonzero(
            np.concatenate([[True], u[1:] != u[:-1]]))
        seg = np.repeat(np.arange(len(starts)),
                        np.diff(np.append(starts, m)))
        n_per = np.diff(np.append(starts, m)).astype(np.int64)
        n_rep = n_per[seg]
        cum = np.cumsum(v)
        base = np.concatenate([[0], cum[:-1]])[starts]
        s_i = cum - base[seg]
        s_tot = (cum[np.append(starts[1:] - 1, m - 1)] - base)
        s_rep = s_tot[seg]
        i_in = (np.arange(m) - starts[seg] + 1).astype(np.int64)
        gv = np.abs(n_rep * s_i - i_in * s_rep)
        g_max = np.maximum.reduceat(gv, starts)
        big = np.iinfo(np.int64).max
        cand = np.where(gv == g_max[seg], i_in, big)
        cp_i = np.minimum.reduceat(cand, starts)
        pos = (starts + cp_i - 1).astype(np.int64)
        out = {key_col: u[starts], "n": n_per, "cp_i": cp_i,
               "g_max": g_max}
        if id_col:
            out["cp_id"] = g[id_col].to_numpy()[pos]
        return pd.DataFrame(out)

    return bucketed_groupby(ds, [key_col], fold, n_buckets=n_buckets)


def interval_union_length(ds, key_col: str, start_col: str,
                          end_col: str, *, n_buckets: int = 32):
    """Per-key TOTAL COVERED LENGTH of half-open intervals
    [start, end) with overlaps merged — the session-coverage /
    uptime-accounting sweep.  Output: (key, n_iv, covered), all int64.

    ONE bucketed shuffle by key; the sweep inside is the vectorized
    gaps-and-islands form: sort by (key, start, end), running per-key
    cummax of ends (pandas C kernel, no Python loop), and each row
    contributes ``max(0, end − max(start, prev_cummax))`` — exactly
    the merged-interval total without materializing islands.
    """

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 "n_iv": pd.Series([], dtype="int64"),
                                 "covered": pd.Series([], dtype="int64")})
        g = g.sort_values([key_col, start_col, end_col],
                          kind="mergesort").reset_index(drop=True)
        s = g[start_col].to_numpy().astype(np.int64)
        e = g[end_col].to_numpy().astype(np.int64)
        cummax = g.groupby(key_col, sort=False)[end_col].cummax() \
            .to_numpy().astype(np.int64)
        prev = np.empty_like(cummax)
        prev[1:] = cummax[:-1]
        u = g[key_col].to_numpy()
        first = np.concatenate([[True], u[1:] != u[:-1]])
        prev[first] = np.iinfo(np.int64).min
        lo = np.maximum(s, prev)
        add = np.maximum(e - lo, 0)
        out = pd.DataFrame({key_col: u, "_a": add, "_one": 1})
        agg = out.groupby(key_col, sort=False, as_index=False).sum()
        return pd.DataFrame({key_col: agg[key_col],
                             "n_iv": agg["_one"].astype(np.int64),
                             "covered": agg["_a"].astype(np.int64)})

    return bucketed_groupby(ds, [key_col], fold, n_buckets=n_buckets)
