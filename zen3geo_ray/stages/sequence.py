"""Event-sequence analytics over the partitioned-log model.

Operators a clickstream / training-telemetry pipeline needs beyond
plain windows (SURVEY §2.3 streaming semantics; reference surface:
zen3geo treats streams as ordered datapipes — here each op is one
coarse-bucket shuffle on the key plus vectorized pandas/numpy inside,
so the Python-call count is O(buckets), never O(keys)):

* transition_counts — Markov bigram matrix of event types: per key
  sort by a unique order column, pair each type with its successor,
  count globally.  Partial counts per bucket (bounded by #types^2)
  then one tiny final reduce — raw events shuffle once.
* funnel_conversion — per key, how many `from_type` events are
  followed by a `to_type` event within a horizon; one lexsort + a
  reverse running-min across the whole bucket (no per-key slicing,
  no pair blowup).
* cumulative_distinct — running COUNT(DISTINCT type) per key in order:
  first-occurrence flags (vectorized ~duplicated) + per-key cumsum.
* gapfill_counts — densify per-key unit-bucket counts over each key's
  [min, max] span with zero fill.  Output volume is keys x span-units
  (inherent to densification); spans are per-key, never the global
  axis, mirroring the gap-split bound in stages/windows.py.

All arithmetic is integer (epoch-us buckets, int counts) so the DuckDB
oracles match bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketed import bucketed_groupby


def transition_counts(ds, *, key_col: str, order_col: str, type_col: str,
                      n_buckets: int = 64):
    """Global (type, next_type) pair counts; successor taken per key in
    ``order_col`` order (``order_col`` must be unique within a key).
    Returns columns (type_col, next_{type_col}, n) — pairs whose
    successor falls off the end of a key's sequence are dropped, the
    LEAD-IS-NOT-NULL convention."""
    next_col = f"next_{type_col}"

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="mergesort")
        nxt = g.groupby(key_col, sort=False)[type_col].shift(-1)
        pairs = pd.DataFrame({type_col: g[type_col], next_col: nxt})
        pairs = pairs[nxt.notna()]
        out = pairs.value_counts([type_col, next_col]).reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = bucketed_groupby(ds, [key_col], partial, n_buckets)

    def finalize(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        out = df.groupby([type_col, next_col], as_index=False, sort=False)[
            "n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    # pair domain is #types^2 rows per bucket — a single micro-task
    return partials.repartition(1).map_batches(finalize,
                                               batch_format="pyarrow")


def funnel_conversion(ds, *, key_col: str, ts_col: str, type_col: str,
                      from_type: str, to_type: str, within_us: int,
                      n_buckets: int = 64):
    """Per key: ``n_from`` = count of `from_type` events, ``n_conv`` =
    how many of them have a `to_type` event strictly after them and at
    most ``within_us`` later (EXISTS semantics — each from-event counts
    once no matter how many conversions follow).  ``ts_col`` must be
    int64 epoch microseconds.

    Fully vectorized across ALL keys in a bucket: one lexsort of
    (key, ts, kind) placing to-events before equal-ts from-events
    (so "strictly after" holds by construction), then a reverse
    running-min over to-positions gives each from-event its nearest
    following to-event; a same-key comparison replaces per-key slicing.
    Keys with no from-events emit nothing (SQL inner-grouping shape).
    """

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        kinds = g[type_col].to_numpy()
        keep = (kinds == from_type) | (kinds == to_type)
        key = g[key_col].to_numpy()[keep]
        t = g[ts_col].to_numpy()[keep]
        is_from = kinds[keep] == from_type
        order = np.lexsort((is_from, t, key))
        key, t, is_from = key[order], t[order], is_from[order]
        n = len(key)
        idx = np.arange(n, dtype=np.int64)
        to_pos = np.where(~is_from, idx, n)
        nxt = np.minimum.accumulate(to_pos[::-1])[::-1]
        f_nxt = nxt[is_from]
        ok = f_nxt < n
        safe = np.minimum(f_nxt, max(n - 1, 0))
        conv = np.zeros(int(is_from.sum()), dtype=np.int64)
        if n:
            same_key = key[safe] == key[is_from]
            in_time = t[safe] - t[is_from] <= np.int64(within_us)
            conv = (ok & same_key & in_time).astype(np.int64)
        out = pd.DataFrame({key_col: key[is_from], "_c": conv})
        agg = out.groupby(key_col, sort=False)["_c"].agg(
            ["count", "sum"]).reset_index()
        agg.columns = [key_col, "n_from", "n_conv"]
        agg["n_from"] = agg["n_from"].astype(np.int64)
        agg["n_conv"] = agg["n_conv"].astype(np.int64)
        return agg

    return bucketed_groupby(ds, [key_col], fn, n_buckets)


def cumulative_distinct(ds, *, key_col: str, order_col: str, type_col: str,
                        out_col: str = "n_types", n_buckets: int = 64):
    """Running COUNT(DISTINCT type) per key in ``order_col`` order
    (unique within key): one row out per row in, with the cumulative
    number of distinct types seen so far (inclusive)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="mergesort")
        first = ~g.duplicated([key_col, type_col], keep="first")
        g = g.drop(columns=[type_col])
        g[out_col] = (
            first.astype(np.int64)
            .groupby(g[key_col].to_numpy(), sort=False)
            .cumsum()
            .to_numpy()
        )
        return g

    return bucketed_groupby(ds, [key_col], fn, n_buckets)


def gapfill_counts(ds, *, key_col: str, ts_col: str, unit_us: int,
                   out_ts_col: str = "unit_us", n_buckets: int = 64):
    """Per-key event counts per ``unit_us`` bucket, densified: every
    bucket between a key's first and last event appears, zero filled.
    ``ts_col`` must be int64 epoch microseconds; buckets are
    floor(ts / unit), output timestamps are bucket * unit.

    Vectorized densification across the whole bucket: per-key
    [lo, hi] spans come from one groupby min/max; the dense axis is a
    single arange sliced by repeated offsets; observed counts scatter
    into it by (cumstart + hb - lo) positions — no per-key loop."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        hb = g[ts_col].to_numpy() // np.int64(unit_us)
        obs = (
            pd.DataFrame({key_col: g[key_col].to_numpy(), "_hb": hb})
            .groupby([key_col, "_hb"], sort=True)
            .size()
            .reset_index(name="n")
        )
        keys = obs[key_col].to_numpy()
        hbs = obs["_hb"].to_numpy()
        first = np.ones(len(keys), dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        key_vals = keys[first]
        lo = hbs[first]
        hi = np.empty(len(key_vals), dtype=np.int64)
        hi[:-1] = hbs[np.flatnonzero(first)[1:] - 1]
        if len(key_vals):
            hi[-1] = hbs[-1]
        lengths = hi - lo + 1
        cumstart = np.zeros(len(key_vals), dtype=np.int64)
        np.cumsum(lengths[:-1], out=cumstart[1:])
        total = int(lengths.sum())
        # dense per-key bucket axis in one arange
        dense_hb = (
            np.arange(total, dtype=np.int64)
            - np.repeat(cumstart, lengths)
            + np.repeat(lo, lengths)
        )
        n_arr = np.zeros(total, dtype=np.int64)
        key_idx = np.cumsum(first) - 1
        n_arr[cumstart[key_idx] + (hbs - lo[key_idx])] = obs["n"].to_numpy()
        return pd.DataFrame({
            key_col: np.repeat(key_vals, lengths),
            out_ts_col: dense_hb * np.int64(unit_us),
            "n": n_arr,
        })

    return bucketed_groupby(ds, [key_col], fn, n_buckets)


def cooccurrence_pairs(ds, *, key_col: str, item_col: str,
                       n_buckets: int = 64):
    """Market-basket pair support: for every unordered item pair
    (t1 < t2), the number of keys whose item set contains both — the
    candidate-generation step of frequent-itemset mining.

    One bucketed shuffle on the key; inside each bucket the distinct
    (key, item) pairs self-merge vectorized (pair volume is
    keys x k² for per-key item counts k — the inherent output of pair
    enumeration, never |rows|²); partial counts are bounded by the
    item-domain² and re-sum in a single micro-task.
    Output columns: (t1, t2, n).
    """

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[key_col, item_col]].drop_duplicates()
        m = d.merge(d, on=key_col, suffixes=("_1", "_2"))
        a, b = f"{item_col}_1", f"{item_col}_2"
        m = m[m[a] < m[b]]
        vc = m.value_counts([a, b], sort=False).reset_index(name="n")
        vc.columns = ["t1", "t2", "n"]
        vc["n"] = vc["n"].astype(np.int64)
        return vc

    partials = bucketed_groupby(ds, [key_col], partial, n_buckets)

    def finalize(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        out = df.groupby(["t1", "t2"], as_index=False, sort=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return partials.repartition(1).map_batches(finalize,
                                               batch_format="pyarrow")


def cohort_retention(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                     unit_us: int = 7 * 86_400 * 10 ** 6,
                     n_buckets: int = 64):
    """Cohort retention matrix (the growth-analytics classic): cohort =
    a key's FIRST activity unit (epoch-us // unit_us, default calendar
    weeks from the epoch), and for every (cohort, offset) the number of
    cohort keys active ``offset`` units later.

    Output: (cohort, offset, n_keys); offset 0 rows are cohort sizes.

    100-TB shape: ONE key-partitioned shuffle of per-batch DISTINCT
    (key, unit) partials — the per-bucket kernel sees each key whole,
    derives its cohort with a segmented min (vectorized, no per-key
    Python), and emits (cohort, offset) partial counts bounded by
    units^2 per bucket; the final reduce is a tiny units^2 groupby.
    No join: the cohort never leaves the bucket that computed it.
    """

    def partial(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        u = t // unit_us
        pairs = np.unique(np.stack([k, u], axis=1), axis=0)
        return pa.table({"k": pa.array(pairs[:, 0]),
                         "u": pa.array(pairs[:, 1])})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["k", "u"])
        k = d["k"].to_numpy()
        u = d["u"].to_numpy().astype(np.int64)
        o = np.lexsort((u, k))
        k, u = k[o], u[o]
        new = np.ones(len(k), dtype=bool)
        new[1:] = k[1:] != k[:-1]
        # segmented min: first unit per key run IS the min (u sorted
        # within each key run)
        cohort = u[np.maximum.accumulate(np.where(new, np.arange(len(k)),
                                                  0))]
        off = u - cohort
        cnt = (pd.DataFrame({"cohort": cohort, "offset": off})
               .groupby(["cohort", "offset"], sort=False,
                        as_index=False).size())
        return pd.DataFrame({"cohort": cnt["cohort"].astype(np.int64),
                             "offset": cnt["offset"].astype(np.int64),
                             "n_keys": cnt["size"].astype(np.int64)})

    counts = bucketed_groupby(partials, ["k"], per_key,
                              n_buckets=n_buckets)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cohort", "offset"], sort=False,
                        as_index=False)["n_keys"].sum()
        out["n_keys"] = out["n_keys"].astype(np.int64)
        return out

    return bucketed_groupby(counts, ["cohort", "offset"], final,
                            n_buckets=min(n_buckets, 16))


def twap_per_key(ds, key_col: str, ts_col: str, value_col: str,
                 uid_col: str, *, n_buckets: int = 32):
    """Per-key TIME-WEIGHTED average price (the OHLC/TWAP market-data
    reduce): each event's value holds until the next event; twap =
    Σ value·Δt / (t_max − t_min).

    Float discipline: every term is quantized to the exact INTEGER
    ``floor(value · Δt_us)`` (both sides compute the identical double
    product of a stored double and an exact-in-double int64 gap first,
    so the floor agrees bit-for-bit), integer terms sum order-free,
    and the one float finale ``s / span`` shares its parenthesization
    with the oracle.  The last event of a key contributes 0 (no next
    event); ties on ``ts_col`` break by ``uid_col`` exactly like the
    oracle's ``ORDER BY t, uid``.

    One coarse-bucket shuffle on the key; inside each bucket one
    lexsort + segment-boundary diffs — no per-key Python.  Output:
    ``(key, n, s, span, twap)``; twap NULL when span = 0.
    """
    import pandas as pd

    from .bucketed import bucketed_groupby

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, uid_col], kind="stable")
        k = df[key_col].to_numpy()
        t = df[ts_col].to_numpy(dtype=np.int64)
        v = df[value_col].to_numpy(dtype=np.float64)
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        # Δt to the NEXT event within the key; last-of-key gets 0
        nxt = np.empty(len(df), dtype=np.int64)
        nxt[:-1] = t[1:] - t[:-1]
        nxt[-1] = 0
        ends = np.concatenate([starts[1:] - 1, [len(df) - 1]])
        nxt[ends] = 0
        term = np.floor(v * nxt).astype(np.int64)
        s = np.add.reduceat(term, starts)
        n = np.diff(np.concatenate([starts, [len(df)]]))
        span = t[ends] - t[starts]
        twap = np.where(span == 0, np.nan,
                        s.astype(np.float64)
                        / np.where(span == 0, 1, span).astype(np.float64))
        out = pd.DataFrame({key_col: k[starts],
                            "n": n.astype(np.int64),
                            "s": s.astype(np.int64),
                            "span": span.astype(np.int64),
                            "twap": twap})
        out["twap"] = out["twap"].where(out["span"] != 0, other=None)
        return out

    return bucketed_groupby(ds, [key_col], fold, n_buckets=n_buckets)


def ohlc_bars(ds, key_col: str, bucket_col: str, ts_col: str,
              value_col: str, uid_col: str, *, n_buckets: int = 32):
    """OHLC candle bars per (key, time-bucket): count, OPEN (first
    value in (ts, uid) order), HIGH, LOW, CLOSE (last value).  No
    arithmetic touches the doubles — open/close are selections and
    high/low exact comparisons — so the oracle matches bit-for-bit
    (values must be NaN-free; pandas min/max skip NaN where SQL
    propagates it).

    One coarse-bucket shuffle on the key; vectorized sort + groupby
    head/tail inside — no per-key Python.  Output:
    ``(key, bucket, n, open, high, low, close)``.
    """
    import pandas as pd

    from .bucketed import bucketed_groupby

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, bucket_col, ts_col, uid_col],
                            kind="stable")
        g = df.groupby([key_col, bucket_col], sort=False)[value_col]
        out = g.agg(n="size", open="first", high="max", low="min",
                    close="last").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_groupby(ds, [key_col], fold, n_buckets=n_buckets)


def rle_runs(ds, key_col: str, type_col: str, ts_col: str,
             uid_col: str, *, n_buckets: int = 32):
    """RUN-LENGTH encoding of each key's ordered event-type sequence
    (the gaps-and-islands compaction): consecutive equal types in
    (ts, uid) order collapse to one row ``(key, run_id, type,
    run_len)`` with run_id 1-based per key.

    One coarse-bucket shuffle on the key; inside each bucket one
    lexsort + vectorized boundary flags + reduceat — no per-key
    Python, all integers.
    """
    import pandas as pd

    from .bucketed import bucketed_groupby

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, uid_col], kind="stable")
        k = df[key_col].to_numpy()
        ty = df[type_col].to_numpy()
        newkey = np.empty(len(df), dtype=bool)
        newkey[0] = True
        newkey[1:] = k[1:] != k[:-1]
        newrun = newkey.copy()
        newrun[1:] |= ty[1:] != ty[:-1]
        starts = np.flatnonzero(newrun)
        run_len = np.diff(np.concatenate([starts, [len(df)]]))
        # run_id restarts at 1 on each key boundary
        run_seq = np.arange(len(starts), dtype=np.int64)
        keystart_of_run = np.cumsum(newkey[starts]) - 1
        first_run_of_key = np.flatnonzero(newkey[starts])
        run_id = run_seq - first_run_of_key[keystart_of_run] + 1
        return pd.DataFrame({key_col: k[starts],
                             "run_id": run_id.astype(np.int64),
                             type_col: ty[starts],
                             "run_len": run_len.astype(np.int64)})

    return bucketed_groupby(ds, [key_col], fold, n_buckets=n_buckets)


def max_drawdown(ds, key_col: str, ts_col: str, value_col: str,
                 uid_col: str, *, n_buckets: int = 32):
    """Per-key MAXIMUM DRAWDOWN of an integer value series in
    (ts, uid) order — max(running_peak − value), the classic
    risk/regression metric, plus the peak itself.  All integers
    (quantize floats to cents upstream); one bucketed shuffle, pandas
    C-kernel cummax inside — no per-key Python.

    Output: ``(key, n, max_drawdown, peak)``, int64.
    """
    import pandas as pd

    from .bucketed import bucketed_groupby

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, uid_col], kind="stable")
        pk = df.groupby(key_col, sort=False)[value_col].cummax()
        df = df.assign(_dd=pk - df[value_col], _pk=pk)
        out = df.groupby(key_col, sort=False).agg(
            n=(value_col, "size"), max_drawdown=("_dd", "max"),
            peak=("_pk", "max")).reset_index()
        for c in ("n", "max_drawdown", "peak"):
            out[c] = out[c].astype(np.int64)
        return out

    return bucketed_groupby(ds, [key_col], fold, n_buckets=n_buckets)


def linear_interp_grid(ds, key_col: str, ts_col: str, value_col: str,
                       uid_col: str, *, hour_lo: int, hour_hi: int,
                       hour_us: int = 3_600_000_000,
                       n_buckets: int = 32):
    """Per-key LINEAR INTERPOLATION of an irregular value series onto a
    fixed hourly grid (the time-series resample/align step): grid point
    t_g takes ``v0 + (v1 − v0) · ((t_g − t0) / (t1 − t0))`` between its
    bracketing events (prev = last t <= t_g, next = first t >= t_g);
    only points bracketed on BOTH sides emit (inner as-of semantics),
    a grid point ON an event takes that value, and events tied on ts
    dedupe to the highest-uid row — all rules mirrored by the ASOF-JOIN
    oracle.  The float expression shares one parenthesization with the
    SQL; µs gaps are exact in double.

    One bucketed shuffle on the key; per-bucket vectorized searchsorted
    against the fixed [hour_lo, hour_hi] window (bounded output:
    keys × window hours).  Output: ``(key, h, val)``.
    """
    import pandas as pd

    from .bucketed import bucketed_groupby

    hours = np.arange(hour_lo, hour_hi + 1, dtype=np.int64)
    grid = hours * hour_us

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, uid_col], kind="stable") \
            .drop_duplicates([key_col, ts_col], keep="last")
        ks, hs, vs = [], [], []
        for key, g in df.groupby(key_col, sort=False):
            ts = g[ts_col].to_numpy(dtype=np.int64)
            v = g[value_col].to_numpy(dtype=np.float64)
            jn = np.searchsorted(ts, grid, side="left")
            jp = np.searchsorted(ts, grid, side="right") - 1
            ok = (jp >= 0) & (jn < len(ts))
            if not ok.any():
                continue
            t0, v0 = ts[jp[ok]], v[jp[ok]]
            t1, v1 = ts[jn[ok]], v[jn[ok]]
            dt = t1 - t0
            same = dt == 0
            ratio = ((grid[ok] - t0).astype(np.float64)
                     / np.where(same, 1, dt).astype(np.float64))
            val = np.where(same, v0, v0 + (v1 - v0) * ratio)
            ks.append(np.full(ok.sum(), key))
            hs.append(hours[ok])
            vs.append(val)
        if not ks:
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 "h": pd.Series([], dtype="int64"),
                                 "val": pd.Series([], dtype="float64")})
        return pd.DataFrame({key_col: np.concatenate(ks),
                             "h": np.concatenate(hs),
                             "val": np.concatenate(vs)})

    return bucketed_groupby(ds, [key_col], fold, n_buckets=n_buckets)


def od_counts(ds, *, key_col: str, ts_col: str, id_col: str,
              cell_col: str = "cell", n_buckets: int = 64):
    """ORIGIN-DESTINATION flow matrix (the mobility-analysis staple):
    per key, events ordered by the TOTAL order (ts, id) — id breaks ts
    ties exactly, mirroring LEAD ... ORDER BY ts, id — consecutive
    event pairs become (cell_from, cell_to) trips (stays included;
    filter cell_from <> cell_to downstream for moves only).

    One bucketed shuffle co-locates each key's events; pair counts
    reduce combiner-first per bucket, then one GRID-bounded reduce on
    the (from, to) pair key — the corpus never moves twice.  Returns
    (cell_from, cell_to, n)."""

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        nxt = g.groupby(key_col, sort=False)[cell_col].shift(-1)
        pairs = pd.DataFrame({"cell_from": g[cell_col], "cell_to": nxt})
        pairs = pairs[nxt.notna()]
        out = pairs.value_counts(["cell_from", "cell_to"]).reset_index(
            name="n")
        out["cell_from"] = out["cell_from"].astype(np.int64)
        out["cell_to"] = out["cell_to"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = bucketed_groupby(ds, [key_col], partial, n_buckets)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["cell_from", "cell_to"], sort=False,
                         as_index=False)["n"].sum()

    return bucketed_groupby(partials, ["cell_from", "cell_to"], fold,
                            n_buckets=min(n_buckets, 16))


def flow_reciprocity(od, *, from_col: str = "cell_from",
                     to_col: str = "cell_to", n_col: str = "n",
                     n_buckets: int = 16):
    """Weighted + binary DYAD reciprocity of a directed flow matrix
    (Squartini et al. 2013, "Reciprocity of weighted networks"):

        w_total = Σ w_ij            over ordered pairs i ≠ j
        w_recip = Σ min(w_ij, w_ji) over ordered pairs  (2·min per dyad)
        m_dyads / a_dyads = dyads with both / exactly one direction
        recip_w = w_recip / w_total,  recip_b = 2M / (2M + A)

    Self-loops are excluded.  Input is an already-reduced OD table
    (grid-bounded), so partials fold per block into unordered-dyad
    (lo, hi, nf, nr) rows, one bucketed dyad reduce emits per-bucket
    scalar partials, and the driver sums ≤ n_buckets rows — integer
    end to end, the two ratios are the only float ops.  Returns ONE
    row (w_total, w_recip, m_dyads, a_dyads, recip_w, recip_b)."""
    import ray.data as rd

    def partial(b: pa.Table) -> pa.Table:
        f = b.column(from_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        t = b.column(to_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = b.column(n_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = f != t
        f, t, n = f[m], t[m], n[m]
        lo = np.minimum(f, t)
        hi = np.maximum(f, t)
        df = pd.DataFrame({
            "lo": lo, "hi": hi,
            "nf": np.where(f < t, n, 0),
            "nr": np.where(f > t, n, 0),
        }).groupby(["lo", "hi"], sort=False, as_index=False).sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def pair_fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["lo", "hi"], sort=False, as_index=False)[
            ["nf", "nr"]].sum()
        nf = s["nf"].to_numpy().astype(np.int64)
        nr = s["nr"].to_numpy().astype(np.int64)
        mut = (nf > 0) & (nr > 0)
        return pd.DataFrame({
            "w_total": [int(nf.sum() + nr.sum())],
            "w_recip": [2 * int(np.minimum(nf, nr).sum())],
            "m_dyads": [int(mut.sum())],
            "a_dyads": [int(len(s) - mut.sum())]})

    parts = bucketed_groupby(
        od.map_batches(partial, batch_format="pyarrow"),
        ["lo", "hi"], pair_fold, n_buckets=n_buckets).to_pandas()
    wt = int(parts["w_total"].sum()) if len(parts) else 0
    wr = int(parts["w_recip"].sum()) if len(parts) else 0
    md = int(parts["m_dyads"].sum()) if len(parts) else 0
    ad = int(parts["a_dyads"].sum()) if len(parts) else 0
    return rd.from_arrow(pa.table({
        "w_total": pa.array([wt], pa.int64()),
        "w_recip": pa.array([wr], pa.int64()),
        "m_dyads": pa.array([md], pa.int64()),
        "a_dyads": pa.array([ad], pa.int64()),
        "recip_w": pa.array(
            [float(wr) / float(wt) if wt > 0 else 0.0], pa.float64()),
        "recip_b": pa.array(
            [float(2 * md) / float(2 * md + ad) if md + ad > 0 else 0.0],
            pa.float64())}))


def staypoints(ds, *, key_col: str, ts_col: str, id_col: str,
               cell_col: str = "cell", min_events: int = 2,
               n_buckets: int = 64):
    """STAY-POINT detection (the trajectory-mining primitive): maximal
    runs of CONSECUTIVE same-cell events per key (order = the exact
    (ts, id) total order), kept when the run has >= ``min_events``
    events.  The gaps-and-islands shape — island id is the exact
    ROW_NUMBER difference, so the SQL mirror is rn_overall -
    rn_per-(key,cell).  One bucketed shuffle co-locates each key.
    Returns (key, cell, n_events, start_tu, end_tu)."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        k = g[key_col].to_numpy()
        c = g[cell_col].to_numpy().astype(np.int64)
        t = g[ts_col].to_numpy().astype(np.int64)
        new_run = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_run[1:] = (k[1:] != k[:-1]) | (c[1:] != c[:-1])
        run = np.cumsum(new_run) - 1
        df = pd.DataFrame({key_col: k, "cell": c, "tu": t, "run": run})
        agg = df.groupby("run", sort=False).agg(
            **{key_col: (key_col, "first")}, cell=("cell", "first"),
            n_events=("tu", "size"), start_tu=("tu", "min"),
            end_tu=("tu", "max")).reset_index(drop=True)
        agg = agg[agg["n_events"] >= min_events]
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg

    return bucketed_groupby(ds, [key_col], fold, n_buckets)


def trajectory_stats(ds, *, key_col: str, ts_col: str, id_col: str,
                     x_col: str = "nx", y_col: str = "ny",
                     n_buckets: int = 64):
    """Per-key TRAJECTORY statistics (the scikit-mobility staple set)
    over grid coordinates: events ordered by the exact (ts, id) total
    order give the step sequence; everything is exact int64 —

    * ``n``          events in the trajectory
    * ``steps``      consecutive pairs (n - 1 when n >= 1)
    * ``manhattan``  total L1 path length  SUM |dx| + |dy|
    * ``net``        L1 displacement first -> last event
    * ``rog_num``    radius-of-gyration numerator
                     n * SUM(x^2 + y^2) - SUM(x)^2 - SUM(y)^2
                     (= n^2 * mean squared distance from the centroid,
                     kept as the exact integer so the oracle is
                     float-free; divide by n^2 downstream for RoG^2).

    One bucketed shuffle co-locates each key; inside a bucket the fold
    is one mergesort + vectorized diffs (key-boundary rows masked out
    of the step sums), so Python-call count is O(buckets).  Reference
    surface: zen3geo's per-scene iteration has no trajectory analog —
    this extends the od_counts/staypoints mobility family
    (``sequence.py:od_counts``)."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        k = g[key_col].to_numpy()
        x = g[x_col].to_numpy().astype(np.int64)
        y = g[y_col].to_numpy().astype(np.int64)
        same = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            same[1:] = k[1:] == k[:-1]
        dx = np.zeros(len(g), dtype=np.int64)
        dy = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            dx[1:] = np.abs(x[1:] - x[:-1])
            dy[1:] = np.abs(y[1:] - y[:-1])
        step_len = np.where(same, dx + dy, 0)
        df = pd.DataFrame({
            key_col: k, "sl": step_len, "st": same.astype(np.int64),
            "x": x, "y": y, "x2y2": x * x + y * y,
        })
        agg = df.groupby(key_col, sort=False).agg(
            n=("x", "size"), steps=("st", "sum"), manhattan=("sl", "sum"),
            sx=("x", "sum"), sy=("y", "sum"), sq=("x2y2", "sum"),
            fx=("x", "first"), fy=("y", "first"),
            lx=("x", "last"), ly=("y", "last"),
        ).reset_index()
        for c in ("n", "steps", "manhattan", "sx", "sy", "sq"):
            agg[c] = agg[c].astype(np.int64)
        agg["net"] = (np.abs(agg["lx"] - agg["fx"])
                      + np.abs(agg["ly"] - agg["fy"])).astype(np.int64)
        agg["rog_num"] = (agg["n"] * agg["sq"] - agg["sx"] * agg["sx"]
                          - agg["sy"] * agg["sy"]).astype(np.int64)
        return agg[[key_col, "n", "steps", "manhattan", "net", "rog_num"]]

    return bucketed_groupby(ds, [key_col], fold, n_buckets)


KM_DAY_US = 86_400 * 10**6
KM_SCALE = 1 << 20
KM_ZERO_Q = -50 * KM_SCALE   # ln-S sentinel when the last at-risk set dies


def kaplan_meier(ds, *, key_col: str, ts_col: str,
                 day_us: int = KM_DAY_US, censor_days: int = 7,
                 scale: int = KM_SCALE, n_buckets: int = 64):
    """KAPLAN-MEIER survival curve (Kaplan & Meier 1958) of per-key
    lifetimes: duration = (last - first event day); a key is CENSORED
    (still alive at observation end) when its last event day is within
    ``censor_days`` of the global max day, otherwise it "dies" at its
    duration.  For each death day t:

        n_risk  = #keys with duration >= t   (deaths + censored)
        ls_q    = Σ_{death days <= t} floor((ln(n_risk - n_death)
                                             - ln(n_risk)) * scale)

    ln-terms are quantized to integers (the entropy/kl discipline —
    math.log == DuckDB ln on this glibc) so the cumulative sum is
    order-free; ``log_surv`` = ls_q / scale is the ONE shared float
    (survival = exp(log_surv), left to the caller — exp is not
    mirrored).  A day where the whole at-risk set dies gets the
    sentinel term ``KM_ZERO_Q`` (S = 0).

    Plan: block-combined per-key (first, last) partials -> ONE bucketed
    key reduce -> a DAY-bounded (duration, last_day) 2-D histogram ->
    integer finale over <= days^2 rows on the driver.  The censor rule
    needs the global max day, which comes from the same histogram —
    one pass, the corpus shuffles once.  Returns a pyarrow Table (the
    finale is a bounded driver-side histogram fold — the schema
    survives the zero-death case) with one row per DEATH day
    (t_day, n_risk, n_death, n_censor, ls_q, log_surv)."""
    import math

    def partial(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        t = b.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({key_col: k, "fu": t, "lu": t}).groupby(
            key_col, sort=False, as_index=False).agg(
            fu=("fu", "min"), lu=("lu", "max"))
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def key_fold(g: pd.DataFrame) -> pd.DataFrame:
        ub = g.groupby(key_col, sort=False, as_index=False).agg(
            fu=("fu", "min"), lu=("lu", "max"))
        dur = (ub["lu"].to_numpy() - ub["fu"].to_numpy()) // day_us
        lday = ub["lu"].to_numpy() // day_us
        h = pd.DataFrame({"dur": dur, "lday": lday})
        h["n"] = np.int64(1)
        return h.groupby(["dur", "lday"], sort=False, as_index=False)[
            "n"].sum()

    hist = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col], key_fold, n_buckets=n_buckets)
    h = bucketed_groupby(
        hist, ["dur", "lday"],
        lambda g: g.groupby(["dur", "lday"], sort=False,
                            as_index=False)["n"].sum(),
        n_buckets=8).to_pandas()

    if not len(h):
        return pa.table({"t_day": pa.array([], pa.int64()),
                         "n_risk": pa.array([], pa.int64()),
                         "n_death": pa.array([], pa.int64()),
                         "n_censor": pa.array([], pa.int64()),
                         "ls_q": pa.array([], pa.int64()),
                         "log_surv": pa.array([], pa.float64())})

    m_day = int(h["lday"].max())
    death = (h["lday"].to_numpy() <= m_day - censor_days)
    n = h["n"].to_numpy().astype(np.int64)
    df = pd.DataFrame({"dur": h["dur"].to_numpy().astype(np.int64),
                       "n_death": np.where(death, n, 0),
                       "n_censor": np.where(death, 0, n),
                       "n": n}).groupby("dur", as_index=False).sum()
    df = df.sort_values("dur", kind="mergesort").reset_index(drop=True)
    n_risk = df["n"].to_numpy()[::-1].cumsum()[::-1]
    fs = float(scale)
    tq = np.zeros(len(df), np.int64)
    for i in range(len(df)):
        nd, nr = int(df["n_death"][i]), int(n_risk[i])
        if nd == 0:
            continue
        tq[i] = (math.floor((math.log(nr - nd) - math.log(nr)) * fs)
                 if nr > nd else KM_ZERO_Q)
    ls_q = np.cumsum(tq)
    keep = df["n_death"].to_numpy() > 0
    return pa.table({
        "t_day": pa.array(df["dur"].to_numpy()[keep], pa.int64()),
        "n_risk": pa.array(n_risk[keep].astype(np.int64)),
        "n_death": pa.array(df["n_death"].to_numpy()[keep].astype(
            np.int64)),
        "n_censor": pa.array(df["n_censor"].to_numpy()[keep].astype(
            np.int64)),
        "ls_q": pa.array(ls_q[keep].astype(np.int64)),
        "log_surv": pa.array(
            [float(int(v)) / fs for v in ls_q[keep]], pa.float64())})


def funnel_depth(ds, *, key_col: str, ts_col: str, id_col: str,
                 type_col: str, steps: list, n_buckets: int = 64):
    """Multi-step ORDERED funnel (the k-step product-analytics
    staple): per key, greedy earliest matching over the exact
    (ts, id) total order — step 1 is the key's first ``steps[0]``
    event, step s the first ``steps[s-1]`` event strictly AFTER the
    matched step s−1 (first-touch semantics, no horizon).  Keys with
    no step-1 event emit nothing.  Returns the funnel histogram
    (depth, n_users), depth in 1..len(steps).

    One bucketed key shuffle; inside a bucket every step resolves for
    ALL keys at once — positions of step-s rows are searchsorted
    against the previous step's matched positions, a same-key check
    replaces per-key slicing (the funnel_conversion discipline)."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        keys = g[key_col].to_numpy()
        types = g[type_col].to_numpy()
        n = len(g)
        # step 1: first steps[0] row per key
        m0 = types == steps[0]
        pos0 = np.flatnonzero(m0)
        if len(pos0) == 0:
            return pd.DataFrame({"depth": np.array([], np.int64),
                                 "n_users": np.array([], np.int64)})
        first = np.ones(len(pos0), dtype=bool)
        first[1:] = keys[pos0[1:]] != keys[pos0[:-1]]
        cur_pos = pos0[first]              # one row per funnel entrant
        cur_key = keys[cur_pos]
        depth = np.ones(len(cur_pos), np.int64)
        alive = np.ones(len(cur_pos), dtype=bool)
        for s in range(1, len(steps)):
            its = np.flatnonzero(types == steps[s])
            if len(its) == 0:
                break
            cand = np.searchsorted(its, cur_pos, side="right")
            ok = alive & (cand < len(its))
            safe = np.minimum(cand, len(its) - 1)
            nxt = its[safe]
            ok &= keys[nxt] == cur_key
            # keys[nxt] is the first steps[s] row at a LATER global
            # position; same key -> strictly after in the total order
            depth[ok] += 1
            cur_pos = np.where(ok, nxt, cur_pos)
            alive = ok
            if not alive.any():
                break
        df = pd.DataFrame({"depth": depth,
                           "n_users": np.ones(len(depth), np.int64)})
        return df.groupby("depth", sort=False, as_index=False).sum()

    parts = bucketed_groupby(ds, [key_col], fold, n_buckets)

    def finalize(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("depth", as_index=False)["n_users"] \
            .sum()
        df["depth"] = df["depth"].astype(np.int64)
        df["n_users"] = df["n_users"].astype(np.int64)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    # depth domain is len(steps) rows — one micro-task
    return parts.repartition(1).map_batches(finalize,
                                            batch_format="pyarrow")


def last_touch_attribution(ds, *, key_col: str, ts_col: str, id_col: str,
                           type_col: str, value_col: str, conv_type: str,
                           window: int, n_buckets: int = 64):
    """LAST-TOUCH marketing attribution (the funnel family's revenue
    leg): each ``conv_type`` event credits the LATEST same-key
    non-conversion event strictly before it in the exact (ts, id)
    total order and within ``window`` (ts units); conversions with no
    such touch credit the synthetic channel ``'direct'``.  Output the
    per-channel summary (touch_type, conversions, credited), credited
    = exact integer sum of the conversion's ``value_col``.

    One bucketed key shuffle; inside a bucket the latest touch for
    ALL conversions resolves at once — touch row positions are
    searchsorted against conversion positions on the global
    (key, ts, id) sort, a same-key check replaces per-key slicing
    (the funnel_depth discipline).  An earlier touch can never rescue
    a window miss (it is older still), so the single candidate per
    conversion is exact."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        keys = g[key_col].to_numpy()
        types = g[type_col].to_numpy()
        ts = g[ts_col].to_numpy().astype(np.int64)
        vals = g[value_col].to_numpy().astype(np.int64)
        conv_pos = np.flatnonzero(types == conv_type)
        if len(conv_pos) == 0:
            return pd.DataFrame({
                "touch_type": np.array([], object),
                "conversions": np.array([], np.int64),
                "credited": np.array([], np.int64)})
        touch_pos = np.flatnonzero(types != conv_type)
        channel = np.full(len(conv_pos), "direct", dtype=object)
        if len(touch_pos):
            idx = np.searchsorted(touch_pos, conv_pos, side="left") - 1
            ok = idx >= 0
            cand = touch_pos[np.maximum(idx, 0)]
            ok &= keys[cand] == keys[conv_pos]
            ok &= ts[conv_pos] - ts[cand] <= window
            channel[ok] = types[cand[ok]]
        df = pd.DataFrame({"touch_type": channel,
                           "conversions": np.ones(len(conv_pos), np.int64),
                           "credited": vals[conv_pos]})
        return df.groupby("touch_type", sort=False, as_index=False).sum()

    parts = bucketed_groupby(ds, [key_col], fold, n_buckets)

    def finalize(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("touch_type", as_index=False)[
            ["conversions", "credited"]].sum()
        df["conversions"] = df["conversions"].astype(np.int64)
        df["credited"] = df["credited"].astype(np.int64)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    # channel domain is #event-types rows — one micro-task
    return parts.repartition(1).map_batches(finalize,
                                            batch_format="pyarrow")


def ewma_last_k(ds, *, key_col: str, ts_col: str, id_col: str,
                value_col: str, k: int = 8, n_buckets: int = 64):
    """Per-key EXPONENTIALLY weighted moving average of the last ``k``
    integer values in (ts, id) order with decay 1/2 — the dyadic
    weights make it EXACT: the most recent value gets weight
    2^(k-1), the j-th most recent 2^(k-j), so with m = min(n, k)
    values present

        ewma_num = Σ_j v_j · 2^(k-j)          (exact int64)
        ewma     = ewma_num / (2^k − 2^(k−m)) (ONE float division)

    (the truncated-renormalized EWMA — weights sum to the
    denominator exactly).  Output one row per key
    (key, n_used, ewma_num, ewma).  One bucketed key shuffle;
    position-from-end is a vectorized per-key cumcount, no per-key
    slicing."""
    if not (1 <= k <= 31):
        raise ValueError("k must be in [1, 31]")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        keys = g[key_col].to_numpy()
        vals = g[value_col].to_numpy().astype(np.int64)
        n = len(g)
        # per-key segment boundaries on the sorted frame
        new = np.ones(n, dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        seg_start = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        seg_end = np.append(seg_start[1:], n)          # exclusive
        pos_from_end = (seg_end[seg_id] - 1) - np.arange(n)
        keep = pos_from_end < k                         # last k rows/key
        rn = pos_from_end[keep] + 1                     # 1 = most recent
        w = np.int64(1) << (k - rn)
        num = vals[keep] * w
        df = pd.DataFrame({key_col: keys[keep], "__num": num,
                           "__one": np.ones(keep.sum(), np.int64)})
        agg = df.groupby(key_col, sort=False, as_index=False).sum()
        m = agg["__one"].to_numpy().astype(np.int64)
        enum = agg["__num"].to_numpy().astype(np.int64)
        denom = (np.int64(1) << k) - (np.int64(1) << (k - m))
        return pd.DataFrame({
            key_col: agg[key_col],
            "n_used": m,
            "ewma_num": enum,
            "ewma": enum.astype(np.float64) / denom.astype(np.float64)})

    return bucketed_groupby(ds, [key_col], fold, n_buckets)


def dtw_pairs(ds, *, key_col: str, ts_col: str, value_col: str,
              length: int = 8, day_us: int = 86_400_000_000,
              n_buckets: int = 16):
    """Pairwise DYNAMIC-TIME-WARPING distance between every two keys'
    daily-total series (the time-series similarity staple;
    Sakoe–Chiba 1978 recurrence, unconstrained path, |x−y| cost) —
    series are the first ``length`` days from the GLOBAL min day,
    zero-filled, exact integer sums, so the DP is exact-int and the
    output (key_a, key_b, dtw) with key_a < key_b is deterministic.

    Scale shape (the knn_confusion broadcast discipline): the corpus
    reduces to the KEY-BOUNDED (key, day, sum) histogram via one
    bucketed shuffle; the keys×length int64 matrix broadcasts once
    via ray.put, and each batch of keys computes its pair block
    against all LARGER keys — the DP is length² SCALAR steps of
    P-length vector ops (the levenshtein_pairs trick), never a
    per-pair Python loop.  Pair volume is keys²/2: a key-bounded
    operator by contract (sample or band-limit above ~10^5 keys)."""
    import ray

    from .bucketed import bucketed_groupby

    def partial(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = b.column(ts_col).to_numpy(zero_copy_only=False) // day_us
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = pd.DataFrame({"k": k, "d": d, "c": v})
        g = df.groupby(["k", "d"], sort=False, as_index=False)["c"].sum()
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    hist = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["k"],
        lambda g: g.groupby(["k", "d"], sort=False,
                            as_index=False)["c"].sum(),
        n_buckets=n_buckets).to_pandas()     # key-bounded
    if len(hist) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "key_a": pa.array([], pa.int64()),
            "key_b": pa.array([], pa.int64()),
            "dtw": pa.array([], pa.int64())}))
    lo = int(hist["d"].min())
    keys = np.sort(hist["k"].unique().astype(np.int64))
    mat = np.zeros((len(keys), length), dtype=np.int64)
    kk = hist["k"].to_numpy().astype(np.int64)
    dd = hist["d"].to_numpy().astype(np.int64) - lo
    cc = hist["c"].to_numpy().astype(np.int64)
    m = dd < length
    mat[np.searchsorted(keys, kk[m]), dd[m]] = cc[m]
    blob_ref = ray.put((keys, mat))

    import ray.data as rd

    users = rd.from_arrow(pa.table({"k": pa.array(keys)})) \
        .repartition(max(1, min(n_buckets, len(keys))))

    def pair_block(b: pa.Table, _ref=blob_ref) -> pa.Table:
        from ..stages.graph import _get_blob

        ks, mt = _get_blob(_ref)
        mine = b.column("k").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, mine)
        # pairs (u, v) with u < v: each of my keys against all larger
        reps = len(ks) - pos - 1
        iu = np.repeat(pos, reps)
        base = np.cumsum(reps) - reps
        iv = (np.arange(int(reps.sum()), dtype=np.int64)
              - np.repeat(base, reps)) + np.repeat(pos, reps) + 1
        X = mt[iu]
        Y = mt[iv]
        L = mt.shape[1]
        prev = None
        for i in range(L):
            row = np.empty((len(iu), L), dtype=np.int64) \
                if len(iu) else np.empty((0, L), dtype=np.int64)
            for j in range(L):
                cost = np.abs(X[:, i] - Y[:, j])
                if i == 0 and j == 0:
                    row[:, 0] = cost
                elif i == 0:
                    row[:, j] = row[:, j - 1] + cost
                elif j == 0:
                    row[:, 0] = prev[:, 0] + cost
                else:
                    row[:, j] = cost + np.minimum(
                        np.minimum(prev[:, j], row[:, j - 1]),
                        prev[:, j - 1])
            prev = row
        dtw = prev[:, L - 1] if len(iu) else np.empty(0, np.int64)
        return pa.table({"key_a": pa.array(ks[iu]),
                         "key_b": pa.array(ks[iv]),
                         "dtw": pa.array(dtw)})

    return users.map_batches(pair_block, batch_format="pyarrow")


def interarrival_hist(ds, *, key_col: str, ts_col: str, id_col: str,
                      bucket_us: int, max_bucket: int,
                      n_buckets: int = 16):
    """INTER-ARRIVAL-TIME histogram over per-key ordered event streams
    — the traffic-model / burstiness diagnostic: consecutive deltas in
    (ts, id) order per key, floor-bucketed at ``bucket_us`` and
    clamped to ``max_bucket`` (the tail bucket).  One per-key shuffle
    (keys whole-in-bucket) + a combiner histogram; output
    (bucket, n) over the dense 0..max_bucket domain.
    """
    import pandas as pd

    from .bucketed import bucketed_groupby

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        t = g[ts_col].to_numpy().astype(np.int64)
        k = g[key_col].to_numpy()
        d = t[1:] - t[:-1]
        same = (k[1:] == k[:-1])
        d = d[same]
        b = np.minimum(d // bucket_us, max_bucket)
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bucket": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    parts = bucketed_groupby(ds, [key_col], per_key,
                             n_buckets=n_buckets)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("bucket", sort=False, as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    hist = bucketed_groupby(parts, ["bucket"], fold, n_buckets=4)

    def dense(b: pa.Table) -> pa.Table:
        return b

    return hist.map_batches(dense, batch_format="pyarrow")


def late_event_counts(ds, *, ts_col: str, id_col: str,
                      window_us: int, watermark_us: int,
                      delay_mod_us: int, delay_mult: int = 7919):
    """WATERMARK-lateness accounting — the streaming-ingest health
    table: each event's ARRIVAL time is its event time plus a
    deterministic per-id delay ``(id * delay_mult) % delay_mod_us``
    (the reprocessable stand-in for transport lag); an event is LATE
    when it arrives after its window's close plus the watermark.
    Pure map + one small keyed reduce: output per event-time window
    (win, n_events, n_late).
    """
    from .zonal import zonal_aggregate

    def prep(b: pa.Table) -> pa.Table:
        t = b.column(ts_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        i = b.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        arr = t + (i * delay_mult) % delay_mod_us
        win = t // window_us
        late = (arr > (win + 1) * window_us + watermark_us) \
            .astype(np.int64)
        return pa.table({"win": pa.array(win),
                         "late": pa.array(late)})

    out = zonal_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["win"], {"late": ["sum"]})

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "win": b.column("win"),
            "n_events": b.column("n"),
            "n_late": b.column("late_sum")})

    return out.map_batches(rename, batch_format="pyarrow")
