"""Keyed analytic operators: share-of-total, positional values per key,
robust (median/MAD) outlier flagging, and CUBE grouping sets.

Scale shape: every operator here is either (a) one coarse-bucket
shuffle with vectorized pandas inside (share_of_key, first_last_nth),
(b) combiner-first — per-batch pre-reduction bounds the shuffle by the
value DOMAIN, not the row count (mad_outliers via
stages/zonal.py:grouped_median; cube2 via one fine aggregate whose
subtotal levels derive in a single micro-task, the rollup pattern).

Arithmetic is oracle-mirrorable by construction: shares divide two
EXACT int64s (one IEEE op), medians are the (a+b)/2 of ints that SQL
MEDIAN evaluates, and MAD works in doubled units (2*x - 2*median is an
exact integer) so the second median is again over ints.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketed import bucketed_groupby
from .zonal import grouped_median, zonal_aggregate


def share_of_key(ds, *, key_col: str, value_col: str,
                 out_col: str = "share", n_buckets: int = 64):
    """Ratio-to-report: each row's int64 ``value_col`` divided by its
    key's total — value / SUM(value) OVER (PARTITION BY key).  One
    bucket shuffle; the division is a single IEEE op on two exact
    integers, so it matches SQL bit-for-bit."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value_col].to_numpy()
        tot = g.groupby(key_col, sort=False)[value_col].transform("sum")
        g[out_col] = v.astype(np.float64) / tot.to_numpy().astype(np.float64)
        return g

    return bucketed_groupby(ds, [key_col], fn, n_buckets)


def first_last_nth(ds, *, key_col: str, order_col: str, value_col: str,
                   nth: int, n_buckets: int = 64):
    """Per key in ``order_col`` order (unique within key): the first
    value, the last value, the ``nth`` value (null when the key has
    fewer than nth rows) and the row count.  Output columns:
    key, first_v, last_v, nth_v, n."""
    if nth < 1:
        raise ValueError("nth must be >= 1 (NTH_VALUE is 1-based)")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        v = g[value_col].to_numpy()
        first = np.ones(len(keys), dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(first)
        ends = np.empty(len(starts), dtype=np.int64)
        ends[:-1] = starts[1:] - 1
        if len(starts):
            ends[-1] = len(keys) - 1
        counts = ends - starts + 1
        nth_pos = starts + (nth - 1)
        has_nth = counts >= nth
        nth_v = np.where(
            has_nth, v[np.minimum(nth_pos, max(len(v) - 1, 0))].astype(
                np.float64), np.nan)
        return pd.DataFrame({
            key_col: keys[starts],
            "first_v": v[starts],
            "last_v": v[ends],
            "nth_v": nth_v,
            "n": counts.astype(np.int64),
        })

    return bucketed_groupby(ds, [key_col], fn, n_buckets)


def mad_outliers(ds, *, key_cols: list[str], value_col: str, uid_col: str,
                 k: int = 3, n_buckets: int = 32):
    """Robust per-group outliers: |x - median| > k * MAD, computed
    EXACTLY on an int64 value column.

    To keep every step oracle-exact the deviation works in doubled
    units: med = (a+b)/2 can end in .5, but 2*med = a+b is an exact
    integer, so dev2 = |2*x - 2*med| is int64 and the second
    (MAD) median runs over ints again.  The outlier test is then
    dev2 > k * (2*MAD) evaluated as dev2 > k * mad2 with mad2 itself a
    .0/.5 double — one exact IEEE multiply + compare.

    Both medians use the combiner-first grouped_median (shuffle bounded
    by the value domain); group medians broadcast back via a per-batch
    pandas merge against the tiny medians table (#groups rows).
    Returns outlier rows: uid, keys, value, med, mad2, dev2.
    """
    import ray

    med_df = grouped_median(
        ds, key_cols, value_col, n_buckets=n_buckets
    ).to_pandas()  # one row per group — bounded by the key domain
    med_df["med2"] = np.rint(2.0 * med_df["median"].to_numpy()).astype(
        np.int64)  # 2*median = a+b, exact
    med_ref = ray.put(med_df[[*key_cols, "med2"]])

    def add_dev(b: pa.Table) -> pa.Table:
        df = b.to_pandas().merge(ray.get(med_ref), on=key_cols, how="left")
        df["dev2"] = np.abs(
            2 * df[value_col].to_numpy().astype(np.int64)
            - df.pop("med2").to_numpy()
        )
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    with_dev = ds.map_batches(add_dev, batch_format="pyarrow")
    mad_df = grouped_median(
        with_dev, key_cols, "dev2", n_buckets=n_buckets
    ).to_pandas().rename(columns={"median": "mad2"})
    stats = med_df[[*key_cols]].copy()
    stats["med"] = med_df["med2"].to_numpy() / 2.0
    stats = stats.merge(mad_df, on=key_cols)
    stats_ref = ray.put(stats)

    def flag(b: pa.Table) -> pa.Table:
        df = b.to_pandas().merge(ray.get(stats_ref), on=key_cols, how="left")
        out = df[df["dev2"].to_numpy()
                 > float(k) * df["mad2"].to_numpy()]
        cols = [uid_col, *key_cols, value_col, "med", "mad2", "dev2"]
        return pa.Table.from_pandas(
            out[cols], preserve_index=False).replace_schema_metadata(None)

    return with_dev.map_batches(flag, batch_format="pyarrow")


def cube2(ds, *, dim1: str, dim2: str, value_col: str):
    """GROUP BY CUBE(dim1, dim2): all four grouping sets — (d1,d2),
    (d1), (d2), () — from ONE distributed fine aggregate; the three
    coarser levels re-sum the handful of fine rows in a single final
    micro-task (exact whole-number sums), the rollup pattern extended
    to the full lattice.  Output: dim1, dim2, n, {value}_sum with NULL
    marking the rolled-up dimension."""
    fine = zonal_aggregate(ds, [dim1, dim2], {value_col: ["sum"]})
    sum_col = f"{value_col}_sum"

    def all_levels(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        # dropna=False: SQL GROUP BY CUBE keeps NULL-dim groups
        lv1 = df.groupby(dim1, as_index=False, dropna=False)[
            ["n", sum_col]].sum()
        lv1[dim2] = None
        lv2 = df.groupby(dim2, as_index=False, dropna=False)[
            ["n", sum_col]].sum()
        lv2[dim1] = None
        total = pd.DataFrame({
            dim1: [None], dim2: [None],
            "n": [df["n"].sum()], sum_col: [df[sum_col].sum()],
        })
        cols = [dim1, dim2, "n", sum_col]
        out = pd.concat(
            [df[cols], lv1[cols], lv2[cols], total[cols]],
            ignore_index=True,
        )
        out["n"] = out["n"].astype(np.int64)
        # keep the input's sum dtype (double sums of integral values are
        # exact at any addition order, so the SQL mirror matches)
        out[sum_col] = out[sum_col].astype(df[sum_col].dtype)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return fine.repartition(1).map_batches(all_levels,
                                           batch_format="pyarrow")


def minmax_scale(ds, *, key_cols: list[str], value_col: str,
                 out_col: str = "scaled"):
    """Per-group min-max feature scaling: ``(x - min) / (max - min)``
    over an int64 value column — one subtraction of exact ints and one
    IEEE division, so the SQL mirror matches bit-for-bit.  Groups where
    max == min emit NULL (the undefined-range convention).

    Combiner-first: per-batch min/max partials reduce to one tiny
    per-group table (bounded by the key domain), broadcast via
    ``ray.put``; the scaling itself is a pure ``map_batches`` pass —
    the rows never shuffle.
    """
    import ray

    stats = zonal_aggregate(
        ds, key_cols, {value_col: ["min", "max"]}
    ).to_pandas()  # one row per group
    lo = stats[f"{value_col}_min"].to_numpy().astype(np.int64)
    hi = stats[f"{value_col}_max"].to_numpy().astype(np.int64)
    stats = stats[[*key_cols]].assign(__lo=lo, __rng=hi - lo)
    stats_ref = ray.put(stats)

    def fn(b: pa.Table) -> pa.Table:
        df = b.to_pandas().merge(ray.get(stats_ref), on=key_cols, how="left")
        rng = df.pop("__rng").to_numpy()
        num = (df[value_col].to_numpy().astype(np.int64)
               - df.pop("__lo").to_numpy()).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            scaled = num / rng.astype(np.float64)
        df[out_col] = np.where(rng > 0, scaled, np.nan)
        out = pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def zscore(ds, *, key_cols: list[str], value_col: str,
           out_col: str = "z"):
    """Per-group z-score standardization of an int64 value column:
    ``(x - mean) / std`` with population variance ``sumsq/n - mean²``.

    ``sum`` and ``sumsq`` accumulate as EXACT int64 (caller must ensure
    ``sum(x²)`` fits — scale values accordingly), so the float pipeline
    is a fixed op sequence on exact integers and the SQL mirror matches
    bit-for-bit.  Combiner-first: per-batch partials reduce to one tiny
    per-group table broadcast via ``ray.put``; rows never shuffle.
    Groups with zero variance emit NULL.
    """
    import ray

    sq = f"__{value_col}_sq"

    def add_sq(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(sq, pa.array(v * v, pa.int64()))

    stats = zonal_aggregate(
        ds.map_batches(add_sq, batch_format="pyarrow"),
        key_cols, {value_col: ["sum"], sq: ["sum"]},
    ).to_pandas()  # one row per group
    n = stats["n"].to_numpy().astype(np.float64)
    mu = stats[f"{value_col}_sum"].to_numpy().astype(np.float64) / n
    var = stats[f"{sq}_sum"].to_numpy().astype(np.float64) / n - mu * mu
    with np.errstate(invalid="ignore"):
        std = np.sqrt(var)
    stats = stats[[*key_cols]].assign(__mu=mu, __std=std)
    stats_ref = ray.put(stats)

    def fn(b: pa.Table) -> pa.Table:
        df = b.to_pandas().merge(ray.get(stats_ref), on=key_cols, how="left")
        mu = df.pop("__mu").to_numpy()
        std = df.pop("__std").to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (df[value_col].to_numpy().astype(np.float64) - mu) / std
        df[out_col] = np.where(std > 0, z, np.nan)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(fn, batch_format="pyarrow")


def winsorize(ds, *, key_cols: list[str], value_col: str,
              q_lo: float = 0.1, q_hi: float = 0.9,
              out_col: str = "w", n_buckets: int = 32):
    """Per-group winsorization: clip an int64 value column to its
    group's [q_lo, q_hi] CONTINUOUS (interpolated) quantiles —
    ``LEAST(GREATEST(x, p_lo), p_hi)`` with the quantiles from the exact
    combiner-first :func:`~.zonal.grouped_quantiles_cont` (shuffle
    bounded by distinct (key, value) pairs, broadcast back via
    ``ray.put``); the clipped rows never shuffle.  The clamp is
    max-then-min on exact-int-derived doubles, so SQL mirrors it
    bit-for-bit.
    """
    import ray

    from .zonal import grouped_quantiles_cont

    lab_lo = f"p{int(round(q_lo * 100))}"
    lab_hi = f"p{int(round(q_hi * 100))}"
    qs = grouped_quantiles_cont(ds, key_cols, value_col,
                                [q_lo, q_hi], n_buckets=n_buckets).to_pandas()
    qs_ref = ray.put(qs[[*key_cols, lab_lo, lab_hi]])

    def fn(b: pa.Table) -> pa.Table:
        df = b.to_pandas().merge(ray.get(qs_ref), on=key_cols, how="left")
        lo = df.pop(lab_lo).to_numpy()
        hi = df.pop(lab_hi).to_numpy()
        x = df[value_col].to_numpy().astype(np.float64)
        df[out_col] = np.minimum(np.maximum(x, lo), hi)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(fn, batch_format="pyarrow")


def skyline2d(ds, x_col: str, y_col: str, *, n_buckets: int = 16):
    """2-D SKYLINE (Pareto frontier, maximize both): the distinct
    (x, y) pairs no other row strictly dominates (x' ≥ x AND y' ≥ y
    with at least one strict), plus how many input rows carry each
    surviving pair — the multi-objective top-N primitive (best
    quality-vs-length docs, price-vs-size parts...).

    Combiner-first and exact: the global frontier is a subset of the
    union of per-block frontiers, so each batch reduces to its local
    frontier pairs + counts (value-domain-bounded, never row-bounded),
    one bucketed reduce merges duplicate pairs' counts, and a
    single-block finale runs the sorted cummax scan.  Dominated pairs'
    counts drop with them.  Output: (x_col, y_col, n_rows), frontier
    pairs only.
    """

    def frontier(x: np.ndarray, y: np.ndarray, c: np.ndarray):
        """Keep the non-dominated pairs among UNIQUE (x, y) pairs."""
        # group max y per x, then keep y strictly above the running
        # max over strictly-larger x
        o = np.lexsort((-y, -x))
        x, y, c = x[o], y[o], c[o]
        newx = np.ones(len(x), dtype=bool)
        newx[1:] = x[1:] != x[:-1]
        # within an x group the first (max) y is the only candidate
        keep = newx.copy()
        gy = y[newx]                      # per-group max y, x desc
        run = np.maximum.accumulate(gy)
        prev = np.concatenate([[np.iinfo(np.int64).min], run[:-1]])
        keep[newx] &= gy > prev
        return x[keep], y[keep], c[keep]

    def partial(b: pa.Table) -> pa.Table:
        x = b.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = b.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((y, x))
        xs, ys = x[o], y[o]
        new = np.ones(len(xs), dtype=bool)
        new[1:] = (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])
        idx = np.flatnonzero(new)
        c = np.diff(np.append(idx, len(xs))).astype(np.int64)
        fx, fy, fc = frontier(xs[idx], ys[idx], c)
        return pa.table({x_col: pa.array(fx), y_col: pa.array(fy),
                         "n_rows": pa.array(fc)})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby([x_col, y_col], sort=False,
                         as_index=False)["n_rows"].sum()

    merged = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        [x_col, y_col], merge, n_buckets=n_buckets)

    def finale(b: pa.Table) -> pa.Table:
        x = b.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = b.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column("n_rows").to_numpy(zero_copy_only=False).astype(np.int64)
        fx, fy, fc = frontier(x, y, c)
        return pa.table({x_col: pa.array(fx), y_col: pa.array(fy),
                         "n_rows": pa.array(fc)})

    return merged.repartition(1).map_batches(finale,
                                             batch_format="pyarrow")
