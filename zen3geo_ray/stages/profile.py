"""One-pass distributed column profiler (table statistics).

The stats that drive pruning and planning at 100 TB — per-column row
count, null count, min/max, exact number of distinct values — computed
the combiner-first way:

* stats: each block reduces to ONE row per profiled column
  (n, nulls, min, max); the groupby moves O(#blocks x #cols) tiny rows;
* exact NDV: each block emits its DISTINCT (column, value) pairs
  (bounded by per-block cardinality, the same shape as exact dedup),
  deduplicated with the coarse-bucket reduce and counted per column.
  Profile NDV only on bounded-cardinality columns at scale — for
  unbounded keys use the HLL path (stages/sketch.approx_distinct).

Output is a tiny long-form table (one row per column), returned as an
eager pyarrow Table: ``col_name, n, nulls, min_num, max_num, min_str,
max_str, ndv`` with the min/max pair of the other type null.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def profile_columns(ds, numeric_cols: list[str], string_cols: list[str] = (),
                    n_buckets: int = 32) -> pa.Table:
    from .bucketed import bucketed_groupby, first_per_key
    from .zonal import zonal_aggregate

    numeric_cols = list(numeric_cols)
    string_cols = list(string_cols)
    all_cols = numeric_cols + string_cols

    def stats_partial(b: pa.Table) -> pa.Table:
        rows = []
        for c in numeric_cols:
            col = b.column(c)
            v = col.to_numpy(zero_copy_only=False).astype(np.float64)
            valid = v[~np.isnan(v)] if col.null_count else v
            rows.append({
                "col_name": c, "n": len(b), "nulls": col.null_count,
                "min_num": float(valid.min()) if len(valid) else None,
                "max_num": float(valid.max()) if len(valid) else None,
                "min_str": None, "max_str": None,
            })
        for c in string_cols:
            col = b.column(c)
            vals = col.drop_null()
            rows.append({
                "col_name": c, "n": len(b), "nulls": col.null_count,
                "min_num": None, "max_num": None,
                "min_str": pa.compute.min(vals).as_py() if len(vals) else None,
                "max_str": pa.compute.max(vals).as_py() if len(vals) else None,
            })
        df = pd.DataFrame(rows)
        return pa.table({
            "col_name": pa.array(df["col_name"], pa.string()),
            "n": pa.array(df["n"], pa.int64()),
            "nulls": pa.array(df["nulls"], pa.int64()),
            "min_num": pa.array(df["min_num"], pa.float64()),
            "max_num": pa.array(df["max_num"], pa.float64()),
            "min_str": pa.array(df["min_str"], pa.string()),
            "max_str": pa.array(df["max_str"], pa.string()),
        })

    def stats_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("col_name", sort=False).agg(
            n=("n", "sum"), nulls=("nulls", "sum"),
            min_num=("min_num", "min"), max_num=("max_num", "max"),
            min_str=("min_str", "min"), max_str=("max_str", "max"),
        ).reset_index()

    stats = bucketed_groupby(
        ds.map_batches(stats_partial, batch_format="pyarrow"),
        ["col_name"], stats_merge, n_buckets=min(n_buckets, 8),
    ).to_pandas()  # bounded: one row per profiled column

    def distinct_partial(b: pa.Table) -> pa.Table:
        # one row per within-block distinct (column, value); numerics are
        # keyed by repr(float) — injective, so distinctness is preserved
        outs = []
        for c in all_cols:
            col = b.column(c)
            if c in numeric_cols:
                u = np.unique(col.to_numpy(zero_copy_only=False).astype(np.float64))
                vals = pa.array([repr(x) for x in u[~np.isnan(u)]], pa.string())
            else:
                vals = pa.compute.unique(col.drop_null().combine_chunks())
            outs.append(pa.table({
                "col_name": pa.array([c] * len(vals), pa.string()),
                "value_key": vals,
            }))
        return pa.concat_tables(outs)

    pairs = ds.map_batches(distinct_partial, batch_format="pyarrow")
    uniq = first_per_key(pairs, ["col_name", "value_key"],
                         ["col_name"], n_buckets=n_buckets)
    ndv = zonal_aggregate(uniq, ["col_name"], {}).to_pandas().rename(
        columns={"n": "ndv"}
    )  # bounded: one row per column

    out = stats.merge(ndv, on="col_name", how="left")
    out = out.set_index("col_name").loc[all_cols].reset_index()
    return pa.table({
        "col_name": pa.array(out["col_name"], pa.string()),
        "n": pa.array(out["n"].astype(np.int64)),
        "nulls": pa.array(out["nulls"].astype(np.int64)),
        "min_num": pa.array([None if pd.isna(v) else float(v)
                             for v in out["min_num"]], pa.float64()),
        "max_num": pa.array([None if pd.isna(v) else float(v)
                             for v in out["max_num"]], pa.float64()),
        "min_str": pa.array(
            [None if (isinstance(v, float) or v is None) else v
             for v in out["min_str"]], pa.string()),
        "max_str": pa.array(
            [None if (isinstance(v, float) or v is None) else v
             for v in out["max_str"]], pa.string()),
        "ndv": pa.array(out["ndv"].astype(np.int64)),
    })


def histogram(ds, col: str, lo: int, width: int, n_bins: int,
              bin_col: str = "bin", count_col: str = "n"):
    """Fixed-bin histogram of an integer column: ``bin =
    clamp(floor((x - lo) / width), 0, n_bins - 1)`` (under/overflow
    collapse into the edge bins), counted per bin.

    Per-batch bincount combiner — exactly ``n_bins`` partial rows leave
    each block regardless of row count — then one tiny final groupby.
    Integer arithmetic end-to-end (SQL-mirrorable with // semantics:
    numpy floor_divide == SQL FLOOR(x / w) only for non-negative x - lo,
    so the clamp happens BEFORE the divide on the shifted value).
    """

    def part(b: pa.Table) -> pa.Table:
        x = b.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        shifted = np.maximum(x - lo, 0)
        bins = np.minimum(shifted // width, n_bins - 1)
        counts = np.bincount(bins, minlength=n_bins).astype(np.int64)
        return pa.table({
            bin_col: pa.array(np.arange(n_bins, dtype=np.int64)),
            count_col: pa.array(counts, pa.int64()),
        })

    partials = ds.map_batches(part, batch_format="pyarrow")
    agg = partials.groupby(bin_col).sum(count_col)
    return agg.map_batches(
        lambda b: b.rename_columns([bin_col, count_col]),
        batch_format="pyarrow",
    )


#: Benford first-digit probabilities log10(1 + 1/d), d = 1..9 —
#: PRECOMPUTED constants inlined identically into the SQL oracle (the
#: ndcg discipline: no libm call on either side at query time).
BENFORD_P = (
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
)


def benford_profile(ds, value_col: str, n_buckets: int = 4) -> pa.Table:
    """Benford's-law first-digit audit of a POSITIVE integer column:
    per digit d = 1..9 the observed count, the expected count
    n * log10(1+1/d) (precomputed constants, ONE multiply) and the
    chi-square contribution (obs-exp)^2/exp (one shared float shape,
    SQL-mirrored).  Digits are found by repeated integer division —
    combiner-first 9-bin histograms, one tiny shuffle.
    Output (digit, obs, exp, chi2_term)."""

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = v[v > 0]
        while len(v) and int(v.max()) >= 10:
            v = np.where(v >= 10, v // 10, v)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"digit": pa.array(u, pa.int64()),
                         "obs": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("digit", as_index=False)["obs"].sum()

    from .bucketed import bucketed_groupby

    df = bucketed_groupby(parts, ["digit"], fold,
                          n_buckets=n_buckets).to_pandas()
    df = df.sort_values("digit", kind="mergesort")
    n = int(df["obs"].sum())
    digits = df["digit"].to_numpy().astype(np.int64)
    obs = df["obs"].to_numpy().astype(np.int64)
    exp, term = [], []
    for d, o in zip(digits.tolist(), obs.tolist()):
        e = float(n) * BENFORD_P[d - 1]
        exp.append(e)
        diff = float(o) - e
        term.append(diff * diff / e)
    return pa.table({
        "digit": pa.array(digits),
        "obs": pa.array(obs),
        "exp": pa.array(exp, pa.float64()),
        "chi2_term": pa.array(term, pa.float64()),
    })


def fd_check(ds, det_col: str, dep_col: str, *, label: str | None = None,
             n_buckets: int = 16) -> pa.Table:
    """FUNCTIONAL-DEPENDENCY profiler: does ``det_col`` determine
    ``dep_col``?  The data-quality check behind key discovery and
    denormalization audits (Papenbrock 2015's FD-discovery verify
    step, run distributed).  Combiner-first: each block reduces to its
    DISTINCT (det, dep) pairs, the coarse-bucket reduce dedups
    globally, and per-det cardinalities fold to ONE summary row

        (fd, n_keys, n_violated, max_card)

    — n_violated = determinant values with >1 distinct dependent,
    max_card the worst multiplicity; the FD holds iff n_violated == 0.
    Only distinct pairs ever shuffle (bounded by the true pair
    cardinality, never the row count)."""
    from .bucketed import bucketed_groupby

    name = label or f"{det_col}->{dep_col}"

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([det_col, dep_col]).to_pandas()
        return pa.Table.from_pandas(
            df.drop_duplicates([det_col, dep_col]),
            preserve_index=False).replace_schema_metadata(None)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([det_col, dep_col])
        card = g.groupby(det_col, sort=False, as_index=False).size()
        return pd.DataFrame({
            "n_keys": [np.int64(len(card))],
            "n_violated": [np.int64((card["size"] > 1).sum())],
            "max_card": [np.int64(card["size"].max())
                         if len(card) else np.int64(0)]})

    parts = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        [det_col], fold, n_buckets=n_buckets).to_pandas()
    return pa.table({
        "fd": pa.array([name], pa.string()),
        "n_keys": pa.array([int(parts["n_keys"].sum())], pa.int64()),
        "n_violated": pa.array([int(parts["n_violated"].sum())],
                               pa.int64()),
        "max_card": pa.array([int(parts["max_card"].max())
                              if len(parts) else 0], pa.int64())})


def k_anonymity(ds, qi_cols: list[str], k: int, *,
                n_buckets: int = 16) -> pa.Table:
    """K-ANONYMITY audit (Sweeney 2002): partition rows by the
    quasi-identifier tuple and report how exposed the table is —
    combiner-first (each block reduces to its (qi..., count) partials,
    one bucketed sum), finale a handful of exact ints:

        (n_rows, n_classes, min_class, n_rows_exposed,
         n_classes_exposed)

    where exposed = equivalence class smaller than ``k``.  The table
    is k-anonymous iff n_classes_exposed == 0.  Every class lives
    whole inside one bucket, so each bucket folds straight to ONE
    summary row — the driver reduce sees n_buckets rows no matter how
    many QI classes exist."""
    from .bucketed import bucketed_groupby

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(qi_cols).to_pandas()
        out = df.groupby(qi_cols, sort=False, as_index=False).size()
        out = out.rename(columns={"size": "c"})
        out["c"] = out["c"].astype(np.int64)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(qi_cols, sort=False)["c"].sum() \
            .to_numpy().astype(np.int64)
        exposed = c < k
        return pd.DataFrame({
            "n_rows": [np.int64(c.sum())],
            "n_classes": [np.int64(len(c))],
            "min_class": [np.int64(c.min()) if len(c) else np.int64(0)],
            "n_rows_exposed": [np.int64(c[exposed].sum())],
            "n_classes_exposed": [np.int64(exposed.sum())]})

    s = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        qi_cols, fold, n_buckets=n_buckets).to_pandas()
    return pa.table({
        "n_rows": pa.array([int(s["n_rows"].sum())], pa.int64()),
        "n_classes": pa.array([int(s["n_classes"].sum())], pa.int64()),
        "min_class": pa.array([int(s["min_class"].min())
                               if len(s) else 0], pa.int64()),
        "n_rows_exposed": pa.array([int(s["n_rows_exposed"].sum())],
                                   pa.int64()),
        "n_classes_exposed": pa.array(
            [int(s["n_classes_exposed"].sum())], pa.int64()),
    })


def l_diversity(ds, qi_cols: list[str], sensitive_col: str, lvl: int, *,
                n_buckets: int = 16) -> pa.Table:
    """L-DIVERSITY audit (Machanavajjhala 2007) — k-anonymity's
    sibling: per quasi-identifier class, the number of DISTINCT
    sensitive values; a class with fewer than ``lvl`` is exposed
    (attribute disclosure even when the class is large).

    Combiner-first on (qi..., sensitive) DISTINCT pairs — duplicate
    pairs collapse inside each block before the one bucketed shuffle,
    classes live whole inside one bucket, each bucket folds to ONE
    summary row.  Output one row:
    (n_classes, min_diversity, n_classes_exposed, n_rows_exposed).
    """
    from .bucketed import bucketed_groupby

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(qi_cols + [sensitive_col]).to_pandas()
        out = df.groupby(qi_cols + [sensitive_col], sort=False,
                         as_index=False).size()
        out = out.rename(columns={"size": "c"})
        out["c"] = out["c"].astype(np.int64)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        pairs = g.groupby(qi_cols + [sensitive_col], sort=False,
                          as_index=False)["c"].sum()
        per = pairs.groupby(qi_cols, sort=False).agg(
            div=(sensitive_col, "nunique"), rows=("c", "sum"))
        d = per["div"].to_numpy().astype(np.int64)
        r = per["rows"].to_numpy().astype(np.int64)
        exposed = d < lvl
        return pd.DataFrame({
            "n_classes": [np.int64(len(d))],
            "min_diversity": [np.int64(d.min()) if len(d)
                              else np.int64(0)],
            "n_classes_exposed": [np.int64(exposed.sum())],
            "n_rows_exposed": [np.int64(r[exposed].sum())]})

    s = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        qi_cols, fold, n_buckets=n_buckets).to_pandas()
    return pa.table({
        "n_classes": pa.array([int(s["n_classes"].sum())], pa.int64()),
        "min_diversity": pa.array(
            [int(s["min_diversity"].min()) if len(s) else 0],
            pa.int64()),
        "n_classes_exposed": pa.array(
            [int(s["n_classes_exposed"].sum())], pa.int64()),
        "n_rows_exposed": pa.array(
            [int(s["n_rows_exposed"].sum())], pa.int64()),
    })
