"""Guard the driver contract: queries() vs oracle_sql() at sf0.001.

A fast subset runs in CI (the full suite is tools/check_oracles.py).
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

FAST = [
    "geocode",
    "zonal",
    "pip_admin",
    "knn",
    "dedup_docs",
    "first_event",
    "topk_cells",
    "token_count",
    "lineitem_agg",
    "mktsegment",
    "cust_no_orders",
    "top_orders",
    "rasterize",
    "multires",
    "sample",
    "join_agg",
    "distinct_users",
    "prepost",
    "sessions",
    "sliding",
    "user_series",
    "quality",
    "events_hourly",
    "ann",
    "chips",
    "region_balance",
    "priority_segment",
    "semi_customers",
    "lang_detect",
    "simhash",
    "minhash_groups",
    "emb_dups",
    "kmeans",
    "semdedup",
    "peak_value",
    "token_bpe",
    "asof",
    "range_windows",
    "sliding_value",
    "curate",
    "top_per_group",
    "rollup",
    "near_dup",
    "median_price",
    "pyramid",
    "dedup_rate",
    "densify",
    "confusion",
    "kappa",
    "trimmed_mean",
    "theil",
    "heldout_ppl",
    "lpm",
    "cdc_diff",
    "quadkey",
    "vocab_coverage",
    "source_overlap",
    "spatial_gini",
    "iat",
    "late_events",
    # round-3 additions (sequence/analytic/corpus/mixing/flagship)
    "transitions",
    "funnel",
    "run_distinct",
    "gapfill",
    "share",
    "firstlast",
    "mad_outliers",
    "cube",
    "chunks",
    "postings",
    "skipgrams",
    "outer_join",
    "temp_sample",
    "wsample",
    "minmax",
    "zscore",
    "split",
    "len_buckets",
    "bpe_pairs",
    "basket",
    "winsorize",
    "q3_top",
    "q5_nation_rev",
    "promo_rev",
    "raster_mode",
    "pagerank",
    "bfs_hops",
    "components",
    "triangles",
    "source_hhi",
    "kcore",
    "ppr",
    "delta_neardup",
    "split_explode",
    "wpagerank",
    "neighbor_sample",
    "common_neighbors",
    # round-4 late additions (scoring/packing/warp/flagship-v2)
    "bigram_lm",
    "dsir",
    "pack_spans",
    "warp",
    "warp_bilinear",
    "curate2",
    # round-4 closing session 4 (spatial stats / stats / graph)
    "gram",
    "moran",
    "gi_star",
    "variogram",
    "dissolve",
    "idw",
    "hotspot_docs",
    "anova",
    "clustering",
    "ripley",
    "dispersion",
    "proximity",
    "colocation",
    "richclub",
    "plaw",
    "zipf",
    "lisa",
    "emerging",
    "temporal_gi",
    "voronoi",
    "ndi",
    "hist_eq",
    "moran_w",
    "diameter_lb",
    "pca1",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as entrymod

    got = canon(entrymod.queries()[name](SF).to_pandas())
    exp = canon(con.sql(entrymod.oracle_sql()[name]).fetchdf())
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}"
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_every_query_has_oracle_or_is_flagged():
    import __ray_entry__ as entrymod

    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs
    # every query is oracle-checked (the dedup/lang kernels are written in
    # SQL-mirrorable arithmetic precisely so nothing is rows-only)
    assert qs - os_ == set()


def test_no_shadowed_module_definitions():
    """Append-heavy modules: a later duplicate def silently SHADOWS
    the earlier one and reroutes unrelated callers (the _events_cents
    and harmonic_centrality incidents).  Pin: no top-level name is
    defined twice in ANY package module, and the two registry dict
    literals carry no duplicate keys (a duplicate key silently
    replaces the earlier query/oracle)."""
    import ast
    import collections
    import glob

    for path in glob.glob("/root/repo/zen3geo_ray/**/*.py",
                          recursive=True):
        tree = ast.parse(open(path).read())
        seen = collections.Counter()
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                seen[node.name] += 1
        dups = [n for n, c in seen.items() if c > 1]
        assert not dups, f"shadowed top-level defs in {path}: {dups}"

    # registry dict literals: every key exactly once
    src = open("/root/repo/zen3geo_ray/pipelines/queries.py").read()
    tree = ast.parse(src)
    for fn in tree.body:
        if not (isinstance(fn, ast.FunctionDef)
                and fn.name in ("build_oracles", "build_queries")):
            continue
        for node in ast.walk(fn):
            if isinstance(node, ast.Dict):
                keys = [k.value for k in node.keys
                        if isinstance(k, ast.Constant)]
                dup = [k for k, c in
                       collections.Counter(keys).items() if c > 1]
                assert not dup, f"duplicate {fn.name} keys: {dup}"


def test_lorenz_curve_invariants(ray_session):
    """Lorenz shares are monotone, end at exactly 1.0, and lie under
    the diagonal (poorest-first concentration)."""
    import numpy as np

    from zen3geo_ray.pipelines.queries import q_lorenz

    out = q_lorenz("/root/testdata/sf0.001").to_pandas()
    s = out["cum_share"].to_numpy()
    assert (np.diff(s) > 0).all()
    assert s[-1] == 1.0
    # cumulative user fraction at each bin boundary dominates the
    # cumulative revenue share (definition of concentration)
    cum_users = np.cumsum(out["n"].to_numpy()) / out["n"].sum()
    assert (s <= cum_users + 1e-12).all()
