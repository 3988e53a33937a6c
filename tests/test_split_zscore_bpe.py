"""assign_split / zscore / length_buckets / char_pair_counts vs
brute-force references."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from zen3geo_ray.functions.hashing import knuth_hash
from zen3geo_ray.stages.analytic import zscore
from zen3geo_ray.stages.corpus import char_pair_counts, length_buckets
from zen3geo_ray.stages.partition import (SPLIT_TRAIN_T, SPLIT_VAL_T,
                                          assign_split)


def test_assign_split(ray_session):
    n = 5000
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    out = assign_split(rd.from_arrow(t).repartition(4), "doc_id").to_pandas()
    h = knuth_hash(out["doc_id"].to_numpy())
    exp = np.where(h < SPLIT_TRAIN_T, "train",
                   np.where(h < SPLIT_VAL_T, "val", "test"))
    assert (out["split"].to_numpy() == exp).all()
    frac = pd.Series(exp).value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02


def test_zscore(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "i": np.arange(4000, dtype=np.int64),
        "g": rng.choice(["a", "b", "c"], 4000),
        "v": rng.integers(0, 1000, 4000).astype(np.int64),
    })
    out = zscore(rd.from_arrow(pa.Table.from_pandas(df)).repartition(5),
                 key_cols=["g"], value_col="v").to_pandas()
    out = out.set_index("i").loc[df["i"]]
    for g, grp in df.groupby("g"):
        mu = grp["v"].sum() / len(grp)
        m2 = (grp["v"] ** 2).sum() / len(grp)
        std = np.sqrt(m2 - mu * mu)
        exp = (grp["v"].to_numpy() - mu) / std
        np.testing.assert_allclose(
            out.loc[grp["i"], "z"].to_numpy(), exp, rtol=1e-12)


def test_zscore_degenerate_group(ray_session):
    t = pa.table({"i": pa.array([0, 1], pa.int64()),
                  "g": pa.array(["x", "x"]),
                  "v": pa.array([7, 7], pa.int64())})
    out = zscore(rd.from_arrow(t), key_cols=["g"],
                 value_col="v").to_pandas()
    assert out["z"].isna().all()


def test_length_buckets(ray_session):
    texts = ["w " * k for k in [1, 3, 5, 17, 18, 31, 33]]
    t = pa.table({"text": pa.array(texts)})
    out = (length_buckets(rd.from_arrow(t).repartition(3), bucket_tokens=16)
           .to_pandas().set_index("bucket").sort_index())
    # bucket 0: 1,3,5 tokens -> n=3 max=5 waste=15-9=6
    assert out.loc[0, "n"] == 3 and out.loc[0, "max_tok"] == 5
    assert out.loc[0, "pad_waste"] == 6
    # bucket 1: 17,18,31 -> max 31, waste 93-66=27
    assert out.loc[1, "n"] == 3 and out.loc[1, "pad_waste"] == 27
    assert out.loc[2, "n"] == 1 and out.loc[2, "pad_waste"] == 0


def test_char_pair_counts(ray_session):
    texts = ["ab ab", "abc", "a\xa0b x"]  # NBSP is NOT RE2 whitespace
    t = pa.table({"text": pa.array(texts)})
    out = char_pair_counts(rd.from_arrow(t).repartition(2)).to_pandas()
    got = dict(zip(out["pair"], out["n"]))
    # "ab" x2, "ab"+"bc" from abc, "a\xa0"+"\xa0b" from the NBSP token
    assert got["ab"] == 3
    assert got["bc"] == 1
    assert got["a\xa0"] == 1 and got["\xa0b"] == 1
    assert " b" not in got and "b " not in got
    assert sum(got.values()) == 6


def test_char_pairs_boundary_and_u10fffd(ray_session):
    from zen3geo_ray.stages.corpus import char_pair_counts
    # doc boundary must not create a pair ("ab"|"cd" -> no "bc");
    # U+10FFFD is a legal codepoint and must count like any other
    t = pa.table({"text": pa.array(["ab", "cd", "a\U0010fffdb"])})
    out = char_pair_counts(rd.from_arrow(t).repartition(1)).to_pandas()
    got = dict(zip(out["pair"], out["n"]))
    assert got == {"ab": 1, "cd": 1,
                   "a\U0010fffd": 1, "\U0010fffdb": 1}


def test_cube2_null_dims(ray_session):
    from zen3geo_ray.stages.analytic import cube2
    t = pa.table({
        "d1": pa.array(["x", None, "x", None]),
        "d2": pa.array(["p", "p", None, "q"]),
        "v": pa.array([1, 2, 4, 8], pa.int64()),
    })
    out = cube2(rd.from_arrow(t), dim1="d1", dim2="d2",
                value_col="v").to_pandas()
    # SQL CUBE keeps NULL-valued dim groups at every level
    lv1 = out[out["d2"].isna() & out["d1"].isna()]
    # grand total row: n=4 sum=15 (also d1=None,d2=None fine rows exist —
    # distinguish by checking the full lattice sums)
    assert out["n"].sum() == 16  # 4 fine + 4 + 4 + 4 across levels
    assert out.loc[out["d1"].isna(), "v_sum"].sum() > 0
    lv_d1 = out[(~out["d1"].isna()) & out["d2"].isna()]
    assert lv_d1.loc[lv_d1["d1"] == "x", "v_sum"].sum() >= 5


def test_first_last_nth_rejects_bad_nth(ray_session):
    import pytest
    from zen3geo_ray.stages.analytic import first_last_nth
    t = pa.table({"k": pa.array([1], pa.int64()),
                  "o": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        first_last_nth(rd.from_arrow(t), key_col="k", order_col="o",
                       value_col="v", nth=0)


def test_naive_bayes_confusion_separable(ray_session):
    """Two classes with disjoint vocab: every test doc classifies to
    its own class -> a perfectly diagonal confusion matrix."""
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.scoring import naive_bayes_confusion

    rows = []
    for i in range(40):
        if i % 4 < 2:
            rows.append((i, "apple banana apple", "fruit"))
        else:
            rows.append((i, "iron copper iron zinc", "metal"))
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows]),
                  "source": pa.array([r[2] for r in rows])})
    out = naive_bayes_confusion(
        rd.from_arrow(t).repartition(3), top_v=16,
        n_buckets=2).to_pandas()
    got = {(r.true_source, r.pred_source): int(r.n)
           for r in out.itertuples()}
    assert got == {("fruit", "fruit"): 10, ("metal", "metal"): 10}


def test_naive_bayes_tie_breaks_to_smallest_label(ray_session):
    """A test doc with symmetric evidence (equal counts both classes)
    lands on the lexicographically smallest class."""
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.scoring import naive_bayes_confusion

    # train (even ids): classes 'a' and 'b' with identical profiles
    rows = [(0, "x y", "a"), (2, "x y", "b")]
    # test (odd ids): same text -> identical scores -> tie -> 'a'
    rows += [(1, "x y", "b")]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows]),
                  "source": pa.array([r[2] for r in rows])})
    out = naive_bayes_confusion(
        rd.from_arrow(t), top_v=8, n_buckets=2).to_pandas()
    assert [(r.true_source, r.pred_source, int(r.n))
            for r in out.itertuples()] == [("b", "a", 1)]


def test_naive_bayes_zero_invocab_doc_dropped(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.scoring import naive_bayes_confusion

    rows = [(0, "x x x", "a"), (2, "y y", "b"),
            (1, "zzz qqq", "a")]       # test doc entirely OOV
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows]),
                  "source": pa.array([r[2] for r in rows])})
    out = naive_bayes_confusion(
        rd.from_arrow(t), top_v=8, n_buckets=2).to_pandas()
    assert len(out) == 0
