"""Distinct set operations (INTERSECT / EXCEPT / UNION)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from zen3geo_ray.stages.setops import (
    except_distinct,
    intersect_distinct,
    union_distinct,
)


def _two(seed=0, n=3000, lo_a=0, hi_a=60, lo_b=30, hi_b=90):
    rng = np.random.default_rng(seed)
    a = rd.from_arrow(pa.table({
        "k": rng.integers(lo_a, hi_a, n).astype(np.int64),
        "g": rng.integers(0, 3, n).astype(np.int64)})).repartition(5)
    b = rd.from_arrow(pa.table({
        "k": rng.integers(lo_b, hi_b, n).astype(np.int64),
        "g": rng.integers(0, 3, n).astype(np.int64)})).repartition(4)
    return a, b


def _expect(a, b, op):
    da = a.to_pandas().drop_duplicates(["k", "g"])
    db = b.to_pandas().drop_duplicates(["k", "g"])
    ta = set(map(tuple, da.to_numpy()))
    tb = set(map(tuple, db.to_numpy()))
    if op == "intersect":
        s = ta & tb
    elif op == "except":
        s = ta - tb
    else:
        s = ta | tb
    return sorted(s)


def test_intersect_distinct(ray_session):
    a, b = _two()
    got = sorted(map(tuple, intersect_distinct(a, b, ["k", "g"])
                 .to_pandas().to_numpy()))
    assert got == _expect(a, b, "intersect")


def test_except_distinct(ray_session):
    a, b = _two(seed=1)
    got = sorted(map(tuple, except_distinct(a, b, ["k", "g"])
                 .to_pandas().to_numpy()))
    assert got == _expect(a, b, "except")


def test_union_distinct(ray_session):
    a, b = _two(seed=2)
    got = sorted(map(tuple, union_distinct(a, b, ["k", "g"])
                 .to_pandas().to_numpy()))
    assert got == _expect(a, b, "union")


def test_except_disjoint_returns_all_left(ray_session):
    a, b = _two(seed=3, lo_a=0, hi_a=10, lo_b=100, hi_b=110)
    got = except_distinct(a, b, ["k", "g"]).to_pandas()
    assert len(got) == len(a.to_pandas().drop_duplicates(["k", "g"]))
