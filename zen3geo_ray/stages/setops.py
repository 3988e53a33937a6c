"""Distinct set operations over arbitrary column tuples:
``INTERSECT`` / ``EXCEPT`` / ``UNION`` (all DISTINCT semantics, the SQL
defaults).

The reference's pipe combinators concatenate and fork streams
(`/root/reference/zen3geo/datapipes/` composes torchdata ``Concater`` /
``Forker``); the relational analogs over a 100-TB corpus are the
distinct set ops.  Scale shape — combiner first, ONE shuffle:

* each side is pruned to the op columns and pre-distincted per batch
  (a block contributes at most one copy of each tuple), tagged with a
  side bit;
* the tagged union shuffles into coarse hash buckets
  (:func:`..stages.bucketed.bucketed_groupby` — O(#buckets) tasks, not
  O(#keys));
* per bucket a vectorized pandas reduce computes side presence per
  tuple and keeps tuples by the op's predicate (both sides / left
  only / any).

No driver-side state; only distinct-per-block tuples ever move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketed import bucketed_groupby

_SIDE = "__side"


def _tag(ds, cols: list[str], side: int):
    def fn(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        # per-block distinct: combiner before the shuffle
        t = pa.Table.from_pandas(
            t.to_pandas().drop_duplicates(cols), preserve_index=False
        ).replace_schema_metadata(None)
        return t.append_column(
            _SIDE, pa.array(np.full(len(t), side, np.int8)))

    return ds.map_batches(fn, batch_format="pyarrow")


def _set_op(a, b, cols: list[str], keep: str, n_buckets: int):
    u = _tag(a, cols, 0).union(_tag(b, cols, 1))

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        pres = g.groupby(cols, sort=False)[_SIDE].agg(["min", "max"])
        if keep == "both":
            m = (pres["min"] == 0) & (pres["max"] == 1)
        elif keep == "left_only":
            m = pres["max"] == 0
        else:  # any
            m = np.ones(len(pres), dtype=bool)
        return pres[m].reset_index()[cols]

    return bucketed_groupby(u, cols, fn, n_buckets=n_buckets)


def intersect_distinct(a, b, cols: list[str], n_buckets: int = 64):
    """``SELECT DISTINCT cols FROM a INTERSECT SELECT ... FROM b`` —
    tuples present on BOTH sides, one row each."""
    return _set_op(a, b, cols, "both", n_buckets)


def except_distinct(a, b, cols: list[str], n_buckets: int = 64):
    """``a EXCEPT b`` (distinct) — tuples of ``a`` absent from ``b``."""
    return _set_op(a, b, cols, "left_only", n_buckets)


def union_distinct(a, b, cols: list[str], n_buckets: int = 64):
    """``a UNION b`` (distinct) — every tuple once, whichever side."""
    return _set_op(a, b, cols, "any", n_buckets)
