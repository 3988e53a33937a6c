"""Large-x-large equi-joins (the non-broadcast join path).

The reference has only positional zips and broadcast pairings (SURVEY
§2.3 joins); at engine scale two big tables sometimes must join on a key
(points x points on cell, orders x lineitem).  Two implementations:

* ``equi_join`` — Ray Data's built-in hash-partitioned ``Dataset.join``
  when available (Ray >= 2.46), with ``num_partitions`` as the explicit
  shuffle-width knob;
* ``bucketed_join`` — the portable fallback: pad both sides to a shared
  schema, tag them, union, ONE all-to-all on ``hash(key) % B``, then a
  vectorized pandas merge inside each bucket.

Skew note: a hot key lands in one bucket either way — for skewed keys
pre-aggregate the skewed side first (stages/zonal.py) or broadcast it if
small enough; joins replicate rows, so salting alone cannot fix a hot
join key without replicating the other side (document per pipeline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketed import _bucket_ids

_SIDE = "__side"
_BUCKET = "__jbucket"


def equi_join(left, right, on: list[str], how: str = "inner",
              num_partitions: int = 32, right_on: list[str] | None = None):
    """Hash-partitioned join via Dataset.join (falls back to bucketed)."""
    try:
        return left.join(
            right,
            join_type=how,
            num_partitions=num_partitions,
            on=tuple(on),
            right_on=tuple(right_on) if right_on else None,
        )
    except (AttributeError, TypeError):
        if right_on and list(right_on) != list(on):
            raise NotImplementedError("bucketed fallback needs same key names")
        return bucketed_join(left, right, on, how=how, n_buckets=num_partitions)


def bucketed_join(left, right, on: list[str], how: str = "inner",
                  n_buckets: int = 64):
    """Portable partitioned hash join (same key names on both sides;
    non-key columns must be disjoint)."""
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c not in on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key columns overlap: {sorted(overlap)}")
    types = {n: t for n, t in zip(lschema.names, lschema.types)}
    types.update({n: t for n, t in zip(rschema.names, rschema.types)})
    all_cols = lcols + rcols

    def pad(side: int, keys: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            n = len(b)
            cols = {}
            for name in all_cols:
                if name in b.column_names:
                    cols[name] = b.column(name)
                else:
                    cols[name] = pa.nulls(n, types[name])
            out = pa.table(cols)
            bucket = _bucket_ids(b, keys, n_buckets)
            return out.append_column(_BUCKET, pa.array(bucket)).append_column(
                _SIDE, pa.array(np.full(n, side, dtype=np.int8))
            )

        return fn

    lt = left.map_batches(pad(0, on), batch_format="pyarrow")
    rt = right.map_batches(pad(1, on), batch_format="pyarrow")
    both = lt.union(rt)

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        l = g[g[_SIDE] == 0][lcols]
        r = g[g[_SIDE] == 1][on + rcols]
        merged = l.merge(r, how=how, on=on)
        return pa.Table.from_pandas(merged, preserve_index=False)

    return both.groupby(_BUCKET).map_groups(join_bucket, batch_format="pandas")
