"""Per-partition lineage manifests + resumable partitioned writes.

The reference has no checkpoint/resume at all (SURVEY §4.1); Ray Data
gives task-level lineage retries but no job-level resume.  This module
supplies the north-star contract ("resumable from checkpoint with
per-partition lineage + metrics"):

* output is partitioned by a deterministic partition id (a column the
  caller derives — e.g. a coarse cell, a scene id, an input shard id);
* each partition is written ATOMICALLY (tmp dir + rename) by the task
  that reduces it, together with a lineage record: partition id, row
  count, byte size, content hash (order-insensitive), wall time;
* the manifest is a directory of one JSON file per partition, so
  completion is itself atomic and a resumed run simply skips partitions
  whose manifest entry exists (filter BEFORE the shuffle, so finished
  partitions cost nothing);
* ``load_manifest`` doubles as the metrics summary (rows/s, bytes).

At 100 TB the partition count is chosen so each partition is a few GB
(coarse-cell parent or input shard ranges) — small enough to re-do on
failure, large enough that the manifest stays tiny.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _hash_table(t: pa.Table) -> int:
    """Order-insensitive content hash (xor of row hashes via pandas)."""
    df = t.to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return int(np.bitwise_xor.reduce(h)) if len(h) else 0


def completed_partitions(out_dir: str) -> set:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for f in os.listdir(mdir):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                done.add(json.load(fh)["partition"])
    return done


def load_manifest(out_dir: str) -> pd.DataFrame:
    mdir = os.path.join(out_dir, "_manifest")
    rows = []
    if os.path.isdir(mdir):
        for f in sorted(os.listdir(mdir)):
            if f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    rows.append(json.load(fh))
    return pd.DataFrame(rows)


class PartitionWriter:
    """map_groups fn: write one partition's rows atomically + manifest."""

    def __init__(self, out_dir: str, partition_col: str):
        self.out_dir = out_dir
        self.partition_col = partition_col

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        pid = group.column(self.partition_col)[0].as_py()
        part_dir = os.path.join(self.out_dir, f"{self.partition_col}={pid}")
        tmp_dir = part_dir + f".tmp.{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(group, os.path.join(tmp_dir, "data.parquet"))
        # atomic publish: rename tmp dir over the final name
        if os.path.isdir(part_dir):
            import shutil

            shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)
        record = {
            "partition": pid,
            "rows": group.num_rows,
            "bytes": group.nbytes,
            "content_hash": _hash_table(group),
            "wall_s": round(time.monotonic() - t0, 4),
            "ts": time.time(),
        }
        mdir = os.path.join(self.out_dir, "_manifest")
        os.makedirs(mdir, exist_ok=True)
        mtmp = os.path.join(mdir, f".{pid}.tmp.{os.getpid()}")
        with open(mtmp, "w") as fh:
            json.dump(record, fh)
        os.replace(mtmp, os.path.join(mdir, f"{pid}.json"))
        return pa.table(
            {
                "partition": pa.array([pid]),
                "rows": pa.array([group.num_rows], pa.int64()),
                "wall_s": pa.array([record["wall_s"]], pa.float64()),
            }
        )


def resumable_write(ds, out_dir: str, partition_col: str):
    """Write ``ds`` partitioned by ``partition_col`` with skip-complete
    resume.  Returns the manifest-row Dataset (consume to execute)."""
    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir)
    if done:
        done_arr = pa.array(list(done))

        def skip(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.invert(pc.is_in(batch.column(partition_col), done_arr))
            return batch.filter(mask)

        ds = ds.map_batches(skip, batch_format="pyarrow")
    writer = PartitionWriter(out_dir, partition_col)

    def write_partition(group: pa.Table) -> pa.Table:
        return writer(group)

    return ds.groupby(partition_col).map_groups(
        write_partition, batch_format="pyarrow"
    )


def read_partitioned(paths_or_dir: str):
    """Read back a resumable_write output directory as a Dataset."""
    import glob

    import ray.data as rd

    files = sorted(glob.glob(os.path.join(paths_or_dir, "*=*", "data.parquet")))
    return rd.read_parquet(files)


# --- incremental (changed-input) re-runs ----------------------------------


def input_fingerprints(ds, partition_col: str, fp_col: str):
    """Distributed per-partition input fingerprint: xor-reduce a caller-
    computed row fingerprint column per partition (order-insensitive, so
    any partitioning/retry yields the same value).  Returns
    {partition_id: fingerprint} — one small row per partition."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "p": batch.column(partition_col).to_numpy(zero_copy_only=False),
            "f": batch.column(fp_col).to_numpy(zero_copy_only=False)
            .astype(np.uint64),
        })
        agg = df.groupby("p", sort=False)["f"].agg(
            lambda s: np.bitwise_xor.reduce(s.to_numpy())
        )
        return pa.table({
            partition_col: pa.array(agg.index.to_numpy()),
            "_fp": pa.array(agg.to_numpy().astype(np.uint64).view(np.int64),
                            pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out: dict = {}
    for p, f in zip(parts[partition_col], parts["_fp"]):
        out[p] = out.get(p, 0) ^ (int(f) & 0xFFFFFFFFFFFFFFFF)
    return out


def stale_partitions(out_dir: str, current_fps: dict) -> set:
    """Partitions needing (re-)processing: missing from the manifest OR
    written from different input bytes (``input_fp`` mismatch).  Feed the
    result to ``incremental_write``'s keep-filter."""
    man = load_manifest(out_dir)
    if man.empty:
        return set(current_fps)
    recorded = {
        r["partition"]: r.get("input_fp")
        for _, r in man.iterrows()
    }
    stale = set()
    for pid, fp in current_fps.items():
        if pid not in recorded or recorded[pid] != fp:
            stale.add(pid)
    return stale


def incremental_write(ds, out_dir: str, partition_col: str, fp_col: str):
    """Changed-input incremental run: recompute per-partition input
    fingerprints, then write ONLY missing or stale partitions (their
    manifest records carry ``input_fp`` for the next run's comparison).

    The fingerprint pass reads just (partition, fp) columns; unchanged
    partitions are filtered out BEFORE the write shuffle, so a no-change
    re-run costs one column scan and nothing else.
    """
    os.makedirs(out_dir, exist_ok=True)
    fps = input_fingerprints(ds, partition_col, fp_col)
    todo = stale_partitions(out_dir, fps)
    if not todo:
        import ray.data as rd

        return rd.from_items([]), set()
    todo_arr = pa.array(list(todo))

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column(partition_col), todo_arr))

    writer = PartitionWriter(out_dir, partition_col)

    def write_partition(group: pa.Table) -> pa.Table:
        pid = group.column(partition_col)[0].as_py()
        out = writer(group)
        # extend the manifest record with the input fingerprint
        mpath = os.path.join(out_dir, "_manifest", f"{pid}.json")
        with open(mpath) as fh:
            rec = json.load(fh)
        rec["input_fp"] = fps[pid]
        tmp = mpath + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, mpath)
        return out

    filtered = ds.map_batches(keep, batch_format="pyarrow")
    return (
        filtered.groupby(partition_col).map_groups(
            write_partition, batch_format="pyarrow"
        ),
        todo,
    )


def upsert_store(new, store_dir: str, *, key_cols: list[str],
                 order_cols: list[str], n_buckets: int = 32):
    """SCD-TYPE-1 keyed UPSERT into a persistent parquet store — the
    MERGE INTO / compacted-changelog staple: append the new rows as an
    immutable run part (no rewrite of prior state; delete the
    directory to reset) and return the CURRENT view, i.e. the single
    LATEST row per ``key_cols`` ordering by ``order_cols`` DESCENDING
    across every part ever written.  End ``order_cols`` with a unique
    id so the winner is deterministic.

    Scale shape: parts are append-only (a failed run never corrupts
    prior state), the view is one bucketed shuffle of the store keyed
    on ``key_cols`` — every key's history lands whole in one bucket
    where a vectorized sort + drop_duplicates picks the survivor; at
    compaction time write the view back as a new store generation."""
    import os
    import uuid

    import ray.data as rd

    from ..stages.bucketed import bucketed_groupby

    new = new.materialize()
    os.makedirs(store_dir, exist_ok=True)
    run_dir = os.path.join(store_dir, f"run-{uuid.uuid4().hex[:12]}")
    new.write_parquet(run_dir)
    allrows = rd.read_parquet(store_dir)

    def latest(g):
        return g.sort_values(list(order_cols), ascending=False,
                             kind="mergesort") \
            .drop_duplicates(list(key_cols), keep="first")

    return bucketed_groupby(allrows, list(key_cols), latest,
                            n_buckets=n_buckets)
