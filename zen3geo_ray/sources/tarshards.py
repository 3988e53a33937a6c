"""WebDataset-style tar shards — the de-facto layout for web-scale
multimodal training corpora (Beaumont et al.'s img2dataset / WebDataset
convention: a dataset is a directory of .tar files; each SAMPLE is a
group of adjacent members sharing a basename, one member per field,
field name = extension: ``000123.jpg``, ``000123.txt``,
``000123.json``).

Pure-stdlib ``tarfile`` — no external deps.  The engine's multimodal
stages (decoders, feature extractors) consume the same (key, field...)
binary columns this reader emits.

Scale shape:
- WRITE is a distributed per-block sink: every block serializes to ONE
  tar named by the content hash of its keys — deterministic and
  idempotent (a re-run of the same block overwrites the same file with
  the same bytes; a resumed run skips nothing but corrupts nothing).
  Samples within a shard are sorted by key.
- READ streams: the driver lists ``*.tar`` only; member parse happens
  inside ``flat_map`` tasks, one tar per task, so shard bytes never
  land on the driver.

Reference parity: zen3geo's heavy-payload iteration unit is the
scene/asset (`/root/reference/zen3geo/datapipes/rioxarray.py:70-74`);
tar shards are the web-scale analog of that unit for image/audio/text
sample groups.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import pyarrow as pa

_MTIME = 0  # fixed timestamp -> byte-deterministic shards


def _shard_bytes(keys: list[str], fields: dict[str, list[bytes]]) -> bytes:
    """One in-memory tar of samples (sorted by key), deterministic."""
    buf = io.BytesIO()
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for i in order:
            for ext in sorted(fields):
                data = fields[ext][i]
                if data is None:
                    continue
                info = tarfile.TarInfo(name=f"{keys[i]}.{ext}")
                info.size = len(data)
                info.mtime = _MTIME
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def write_tar_shards(ds, out_dir: str, *, key_col: str = "key",
                     field_cols: dict[str, str] | None = None):
    """Distributed WebDataset sink: one tar per input block, named
    ``shard-<keyhash>.tar`` (content-hash of the sorted keys —
    idempotent re-writes).  ``field_cols`` maps extension -> column
    (default: every non-key column keeps its name as the extension).
    String columns are UTF-8 encoded; binary pass through.  Returns
    the list of shard paths (driver sees names only, never bytes)."""
    os.makedirs(out_dir, exist_ok=True)
    schema = ds.schema()
    if field_cols is None:
        field_cols = {c: c for c in schema.names if c != key_col}

    def write_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        keys = [str(k) for k in b.column(key_col).to_pylist()]
        fields = {}
        for ext, col in field_cols.items():
            vals = b.column(col).to_pylist()
            fields[ext] = [
                v.encode() if isinstance(v, str) else v for v in vals
            ]
        h = hashlib.sha1("\n".join(sorted(keys)).encode()).hexdigest()
        path = os.path.join(out_dir, f"shard-{h[:16]}.tar")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_shard_bytes(keys, fields))
        os.replace(tmp, path)  # atomic: partial writes never visible
        return pa.table({"path": pa.array([path], pa.string()),
                         "n": pa.array([len(keys)], pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None).to_pandas()["path"].tolist()


def _parse_tar(data: bytes) -> dict[str, dict[str, bytes]]:
    """tar bytes -> {key: {ext: payload}} (WebDataset grouping: split
    on the LAST dot; everything before it is the sample key)."""
    samples: dict[str, dict[str, bytes]] = {}
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        for m in tf:
            if not m.isfile():
                continue
            name = m.name
            key, _, ext = name.rpartition(".")
            if not key:
                key, ext = name, ""
            samples.setdefault(key, {})[ext] = tf.extractfile(m).read()
    return samples


def read_tar_shards(path, *, fields: list[str] | None = None):
    """WebDataset source: ``path`` is a directory of .tar shards, one
    tar, or a LIST of shard paths/URLs (http(s) shard lists are the
    WebDataset brace-expansion deployment shape — each task GETs its
    own shard object).  Returns a Dataset of (key: string, <field>:
    binary ...) — one row per sample, fields missing in a sample are
    NULL.  The driver only lists files (and probes ONE shard for the
    field set); tars parse inside read tasks."""
    import ray.data as rd

    from .remote import fetch_bytes, is_remote

    if isinstance(path, (list, tuple)):
        paths = list(path)
    elif not is_remote(path) and os.path.isdir(path):
        paths = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".tar"))
    else:
        paths = [path]
    if fields is None:
        # probe the first shard for its field set (driver reads ONE)
        probe = _parse_tar(fetch_bytes(paths[0]))
        fields = sorted({e for s in probe.values() for e in s})
    flds = list(fields)

    if any(is_remote(p) for p in paths):
        descr = rd.from_items([{"path": p} for p in paths])

        def fetch(row: dict) -> list[dict]:
            return _explode_tar(fetch_bytes(row["path"]), flds)

        return descr.flat_map(fetch)

    files = rd.read_binary_files(paths)

    def explode(row: dict) -> list[dict]:
        return _explode_tar(row["bytes"], flds)

    return files.flat_map(explode)


def _explode_tar(data: bytes, flds: list[str]) -> list[dict]:
    out = []
    for key, sample in sorted(_parse_tar(data).items()):
        rec = {"key": key}
        for e in flds:
            rec[e] = sample.get(e)
        out.append(rec)
    return out
