"""WebDataset-style tar shard sink/source round trips."""

import os
import tarfile

import numpy as np
import pyarrow as pa

import ray.data as rd

from zen3geo_ray.sources.tarshards import (
    read_tar_shards,
    write_tar_shards,
)


def _corpus(n=40):
    keys = [f"{i:06d}" for i in range(n)]
    imgs = [bytes([i % 256]) * (10 + i) for i in range(n)]
    txts = [f"caption {i}" for i in range(n)]
    return pa.table({"key": pa.array(keys),
                     "img": pa.array(imgs, pa.binary()),
                     "txt": pa.array(txts)})


def test_tar_shards_roundtrip(ray_session, tmp_path):
    t = _corpus(40)
    out = str(tmp_path / "wds")
    paths = write_tar_shards(rd.from_arrow(t).repartition(4), out,
                             key_col="key")
    assert len(paths) >= 2  # one shard per non-empty block
    assert all(p.endswith(".tar") for p in paths)

    back = read_tar_shards(out).to_pandas().sort_values("key")
    assert len(back) == 40
    assert back["key"].tolist() == [f"{i:06d}" for i in range(40)]
    for i, r in enumerate(back.itertuples()):
        assert r.img == bytes([i % 256]) * (10 + i)
        assert r.txt == f"caption {i}".encode()


def test_tar_shards_idempotent_and_standard(ray_session, tmp_path):
    """Re-writing the same block produces the SAME file name and
    bytes; plain tarfile (the WebDataset convention) can read it."""
    t = _corpus(10)
    out = str(tmp_path / "wds")
    p1 = write_tar_shards(rd.from_arrow(t), out, key_col="key")
    st1 = {p: open(p, "rb").read() for p in p1}
    p2 = write_tar_shards(rd.from_arrow(t), out, key_col="key")
    assert sorted(p1) == sorted(p2)
    for p in p1:
        assert open(p, "rb").read() == st1[p]

    with tarfile.open(p1[0]) as tf:
        names = tf.getnames()
    assert "000000.img" in names and "000000.txt" in names
    # samples are adjacent (key-sorted): img/txt interleaved per key
    assert names[0].split(".")[0] == names[1].split(".")[0]


def test_tar_shards_missing_field_null(ray_session, tmp_path):
    """A sample lacking a field reads back as NULL."""
    out = str(tmp_path / "wds")
    os.makedirs(out)
    import io

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in (("a.img", b"xx"), ("a.txt", b"hi"),
                           ("b.img", b"yy")):
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    with open(os.path.join(out, "shard-m.tar"), "wb") as f:
        f.write(buf.getvalue())
    back = read_tar_shards(out).to_pandas().set_index("key")
    assert back.loc["b", "txt"] is None
    assert back.loc["a", "txt"] == b"hi"
