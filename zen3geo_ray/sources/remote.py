"""HTTP(S) byte-range transport for the raster/vector sources.

The ``/vsicurl/`` analog (reference reads remote sources everywhere:
the https GeoTIFF doctest ``zen3geo/datapipes/rioxarray.py:54-60``,
``/vsizip/vsicurl/`` remote zips ``docs/vector-segmentation-masks.md:
190``, remote STAC assets) — a 100-TB cluster reads object storage,
not local disk, so every offset+length seam in the sources accepts a
URI here.

Design: one tiny abstraction, ``RangeSource`` (``read(off, ln)`` /
``size()``), with file and HTTP implementations, plus ``RangeBytes``
— a lazy bytes-like facade (``buf[a:b]`` / ``len(buf)``) with
block-aligned caching, so parsers written against plain ``bytes``
slices (the GeoTIFF IFD walk, the FlatGeobuf header/index/feature
decode) gain remote range reads WITHOUT a rewrite: pass a
``RangeBytes`` where they took ``bytes`` and only the slices they
actually touch leave the server.

stdlib urllib only (no deps); servers that ignore the Range header
(plain 200) degrade gracefully — the full body is cached and sliced
locally.  ``RangeBytes`` exposes ``bytes_fetched`` / ``requests`` so
tests can assert pushdown reads a fraction of the file.
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request

_BLOCK = 64 * 1024  # cache granularity for small scattered reads


def is_remote(uri: str) -> bool:
    return isinstance(uri, str) and uri.startswith(("http://", "https://"))


def uri_join(base: str, *parts: str) -> str:
    """Path join that keeps http(s) URIs with forward slashes."""
    if is_remote(base):
        return "/".join([base.rstrip("/")] + [p.strip("/") for p in parts])
    return os.path.join(base, *parts)


class FileRangeSource:
    """Local-file RangeSource (the baseline implementation)."""

    def __init__(self, path: str):
        self.path = path
        self._size = os.path.getsize(path)

    def size(self) -> int:
        return self._size

    def read(self, off: int, ln: int) -> bytes:
        with open(self.path, "rb") as f:
            f.seek(off)
            return f.read(ln)


class HttpRangeSource:
    """HTTP(S) RangeSource via ``Range: bytes=a-b`` requests.

    A 206 returns exactly the window; a 200 (server ignores Range)
    caches the whole body and serves every later read locally.  Size
    comes from a HEAD Content-Length (falling back to a full GET).
    """

    def __init__(self, url: str):
        self.url = url
        self._size: int | None = None
        self._full: bytes | None = None

    def size(self) -> int:
        if self._size is None:
            if self._full is not None:
                self._size = len(self._full)
            else:
                req = urllib.request.Request(self.url, method="HEAD")
                try:
                    with urllib.request.urlopen(req) as r:
                        cl = r.headers.get("Content-Length")
                    if cl is None:
                        raise ValueError("no Content-Length")
                    self._size = int(cl)
                except (urllib.error.URLError, ValueError):
                    self._full = _http_get(self.url)
                    self._size = len(self._full)
        return self._size

    def read(self, off: int, ln: int) -> bytes:
        if self._full is not None:
            return self._full[off:off + ln]
        req = urllib.request.Request(
            self.url, headers={"Range": f"bytes={off}-{off + ln - 1}"})
        with urllib.request.urlopen(req) as r:
            body = r.read()
            if r.status == 206:
                return body
        # server ignored Range: keep the full body for later reads
        self._full = body
        self._size = len(body)
        return body[off:off + ln]


def _http_get(url: str) -> bytes:
    with urllib.request.urlopen(url) as r:
        return r.read()


def open_range(uri: str):
    """RangeSource for a local path or http(s) URL."""
    return HttpRangeSource(uri) if is_remote(uri) else FileRangeSource(uri)


def fetch_bytes(uri: str) -> bytes:
    """Whole-object fetch (local read or HTTP GET)."""
    if is_remote(uri):
        return _http_get(uri)
    with open(uri, "rb") as f:
        return f.read()


def exists(uri: str) -> bool:
    """Existence probe: os.path for local, a ranged GET probe for HTTP
    (404 -> False)."""
    if not is_remote(uri):
        return os.path.exists(uri)
    req = urllib.request.Request(uri, headers={"Range": "bytes=0-0"})
    try:
        with urllib.request.urlopen(req):
            return True
    except urllib.error.HTTPError as e:
        if e.code in (404, 403, 410):
            return False
        raise
    except urllib.error.URLError:
        return False


def fetch_bytes_or_none(uri: str) -> bytes | None:
    """Whole-object fetch returning None on a missing object (404) —
    the zarr missing-chunk = fill_value contract."""
    if not is_remote(uri):
        if not os.path.exists(uri):
            return None
        with open(uri, "rb") as f:
            return f.read()
    try:
        return _http_get(uri)
    except urllib.error.HTTPError as e:
        if e.code in (404, 410):
            return None
        raise


class RangeBytes:
    """Lazy bytes-like view over a RangeSource.

    Supports exactly what the byte parsers use — ``buf[a:b]`` slices
    (step 1, non-negative bounds) and ``len(buf)`` — fetching ONLY the
    touched ranges: reads under one cache block go through a
    block-aligned LRU-less cache (IFD walks make many tiny reads);
    larger reads (tile/strip/feature payloads) fetch directly.

    ``bytes_fetched`` / ``requests`` count actual transport traffic so
    tests can assert a bbox/overview read pulls a fraction of the file.
    """

    def __init__(self, source, block: int = _BLOCK):
        self.src = source
        self.block = block
        self._blocks: dict[int, bytes] = {}
        self.bytes_fetched = 0
        self.requests = 0

    def __len__(self) -> int:
        return self.src.size()

    def _fetch(self, off: int, ln: int) -> bytes:
        self.requests += 1
        self.bytes_fetched += ln
        return self.src.read(off, ln)

    def _read(self, off: int, ln: int) -> bytes:
        if ln <= 0:
            return b""
        if ln > self.block:
            return self._fetch(off, ln)
        size = len(self)
        b0 = off // self.block
        b1 = (off + ln - 1) // self.block
        parts = []
        for bi in range(b0, b1 + 1):
            blk = self._blocks.get(bi)
            if blk is None:
                start = bi * self.block
                blk = self._fetch(start,
                                  min(self.block, max(0, size - start)))
                self._blocks[bi] = blk
            parts.append(blk)
        joined = b"".join(parts)
        rel = off - b0 * self.block
        return joined[rel:rel + ln]

    def __getitem__(self, key):
        if isinstance(key, slice):
            if key.step not in (None, 1):
                raise ValueError("RangeBytes slices must be contiguous")
            size = len(self)
            start = 0 if key.start is None else min(key.start, size)
            stop = size if key.stop is None else min(key.stop, size)
            return self._read(start, stop - start)
        # single index -> int, like bytes
        return self._read(key, 1)[0]


class RangeFile:
    """Seekable read-only file object over a RangeSource — what
    ``pyarrow.parquet`` needs to read a REMOTE parquet object with
    true range IO (footer, then only the projected column chunks).

    Not buffered beyond the source's own semantics; pyarrow issues
    coalesced column-chunk reads, so per-call fetches map ~1:1 onto
    HTTP range requests.  Tracks ``bytes_read`` / ``requests``.
    """

    def __init__(self, source):
        self.src = source
        self.pos = 0
        self._size = source.size()
        self.bytes_read = 0
        self.requests = 0
        self.closed = False

    # --- the file protocol subset pyarrow uses -------------------------
    def size(self) -> int:
        return self._size

    def tell(self) -> int:
        return self.pos

    def seek(self, off: int, whence: int = 0) -> int:
        if whence == 0:
            self.pos = off
        elif whence == 1:
            self.pos += off
        elif whence == 2:
            self.pos = self._size + off
        return self.pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self.pos
        n = max(0, min(n, self._size - self.pos))
        if n == 0:
            return b""
        data = self.src.read(self.pos, n)
        self.pos += len(data)
        self.bytes_read += len(data)
        self.requests += 1
        return data

    def read_at(self, n: int, off: int) -> bytes:
        data = self.src.read(off, n)
        self.bytes_read += len(data)
        self.requests += 1
        return data

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def close(self) -> None:
        self.closed = True

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_parquet_uris(uris, columns=None, *, rows_per_task: int | None = None):
    """Ray Dataset over REMOTE (or local) parquet objects with
    column-chunk range pushdown — the object-store corpus read shape
    the 100-TB design assumes: the driver range-reads each footer for
    the row-group list, ships (uri, row_group) descriptors, and every
    task opens its object with a ranged file and decodes ONLY its row
    group's projected column chunks.  ``columns=`` prunes at the
    transport level (untouched columns never leave the server).
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    if rows_per_task is None:
        rows_per_task = 100_000
    items = []
    metas: dict = {}
    uri_list = [uris] if isinstance(uris, str) else list(uris)
    for uri in uri_list:
        f = pq.ParquetFile(RangeFile(open_range(uri)))
        md = f.metadata
        if len(uri_list) <= 1000:
            metas[uri] = md  # footer shipped once, tasks skip re-fetch
        chunk: list[int] = []
        acc = 0
        for rg in range(md.num_row_groups):
            chunk.append(rg)
            acc += md.row_group(rg).num_rows
            if acc >= rows_per_task:
                items.append({"uri": uri, "rg0": chunk[0],
                              "nrg": len(chunk)})
                chunk, acc = [], 0
        if chunk:
            items.append({"uri": uri, "rg0": chunk[0],
                          "nrg": len(chunk)})
    descr = rd.from_items(items)

    def decode(b):
        import pyarrow as pa

        uris_ = b.column("uri").to_pylist()
        rg0s = b.column("rg0").to_pylist()
        nrgs = b.column("nrg").to_pylist()
        outs = []
        open_files: dict = {}
        for uri, rg0, nrg in zip(uris_, rg0s, nrgs):
            f = open_files.get(uri)
            if f is None:
                f = pq.ParquetFile(RangeFile(open_range(uri)),
                                   metadata=metas.get(uri))
                open_files[uri] = f
            outs.append(f.read_row_groups(
                list(range(rg0, rg0 + nrg)), columns=columns))
        return pa.concat_tables(outs, promote_options="permissive")

    return descr.map_batches(decode, batch_format="pyarrow",
                             batch_size=4)
