"""Apache Avro Object Container File codec — pure stdlib.

The row-oriented interchange sibling of the ORC/Arrow-IPC vector
sources (reference surface: zen3geo's pyogrio reader accepts any
OGR-readable container, `zen3geo/datapipes/pyogrio.py:87-89`; Avro is
the canonical row format of log-shipping pipelines).  Spec:
https://avro.apache.org/docs/1.11.1/specification/ — implemented here:

* container framing: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker,
  blocks of (row count, byte size, payload, sync);
* codecs ``null`` and ``deflate`` (raw zlib, RFC 1951);
* a FLAT record schema with primitive fields — ``long`` ``int``
  ``double`` ``float`` ``boolean`` ``string`` ``bytes`` and the
  nullable union ``["null", T]`` — the shape a columnar table
  round-trips through;
* zigzag-varint longs exactly per spec.

The writer is deterministic (sync marker = md5 of the schema JSON) so
fixtures and golden files are byte-stable.  Reader and writer are
driver-side small-side utilities like every other ``read_vector``
format; large inputs should land in parquet.
"""

from __future__ import annotations

import hashlib
import io
import json
import zlib

import numpy as np
import pyarrow as pa

_MAGIC = b"Obj\x01"

_ARROW_TO_AVRO = [
    (pa.types.is_int64, "long"),
    (pa.types.is_int32, "int"),
    (pa.types.is_float64, "double"),
    (pa.types.is_float32, "float"),
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_string, "string"),
    (pa.types.is_large_string, "string"),
    (pa.types.is_binary, "bytes"),
    (pa.types.is_large_binary, "bytes"),
]

_AVRO_TO_ARROW = {"long": pa.int64(), "int": pa.int32(),
                  "double": pa.float64(), "float": pa.float32(),
                  "boolean": pa.bool_(), "string": pa.string(),
                  "bytes": pa.binary(), "null": pa.null()}


def _zigzag_encode(v: int) -> bytes:
    n = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varlong(buf: memoryview, pos: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (n >> 1) ^ -(n & 1), pos


def _avro_field_type(typ: pa.DataType) -> str:
    for pred, name in _ARROW_TO_AVRO:
        if pred(typ):
            return name
    raise NotImplementedError(f"avro writer: unsupported type {typ}")


def write_avro(table: pa.Table, path: str, *, codec: str = "deflate",
               block_rows: int = 4096) -> str:
    """Write a flat pyarrow Table as an Avro container file.  Every
    field is the nullable union ``["null", T]`` (branch 1 = value),
    matching what generic Avro writers emit for optional columns."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    fields = [{"name": f.name,
               "type": ["null", _avro_field_type(f.type)]}
              for f in table.schema]
    schema = {"type": "record", "name": "Row", "fields": fields}
    sjson = json.dumps(schema, separators=(",", ":"), sort_keys=True)
    sync = hashlib.md5(sjson.encode()).digest()

    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {"avro.schema": sjson.encode(), "avro.codec": codec.encode()}
    out.write(_zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out.write(_zigzag_encode(len(kb)) + kb)
        out.write(_zigzag_encode(len(v)) + v)
    out.write(_zigzag_encode(0))
    out.write(sync)

    cols = [table.column(f.name) for f in table.schema]
    types = [_avro_field_type(f.type) for f in table.schema]
    n = table.num_rows
    for lo in range(0, n, block_rows):
        hi = min(lo + block_rows, n)
        body = bytearray()
        pycols = [c.slice(lo, hi - lo).to_pylist() for c in cols]
        for i in range(hi - lo):
            for t, col in zip(types, pycols):
                v = col[i]
                if v is None:
                    body += _zigzag_encode(0)
                    continue
                body += _zigzag_encode(1)
                if t in ("long", "int"):
                    body += _zigzag_encode(int(v))
                elif t == "double":
                    body += np.float64(v).tobytes()
                elif t == "float":
                    body += np.float32(v).tobytes()
                elif t == "boolean":
                    body += b"\x01" if v else b"\x00"
                elif t == "string":
                    vb = v.encode()
                    body += _zigzag_encode(len(vb)) + vb
                else:  # bytes
                    body += _zigzag_encode(len(v)) + v
        payload = (zlib.compress(bytes(body), 6)[2:-4]
                   if codec == "deflate" else bytes(body))
        out.write(_zigzag_encode(hi - lo))
        out.write(_zigzag_encode(len(payload)))
        out.write(payload)
        out.write(sync)
    data = out.getvalue()
    with open(path, "wb") as f:
        f.write(data)
    return path


def _parse_schema(sjson: str):
    sch = json.loads(sjson)
    if sch.get("type") != "record":
        raise NotImplementedError("avro reader: only record schemas")
    names, types = [], []
    for f in sch["fields"]:
        t = f["type"]
        if isinstance(t, list):
            branches = [b if isinstance(b, str) else b.get("type")
                        for b in t]
            if len(branches) > 2 or (len(branches) == 2
                                     and "null" not in branches):
                raise NotImplementedError(
                    f"avro reader: union {branches} unsupported")
        elif not isinstance(t, str):
            raise NotImplementedError(
                f"avro reader: nested type {t!r} unsupported")
        names.append(f["name"])
        types.append(t)
    return names, types


def read_avro(path: str, columns: list[str] | None = None) -> pa.Table:
    """Read an Avro container file (null/deflate codec, flat record
    schema) into a pyarrow Table."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != _MAGIC:
        raise ValueError(f"{path!r}: not an Avro container file")
    buf = memoryview(raw)
    pos = 4
    meta = {}
    while True:
        cnt, pos = _read_varlong(buf, pos)
        if cnt == 0:
            break
        if cnt < 0:  # block-size-prefixed negative-count map chunk
            _, pos = _read_varlong(buf, pos)
            cnt = -cnt
        for _ in range(cnt):
            klen, pos = _read_varlong(buf, pos)
            k = bytes(buf[pos:pos + klen]).decode()
            pos += klen
            vlen, pos = _read_varlong(buf, pos)
            meta[k] = bytes(buf[pos:pos + vlen])
            pos += vlen
    sync = bytes(buf[pos:pos + 16])
    pos += 16
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    names, types = _parse_schema(meta["avro.schema"].decode())

    data = {nm: [] for nm in names}
    total = len(raw)
    while pos < total:
        cnt, pos = _read_varlong(buf, pos)
        size, pos = _read_varlong(buf, pos)
        payload = bytes(buf[pos:pos + size])
        pos += size
        if bytes(buf[pos:pos + 16]) != sync:
            raise ValueError(f"{path!r}: sync marker mismatch")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        body = memoryview(payload)
        bp = 0
        for _ in range(cnt):
            for nm, t in zip(names, types):
                if isinstance(t, list):
                    ix, bp = _read_varlong(body, bp)
                    eff = t[ix]
                    if eff == "null":
                        data[nm].append(None)
                        continue
                else:
                    eff = t
                if eff in ("long", "int"):
                    v, bp = _read_varlong(body, bp)
                    data[nm].append(v)
                elif eff == "double":
                    data[nm].append(
                        float(np.frombuffer(body[bp:bp + 8],
                                            np.float64)[0]))
                    bp += 8
                elif eff == "float":
                    data[nm].append(
                        float(np.frombuffer(body[bp:bp + 4],
                                            np.float32)[0]))
                    bp += 4
                elif eff == "boolean":
                    data[nm].append(body[bp] != 0)
                    bp += 1
                elif eff == "string":
                    ln, bp = _read_varlong(body, bp)
                    data[nm].append(bytes(body[bp:bp + ln]).decode())
                    bp += ln
                elif eff == "bytes":
                    ln, bp = _read_varlong(body, bp)
                    data[nm].append(bytes(body[bp:bp + ln]))
                    bp += ln
                elif eff == "null":
                    data[nm].append(None)
                else:
                    raise NotImplementedError(
                        f"avro reader: type {eff!r}")

    def arrow_type(t):
        if isinstance(t, list):
            nn = [b for b in t if b != "null"]
            return _AVRO_TO_ARROW[nn[0]] if nn else pa.null()
        return _AVRO_TO_ARROW[t]

    arrs = {nm: pa.array(data[nm], arrow_type(t))
            for nm, t in zip(names, types)}
    t = pa.table(arrs)
    if columns is not None:
        t = t.select(columns)
    return t
