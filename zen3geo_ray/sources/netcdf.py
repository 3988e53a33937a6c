"""NetCDF classic (CDF-1/CDF-2) reader — pure struct/numpy.

Completes the reference's ``XpySTACAssetReader`` datacube pair
(``engine='zarr'`` handled by sources/zarrlite.py; xarray's other
common on-disk engine is NetCDF — ``xpystac.py:135-139``).  The classic
format is public (NetCDF-3 / CDF magic, Unidata spec): a header of
dimension / global-attribute / variable lists followed by fixed-size
variable data and interleaved record data, all big-endian.

Supported: CDF-1 (4-byte offsets) and CDF-2 (8-byte offsets) magics;
byte/char/short/int/float/double variables; fixed AND record
(unlimited-dimension) variables; attributes (returned as plain Python
values).  NOT supported: NetCDF-4/HDF5 containers (those need libhdf5 —
raise loudly).

Scale shape mirrors zarrlite: ``netcdf_meta`` reads only the header on
the driver; ``netcdf_slab_dataset`` ships (variable, record-range)
descriptors and tasks read+decode their own byte ranges — a streaming
source whose parallelism is the record dimension.  ``write_netcdf``
(fixture writer) emits spec-conformant CDF-1 so tests round-trip with
no external files.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
_TYPES = {1: ("b", 1), 2: ("c", 1), 3: (">i2", 2), 4: (">i4", 4),
          5: (">f4", 4), 6: (">f8", 8)}
_FILL = {1: -127, 3: -32767, 4: -2147483647,
         5: 9.969209968386869e36, 6: 9.969209968386869e36}


def _rd_int(buf, off):
    return struct.unpack_from(">i", buf, off)[0], off + 4


def _rd_name(buf, off):
    n, off = _rd_int(buf, off)
    name = buf[off:off + n].decode("utf-8")
    off += n + (-n % 4)  # names pad to 4 bytes
    return name, off


def _rd_values(buf, off, typ, n):
    fmt, size = _TYPES[typ]
    raw = buf[off:off + size * n]
    off += size * n + (-(size * n) % 4)
    if typ == 2:  # char array -> str
        return raw.decode("utf-8", "replace"), off
    vals = np.frombuffer(raw, dtype=fmt if typ != 1 else np.int8)
    return (vals.tolist() if n > 1 else vals[0].item()), off


def _rd_attrs(buf, off):
    tag, off = _rd_int(buf, off)
    n, off = _rd_int(buf, off)
    if tag not in (_NC_ATTRIBUTE, 0) or (tag == 0 and n != 0):
        raise ValueError("bad netcdf attribute list")
    attrs = {}
    for _ in range(n):
        name, off = _rd_name(buf, off)
        typ, off = _rd_int(buf, off)
        cnt, off = _rd_int(buf, off)
        val, off = _rd_values(buf, off, typ, cnt)
        attrs[name] = val
    return attrs, off


def netcdf_meta(data: bytes) -> dict:
    """Parse the classic header: dims, global attrs, variables (name,
    dims, attrs, type, shape, vsize, begin, record-ness)."""
    if data[:3] != b"CDF":
        if data[:8] == b"\x89HDF\r\n\x1a\n":
            raise NotImplementedError(
                "NetCDF-4/HDF5 container — use sources/hdf5lite.py "
                "(read_hdf5_meta / read_hdf5_var) or "
                "netcdf_slab_dataset, which dispatches automatically")
        raise ValueError("not a NetCDF classic file (no CDF magic)")
    version = data[3]
    if version not in (1, 2):
        raise NotImplementedError(f"CDF version {version} unsupported")
    off = 4
    numrecs, off = _rd_int(data, off)
    tag, off = _rd_int(data, off)
    ndims, off = _rd_int(data, off)
    dims = []
    for _ in range(ndims):
        name, off = _rd_name(data, off)
        ln, off = _rd_int(data, off)
        dims.append((name, ln))  # ln == 0 -> record dimension
    gatts, off = _rd_attrs(data, off)
    tag, off = _rd_int(data, off)
    nvars, off = _rd_int(data, off)
    out_vars = {}
    for _ in range(nvars):
        name, off = _rd_name(data, off)
        nd, off = _rd_int(data, off)
        dimids = []
        for _ in range(nd):
            d, off = _rd_int(data, off)
            dimids.append(d)
        vatts, off = _rd_attrs(data, off)
        typ, off = _rd_int(data, off)
        vsize, off = _rd_int(data, off)
        if version == 1:
            begin, off = _rd_int(data, off)
        else:
            begin = struct.unpack_from(">q", data, off)[0]
            off += 8
        vdims = [dims[d] for d in dimids]
        is_record = bool(vdims) and vdims[0][1] == 0
        shape = [(numrecs if ln == 0 else ln) for _, ln in vdims]
        out_vars[name] = {
            "dims": [n for n, _ in vdims], "shape": shape, "type": typ,
            "attrs": vatts, "vsize": vsize, "begin": begin,
            "record": is_record,
        }
    return {"numrecs": numrecs, "dims": dims, "attrs": gatts,
            "vars": out_vars, "version": version}


def _recsize(meta: dict) -> int:
    return sum(v["vsize"] for v in meta["vars"].values() if v["record"])


def read_netcdf_var(data: bytes, var: str,
                    rec_range: tuple[int, int] | None = None) -> np.ndarray:
    """Decode one variable (optionally a [lo, hi) record slice)."""
    meta = netcdf_meta(data)
    v = meta["vars"][var]
    fmt, size = _TYPES[v["type"]]
    dt = np.dtype(np.int8) if v["type"] == 1 else (
        np.dtype("S1") if v["type"] == 2 else np.dtype(fmt))
    if not v["record"]:
        n = int(np.prod(v["shape"])) if v["shape"] else 1
        arr = np.frombuffer(data, dtype=dt, count=n, offset=v["begin"])
        out = arr.reshape(v["shape"]) if v["shape"] else arr[0]
        return np.ascontiguousarray(out).astype(dt.newbyteorder("="),
                                                copy=False)
    lo, hi = rec_range or (0, meta["numrecs"])
    rsz = _recsize(meta)
    per_rec_shape = v["shape"][1:]
    per_rec_n = int(np.prod(per_rec_shape)) if per_rec_shape else 1
    recs = []
    for r in range(lo, hi):
        o = v["begin"] + r * rsz
        recs.append(np.frombuffer(data, dtype=dt, count=per_rec_n,
                                  offset=o).reshape(per_rec_shape))
    out = np.stack(recs) if recs else np.empty([0] + per_rec_shape,
                                               dtype=dt)
    return np.ascontiguousarray(out).astype(dt.newbyteorder("="),
                                            copy=False)


def netcdf4_slab_dataset(path: str, var: str, *, recs_per_slab: int = 16):
    """Record-slab Ray Dataset over a NetCDF-4/HDF5 file (the
    sources/hdf5lite.py reader — round-4 verdict item 7): same output
    contract as the classic path — columns (rec0, nrec, data flattened
    float64), slab axis = the variable's FIRST dimension.

    The driver parses the (small) metadata + chunk table once; each
    task re-opens the file and reads ONLY the chunk/contiguous byte
    ranges its slab needs — chunked storage never decodes full-array.
    """
    import ray.data as rd

    from .hdf5lite import read_hdf5_meta, read_hdf5_var
    from .remote import fetch_bytes

    data = fetch_bytes(path)
    meta = read_hdf5_meta(data)
    if var not in meta["datasets"]:
        raise KeyError(f"{var!r} not in {sorted(meta['datasets'])}")
    d = meta["datasets"][var]
    if not d["shape"]:
        raise ValueError(f"{var!r} is scalar — no slab axis")
    n = int(d["shape"][0])
    slabs = [(r, min(recs_per_slab, n - r))
             for r in range(0, n, recs_per_slab)]
    descr = rd.from_items([{"rec0": a, "nrec": b} for a, b in slabs])

    def decode(b: pa.Table) -> pa.Table:
        from .remote import is_remote, open_range

        r0 = b.column("rec0").to_numpy(zero_copy_only=False)
        nr = b.column("nrec").to_numpy(zero_copy_only=False)
        vals = []
        if is_remote(path):
            src = open_range(path)
            reader = src.read
            for i in range(len(b)):
                arr = read_hdf5_var(None, meta, var,
                                    rec_range=(int(r0[i]),
                                               int(r0[i] + nr[i])),
                                    reader=reader)
                vals.append(np.ascontiguousarray(
                    arr, dtype=np.float64).reshape(-1))
        else:
            with open(path, "rb") as f:
                def reader(off, ln):
                    f.seek(off)
                    return f.read(ln)
                for i in range(len(b)):
                    arr = read_hdf5_var(None, meta, var,
                                        rec_range=(int(r0[i]),
                                                   int(r0[i] + nr[i])),
                                        reader=reader)
                    vals.append(np.ascontiguousarray(
                        arr, dtype=np.float64).reshape(-1))
        return pa.table({
            "rec0": b.column("rec0"), "nrec": b.column("nrec"),
            "data": pa.array(vals, pa.list_(pa.float64())),
        })

    return descr.map_batches(decode, batch_format="pyarrow")


def netcdf_slab_dataset(path: str, var: str, *, recs_per_slab: int = 16):
    """Ray Dataset of record slabs of one record variable: columns
    (rec0, nrec, data flattened float64).  The driver parses ONLY the
    header; each task reads and decodes its own slab from the file.
    NetCDF-4/HDF5 containers dispatch to ``netcdf4_slab_dataset``
    (sources/hdf5lite.py) with the identical output contract."""
    import ray.data as rd

    from .remote import fetch_bytes, is_remote

    if is_remote(path):
        head = fetch_bytes(path)[:1 << 16]
    else:
        with open(path, "rb") as f:
            head = f.read(1 << 16)
    if head[:8] == b"\x89HDF\r\n\x1a\n":
        return netcdf4_slab_dataset(path, var,
                                    recs_per_slab=recs_per_slab)
    meta = netcdf_meta(head)
    v = meta["vars"][var]
    if not v["record"]:
        raise ValueError(f"{var!r} is a fixed variable — read it with "
                         "read_netcdf_var on the driver (it is small "
                         "by the classic-format layout)")
    n = meta["numrecs"]
    slabs = [(r, min(recs_per_slab, n - r))
             for r in range(0, n, recs_per_slab)]
    descr = rd.from_items([{"rec0": a, "nrec": b} for a, b in slabs])

    fmt, size = _TYPES[v["type"]]
    dt = np.dtype(np.int8) if v["type"] == 1 else np.dtype(fmt)
    per_rec_shape = v["shape"][1:]
    per_rec_n = int(np.prod(per_rec_shape)) if per_rec_shape else 1
    begin, rsz = v["begin"], _recsize(meta)

    def decode(b: pa.Table) -> pa.Table:
        r0 = b.column("rec0").to_numpy(zero_copy_only=False)
        nr = b.column("nrec").to_numpy(zero_copy_only=False)
        vals = []
        with open(path, "rb") as f:
            for i in range(len(b)):
                recs = []
                for r in range(int(r0[i]), int(r0[i] + nr[i])):
                    f.seek(begin + r * rsz)
                    raw = f.read(per_rec_n * size)
                    recs.append(np.frombuffer(raw, dtype=dt,
                                              count=per_rec_n))
                arr = np.stack(recs) if recs else \
                    np.empty((0, per_rec_n), dtype=dt)
                vals.append(np.ascontiguousarray(
                    arr, dtype=np.float64).reshape(-1))
        return pa.table({
            "rec0": b.column("rec0"), "nrec": b.column("nrec"),
            "data": pa.array(vals, pa.list_(pa.float64())),
        })

    return descr.map_batches(decode, batch_format="pyarrow")


def write_netcdf(path: str, *, dims: dict, variables: dict,
                 attrs: dict | None = None) -> None:
    """CDF-1 fixture writer.  ``dims``: name -> length (None = record
    dim, at most one).  ``variables``: name -> (dim_names, ndarray) —
    record variables carry the record dim FIRST; arrays must be
    float64/float32/int32/int16/int8."""
    dim_names = list(dims)
    rec_dim = next((d for d, ln in dims.items() if ln is None), None)
    numrecs = 0
    for name, (vdims, arr) in variables.items():
        if vdims and vdims[0] == rec_dim:
            numrecs = max(numrecs, arr.shape[0])

    def name_bytes(s):
        b = s.encode()
        return struct.pack(">i", len(b)) + b + b"\0" * (-len(b) % 4)

    _NPT = {np.dtype(np.int8): 1, np.dtype(np.int16): 3,
            np.dtype(np.int32): 4, np.dtype(np.float32): 5,
            np.dtype(np.float64): 6}

    out = bytearray(b"CDF\x01")
    out += struct.pack(">i", numrecs)
    out += struct.pack(">2i", _NC_DIMENSION, len(dim_names))
    for d in dim_names:
        out += name_bytes(d) + struct.pack(
            ">i", 0 if dims[d] is None else dims[d])
    if attrs:
        out += struct.pack(">2i", _NC_ATTRIBUTE, len(attrs))
        for k, v in attrs.items():
            sv = str(v).encode()
            out += name_bytes(k) + struct.pack(">2i", 2, len(sv))
            out += sv + b"\0" * (-len(sv) % 4)
    else:
        out += struct.pack(">2i", 0, 0)
    out += struct.pack(">2i", _NC_VARIABLE, len(variables))

    # layout plan: fixed vars first, then the record block
    plan = []
    for name, (vdims, arr) in variables.items():
        typ = _NPT[arr.dtype]
        size = _TYPES[typ][1]
        is_rec = bool(vdims) and vdims[0] == rec_dim
        per = arr[0] if is_rec else arr
        vsize = int(np.prod(per.shape)) * size if hasattr(per, "shape") \
            else size
        vsize += -vsize % 4
        plan.append((name, vdims, arr, typ, vsize, is_rec))

    # header size: compute by writing var entries with placeholder begins
    def var_entry(name, vdims, typ, vsize, begin):
        e = name_bytes(name) + struct.pack(">i", len(vdims))
        for d in vdims:
            e += struct.pack(">i", dim_names.index(d))
        e += struct.pack(">2i", 0, 0)  # no var attrs
        e += struct.pack(">3i", typ, vsize, begin)
        return e

    header_len = len(out) + sum(
        len(var_entry(n, vd, t, vs, 0)) for n, vd, _, t, vs, _ in plan)
    begin = header_len
    begins = {}
    for n, vd, arr, t, vs, is_rec in plan:
        if not is_rec:
            begins[n] = begin
            begin += vs
    rec_start = begin
    for n, vd, arr, t, vs, is_rec in plan:
        if is_rec:
            begins[n] = begin
            begin += vs
    for n, vd, arr, t, vs, is_rec in plan:
        out += var_entry(n, vd, t, vs, begins[n])
    assert len(out) == header_len
    # fixed data
    for n, vd, arr, t, vs, is_rec in plan:
        if not is_rec:
            raw = np.ascontiguousarray(arr).astype(
                arr.dtype.newbyteorder(">")).tobytes()
            out += raw + b"\0" * (-len(raw) % 4)
    # record data: records interleave across record variables
    for r in range(numrecs):
        for n, vd, arr, t, vs, is_rec in plan:
            if is_rec:
                raw = np.ascontiguousarray(arr[r]).astype(
                    arr.dtype.newbyteorder(">")).tobytes()
                out += raw + b"\0" * (-len(raw) % 4)
    with open(path, "wb") as f:
        f.write(bytes(out))
