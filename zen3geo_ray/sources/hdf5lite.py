"""HDF5-lite — minimal reader + fixture writer for NetCDF-4
classic-model files (round-4 verdict item 7).

The reference's ``XpySTACAssetReader`` opens NetCDF/COG/Zarr
(``xpystac.py:19-142``); HDF5-backed NetCDF-4 is the dominant wild
format.  No libhdf5 in this environment, so this implements the PUBLIC
HDF5 File Format Specification directly (like the repo's FlatGeobuf /
GeoTIFF codecs): the writer emits a spec-conformant superblock-v0
file (v1 object headers, symbol-table group, contiguous or chunked-v1-
B-tree layouts, optional shuffle+deflate filters) and the reader walks
superblock v0/v2/v3, object headers v1/v2 (link messages or symbol
tables), dataspace/datatype/layout/filter/attribute messages, and v1
chunk B-trees.

Scope is the netCDF-4 CLASSIC MODEL surface with default library
settings: a FLAT root group of simply-typed datasets with numeric /
fixed-string attributes.  Everything outside it fails LOUDLY
(NotImplementedError) — dense/fractal-heap groups, nested groups,
compact/v4-indexed layouts, filters beyond shuffle+deflate, vlen
dataset types; vlen/reference ATTRIBUTES are skipped by name (listed
in ``skipped_attrs``) because netCDF-4 files routinely carry them on
otherwise-readable data.

All multi-byte values little-endian; offsets/lengths must be 8 bytes
(what every mainstream writer emits).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


# =========================== low-level helpers ===========================

def _u(buf, off, n):
    return int.from_bytes(buf[off:off + n], "little")


def _name_at(buf, off):
    end = buf.index(b"\x00", off)
    return buf[off:end].decode("utf-8")


# ============================== datatypes ===============================

def _parse_datatype(body: bytes):
    """Datatype message -> (np.dtype | None, is_string).  None = class
    this reader cannot decode (caller decides skip-vs-raise)."""
    cls = body[0] & 0x0F
    bits0 = body[1]
    size = _u(body, 4, 4)
    if cls == 0:  # fixed-point
        order = ">" if (bits0 & 1) else "<"
        signed = bool(bits0 & 0x08)
        code = {1: "b", 2: "h", 4: "i", 8: "q"}.get(size)
        if code is None:
            return None, False
        if not signed:
            code = code.upper()
        return np.dtype(order + code if size > 1 else
                        ("i1" if signed else "u1")), False
    if cls == 1:  # float
        order = ">" if (bits0 & 1) else "<"
        if size == 4:
            return np.dtype(order + "f4"), False
        if size == 8:
            return np.dtype(order + "f8"), False
        return None, False
    if cls == 3:  # fixed-length string
        return np.dtype(f"S{size}"), True
    return None, False


def _dtype_message(dt: np.dtype) -> bytes:
    """Datatype message body for the supported numpy dtypes."""
    dt = np.dtype(dt)
    le = dt.byteorder in ("<", "=", "|")
    if dt.kind in ("i", "u"):
        b0 = 0x10  # version 1, class 0
        bits0 = (0 if le else 1) | (0x08 if dt.kind == "i" else 0)
        body = bytes([b0, bits0, 0, 0]) + struct.pack("<I", dt.itemsize)
        body += struct.pack("<HH", 0, dt.itemsize * 8)
        return body
    if dt.kind == "f":
        b0 = 0x11  # version 1, class 1
        bits0 = (0 if le else 1) | 0x20  # msb-set implied mantissa
        if dt.itemsize == 8:
            sign, eloc, esz, mloc, msz, bias = 63, 52, 11, 0, 52, 1023
        elif dt.itemsize == 4:
            sign, eloc, esz, mloc, msz, bias = 31, 23, 8, 0, 23, 127
        else:
            raise NotImplementedError(f"float size {dt.itemsize}")
        body = bytes([b0, bits0, sign, 0]) \
            + struct.pack("<I", dt.itemsize) \
            + struct.pack("<HHBBBBI", 0, dt.itemsize * 8,
                          eloc, esz, mloc, msz, bias)
        return body
    if dt.kind == "S":
        b0 = 0x13  # version 1, class 3 (fixed string)
        body = bytes([b0, 0, 0, 0]) + struct.pack("<I", dt.itemsize)
        return body
    raise NotImplementedError(f"dtype {dt} unsupported")


# ========================= object header walking =========================

def _walk_messages_v1(buf, addr):
    """Yield (type, body) for a v1 object header incl. continuations."""
    nmsgs = _u(buf, addr + 2, 2)
    hdrsize = _u(buf, addr + 8, 4)
    segments = [(addr + 16, hdrsize)]
    got = 0
    while segments and got < nmsgs:
        off, remain = segments.pop(0)
        while remain >= 8 and got < nmsgs:
            mtype = _u(buf, off, 2)
            msize = _u(buf, off + 2, 2)
            body = buf[off + 8:off + 8 + msize]
            off += 8 + msize
            remain -= 8 + msize
            got += 1
            if mtype == 0x10:  # continuation: raw messages, no sig
                caddr = _u(body, 0, 8)
                clen = _u(body, 8, 8)
                segments.append((caddr, clen))
            else:
                yield mtype, body


def _walk_messages_v2(buf, addr):
    """Yield (type, body) for a v2 ('OHDR') object header."""
    if buf[addr:addr + 4] != b"OHDR":
        raise ValueError("bad v2 object header signature")
    ver = buf[addr + 4]
    if ver != 2:
        raise NotImplementedError(f"object header version {ver}")
    flags = buf[addr + 5]
    off = addr + 6
    if flags & 0x20:
        off += 16  # times
    if flags & 0x10:
        off += 4   # max compact / min dense
    csize_len = 1 << (flags & 0x03)
    chunk0 = _u(buf, off, csize_len)
    off += csize_len
    tracked = bool(flags & 0x04)
    segments = [(off, chunk0)]
    while segments:
        off, remain = segments.pop(0)
        end = off + remain
        while off + 4 <= end - 4:  # gap + checksum tail tolerance
            mtype = buf[off]
            msize = _u(buf, off + 1, 2)
            mflags = buf[off + 3]
            off += 4
            if tracked:
                off += 2
            body = buf[off:off + msize]
            off += msize
            if mtype == 0x10:
                caddr = _u(body, 0, 8)
                clen = _u(body, 8, 8)
                # 'OCHK' signature + trailing checksum
                segments.append((caddr + 4, clen - 8))
            elif mtype == 0x00 and msize == 0:
                break
            else:
                yield mtype, body


def _object_messages(buf, addr):
    if buf[addr:addr + 4] == b"OHDR":
        return _walk_messages_v2(buf, addr)
    if buf[addr] == 1:
        return _walk_messages_v1(buf, addr)
    raise NotImplementedError(
        f"object header at {addr:#x}: unknown version byte "
        f"{buf[addr]!r}")


# ============================ group walking =============================

def _walk_group_btree(buf, addr, heap_data):
    """v1 group B-tree -> [(name, object header addr)] via SNODs."""
    out = []
    if buf[addr:addr + 4] != b"TREE":
        raise ValueError("bad group B-tree signature")
    level = buf[addr + 5]
    entries = _u(buf, addr + 6, 2)
    base = addr + 8 + 16  # sig+type+level+entries, left+right siblings
    for i in range(entries):
        child = _u(buf, base + 8 + i * 16, 8)
        if level > 0:
            out.extend(_walk_group_btree(buf, child, heap_data))
            continue
        if buf[child:child + 4] != b"SNOD":
            raise ValueError("bad symbol node signature")
        nsym = _u(buf, child + 6, 2)
        for s in range(nsym):
            e = child + 8 + s * 40
            name_off = _u(buf, e, 8)
            oh = _u(buf, e + 8, 8)
            out.append((_name_at(buf, heap_data + name_off), oh))
    return out


def _heap_data_addr(buf, heap_addr):
    if buf[heap_addr:heap_addr + 4] != b"HEAP":
        raise ValueError("bad local heap signature")
    return _u(buf, heap_addr + 24, 8)


def _parse_link(body: bytes):
    """Hard-link message -> (name, address) or None for soft/external."""
    ver, flags = body[0], body[1]
    off = 2
    ltype = 0
    if flags & 0x08:
        ltype = body[off]
        off += 1
    if flags & 0x04:
        off += 8  # creation order
    if flags & 0x10:
        off += 1  # charset
    nlen = _u(body, off, 1 << (flags & 0x03))
    off += 1 << (flags & 0x03)
    name = body[off:off + nlen].decode("utf-8")
    off += nlen
    if ltype != 0:
        return None
    return name, _u(body, off, 8)


# =========================== dataset parsing ============================

def _parse_dataspace(body: bytes):
    ver = body[0]
    rank = body[1]
    if ver == 1:
        off = 8
    elif ver == 2:
        off = 4
    else:
        raise NotImplementedError(f"dataspace version {ver}")
    return [_u(body, off + 8 * i, 8) for i in range(rank)]


def _parse_filters(body: bytes):
    ver = body[0]
    out = []
    if ver == 1:
        n = body[1]
        off = 8
        for _ in range(n):
            fid = _u(body, off, 2)
            nlen = _u(body, off + 2, 2)
            ncv = _u(body, off + 6, 2)
            off += 8
            off += nlen + (-nlen % 8)
            off += 4 * ncv
            if ncv % 2:
                off += 4
            out.append(fid)
    elif ver == 2:
        n = body[1]
        off = 2
        for _ in range(n):
            fid = _u(body, off, 2)
            off += 2
            nlen = 0
            if fid >= 256:
                nlen = _u(body, off, 2)
                off += 2
            ncv = _u(body, off + 2, 2)
            off += 4
            off += nlen
            off += 4 * ncv
            out.append(fid)
    else:
        raise NotImplementedError(f"filter pipeline version {ver}")
    bad = [f for f in out if f not in (1, 2)]
    if bad:
        raise NotImplementedError(
            f"HDF5 filters {bad} unsupported (shuffle+deflate only)")
    return out


def _parse_attribute(body: bytes):
    """Attribute message -> (name, value | None)."""
    ver = body[0]
    if ver == 1:
        nsize = _u(body, 2, 2)
        dtsize = _u(body, 4, 2)
        dssize = _u(body, 6, 2)
        off = 8
        name = _name_at(body, off)
        off += nsize + (-nsize % 8)
        dt_body = body[off:off + dtsize]
        off += dtsize + (-dtsize % 8)
        ds_body = body[off:off + dssize]
        off += dssize + (-dssize % 8)
    elif ver == 3:
        nsize = _u(body, 2, 2)
        dtsize = _u(body, 4, 2)
        dssize = _u(body, 6, 2)
        off = 9
        name = _name_at(body, off)
        off += nsize
        dt_body = body[off:off + dtsize]
        off += dtsize
        ds_body = body[off:off + dssize]
        off += dssize
    else:
        raise NotImplementedError(f"attribute version {ver}")
    dt, is_str = _parse_datatype(dt_body)
    if dt is None:
        return name, None
    dims = _parse_dataspace(ds_body) if ds_body[1] else []
    n = int(np.prod(dims)) if dims else 1
    raw = body[off:off + dt.itemsize * n]
    vals = np.frombuffer(raw, dtype=dt, count=n)
    if is_str:
        s = vals[0].split(b"\x00")[0].decode("utf-8", "replace")
        return name, s
    out = vals.astype(dt.newbyteorder("="))
    return name, (out.tolist() if n > 1 else out[0].item())


def _walk_chunk_btree(buf, addr, ndims):
    """v1 chunk B-tree -> [(chunk_nbytes, filter_mask, offsets, addr)]."""
    out = []
    if buf[addr:addr + 4] != b"TREE":
        raise ValueError("bad chunk B-tree signature")
    level = buf[addr + 5]
    entries = _u(buf, addr + 6, 2)
    keysize = 8 + 8 * ndims
    off = addr + 24
    for _ in range(entries):
        nbytes = _u(buf, off, 4)
        mask = _u(buf, off + 4, 4)
        coords = [_u(buf, off + 8 + 8 * d, 8) for d in range(ndims)]
        child = _u(buf, off + keysize, 8)
        off += keysize + 8
        if level > 0:
            out.extend(_walk_chunk_btree(buf, child, ndims))
        else:
            out.append((nbytes, mask, coords, child))
    return out


def read_hdf5_meta(data: bytes) -> dict:
    """Parse the file: root attrs + per-dataset meta incl. the chunk
    table, so slab readers can fetch exactly the byte ranges they
    need.  Returns {"attrs", "skipped_attrs", "datasets": {name: {
    shape, dtype, str, attrs, skipped_attrs, layout, contiguous
    (addr, size) | chunks [(nbytes, mask, coords, addr)], chunk_dims,
    filters}}}."""
    if data[:8] != _SIG:
        raise ValueError("not an HDF5 file (bad signature)")
    ver = data[8]
    if ver == 0:
        if data[13] != 8 or data[14] != 8:
            raise NotImplementedError("non-8-byte offsets/lengths")
        # fixed part is 56 bytes; the root symbol-table entry follows
        # (link name offset 8, then the object header address)
        root_oh = _u(data, 56 + 8, 8)
    elif ver in (2, 3):
        if data[9] != 8 or data[10] != 8:
            raise NotImplementedError("non-8-byte offsets/lengths")
        root_oh = _u(data, 36, 8)
    else:
        raise NotImplementedError(f"superblock version {ver}")

    def _object(addr):
        """Collect one object's parsed messages."""
        o = {"dataspace": None, "dtype": None, "str": False,
             "layout": None, "contiguous": None, "chunk_btree": None,
             "chunk_dims": None, "filters": [], "attrs": {},
             "skipped_attrs": [], "links": [], "symtab": None,
             "has_link_info": False}
        for mtype, body in _object_messages(data, addr):
            if mtype == 0x01:
                o["dataspace"] = _parse_dataspace(body)
            elif mtype == 0x03:
                dt, is_str = _parse_datatype(body)
                if dt is None:
                    raise NotImplementedError(
                        f"dataset datatype class {body[0] & 0x0F} "
                        "unsupported")
                o["dtype"], o["str"] = dt, is_str
            elif mtype == 0x08:
                if body[0] != 3:
                    raise NotImplementedError(
                        f"data layout version {body[0]} (v3 only)")
                cls = body[1]
                if cls == 1:
                    o["layout"] = "contiguous"
                    o["contiguous"] = (_u(body, 2, 8), _u(body, 10, 8))
                elif cls == 2:
                    nd = body[2]
                    o["layout"] = "chunked"
                    o["chunk_btree"] = _u(body, 3, 8)
                    o["chunk_dims"] = [
                        _u(body, 11 + 4 * d, 4) for d in range(nd - 1)]
                else:
                    raise NotImplementedError(
                        "compact/virtual layouts unsupported")
            elif mtype == 0x0B:
                o["filters"] = _parse_filters(body)
            elif mtype == 0x0C:
                name, val = _parse_attribute(body)
                if val is None:
                    o["skipped_attrs"].append(name)
                else:
                    o["attrs"][name] = val
            elif mtype == 0x06:
                ln = _parse_link(body)
                if ln is not None:
                    o["links"].append(ln)
            elif mtype == 0x11:
                o["symtab"] = (_u(body, 0, 8), _u(body, 8, 8))
            elif mtype == 0x02:
                o["has_link_info"] = True
        return o

    root = _object(root_oh)
    members = list(root["links"])
    if root["symtab"] is not None:
        btree, heap = root["symtab"]
        heap_data = _heap_data_addr(data, heap)
        members.extend(_walk_group_btree(data, btree, heap_data))
    if not members and root["has_link_info"]:
        raise NotImplementedError(
            "dense (fractal-heap) group links unsupported")

    datasets = {}
    for name, addr in members:
        o = _object(addr)
        if o["dataspace"] is None and o["dtype"] is None:
            raise NotImplementedError(
                f"{name!r} is not a dataset (nested groups "
                "unsupported — classic model is flat)")
        shape = o["dataspace"] or []
        d = {"shape": shape, "dtype": o["dtype"], "str": o["str"],
             "attrs": o["attrs"], "skipped_attrs": o["skipped_attrs"],
             "layout": o["layout"], "contiguous": o["contiguous"],
             "chunk_dims": o["chunk_dims"], "filters": o["filters"]}
        if o["layout"] == "chunked":
            d["chunks"] = _walk_chunk_btree(
                data, o["chunk_btree"], len(shape) + 1)
        datasets[name] = d
    return {"attrs": root["attrs"],
            "skipped_attrs": root["skipped_attrs"],
            "datasets": datasets}


def _decode_chunk_bytes(raw: bytes, filters, dtype, nelem) -> np.ndarray:
    if 1 in filters:
        raw = zlib.decompress(raw)
    if 2 in filters:  # byte shuffle: stored as [byte0 of all, byte1...]
        a = np.frombuffer(raw, dtype=np.uint8)
        a = a.reshape(dtype.itemsize, nelem).T
        raw = np.ascontiguousarray(a).tobytes()
    return np.frombuffer(raw, dtype=dtype, count=nelem)


def read_hdf5_var(data: bytes, meta: dict, name: str,
                  rec_range: tuple[int, int] | None = None,
                  reader=None) -> np.ndarray:
    """Decode one dataset (optionally a [lo, hi) slice of its FIRST
    dimension — the record/slab axis).  ``reader(off, ln)`` overrides
    byte access (file handle / HTTP range source); default slices
    ``data``."""
    d = meta["datasets"][name]
    dt = d["dtype"]
    shape = list(d["shape"])
    if reader is None:
        def reader(off, ln):
            return data[off:off + ln]
    lo, hi = rec_range or (0, shape[0] if shape else 1)
    out_shape = ([hi - lo] + shape[1:]) if shape else []
    if d["layout"] == "contiguous":
        addr, size = d["contiguous"]
        if addr == _UNDEF:
            return np.zeros(out_shape, dtype=dt.newbyteorder("="))
        per_rec = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        if not shape:
            raw = reader(addr, dt.itemsize)
            return np.frombuffer(raw, dtype=dt, count=1).astype(
                dt.newbyteorder("="))[0]
        raw = reader(addr + lo * per_rec * dt.itemsize,
                     (hi - lo) * per_rec * dt.itemsize)
        arr = np.frombuffer(raw, dtype=dt,
                            count=(hi - lo) * per_rec)
        return arr.reshape(out_shape).astype(dt.newbyteorder("="),
                                             copy=False)
    if d["layout"] != "chunked":
        raise NotImplementedError(f"layout {d['layout']!r}")
    cd = d["chunk_dims"]
    nelem = int(np.prod(cd))
    out = np.zeros(out_shape, dtype=dt.newbyteorder("="))
    for nbytes, mask, coords, addr in d["chunks"]:
        c0 = coords[0] if shape else 0
        if shape and (c0 >= hi or c0 + cd[0] <= lo):
            continue  # chunk outside the record slab
        raw = reader(addr, nbytes)
        arr = _decode_chunk_bytes(raw, d["filters"], dt, nelem) \
            .reshape(cd).astype(dt.newbyteorder("="), copy=False)
        # paste with edge trim + slab clip on dim 0
        src = []
        dst = []
        for axis in range(len(shape)):
            a0 = coords[axis]
            valid = min(cd[axis], shape[axis] - a0)
            if axis == 0:
                s0 = max(lo - a0, 0)
                s1 = min(hi - a0, valid)
                src.append(slice(s0, s1))
                dst.append(slice(a0 + s0 - lo, a0 + s1 - lo))
            else:
                src.append(slice(0, valid))
                dst.append(slice(a0, a0 + valid))
        out[tuple(dst)] = arr[tuple(src)]
    return out


# ============================ fixture writer ============================

def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HH", mtype, len(body)) + b"\x00" * 4 + body


def _dataspace_message(shape) -> bytes:
    body = bytes([1, len(shape), 0, 0]) + b"\x00" * 4
    for s in shape:
        body += struct.pack("<Q", s)
    return body


def _attr_message(name: str, value) -> bytes:
    if isinstance(value, str):
        val = np.array(value.encode("utf-8"),
                       dtype=f"S{max(1, len(value.encode('utf-8')))}")
        arr = val.reshape(())
    else:
        arr = np.asarray(value)
        if arr.dtype == np.float64 or arr.dtype.kind == "f":
            arr = arr.astype("<f8")
        else:
            arr = arr.astype("<i8")
    dt_body = _dtype_message(arr.dtype)
    ds_body = _dataspace_message(list(arr.shape))
    nb = name.encode("utf-8") + b"\x00"
    body = bytes([1, 0]) + struct.pack(
        "<HHH", len(nb), len(dt_body), len(ds_body))
    body += _pad8(nb) + _pad8(dt_body) + _pad8(ds_body)
    body += arr.tobytes()
    return body


def write_hdf5(path: str, datasets: dict, *, attrs: dict | None = None,
               chunks: dict | None = None, compress: bool = False,
               shuffle: bool = False) -> None:
    """Fixture writer: superblock v0, v1 object headers, symbol-table
    root group — the classic layout every HDF5 1.8-era writer (and
    default-configured h5py / netCDF-4) emits.

    ``datasets``: name -> ndarray | (ndarray, attrs_dict).
    ``chunks``: name -> chunk dims (enables the chunked v1-B-tree
    layout for that dataset; with ``compress`` each chunk is
    deflate(6), with ``shuffle`` byte-shuffled first).
    """
    chunks = chunks or {}
    names = sorted(datasets)

    blobs: list[bytes] = []   # (addr assigned at the end)
    addrs: dict = {}
    cursor = [0]

    def alloc(tag, blob: bytes, align: int = 8) -> int:
        pad = -cursor[0] % align
        if pad:
            blobs.append(b"\x00" * pad)
            cursor[0] += pad
        addrs[tag] = cursor[0]
        blobs.append(blob)
        cursor[0] += len(blob)
        return addrs[tag]

    # ---- plan the local heap ------------------------------------------
    heap_data = bytearray(b"\x00" * 8)  # offset 0: the empty name
    name_offs = {}
    for n in names:
        name_offs[n] = len(heap_data)
        nb = n.encode("utf-8") + b"\x00"
        heap_data += nb + b"\x00" * (-len(nb) % 8)

    # ---- superblock placeholder (patched last) ------------------------
    alloc("super", b"\x00" * 96)

    # ---- root object header (symbol table message) --------------------
    st_msg = _msg(0x11, b"\x00" * 16)  # btree+heap addrs patched later
    root_oh = struct.pack("<BBHI", 1, 0, 1, 1) \
        + struct.pack("<I", len(st_msg)) + b"\x00" * 4 + st_msg
    alloc("root_oh", root_oh)

    # ---- local heap ----------------------------------------------------
    alloc("heap_data", bytes(heap_data))
    heap_hdr = b"HEAP" + bytes([0, 0, 0, 0]) \
        + struct.pack("<QQQ", len(heap_data), 1, addrs["heap_data"])
    alloc("heap", heap_hdr)

    # ---- per-dataset data + object headers -----------------------------
    for n in names:
        spec = datasets[n]
        arr, dattrs = spec if isinstance(spec, tuple) else (spec, {})
        arr = np.ascontiguousarray(arr)
        if arr.dtype.kind in ("i", "u", "f"):
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        msgs = [_msg(0x01, _dataspace_message(arr.shape)),
                _msg(0x03, _dtype_message(arr.dtype))]
        if n in chunks:
            cd = list(chunks[n])
            filters = []
            if shuffle:
                filters.append(2)
            if compress:
                filters.append(1)
            # chunk data
            entries = []
            grid = [range(0, max(s, 1), c)
                    for s, c in zip(arr.shape, cd)]
            coords_list = [[]]
            for axis_rng in grid:
                coords_list = [c + [o] for c in coords_list
                               for o in axis_rng]
            for coords in coords_list:
                full = np.zeros(cd, dtype=arr.dtype)
                sl_src = tuple(
                    slice(o, min(o + c, s))
                    for o, c, s in zip(coords, cd, arr.shape))
                sl_dst = tuple(
                    slice(0, min(o + c, s) - o)
                    for o, c, s in zip(coords, cd, arr.shape))
                full[sl_dst] = arr[sl_src]
                raw = full.tobytes()
                if 2 in filters:
                    a = np.frombuffer(raw, dtype=np.uint8)
                    raw = np.ascontiguousarray(
                        a.reshape(-1, arr.dtype.itemsize).T).tobytes()
                if 1 in filters:
                    raw = zlib.compress(raw, 6)
                ca = alloc(("chunk", n, tuple(coords)), raw)
                entries.append((len(raw), coords, ca))
            # chunk B-tree (single leaf node)
            nd = len(cd) + 1
            keysize = 8 + 8 * nd
            node = bytearray()
            node += b"TREE" + bytes([1, 0]) \
                + struct.pack("<H", len(entries)) \
                + struct.pack("<QQ", _UNDEF, _UNDEF)
            for nbytes, coords, ca in entries:
                node += struct.pack("<II", nbytes, 0)
                for c in coords:
                    node += struct.pack("<Q", c)
                node += struct.pack("<Q", 0)  # element offset
                node += struct.pack("<Q", ca)
            # final boundary key
            node += struct.pack("<II", 0, 0)
            for s, c in zip(arr.shape, cd):
                node += struct.pack("<Q", -(-s // c) * c)
            node += struct.pack("<Q", 0)
            bta = alloc(("btree", n), bytes(node))
            lay = bytes([3, 2, nd]) + struct.pack("<Q", bta)
            for c in cd:
                lay += struct.pack("<I", c)
            lay += struct.pack("<I", arr.dtype.itemsize)
            msgs.append(_msg(0x08, lay))
            if filters:
                fb = bytes([1, len(filters)]) + b"\x00" * 6
                for fid in filters:
                    level = 6 if fid == 1 else arr.dtype.itemsize
                    fb += struct.pack("<HHHH", fid, 0, 0, 1)
                    fb += struct.pack("<I", level)
                    fb += b"\x00" * 4  # pad odd client-value count
                msgs.append(_msg(0x0B, fb))
        else:
            da = alloc(("data", n), arr.tobytes())
            lay = bytes([3, 1]) + struct.pack("<QQ", da, arr.nbytes)
            msgs.append(_msg(0x08, lay))
        for an, av in (dattrs or {}).items():
            msgs.append(_msg(0x0C, _attr_message(an, av)))
        mb = b"".join(msgs)
        oh = struct.pack("<BBHI", 1, 0, len(msgs), 1) \
            + struct.pack("<I", len(mb)) + b"\x00" * 4 + mb
        alloc(("oh", n), oh)

    # ---- SNOD + group B-tree -------------------------------------------
    snod = bytearray(b"SNOD" + bytes([1, 0])
                     + struct.pack("<H", len(names)))
    for n in names:
        snod += struct.pack("<QQ", name_offs[n], addrs[("oh", n)])
        snod += struct.pack("<II", 0, 0) + b"\x00" * 16
    alloc("snod", bytes(snod))
    bt = bytearray(b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
                   + struct.pack("<QQ", _UNDEF, _UNDEF))
    last_off = name_offs[names[-1]] if names else 0
    bt += struct.pack("<QQQ", 0, addrs["snod"], last_off)
    alloc("btree_root", bytes(bt))

    eof = cursor[0]

    # ---- patch superblock + root symbol-table message ------------------
    out = bytearray(b"".join(blobs))
    sb = bytearray()
    sb += _SIG
    sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])
    sb += struct.pack("<HHI", 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
    # root symbol table entry
    sb += struct.pack("<QQ", 0, addrs["root_oh"])
    sb += struct.pack("<II", 1, 0)
    sb += struct.pack("<QQ", addrs["btree_root"], addrs["heap"])
    out[0:96] = sb
    # symbol-table message body inside root_oh: prefix 16 + msghdr 8
    sto = addrs["root_oh"] + 16 + 8
    out[sto:sto + 16] = struct.pack("<QQ", addrs["btree_root"],
                                    addrs["heap"])
    if attrs:
        raise NotImplementedError(
            "root-group attrs unsupported in the fixture writer "
            "(put them on a dataset)")
    with open(path, "wb") as f:
        f.write(bytes(out))
