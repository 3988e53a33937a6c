"""FlatGeobuf vector source — hand-rolled flatbuffers subset, no GDAL.

The last of the reference's pyogrio vector formats
(``/root/reference/zen3geo/datapipes/pyogrio.py:87-89``; the
segmentation walkthrough's layer is a FlatGeobuf,
``docs/vector-segmentation-masks.md:190``).  Both specs are public:

* the FlatBuffers WIRE format (google/flatbuffers internals doc):
  little-endian; a table starts with an int32 soffset back to its
  vtable (uint16 vtable_len, uint16 table_len, then per-field uint16
  offsets relative to the table start, 0 = field absent); vectors and
  strings are uoffset-pointed with a uint32 length; roots/size-prefixes
  are uint32;
* the FlatGeobuf LAYOUT (flatgeobuf.org, fgb 3.x): 8-byte magic
  ``fgb\\x03fgb\\x00``, a size-prefixed Header table, an optional
  packed Hilbert R-tree (flatbush: 40-byte nodes, level sizes from
  ceil-division by node size), then size-prefixed Feature tables whose
  Geometry tables hold ``ends``/``xy``/``type``/``parts``.

Field slots used (from the published header.fbs / feature.fbs /
geometry.fbs): Header{0 name, 2 envelope?..}: we read geometry_type
(slot 2), columns (slot 7), features_count (slot 8), index_node_size
(slot 9); Feature{0 geometry, 1 properties}; Geometry{0 ends, 1 xy,
7 type, 8 parts}.  The reader skips any spatial index (it is an
optimization, not data); the writer emits none (node size 0).

Emits the SAME fixed POLYGONS schema as the other vector paths.
``write_flatgeobuf`` is a spec-conformant fixture writer so the
round-trip pins the byte layout.

Spatial index (``write_flatgeobuf(..., index=True)`` /
``read_flatgeobuf(..., bbox=...)``): the FGB packed Hilbert R-tree —
features sort by the Hilbert distance of their bbox centers on a
2^16 grid over the layer extent (the flatbush ordering; the bitwise
Hilbert kernel is the public-domain rawrunprotected/hilbert_curves
algorithm flatbush ports), then 40-byte nodes
(minx,miny,maxx,maxy f64 + u64 offset) pack level by level with the
ROOT FIRST (FGB's streaming-friendly inversion of flatbush). Leaf
node offsets are feature byte offsets relative to the start of the
features section; internal node offsets are the byte offset of the
node's first child within the index. A bbox read walks the tree
top-down and decodes ONLY intersecting features — the leaf's position
inside the leaf level recovers the file ordinal, so ``poly_id`` is
identical between a bbox read and a full scan.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..geom import wkb
from ..geom.cells import hilbert_d
from ..schema import POLYGONS

MAGIC = b"fgb\x03fgb\x00"

# GeometryType enum (flatgeobuf spec)
_GT = {0: "Unknown", 1: "Point", 2: "LineString", 3: "Polygon",
       4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon"}
_GT_INV = {v: k for k, v in _GT.items()}


# --- minimal flatbuffers wire decoding ------------------------------------

def _u16(b, o):
    return struct.unpack_from("<H", b, o)[0]


def _i32(b, o):
    return struct.unpack_from("<i", b, o)[0]


def _u32(b, o):
    return struct.unpack_from("<I", b, o)[0]


def _field_off(buf, table, slot):
    """Absolute offset of field ``slot`` inside a table, or None."""
    vt = table - _i32(buf, table)
    vlen = _u16(buf, vt)
    fo = 4 + 2 * slot
    if fo + 2 > vlen:
        return None
    rel = _u16(buf, vt + fo)
    return table + rel if rel else None


def _field_scalar(buf, table, slot, fmt, default):
    off = _field_off(buf, table, slot)
    if off is None:
        return default
    return struct.unpack_from("<" + fmt, buf, off)[0]


def _field_vector(buf, table, slot, dtype):
    off = _field_off(buf, table, slot)
    if off is None:
        return None
    vec = off + _u32(buf, off)
    n = _u32(buf, vec)
    if dtype == "offset":  # vector of table/string offsets
        base = vec + 4
        return [base + 4 * i + _u32(buf, base + 4 * i) for i in range(n)]
    return np.frombuffer(buf, dtype=dtype, count=n, offset=vec + 4)


def _field_table(buf, table, slot):
    off = _field_off(buf, table, slot)
    if off is None:
        return None
    return off + _u32(buf, off)


# --- geometry decoding -----------------------------------------------------

def _decode_geometry(buf, gtab, gtype_hint):
    gtype = _field_scalar(buf, gtab, 7, "B", 0) or gtype_hint
    name = _GT.get(gtype)
    if name == "MultiPolygon":
        parts = _field_vector(buf, gtab, 8, "offset") or []
        polys = [_decode_geometry(buf, p, _GT_INV["Polygon"])
                 for p in parts]
        return {"type": "MultiPolygon",
                "coords": [g["coords"] for g in polys]}
    xy = _field_vector(buf, gtab, 1, "<f8")
    pts = (np.asarray(xy, dtype=np.float64).reshape(-1, 2)
           if xy is not None else np.empty((0, 2)))
    ends = _field_vector(buf, gtab, 0, "<u4")
    if name == "Point":
        return {"type": "Point", "coords": pts[:1]}
    if name == "MultiPoint":
        return {"type": "MultiPoint", "coords": pts}
    if name == "LineString":
        return {"type": "LineString", "coords": pts}
    if name in ("Polygon", "MultiLineString"):
        e = (np.asarray(ends, dtype=np.int64)
             if ends is not None and len(ends) else
             np.array([len(pts)], dtype=np.int64))
        rings, prev = [], 0
        for end in e:
            rings.append(pts[prev:int(end)])
            prev = int(end)
        return {"type": name, "coords": rings}
    raise NotImplementedError(f"flatgeobuf geometry type {gtype}")


def _index_size(num_items: int, node_size: int) -> int:
    """Packed Hilbert R-tree byte size (flatbush layout: 40-byte
    nodes; level widths by repeated ceil-division)."""
    n = num_items
    num_nodes = n
    while n != 1:
        n = -(-n // node_size)
        num_nodes += n
    return num_nodes * 40


# --- packed Hilbert R-tree ---------------------------------------------------

_NODE_DT = np.dtype([("minx", "<f8"), ("miny", "<f8"),
                     ("maxx", "<f8"), ("maxy", "<f8"), ("off", "<u8")])
_HILBERT_MAX = np.uint32((1 << 16) - 1)


def _hilbert_order(bb: np.ndarray) -> np.ndarray:
    """Feature write order: Hilbert distance of bbox centers scaled to
    the 2^16 grid over the layer extent (flatbush scaling; degenerate
    extents collapse to cell 0), ties by input position."""
    minx, miny = bb[:, 0].min(), bb[:, 1].min()
    w = bb[:, 2].max() - minx
    h = bb[:, 3].max() - miny
    cx = (bb[:, 0] + bb[:, 2]) / 2.0 - minx
    cy = (bb[:, 1] + bb[:, 3]) / 2.0 - miny
    fx = np.floor(float(_HILBERT_MAX) * (cx / w)) if w > 0 else \
        np.zeros(len(bb))
    fy = np.floor(float(_HILBERT_MAX) * (cy / h)) if h > 0 else \
        np.zeros(len(bb))
    hd = hilbert_d(np.asarray(fx, dtype=np.uint32),
                   np.asarray(fy, dtype=np.uint32))
    return np.lexsort((np.arange(len(bb)), hd))


def _level_ranges(num_items: int, node_size: int):
    """(start, end) node-index ranges per level, ROOT FIRST (FGB's
    top-down inversion of the flatbush layout)."""
    sizes = [num_items]
    n = num_items
    while n != 1:
        n = -(-n // node_size)
        sizes.append(n)
    sizes = sizes[::-1]
    out, pos = [], 0
    for s in sizes:
        out.append((pos, pos + s))
        pos += s
    return out


def _build_index(bb: np.ndarray, feat_offsets: np.ndarray,
                 node_size: int) -> bytes:
    """Pack the Hilbert R-tree: leaves carry feature byte offsets (into
    the features section), internal nodes carry first-child byte
    offsets (into the index) and union bboxes; bottom-up fill,
    root-first serialization.  ``bb`` must already be in write
    order."""
    ranges = _level_ranges(len(feat_offsets), node_size)
    nodes = np.zeros(ranges[-1][1], dtype=_NODE_DT)
    ls, le = ranges[-1]
    nodes["minx"][ls:le], nodes["miny"][ls:le] = bb[:, 0], bb[:, 1]
    nodes["maxx"][ls:le], nodes["maxy"][ls:le] = bb[:, 2], bb[:, 3]
    nodes["off"][ls:le] = feat_offsets.astype(np.uint64)
    for lvl in range(len(ranges) - 2, -1, -1):
        s, e = ranges[lvl]
        cs, ce = ranges[lvl + 1]
        for j in range(s, e):
            c0 = cs + (j - s) * node_size
            c1 = min(c0 + node_size, ce)
            nodes["minx"][j] = nodes["minx"][c0:c1].min()
            nodes["miny"][j] = nodes["miny"][c0:c1].min()
            nodes["maxx"][j] = nodes["maxx"][c0:c1].max()
            nodes["maxy"][j] = nodes["maxy"][c0:c1].max()
            nodes["off"][j] = np.uint64(c0 * 40)
    return nodes.tobytes()


def _search_index(ibuf: bytes, num_items: int, node_size: int,
                  bbox) -> list[tuple[int, int]]:
    """Walk the packed tree top-down; returns (file ordinal, feature
    byte offset) for every leaf whose bbox intersects ``bbox``.  Node
    visits are tree-bounded (O(node_size * log n + hits))."""
    nodes = np.frombuffer(ibuf, dtype=_NODE_DT)
    ranges = _level_ranges(num_items, node_size)
    leaf_start = ranges[-1][0]
    qminx, qminy, qmaxx, qmaxy = (float(v) for v in bbox)
    hits: list[tuple[int, int]] = []
    stack = [0]
    while stack:
        i = stack.pop()
        nd = nodes[i]
        if (nd["minx"] > qmaxx or nd["maxx"] < qminx
                or nd["miny"] > qmaxy or nd["maxy"] < qminy):
            continue
        if i >= leaf_start:
            hits.append((i - leaf_start, int(nd["off"])))
            continue
        c0 = int(nd["off"]) // 40
        ce = next(e for s, e in ranges if s <= c0 < e)
        stack.extend(range(c0, min(c0 + node_size, ce)))
    return hits


def _decode_feature(buf, off, i, gtype_hint, col_names,
                    ids, names, blobs, bbs):
    """Decode the size-prefixed Feature record at ``off`` (file ordinal
    ``i``) into the accumulator lists; returns the record length."""
    flen = _u32(buf, off)
    if flen == 0:
        return 0
    froot = off + 4 + _u32(buf, off + 4)
    gtab = _field_table(buf, froot, 0)
    if gtab is not None:
        geom = _decode_geometry(buf, gtab, gtype_hint)
        name = f"poly_{i}"
        props = _field_vector(buf, froot, 1, np.uint8)
        if props is not None and col_names[:1] == ["name"]:
            # properties wire format: ushort column index, then the
            # column-typed value; column 0 is a string (u32 len)
            pb = props.tobytes()
            if len(pb) >= 6 and _u16(pb, 0) == 0:
                sl = _u32(pb, 2)
                name = pb[6:6 + sl].decode("utf-8", "replace")
        ids.append(i)
        names.append(name)
        blobs.append(wkb.dumps(geom))
        bbs.append(wkb.bounds(geom))
    return flen


def _parse_header(buf, off: int = 8):
    """Header fields from the size-prefixed Header table at ``off``.
    Returns (hlen, gtype_hint, feat_count, node_size, col_names)."""
    hlen = _u32(buf, off)
    hroot = off + 4 + _u32(buf, off + 4)
    gtype_hint = _field_scalar(buf, hroot, 2, "B", 0)
    feat_count = _field_scalar(buf, hroot, 8, "Q", 0)
    node_size = _field_scalar(buf, hroot, 9, "H", 16)
    # column descriptors: we only need whether column 0 is 'name'
    col_offs = _field_vector(buf, hroot, 7, "offset") or []
    col_names = []
    for c in col_offs:
        noff = _field_table(buf, c, 0)
        if noff is not None:
            ln = _u32(buf, noff)
            col_names.append(buf[noff + 4:noff + 4 + ln].decode())
    return hlen, gtype_hint, feat_count, node_size, col_names


def read_flatgeobuf(path: str, bbox=None) -> pa.Table:
    """Load a FlatGeobuf file as a POLYGONS-schema table (names from a
    'name' string column when the properties carry one).  With
    ``bbox=(minx, miny, maxx, maxy)`` and an indexed file, only the
    R-tree-intersecting features are decoded (poly_id stays the file
    ordinal, identical to a full scan).

    ``path`` may be an http(s) URL (the ``/vsicurl/`` analog — the
    reference layer itself is a remote FlatGeobuf,
    ``docs/vector-segmentation-masks.md:190``): a bbox read against an
    indexed remote file RANGE-reads only the header, the R-tree and
    the hit features' byte windows (block-coalesced via
    sources/remote.py:RangeBytes) — never the whole file; without a
    bbox (or index) the object is fetched once in full.
    """
    from .remote import RangeBytes, is_remote, open_range

    ids, names, blobs, bbs = [], [], [], []
    ranged = False
    if is_remote(path):
        # small cache blocks: FGB features are sub-KB records and the
        # Hilbert ordering clusters bbox hits, so 8 KiB windows keep
        # pushdown tight (the index is fetched in one direct read)
        rb = RangeBytes(open_range(path), block=8192)
        head = rb[0:12]
        if head[:8] != MAGIC[:8]:
            raise ValueError("not a FlatGeobuf file (bad magic)")
        hlen = _u32(head, 8)
        hdr = rb[0:12 + hlen]
        hlen, gtype_hint, feat_count, node_size, col_names = \
            _parse_header(hdr)
        off = 8 + 4 + hlen
        has_index = node_size > 0 and feat_count > 0
        isize = _index_size(feat_count, node_size) if has_index else 0
        if bbox is not None and has_index:
            ranged = True
            ibuf = rb[off:off + isize]
            fstart = off + isize
            hits = sorted(_search_index(ibuf, feat_count, node_size,
                                        bbox))
            for ordinal, foff in hits:
                lb = rb[fstart + foff:fstart + foff + 4]
                flen = _u32(lb, 0)
                blob = lb + rb[fstart + foff + 4:
                               fstart + foff + 4 + flen]
                _decode_feature(blob, 0, ordinal, gtype_hint,
                                col_names, ids, names, blobs, bbs)
        else:
            buf = rb[0:len(rb)]
    else:
        with open(path, "rb") as f:
            buf = f.read()
        if buf[:8] != MAGIC[:8]:
            raise ValueError("not a FlatGeobuf file (bad magic)")

    if not ranged:
        hlen, gtype_hint, feat_count, node_size, col_names = \
            _parse_header(buf)
        off = 8 + 4 + hlen
        has_index = node_size > 0 and feat_count > 0
        isize = _index_size(feat_count, node_size) if has_index else 0
        ibuf, off = buf[off:off + isize], off + isize
        if bbox is not None and has_index:
            hits = sorted(_search_index(ibuf, feat_count, node_size,
                                        bbox))
            for ordinal, foff in hits:
                _decode_feature(buf, off + foff, ordinal, gtype_hint,
                                col_names, ids, names, blobs, bbs)
        else:
            i = 0
            while off + 4 <= len(buf) \
                    and (feat_count == 0 or i < feat_count):
                flen = _decode_feature(buf, off, i, gtype_hint,
                                       col_names, ids, names, blobs, bbs)
                if flen == 0:
                    break
                off += 4 + flen
                i += 1
    b = np.asarray(bbs, dtype=np.float64).reshape(-1, 4)
    out = pa.table(
        {
            "poly_id": pa.array(ids, pa.int64()),
            "name": pa.array(names, pa.string()),
            "geometry_wkb": pa.array(blobs, pa.binary()),
            "minx": b[:, 0], "miny": b[:, 1],
            "maxx": b[:, 2], "maxy": b[:, 3],
        },
        schema=POLYGONS,
    )
    if bbox is not None:
        qminx, qminy, qmaxx, qmaxy = (float(v) for v in bbox)
        keep = ((b[:, 0] <= qmaxx) & (b[:, 2] >= qminx)
                & (b[:, 1] <= qmaxy) & (b[:, 3] >= qminy))
        out = out.filter(pa.array(keep))
    return out


# --- minimal flatbuffers wire encoding (fixture writer) ---------------------

class _FB:
    """Tiny bottom-up flatbuffers builder: enough for tables of
    scalars, vectors and sub-table offsets."""

    def __init__(self):
        self.buf = bytearray()  # built back-to-front, stored reversed

    def _align(self, n):
        while len(self.buf) % n:
            self.buf.append(0)

    def tail(self):
        return len(self.buf)

    def push(self, data: bytes):
        self.buf += data[::-1]
        return len(self.buf)

    # NOTE on layout: every offset is computed from marks, so padding
    # anywhere is self-accounting — the ONLY hard requirements are the
    # CONTIGUOUS structures ([len][data] for vectors/strings, vector
    # elements back-to-back, [vtable][table]).  Alignment pads therefore
    # go BEFORE the data (= after it in the final buffer), never between
    # a length prefix and its payload.

    def vector_f64(self, vals):
        self._align(8)
        self.push(np.asarray(vals, dtype="<f8").tobytes())
        return self.push(struct.pack("<I", len(vals)))

    def vector_u32(self, vals):
        self._align(4)
        self.push(np.asarray(vals, dtype="<u4").tobytes())
        return self.push(struct.pack("<I", len(vals)))

    def vector_u8(self, data: bytes):
        self._align(4)
        self.push(bytes(data))
        return self.push(struct.pack("<I", len(data)))

    def string(self, s: str):
        b = s.encode()
        self._align(4)
        self.push(b"\0")
        self.push(b)
        return self.push(struct.pack("<I", len(b)))

    def vector_offsets(self, marks):
        self._align(4)
        # offsets are relative forward distances in the FINAL buffer:
        # final_pos(x) = total - mark(x); uoffset = target_pos - slot_pos
        for m in reversed(marks):
            slot_mark = len(self.buf) + 4
            self.push(struct.pack("<I", slot_mark - m))
        return self.push(struct.pack("<I", len(marks)))

    def table(self, fields: dict):
        """fields: slot -> ('u8'|'u16'|'u64'|'off', value_or_mark)."""
        nslots = (max(fields) + 1) if fields else 0
        offsets = {}
        # inline field data, largest alignment first is overkill; write
        # in descending slot order with natural alignment
        for slot in sorted(fields, reverse=True):
            kind, val = fields[slot]
            if kind == "off":
                self._align(4)
                slot_mark = len(self.buf) + 4
                self.push(struct.pack("<I", slot_mark - val))
                offsets[slot] = len(self.buf)
            elif kind == "u8":
                offsets[slot] = self.push(struct.pack("<B", val))
            elif kind == "u16":
                self._align(2)
                offsets[slot] = self.push(struct.pack("<H", val))
            elif kind == "u64":
                self._align(8)
                offsets[slot] = self.push(struct.pack("<Q", val))
            else:
                raise ValueError(kind)
        self._align(4)
        table_mark = len(self.buf) + 4  # soffset slot included
        vt_len = 4 + 2 * nslots
        table_len = 4  # soffset; field offsets are relative anyway
        vt = struct.pack("<HH", vt_len, table_len)
        for slot in range(nslots):
            rel = (table_mark - offsets[slot]) if slot in fields else 0
            vt += struct.pack("<H", rel)
        # vtable sits just past the table's soffset
        self.push(struct.pack("<i", -(vt_len)))  # placeholder direction
        # replace: soffset = table_pos - vtable_pos = -(vt placed after)
        # we place the vtable immediately BEFORE the table in the final
        # buffer (i.e. pushed after it here), so soffset = +vt_len... but
        # sign convention: vtable_pos = table_pos - soffset.
        # vtable ends where table begins => vtable_pos = table_pos - vt_len
        # => soffset = vt_len (positive).
        self.buf[-4:] = struct.pack("<i", vt_len)[::-1]
        self.push(vt)
        return table_mark

    def finish(self, root_mark, size_prefixed=True):
        self._align(4)
        slot_mark = len(self.buf) + 4
        self.push(struct.pack("<I", slot_mark - root_mark))
        out = bytes(self.buf[::-1])
        if size_prefixed:
            out = struct.pack("<I", len(out)) + out
        return out


def _encode_geometry(fb: _FB, geom: dict) -> int:
    t = geom["type"]
    if t == "MultiPolygon":
        marks = []
        for rings in geom["coords"]:
            marks.append(_encode_geometry(
                fb, {"type": "Polygon", "coords": rings}))
        parts = fb.vector_offsets(marks)
        return fb.table({7: ("u8", _GT_INV["MultiPolygon"]),
                         8: ("off", parts)})
    if t in ("Point", "MultiPoint", "LineString"):
        pts = np.asarray(geom["coords"], dtype=np.float64).reshape(-1, 2)
        xy = fb.vector_f64(pts.reshape(-1))
        return fb.table({1: ("off", xy), 7: ("u8", _GT_INV[t])})
    if t in ("Polygon", "MultiLineString"):
        rings = [np.asarray(r, dtype=np.float64).reshape(-1, 2)
                 for r in geom["coords"]]
        pts = np.vstack(rings) if rings else np.empty((0, 2))
        ends = np.cumsum([len(r) for r in rings]).astype(np.uint32)
        xy = fb.vector_f64(pts.reshape(-1))
        fields = {1: ("off", xy), 7: ("u8", _GT_INV[t])}
        if len(rings) > 1:
            fields[0] = ("off", fb.vector_u32(ends))
        return fb.table(fields)
    raise NotImplementedError(t)


def _encode_feature(geom: dict, name: str) -> bytes:
    """One size-prefixed Feature record (geometry + a single 'name'
    string property)."""
    fb = _FB()
    gmark = _encode_geometry(fb, geom)
    nb = name.encode()
    props = struct.pack("<HI", 0, len(nb)) + nb
    pmark = fb.vector_u8(props)
    feat = fb.table({0: ("off", gmark), 1: ("off", pmark)})
    return fb.finish(feat)


def write_flatgeobuf(tbl: pa.Table, path: str, *, index: bool = False,
                     node_size: int = 16) -> None:
    """Spec-shaped writer: magic + Header (one 'name' string column,
    layer envelope) + optional packed Hilbert R-tree + size-prefixed
    Feature records.  ``index=True`` Hilbert-sorts the features by
    bbox center and emits the flatbush-layout tree (root first,
    40-byte nodes) so ``read_flatgeobuf(bbox=)`` can decode only the
    intersecting features."""
    feats = [_encode_feature(
        wkb.loads(tbl.column("geometry_wkb")[i].as_py()),
        tbl.column("name")[i].as_py()) for i in range(tbl.num_rows)]
    bb = np.column_stack([
        tbl.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
        for c in ("minx", "miny", "maxx", "maxy")]) if tbl.num_rows \
        else np.empty((0, 4))
    ibytes = b""
    use_index = index and tbl.num_rows > 0
    if use_index:
        order = _hilbert_order(bb)
        feats = [feats[i] for i in order]
        bb = bb[order]
        lens = np.array([len(f) for f in feats], dtype=np.int64)
        feat_offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        ibytes = _build_index(bb, feat_offsets, node_size)

    fb = _FB()
    colname = fb.string("name")
    col = fb.table({0: ("off", colname),
                    1: ("u8", 11)})  # ColumnType.String
    cols = fb.vector_offsets([col])
    env = fb.vector_f64([bb[:, 0].min(), bb[:, 1].min(),
                         bb[:, 2].max(), bb[:, 3].max()]) \
        if tbl.num_rows else None
    hname = fb.string("layer")
    fields = {
        0: ("off", hname),
        2: ("u8", 0),  # geometry_type Unknown (mixed)
        7: ("off", cols),
        8: ("u64", tbl.num_rows),
        9: ("u16", node_size if use_index else 0),
    }
    if env is not None:
        fields[1] = ("off", env)  # Header.envelope (minx,miny,maxx,maxy)
    header = fb.table(fields)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(fb.finish(header))
        f.write(ibytes)
        for rec in feats:
            f.write(rec)
