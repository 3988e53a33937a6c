"""Multimodal binary-column stages.

Images/audio/video travel as opaque ``binary`` columns with typed
metadata columns.  ``mode='real'`` decodes PNG, TIFF **and baseline
JPEG** with the engine's own pure-numpy codecs (``sources/png.py``,
``sources/geotiff.py``, ``sources/jpeg.py``) — no imaging library needed
— dispatched by signature sniffing; ``mode='fake'`` derives a
deterministic tensor from the payload hash for codec-independent
plumbing tests (schema, actor signature, batch sizing, output layout).
Audio (WAV via ``sources/wav.py``) and video (MJPEG-AVI via
``sources/avi.py`` + the JPEG codec) decode for real too — see
``AudioDecoder`` / ``VideoFrameExtractor``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import fnv1a_str_array, splitmix64


class ImageDecoder:
    """Actor-pool map_batches fn: binary payload -> HxWxC uint8 tensor col.

    mode='real' (and its alias 'tiff') decodes PNG/TIFF/baseline-JPEG
    payloads with the in-engine pure-numpy codecs; mode='fake' derives a
    deterministic (h, w, 3) tensor from the payload hash — schema/layout
    identical to the real decoder, for codec-independent plumbing tests.
    """

    def __init__(self, mode: str = "fake", out_h: int = 16, out_w: int = 16,
                 payload_col: str = "payload"):
        if mode not in ("fake", "real", "tiff"):
            raise ValueError(mode)
        self.mode = mode
        self.out_h = out_h
        self.out_w = out_w
        self.payload_col = payload_col

    def _decode_real(self, payloads, batch: pa.Table) -> pa.Table:
        """Real codecs: PNG, TIFF and baseline JPEG by signature
        sniffing — all pure-numpy, in-engine (``sources/png.py``,
        ``sources/geotiff.py``, ``sources/jpeg.py``)."""
        from ..sources.geotiff import read_geotiff
        from ..sources.jpeg import read_jpeg
        from ..sources.png import read_png

        tensors, hs, ws = [], [], []
        for b in payloads:
            if b[:8] == b"\x89PNG\r\n\x1a\n":
                hwc = read_png(b)[:, :, :3]
                if hwc.shape[2] < 3:  # grey -> 3 channels
                    hwc = np.repeat(hwc[:, :, :1], 3, axis=2)
                arr3 = hwc
            elif b[:3] == b"\xff\xd8\xff":
                arr3 = read_jpeg(b)
            elif b[:4] == b"GIF8":
                from ..sources.gif import read_gif

                arr3 = read_gif(b)
            elif b[:2] in (b"II", b"MM"):
                g = read_geotiff(b)
                planes = g["data"][:3]
                if planes.shape[0] < 3:
                    planes = np.repeat(planes[:1], 3, axis=0)
                arr3 = np.clip(planes.transpose(1, 2, 0), 0, 255).astype(
                    np.uint8
                )
            else:
                raise ValueError(
                    "unrecognized image signature "
                    "(PNG/TIFF/JPEG/GIF supported)"
                )
            tensors.append(np.ascontiguousarray(arr3).reshape(-1))
            hs.append(arr3.shape[0])
            ws.append(arr3.shape[1])
        if len({(h, w) for h, w in zip(hs, ws)}) > 1:
            raise ValueError("mixed image sizes in one batch: resize or "
                             "group by size upstream")
        size = (hs[0] * ws[0] * 3) if hs else 0
        tensor = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(tensors) if tensors else
                     np.empty(0, np.uint8), pa.uint8()),
            size or 1,
        )
        n = len(payloads)
        return (
            batch.drop_columns([self.payload_col])
            .append_column("image", tensor)
            .append_column("img_h", pa.array(hs, pa.int32()))
            .append_column("img_w", pa.array(ws, pa.int32()))
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        if self.mode in ("tiff", "real"):
            return self._decode_real(payloads, batch)
        h = fnv1a_str_array(payloads)
        n = len(payloads)
        size = self.out_h * self.out_w * 3
        # deterministic pseudo-pixels: splitmix64 stream per row
        data = np.empty((n, size), dtype=np.uint8)
        for i in range(n):
            stream = splitmix64(
                np.arange(size // 8 + 1, dtype=np.uint64) + h[i]
            ).view(np.uint8)[:size]
            data[i] = stream
        tensor = pa.FixedSizeListArray.from_arrays(
            pa.array(data.reshape(-1), pa.uint8()), size
        )
        return (
            batch.drop_columns([self.payload_col])
            .append_column("image", tensor)
            .append_column("img_h", pa.array([self.out_h] * n, pa.int32()))
            .append_column("img_w", pa.array([self.out_w] * n, pa.int32()))
        )


def _batch_hw(batch: pa.Table) -> tuple[int, int]:
    """Single (h, w) of a decoded batch; raises on size mixes (a mixed
    batch would reshape wrong — equal element counts, e.g. 16x24 vs
    24x16, would silently transpose).  Group by size upstream."""
    import pyarrow.compute as pc

    hs = pc.unique(batch.column("img_h"))
    ws = pc.unique(batch.column("img_w"))
    if len(hs) > 1 or len(ws) > 1:
        raise ValueError(
            f"mixed image sizes in one batch (h={hs.to_pylist()}, "
            f"w={ws.to_pylist()}): group by size upstream"
        )
    return hs[0].as_py(), ws[0].as_py()


def resize_nearest(batch: pa.Table, *, out_h: int, out_w: int) -> pa.Table:
    """Vectorized nearest-neighbor resize of the decoded tensor column."""
    img = batch.column("image")
    if isinstance(img, pa.ChunkedArray):
        img = img.combine_chunks()
    h, w = _batch_hw(batch)
    n = len(img)
    arr = img.flatten().to_numpy(zero_copy_only=False).reshape(n, h, w, 3)
    yi = (np.arange(out_h) * h // out_h).astype(np.int64)
    xi = (np.arange(out_w) * w // out_w).astype(np.int64)
    resized = arr[:, yi][:, :, xi]
    out = pa.FixedSizeListArray.from_arrays(
        pa.array(resized.reshape(-1), pa.uint8()), out_h * out_w * 3
    )
    n_arr = len(batch)
    return (
        batch.drop_columns(["image", "img_h", "img_w"])
        .append_column("image", out)
        .append_column("img_h", pa.array([out_h] * n_arr, pa.int32()))
        .append_column("img_w", pa.array([out_w] * n_arr, pa.int32()))
    )


def resize_bilinear(batch: pa.Table, *, out_h: int, out_w: int) -> pa.Table:
    """Vectorized bilinear resize of the decoded tensor column (align-
    corners=False / half-pixel-centers convention, the torch/PIL default)
    — one einsum-free gather + lerp over the whole batch."""
    img = batch.column("image")
    if isinstance(img, pa.ChunkedArray):
        img = img.combine_chunks()
    h, w = _batch_hw(batch)
    n = len(img)
    arr = img.flatten().to_numpy(zero_copy_only=False).reshape(
        n, h, w, 3
    ).astype(np.float64)
    # half-pixel source coordinates, clamped
    sy = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    sx = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0 = np.floor(sy).astype(np.int64)
    x0 = np.floor(sx).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (sy - y0)[None, :, None, None]
    fx = (sx - x0)[None, None, :, None]
    top = arr[:, y0][:, :, x0] * (1 - fx) + arr[:, y0][:, :, x1] * fx
    bot = arr[:, y1][:, :, x0] * (1 - fx) + arr[:, y1][:, :, x1] * fx
    resized = np.clip(np.rint(top * (1 - fy) + bot * fy), 0, 255).astype(
        np.uint8
    )
    out = pa.FixedSizeListArray.from_arrays(
        pa.array(resized.reshape(-1), pa.uint8()), out_h * out_w * 3
    )
    n_arr = len(batch)
    return (
        batch.drop_columns(["image", "img_h", "img_w"])
        .append_column("image", out)
        .append_column("img_h", pa.array([out_h] * n_arr, pa.int32()))
        .append_column("img_w", pa.array([out_w] * n_arr, pa.int32()))
    )


def frame_sample(batch: pa.Table, *, every_n: int,
                 frame_col: str = "frame_idx") -> pa.Table:
    """Deterministic frame sampling for video-frame rows (keep every Nth)."""
    idx = batch.column(frame_col).to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(idx % every_n == 0))


class AudioDecoder:
    """Actor-pool map_batches fn: WAV payload -> variable-length int16
    sample column (+ rate / n_samples / channels metadata columns).

    mode='real' decodes RIFF PCM WAV via the in-engine pure-numpy codec
    (``sources/wav.py``); mode='fake' derives a deterministic int16
    stream from the payload hash (schema-identical, for plumbing tests).
    Multi-channel audio is downmixed to mono by integer mean — feature
    stages see one channel.
    """

    def __init__(self, mode: str = "real", payload_col: str = "payload",
                 fake_len: int = 2048, fake_rate: int = 16_000):
        if mode not in ("real", "fake"):
            raise ValueError(mode)
        self.mode = mode
        self.payload_col = payload_col
        self.fake_len = fake_len
        self.fake_rate = fake_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        samples, rates, chans = [], [], []
        if self.mode == "real":
            from ..sources.wav import read_wav

            for b in payloads:
                w = read_wav(b)
                mono = w["samples"].astype(np.int32).mean(axis=1).astype(np.int16)
                samples.append(mono)
                rates.append(w["rate"])
                chans.append(w["channels"])
        else:
            h = fnv1a_str_array(payloads)
            for i in range(len(payloads)):
                stream = splitmix64(
                    np.arange(self.fake_len // 4 + 1, dtype=np.uint64) + h[i]
                ).view(np.int16)[: self.fake_len]
                samples.append(stream)
                rates.append(self.fake_rate)
                chans.append(1)
        flat = (np.concatenate(samples) if samples
                else np.empty(0, dtype=np.int16))
        offsets = np.concatenate(
            [[0], np.cumsum([len(s) for s in samples])]
        ).astype(np.int32)
        col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.int16())
        )
        return (
            batch.drop_columns([self.payload_col])
            .append_column("audio", col)
            .append_column("rate", pa.array(rates, pa.int32()))
            .append_column("channels", pa.array(chans, pa.int32()))
            .append_column(
                "n_samples",
                pa.array(np.diff(offsets).astype(np.int64), pa.int64()),
            )
        )


class VideoFrameExtractor:
    """Actor-pool flat-map: one video payload row -> one row PER FRAME.

    mode='real' walks MJPEG AVI containers (``sources/avi.py``) and
    emits each frame's JPEG bytes as a new ``payload`` — so the video
    pipeline composes from existing stages: ``VideoFrameExtractor ->
    frame_sample(every_n) -> ImageDecoder(mode='real') -> resize /
    features``, all real decodes.  mode='fake' fabricates ``fake_frames``
    deterministic payload rows per video for plumbing tests.  Carry-over
    columns are repeated per frame; adds ``frame_idx`` and ``fps``.
    """

    def __init__(self, mode: str = "real", payload_col: str = "payload",
                 fake_frames: int = 8):
        if mode not in ("real", "fake"):
            raise ValueError(mode)
        self.mode = mode
        self.payload_col = payload_col
        self.fake_frames = fake_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        frames, idxs, fps_out, rep = [], [], [], []
        if self.mode == "real":
            from ..sources.avi import read_avi_mjpeg

            for ri, b in enumerate(payloads):
                v = read_avi_mjpeg(b)
                frames.extend(v["frames"])
                idxs.extend(range(v["n_frames"]))
                fps_out.extend([v["fps"]] * v["n_frames"])
                rep.extend([ri] * v["n_frames"])
        else:
            h = fnv1a_str_array(payloads)
            for ri in range(len(payloads)):
                for fi in range(self.fake_frames):
                    frames.append(
                        splitmix64(
                            np.arange(8, dtype=np.uint64)
                            + h[ri] + np.uint64(fi)
                        ).tobytes()
                    )
                    idxs.append(fi)
                    fps_out.append(0)
                    rep.append(ri)
        # typed index array: a plain [] would be null-typed and crash take
        out = batch.drop_columns([self.payload_col]).take(
            pa.array(np.asarray(rep, dtype=np.int64))
        )
        return (
            out.append_column(
                "frame_idx",
                pa.array(np.asarray(idxs, np.int64), pa.int64()),
            )
            .append_column("fps", pa.array(np.asarray(fps_out, np.int32),
                                           pa.int32()))
            .append_column(self.payload_col, pa.array(frames, pa.binary()))
        )


def audio_features(batch: pa.Table, *, audio_col: str = "audio") -> pa.Table:
    """Vectorized per-clip audio features over the decoded sample column:
    duration_s, rms, zero-crossing rate, spectral centroid (Hz, via one
    rfft per clip) — the model-input stand-in for an audio embedding
    stage.  Per-clip numpy kernels; the sample arrays dominate, not the
    row loop."""
    arr = batch.column(audio_col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    rates = batch.column("rate").to_numpy(zero_copy_only=False)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = np.asarray(arr.offsets)
    n = len(arr)
    dur = np.empty(n)
    rms = np.empty(n)
    zcr = np.empty(n)
    cent = np.empty(n)
    for i in range(n):
        s = flat[offs[i]:offs[i + 1]]
        m = len(s)
        dur[i] = m / rates[i]
        if m == 0:
            rms[i] = zcr[i] = cent[i] = 0.0
            continue
        rms[i] = np.sqrt(np.mean(s * s))
        zcr[i] = (np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))
                  / max(m - 1, 1))
        spec = np.abs(np.fft.rfft(s))
        freqs = np.fft.rfftfreq(m, d=1.0 / rates[i])
        tot = spec.sum()
        cent[i] = float((freqs * spec).sum() / tot) if tot > 0 else 0.0
    return (
        batch.append_column("duration_s", pa.array(dur, pa.float64()))
        .append_column("rms", pa.array(rms, pa.float64()))
        .append_column("zcr", pa.array(zcr, pa.float64()))
        .append_column("spectral_centroid", pa.array(cent, pa.float64()))
    )


def image_features(batch: pa.Table) -> pa.Table:
    """Cheap vectorized features from the tensor column (mean/std per
    channel) — the stand-in for a real embedding model stage."""
    img = batch.column("image")
    if isinstance(img, pa.ChunkedArray):
        img = img.combine_chunks()
    h, w = _batch_hw(batch)
    n = len(img)
    arr = img.flatten().to_numpy(zero_copy_only=False).reshape(n, h, w, 3)
    mean = arr.mean(axis=(1, 2)).astype(np.float32)  # (n, 3)
    std = arr.std(axis=(1, 2)).astype(np.float32)
    feat = np.concatenate([mean, std], axis=1)
    return batch.append_column(
        "features",
        pa.FixedSizeListArray.from_arrays(pa.array(feat.reshape(-1)), 6),
    )


def ahash_groups(sparse, *, key_col: str = "tile_id", py_col: str = "py",
                 px_col: str = "px", val_col: str = "n",
                 px_size: int = 16, grid: int = 8, n_buckets: int = 32):
    """Perceptual-hash (average-hash) NEAR-DUP grouping over rasterized
    tiles — the visual-dedup analog of the MinHash text path
    (imagehash's aHash over a sparse (key, py, px, value) raster table).

    Per tile, the ``px_size`` x ``px_size`` grid is pooled into
    ``grid`` x ``grid`` integer cell sums; bit c = 1 iff the cell MEAN
    exceeds the tile mean, computed CROSS-MULTIPLIED
    (cell_sum * grid**2 > total_sum) so no division touches the
    predicate — bit-exact in SQL.  Untouched cells sum to 0 and absent
    tiles never appear (both sides see only touched pixels).  The
    ``grid**2``-bit hash ships as two int64 halves (``hash_hi`` bits
    >= 32, ``hash_lo`` bits < 32 — bit 63 would overflow signed SQL).

    Shape: two coarse-bucket shuffles of TILE-bounded rows — one keyed
    by tile to pool cells, one keyed by hash where each group's members
    are co-resident, so rep/size expansion is local.

    Output: one row per tile — (key_col, hash_hi, hash_lo,
    rep_tile = min key sharing the hash, n_same = group size).
    """
    import pandas as pd

    from .bucketed import bucketed_groupby

    if grid * grid > 64:
        raise ValueError("ahash_groups: grid**2 must be <= 64 bits")
    cell_px = px_size // grid
    if cell_px * grid != px_size:
        raise ValueError("ahash_groups: px_size must be divisible by grid")
    thr = np.int64(grid * grid)

    def tile_hash(g: pd.DataFrame) -> pd.DataFrame:
        cell = ((g[py_col].to_numpy(dtype=np.int64) // cell_px) * grid
                + g[px_col].to_numpy(dtype=np.int64) // cell_px)
        t = pd.DataFrame({key_col: g[key_col].to_numpy(),
                          "_cell": cell,
                          "_v": g[val_col].to_numpy(dtype=np.int64)})
        cs = t.groupby([key_col, "_cell"], sort=False,
                       as_index=False)["_v"].sum()
        tot = t.groupby(key_col, sort=False, as_index=False)["_v"] \
            .sum().rename(columns={"_v": "_t"})
        m = cs.merge(tot, on=key_col)
        s = m["_v"].to_numpy(dtype=np.int64)
        c = m["_cell"].to_numpy(dtype=np.int64)
        b = s * thr > m["_t"].to_numpy(dtype=np.int64)
        m["_lo"] = np.where(b & (c < 32), np.int64(1) << (c % 32),
                            np.int64(0))
        m["_hi"] = np.where(b & (c >= 32), np.int64(1) << (c - 32),
                            np.int64(0))
        out = m.groupby(key_col, sort=False,
                        as_index=False)[["_hi", "_lo"]].sum()
        return pd.DataFrame({key_col: out[key_col],
                             "hash_hi": out["_hi"].astype(np.int64),
                             "hash_lo": out["_lo"].astype(np.int64)})

    h = bucketed_groupby(sparse, [key_col], tile_hash,
                         n_buckets=n_buckets)

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby(["hash_hi", "hash_lo"], sort=False)[key_col]
        return pd.DataFrame({
            key_col: g[key_col],
            "hash_hi": g["hash_hi"], "hash_lo": g["hash_lo"],
            "rep_tile": grp.transform("min"),
            "n_same": grp.transform("size").astype(np.int64),
        })

    return bucketed_groupby(h, ["hash_hi", "hash_lo"], expand,
                            n_buckets=n_buckets)
