"""WAV codec + AudioDecoder/feature tests (fixture-free round trips)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from zen3geo_ray.sources.wav import read_wav, write_wav
from zen3geo_ray.stages.multimodal import AudioDecoder, audio_features


def _sine(freq, rate=16_000, secs=0.25, amp=12_000):
    t = np.arange(int(rate * secs)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def test_wav_roundtrip_mono_and_stereo():
    mono = _sine(440)
    w = read_wav(write_wav(mono, 16_000))
    assert w["rate"] == 16_000 and w["channels"] == 1
    assert np.array_equal(w["samples"][:, 0], mono)
    stereo = np.stack([_sine(440), _sine(880)], axis=1)
    w2 = read_wav(write_wav(stereo, 8_000))
    assert w2["channels"] == 2
    assert np.array_equal(w2["samples"], stereo)


def test_wav_8bit_and_unknown_chunks():
    import struct

    mono = _sine(200, secs=0.05)
    blob = write_wav(mono)
    # splice an unknown LIST chunk before data — the walk must skip it
    fmt_end = blob.index(b"data")
    junk = b"LIST" + struct.pack("<I", 6) + b"junk!\x00"
    spliced = blob[:fmt_end] + junk + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    w = read_wav(spliced)
    assert np.array_equal(w["samples"][:, 0], mono)
    # 8-bit: build manually, check rescale
    u8 = ((mono.astype(np.int32) >> 8) + 128).astype(np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 16_000, 16_000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(u8)) + u8.tobytes())
    blob8 = b"RIFF" + struct.pack("<I", len(body)) + body
    w8 = read_wav(blob8)
    assert np.abs(w8["samples"][:, 0].astype(int) - mono.astype(int)).max() < 256


def test_wav_errors():
    with pytest.raises(ValueError, match="RIFF"):
        read_wav(b"nope")
    with pytest.raises(TypeError, match="int16"):
        write_wav(np.zeros(10, dtype=np.float32))


def test_audio_decoder_pipeline_and_features(ray_session):
    """WAV payloads -> AudioDecoder (actor pool) -> vectorized features:
    the audio twin of the image decode pipeline; spectral centroid of a
    pure tone lands near the tone, silence has zero rms."""
    tones = [440.0, 2000.0]
    payloads = [write_wav(_sine(f)) for f in tones]
    payloads.append(write_wav(np.zeros(4000, dtype=np.int16)))  # silence
    tbl = pa.table({
        "clip_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })
    out = (
        rd.from_arrow(tbl)
        .map_batches(AudioDecoder, fn_constructor_kwargs={"mode": "real"},
                     batch_format="pyarrow", concurrency=2)
        .map_batches(audio_features, batch_format="pyarrow")
        .to_pandas().sort_values("clip_id")
    )
    assert out["n_samples"].tolist() == [4000, 4000, 4000]
    assert out["duration_s"].tolist() == [0.25, 0.25, 0.25]
    for i, f in enumerate(tones):
        assert abs(out["spectral_centroid"].iloc[i] - f) < 0.15 * f
    assert out["rms"].iloc[2] == 0.0 and out["zcr"].iloc[2] == 0.0
    # fake mode: schema-identical, deterministic
    fake = (
        rd.from_arrow(tbl)
        .map_batches(AudioDecoder, fn_constructor_kwargs={"mode": "fake"},
                     batch_format="pyarrow", concurrency=2)
        .to_pandas()
    )
    assert set(fake.columns) == set(out.columns) - {
        "duration_s", "rms", "zcr", "spectral_centroid"
    }


def test_audio_decoder_downmixes_stereo():
    stereo = np.stack([_sine(440), _sine(440)], axis=1)
    tbl = pa.table({"payload": pa.array([write_wav(stereo)], pa.binary())})
    out = AudioDecoder(mode="real")(tbl)
    assert out.column("channels")[0].as_py() == 2
    got = np.asarray(out.column("audio")[0].as_py(), np.int16)
    assert np.array_equal(got, _sine(440))  # equal channels -> identity
