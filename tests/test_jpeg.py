"""JPEG coefficient recoding (preprocess/jpeg.py): exact inversion,
segment integration, fallback behavior, and engine round-trip.

Capability parity target: the reference's JPEG modeling path (paq8
jpegModel class, src/models/paq8.cpp:5386-5804) -- here as a host-side
reversible scan->coefficient transform feeding the shared CM engine.
"""

import io

import numpy as np
import pytest

from cmix_tpu.engine import EngineConfig
from cmix_tpu.preprocess.jpeg import jpeg_recode, jpeg_unrecode
from cmix_tpu.preprocess.wrt import (
    transform, untransform, SEG_JPEG, SEG_JPEGC)
from cmix_tpu.runner import compress, decompress

PIL = pytest.importorskip("PIL.Image")


def _make_jpeg(w=64, h=48, mode="RGB", seed=0, **save_kw):
    rng = np.random.default_rng(seed)
    base = np.add.outer(np.arange(h) * 2, np.arange(w) * 3) % 256
    if mode == "L":
        arr = base.astype(np.uint8)
    else:
        arr = np.stack([base, np.roll(base, 5, 1), 255 - base],
                       axis=-1).astype(np.uint8)
    arr = np.clip(
        arr.astype(np.int32) + rng.integers(-8, 8, arr.shape), 0,
        255).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(arr, mode).save(buf, "JPEG", **save_kw)
    return buf.getvalue()


@pytest.mark.parametrize("kw", [
    dict(mode="L", quality=80),
    dict(mode="RGB", quality=90),
    dict(mode="RGB", quality=60, subsampling=2),
    dict(mode="RGB", quality=75, restart_marker_blocks=2),
])
def test_recode_exact_inverse(kw):
    mode = kw.pop("mode")
    try:
        data = _make_jpeg(mode=mode, **kw)
    except TypeError:
        pytest.skip("PIL lacks restart_marker_blocks")
    payload = jpeg_recode(data)
    assert payload is not None
    assert jpeg_unrecode(payload) == data


def test_recode_rejects_progressive():
    data = _make_jpeg(progressive=True, quality=75)
    assert jpeg_recode(data) is None


def test_recode_rejects_truncated_and_junk():
    data = _make_jpeg()
    assert jpeg_recode(data[:-10]) is None
    assert jpeg_recode(b"\xFF\xD8\xFF" + data[7:]) is None


def test_transform_routes_to_jpegc(monkeypatch):
    monkeypatch.setenv("CMIX_JPEGC", "1")
    jp = _make_jpeg(quality=85)
    data = b"some text around it " * 120 + jp + b" and a tail" * 30
    payload, meta = transform(data, None)
    types = [e[0] for e in meta]
    assert SEG_JPEGC in types
    ent = [e for e in meta if e[0] == SEG_JPEGC][0]
    assert ent[2] == len(jp)                  # raw_len preserved
    assert untransform(payload, meta, None) == data


def test_transform_passthrough_when_recode_fails(monkeypatch):
    monkeypatch.setenv("CMIX_JPEGC", "0")
    jp = _make_jpeg(quality=85)
    data = b"x" * 500 + jp
    payload, meta = transform(data, None)
    types = [e[0] for e in meta]
    assert SEG_JPEGC not in types and SEG_JPEG in types
    assert untransform(payload, meta, None) == data


def test_compress_roundtrip_jpeg(monkeypatch):
    monkeypatch.setenv("CMIX_JPEGC", "1")
    jp = _make_jpeg(w=48, h=40, quality=80)
    data = b"prefix " * 64 + jp + b" suffix" * 16
    cfg = EngineConfig(block_size=2048, tbits=14, mbits=14, ibits=12,
                       lstm_hidden=0)
    arch = compress(data, cfg)
    assert decompress(arch) == data


def test_recoded_geometry():
    from cmix_tpu.preprocess.jpeg import recoded_geometry
    jp = _make_jpeg(w=48, h=40, quality=80)          # RGB, 2x2 subsampled
    enc = jpeg_recode(jp)
    assert enc is not None
    body_off, clens = recoded_geometry(enc)
    # planes must exactly fill [body_off, len) minus the escape stream
    assert body_off > 4 and len(clens) == 3
    assert body_off + 64 * sum(clens) <= len(enc)
    # luma has 4x the chroma blocks under 2x2 subsampling
    assert clens[0] == 4 * clens[1] == 4 * clens[2]


@pytest.mark.slow
def test_compress_roundtrip_jpegx(monkeypatch):
    """JPEGX coefficient-grid contexts: geometry rides the segment
    table, decode reproduces the ensemble (the jpegModel-class contexts
    are part of the format when the gate is on)."""
    monkeypatch.setenv("CMIX_JPEGC", "1")
    from cmix_tpu import engine
    changed = engine.update_gates({"JPEGX": 1, "GRID2": 1})
    try:
        import cmix_tpu.runner as runner
        runner._TRANSCODER_CACHE.clear()
        jp = _make_jpeg(w=48, h=40, quality=80)
        data = b"prefix " * 64 + jp + b" suffix" * 16
        cfg = EngineConfig(block_size=2048, tbits=14, mbits=14, ibits=12,
                           lstm_hidden=0)
        arch = compress(data, cfg)
        assert decompress(arch) == data
    finally:
        engine.update_gates({"JPEGX": 0, "GRID2": 0})
        runner._TRANSCODER_CACHE.clear()
