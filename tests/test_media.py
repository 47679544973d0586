"""Media detection + transforms (preprocess/media.py).

Covers the capability of the reference's BMP/PNM/WAV handling: header
detection (src/preprocess/preprocessor.cpp:177-289), the 24bpp color
decorrelation (encode_bmp, preprocessor.cpp:302-375), and the stride
hint threaded into the engine's record-grid contexts.
"""

import struct

import numpy as np
import pytest

from cmix_tpu.engine import EngineConfig
from cmix_tpu.preprocess.media import (
    find_media_spans, img24_encode, img24_decode)
from cmix_tpu.preprocess.wrt import (
    transform, untransform, block_strides, SEG_IMG24, SEG_IMG8, SEG_AUDIO)
from cmix_tpu.runner import compress, decompress


def _bmp24(w, h, rng):
    rowbytes = (w * 3 + 3) & ~3
    hdr = b"BM" + struct.pack("<IHHI", 54 + rowbytes * h, 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       rowbytes * h, 2835, 2835, 0, 0)
    # smooth gradient + noise: decorrelation should help
    y, x = np.mgrid[0:h, 0:w]
    base = ((x * 3 + y * 2) % 250).astype(np.uint8)
    px = np.zeros((h, rowbytes), dtype=np.uint8)
    for c in range(3):
        px[:, c:w * 3:3] = base + c + rng.integers(0, 3, (h, w),
                                                   dtype=np.uint8)
    return hdr + px.tobytes()


def _pgm(w, h, rng):
    hdr = f"P5\n{w} {h}\n255\n".encode()
    return hdr + rng.integers(0, 255, w * h, dtype=np.uint8).tobytes()


def _wav(nframes, rng):
    t = np.arange(nframes)
    samples = (3000 * np.sin(t / 9.0)).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_detect_bmp():
    rng = np.random.default_rng(0)
    data = b"prefix bytes " + _bmp24(40, 30, rng) + b" suffix"
    spans = find_media_spans(data)
    assert len(spans) == 1
    sp = spans[0]
    assert sp.kind == "img24" and sp.cell == 3
    assert sp.stride == (40 * 3 + 3) & ~3
    assert sp.data_len == sp.stride * 30
    assert data[sp.data_off - 54:sp.data_off - 52] == b"BM"


def test_detect_pgm_and_wav():
    rng = np.random.default_rng(1)
    data = _pgm(32, 20, rng) + b"xx" + _wav(2000, rng)
    spans = find_media_spans(data)
    kinds = [s.kind for s in spans]
    assert kinds == ["img8", "audio"]
    assert spans[0].stride == 32 and spans[0].data_len == 32 * 20
    assert spans[1].cell == 2 and spans[1].stride == 4


def test_img24_roundtrip_with_padding():
    rng = np.random.default_rng(2)
    stride = (7 * 3 + 3) & ~3                  # 24, not a multiple of 3
    seg = rng.integers(0, 256, stride * 11 + 5, dtype=np.uint8).tobytes()
    enc = img24_encode(seg, stride)
    assert len(enc) == len(seg) and enc != seg
    assert img24_decode(enc, stride) == seg


def test_transform_untransform_media():
    rng = np.random.default_rng(3)
    data = b"hello " * 50 + _bmp24(60, 40, rng) + b"\x00" * 100
    payload, meta = transform(data, None)
    assert len(payload) == len(data)
    types = [e[0] for e in meta]
    assert SEG_IMG24 in types
    img = [e for e in meta if e[0] == SEG_IMG24][0]
    assert img[3] == (60 * 3 + 3) & ~3
    assert untransform(payload, meta, None) == data


def test_block_strides():
    meta = [(0, 1000, 1000), (SEG_IMG24, 5000, 5000, 180),
            (0, 2000, 2000), (SEG_AUDIO, 600, 600, 4)]
    fr = block_strides(meta, 5, 2048)
    # img24 covers [1000,6000): majority of blocks 0,1,2
    assert list(fr[:3]) == [180, 180, 180]
    # audio seg at [8000,8600) covers 600 of block 3 => < quarter: off
    assert fr[3] == 0 and fr[4] == 0


@pytest.mark.slow
def test_compress_roundtrip_bmp():
    rng = np.random.default_rng(4)
    data = _bmp24(50, 45, rng)                 # ~7 KB, spans blocks
    cfg = EngineConfig(block_size=2048, tbits=14, mbits=14, ibits=12,
                       lstm_hidden=0)
    arch = compress(data, cfg)
    assert decompress(arch) == data
    assert len(arch) < len(data)               # gradient image compresses


def _jpeg(nscan, rng, progressive=False):
    """Synthetic but structurally valid JPEG: SOI, DQT, SOF0, DHT, SOS,
    entropy bytes (FF stuffed / RST markers), EOI."""
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xFF\xD8"                          # SOI
    out += seg(0xDB, bytes([0]) + bytes(range(64)))             # DQT
    out += seg(0xC0, struct.pack(">BHHB", 8, 16, 16, 1)
               + bytes([1, 0x11, 0]))                           # SOF0
    out += seg(0xC4, bytes([0x00]) + bytes([1] * 16) + b"\x03") # DHT
    scans = 2 if progressive else 1
    for s in range(scans):
        out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))         # SOS
        raw = rng.integers(0, 255, nscan, dtype=np.uint8).tobytes()
        # stuff FF bytes like a real encoder, sprinkle a restart marker
        body = raw.replace(b"\xFF", b"\xFF\x00")
        out += body + (b"\xFF\xD0" if s + 1 < scans else b"")
    return out + b"\xFF\xD9"                   # EOI


def test_detect_jpeg():
    rng = np.random.default_rng(5)
    jp = _jpeg(4000, rng)
    data = b"some text before " * 20 + jp + b" and after" * 20
    spans = find_media_spans(data)
    assert [s.kind for s in spans] == ["jpeg"]
    sp = spans[0]
    assert data[sp.data_off:sp.data_off + 2] == b"\xFF\xD8"
    assert data[sp.data_off:sp.data_off + sp.data_len] == jp


def test_detect_jpeg_multiscan_and_rejects():
    rng = np.random.default_rng(6)
    jp = _jpeg(2000, rng, progressive=True)
    spans = find_media_spans(jp)
    assert len(spans) == 1 and spans[0].data_len == len(jp)
    # bare FFD8FF in random binary data must NOT produce a span
    junk = b"\xFF\xD8\xFF\xEE" + bytes(rng.integers(0, 255, 3000,
                                                    dtype=np.uint8))
    assert all(s.kind != "jpeg" for s in find_media_spans(junk))


def test_transform_jpeg_passthrough():
    from cmix_tpu.preprocess.wrt import SEG_JPEG
    rng = np.random.default_rng(7)
    jp = _jpeg(3000, rng)
    data = b"hello world " * 100 + jp + b"tail" * 25
    payload, meta = transform(data, None)
    assert len(payload) == len(data)
    types = [e[0] for e in meta]
    assert SEG_JPEG in types
    ent = [e for e in meta if e[0] == SEG_JPEG][0]
    assert len(ent) == 3 and ent[1] == ent[2] == len(jp)
    assert untransform(payload, meta, None) == data


def _tga(w, h, cell, rng):
    itype = 3 if cell == 1 else 2
    hdr = bytes([0, 0, itype]) + b"\x00" * 5 \
        + struct.pack("<HHHH", 0, 0, w, h) + bytes([cell * 8, 0])
    return hdr + rng.integers(0, 255, w * h * cell,
                              dtype=np.uint8).tobytes()


def _tiff(w, h, spp, rng):
    # little-endian, one IFD, single strip right after the IFD
    n_tags = 7
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_tags + 4
    def tag(t, typ, cnt, val):
        return struct.pack("<HHII", t, typ, cnt, val)
    ifd = struct.pack("<H", n_tags)
    ifd += tag(256, 4, 1, w) + tag(257, 4, 1, h)
    ifd += tag(258, 3, 1, 8) + tag(259, 3, 1, 1)
    ifd += tag(273, 4, 1, data_off) + tag(277, 3, 1, spp)
    ifd += tag(279, 4, 1, w * h * spp)
    ifd += struct.pack("<I", 0)
    px = rng.integers(0, 255, w * h * spp, dtype=np.uint8).tobytes()
    return b"II*\x00" + struct.pack("<I", ifd_off) + ifd + px


def test_detect_tga_tiff_pbm_pam():
    """TGA/TIFF/PBM/PAM detector parity (the remaining filetypes of the
    reference's detect(), src/preprocess/preprocessor.cpp:177-289)."""
    rng = np.random.default_rng(3)
    w, h = 40, 32
    tga = _tga(w, h, 3, rng)
    sp = find_media_spans(b"zz" + tga + b"yy")
    assert len(sp) == 1 and sp[0].kind == "img24" \
        and sp[0].stride == w * 3 and sp[0].data_len == w * h * 3

    tga8 = _tga(w, h, 1, rng)
    sp = find_media_spans(tga8)
    assert len(sp) == 1 and sp[0].kind == "img8" and sp[0].stride == w

    tif = _tiff(w, h, 3, rng)
    sp = find_media_spans(b"pad" + tif)
    assert len(sp) == 1 and sp[0].kind == "img24" \
        and sp[0].stride == w * 3 and sp[0].data_len == w * h * 3

    tif8 = _tiff(w, h, 1, rng)
    sp = find_media_spans(tif8)
    assert len(sp) == 1 and sp[0].kind == "img8" and sp[0].stride == w

    pbm = (f"P4\n{w * 8} {h}\n".encode()
           + rng.integers(0, 255, w * h, dtype=np.uint8).tobytes())
    sp = find_media_spans(pbm)
    assert len(sp) == 1 and sp[0].kind == "img8" and sp[0].stride == w

    pam = (f"P7\nWIDTH {w}\nHEIGHT {h}\nDEPTH 3\nMAXVAL 255\n"
           f"TUPLTYPE RGB\nENDHDR\n".encode()
           + rng.integers(0, 255, w * h * 3, dtype=np.uint8).tobytes())
    sp = find_media_spans(pam)
    assert len(sp) == 1 and sp[0].kind == "img24" and sp[0].stride == w * 3

    # no false spans in plain zero-heavy binary (TGA magic is \x00-led)
    junk = bytes(4096) + rng.integers(0, 255, 4096,
                                      dtype=np.uint8).tobytes()
    assert find_media_spans(junk) == []
