"""WRT dictionary transform tests (native and Python twins)."""

import numpy as np
import pytest

from cmix_tpu.preprocess import wrt

DICT = "/root/reference/dictionary/english.dic"


@pytest.fixture(scope="module")
def d():
    return wrt.Dictionary(DICT)


def test_dict_loaded(d):
    assert len(d.words) > 40000
    if wrt._LIB is not None and d._handle:
        assert wrt._LIB.wrt_dict_size(d._handle) == len(d.words)


def test_roundtrip_text(d):
    data = open("/root/reference/COPYING", "rb").read()
    enc = d.encode(data)
    assert d.decode(enc) == data
    assert len(enc) < len(data) * 0.75      # real transform, real gain


def test_roundtrip_capitalization(d):
    data = b"The THE the ThE tHe I A a MiXeD CASE Words word WORDS"
    assert d.decode(d.encode(data)) == data


def test_roundtrip_binary_escapes(d):
    data = bytes(range(256)) * 3
    assert d.decode(d.encode(data)) == data


def test_native_matches_python(d):
    if wrt._LIB is None or not d._handle:
        pytest.skip("native lib unavailable")
    data = open("/root/reference/COPYING", "rb").read()[:20000]
    assert d.encode(data) == d._encode_py(data)
    enc = d.encode(data)
    assert d.decode(enc) == d._decode_py(enc)


def test_detect_chunks():
    text = b"hello world, this is plain text. " * 500
    binary = bytes(range(256)) * 64
    types = wrt.detect_text_chunks(text + binary, chunk=4096)
    assert types[0] == 1
    assert types[-1] == 0


EXE_SAMPLE = "/root/repo/.ref_build/cmix"


def _exe_bytes(n):
    import os
    if os.path.exists(EXE_SAMPLE):
        return open(EXE_SAMPLE, "rb").read()[:n]
    # synthetic x86-ish stream with E8/E9 rel32 sites
    rng = np.random.RandomState(3)
    raw = bytearray(rng.bytes(n))
    for i in range(0, n - 8, 64):
        raw[i] = 0xE8
        raw[i + 1:i + 5] = int(rng.randint(-1000, 1000) & 0xFFFFFFFF
                               ).to_bytes(4, "little")
    return bytes(raw)


def test_exe_transform_roundtrip():
    data = _exe_bytes(100000)
    enc = wrt.exe_encode(data)
    assert enc != data
    assert wrt.exe_decode(enc) == data


def test_exe_python_twin_matches():
    if wrt._LIB is None:
        pytest.skip("native lib unavailable")
    data = _exe_bytes(50000)
    assert wrt.exe_encode(data) == wrt._exe_py(data, True)


def test_exe_adversarial_edges():
    """Operands near +-2^24, opcode bytes inside data, dense overlapping
    matches: encode/decode must agree on WHICH operands are transformed
    (the round-1 scheme could desync there; the invariant-condition
    scheme cannot)."""
    import struct
    cases = []
    for rel in (0, 1, -1, (1 << 24) - 1, -(1 << 24), (1 << 24) - 5,
                0x00FFFFFF, -0x01000000, 0x12345678, -0x7FFFFFF0):
        for op in (b"\xE8", b"\xE9", b"\x0F\x84"):
            cases.append(op + struct.pack("<i", rel))
    rng = np.random.RandomState(7)
    blob = b"".join(cases) + bytes(rng.bytes(4096))
    # dense overlapping E8 runs (operand bytes are themselves opcodes)
    blob += b"\xE8" * 64 + b"\x00" * 8 + b"\xE9\xE8\xE9\xE8" * 32
    for data in (blob, blob * 3):
        enc = wrt._exe_py(data, True)
        assert wrt._exe_py(enc, False) == data
        if wrt._LIB is not None:
            enc_n = wrt.exe_encode(data)
            assert enc_n == enc
            assert wrt.exe_decode(enc_n) == data


def test_exe_large_segment_positions():
    """Positions beyond 16 MB: the mod-2^25 form must still invert
    (round 1 corrupted once a segment exceeded 2^24 bytes)."""
    import struct
    n = (1 << 24) + (1 << 16)
    rng = np.random.RandomState(11)
    data = bytearray(rng.bytes(n))
    # plant calls on both sides of the 2^24 boundary with small rels
    for pos in (100, (1 << 24) - 3, (1 << 24) + 500, n - 6):
        data[pos] = 0xE8
        data[pos + 1:pos + 5] = struct.pack("<i", 1234)
    data = bytes(data)
    enc = wrt.exe_encode(data)
    assert wrt.exe_decode(enc) == data


def test_segmented_transform(d):
    text = open("/root/reference/COPYING", "rb").read()
    exe = _exe_bytes(150000)
    data = exe + text + bytes(range(256)) * 16
    payload, meta = wrt.transform(data, d)
    assert wrt.untransform(payload, meta, d) == data
    types = [t for t, _, _ in meta]
    assert wrt.SEG_EXE in types


def test_make_dict_builds_wrt_compatible_list(tmp_path):
    from cmix_tpu.tools.make_dict import build_dictionary
    corpus = open("/root/repo/testdata/text100k.raw", "rb").read()
    words = build_dictionary([corpus], max_words=300, core=False)
    assert 0 < len(words) <= 300
    # frequency-ordered: first word at least as frequent as the last
    enc = [w.encode() if isinstance(w, str) else w for w in words]
    assert corpus.lower().count(enc[0]) >= corpus.lower().count(enc[-1])
    # curated head (r3): common English words take the 1-byte band
    headed = build_dictionary([corpus], max_words=300)
    assert headed[0] == "the"
    p = tmp_path / "t.dic"
    p.write_bytes(b"\n".join(enc) + b"\n")
    dd = wrt.Dictionary(str(p))
    data = corpus[:4000]
    assert dd.decode(dd.encode(data)) == data
