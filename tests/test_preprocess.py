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
