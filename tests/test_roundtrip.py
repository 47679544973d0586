"""End-to-end round-trip tests: the format's correctness oracle.

The reference's implicit methodology (SURVEY.md section 4): compress,
decompress, byte-compare.  These run with a tiny block size on the CPU
backend for speed; bench.py exercises the default config on real TPU.
"""

import os

import numpy as np
import pytest

from cmix_tpu.engine import EngineConfig
from cmix_tpu.runner import compress, decompress

CFG = EngineConfig(block_size=2048, tbits=14, mbits=14, ibits=12, lstm_hidden=0)


def _roundtrip(data: bytes):
    arch = compress(data, CFG)
    back = decompress(arch)
    assert back == data
    return arch


def test_empty():
    _roundtrip(b"")


def test_one_byte():
    _roundtrip(b"A")


def test_text_compresses():
    with open("/root/reference/COPYING", "rb") as f:
        data = f.read()[:6000]
    arch = _roundtrip(data)
    assert len(arch) < len(data) * 0.6          # sanity ratio on English text


def test_repetitive():
    data = b"abcabcabc" * 500
    arch = _roundtrip(data)
    assert len(arch) < len(data) * 0.1


@pytest.mark.slow
def test_random_incompressible():
    data = np.random.RandomState(7).bytes(3000)
    arch = _roundtrip(data)
    assert len(arch) < len(data) + 200          # raw fallback bounds blowup


@pytest.mark.slow
def test_multi_block():
    with open("/root/reference/COPYING", "rb") as f:
        data = f.read()[:7000]                  # spans 4 blocks of 2048
    _roundtrip(data)


def test_all_byte_values():
    data = bytes(range(256)) * 10
    _roundtrip(data)


@pytest.mark.slow
def test_lstm_roundtrip():
    cfg = EngineConfig(block_size=1024, tbits=12, mbits=12, ibits=10,
                       lstm_hidden=64)
    with open("/root/reference/COPYING", "rb") as f:
        data = f.read()[:2000]
    arch = compress(data, cfg)
    assert decompress(arch) == data


@pytest.mark.slow
def test_dictionary_mode_roundtrip():
    cfg = EngineConfig(block_size=2048, tbits=14, mbits=14, ibits=12,
                       lstm_hidden=0)
    with open("/root/reference/COPYING", "rb") as f:
        data = f.read()[:6000]
    # tiny dictionary so the pretrain scan stays fast on CPU
    import tempfile, os
    words = sorted(set(
        w.lower() for w in data.decode("latin-1").split() if w.isalpha()))
    with tempfile.NamedTemporaryFile("w", suffix=".dic", delete=False) as f:
        f.write("\n".join(words))
        dic = f.name
    try:
        arch = compress(data, cfg, dictionary=dic)
        plain = compress(data, cfg)
        back = decompress(arch, dictionary=dic)
        assert back == data
        assert len(arch) < len(plain)       # WRT + pretraining must help
    finally:
        os.unlink(dic)


@pytest.mark.slow
def test_resume_journal(tmp_path):
    """Failure recovery: a run interrupted between coding groups restarts
    from the journal and produces the identical archive."""
    rng = np.random.default_rng(9)
    words = [b"alpha", b"beta", b"gamma", b"delta "]
    data = b" ".join(words[i] for i in rng.integers(0, 4, 4000)) 
    jp = str(tmp_path / "job.tcmr")

    full = compress(data, CFG, max_batch=2)          # 5 blocks, 3 groups
    # run 1: crash after the first group (monkeypatch the saver to raise)
    import cmix_tpu.runner as R
    real_save = R._resume_save
    calls = [0]

    def crashing_save(path, key, streams):
        real_save(path, key, streams)
        calls[0] += 1
        if calls[0] == 1:
            raise KeyboardInterrupt

    R._resume_save = crashing_save
    try:
        compress(data, CFG, max_batch=2, resume_path=jp)
        assert False, "expected simulated crash"
    except KeyboardInterrupt:
        pass
    finally:
        R._resume_save = real_save
    assert os.path.exists(jp)

    resumed = compress(data, CFG, max_batch=2, resume_path=jp)
    assert resumed == full
    assert not os.path.exists(jp)                    # journal cleaned up
    assert decompress(resumed) == data

    # stale journal (different input) is ignored, not misused
    other = data[:-100] + b"zzz"
    R._resume_save(jp, R._resume_key(data, CFG, 2, 0), [(False, b"junk")])
    arch2 = compress(other, CFG, max_batch=2, resume_path=jp)
    assert decompress(arch2) == other
