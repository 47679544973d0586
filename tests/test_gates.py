"""All experimental env gates enabled at once: the interaction oracle.

Gates are module-level constants read at import, so this drives the real
CLI in a subprocess with every gate on.  Catches shape/index clashes
between gated features (each is round-trip-tested alone when added; this
covers the combination).
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_all_gates_roundtrip(tmp_path):
    src = tmp_path / "in.bin"
    # mixed content: text with table rows + binary tail
    row = b"| alpha | beta | 1234 |\n"
    data = (b"Some prose first. " * 40 + row * 60
            + bytes(range(256)) * 8)
    src.write_bytes(data)
    out = tmp_path / "out.tcmx"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": "/root/repo",
        "MIX_AUX": "1", "MIX_DYN2": "1", "MIX_KIND": "1",
        "MIX_DYN3": "1", "MIX_DYN4": "1", "JPEGX": "1", "GRID2": "1",
        "STEMX": "1", "APM3X": "1", "MATCH2": "1", "CTX2": "1", "SSE2": "1", "RUNX": "1",
        "BANK_CK": "2", "PPM_UPD": "1",
        "VMATCH": "1", "LMS": "1", "BANK_CH": "3", "WIKI": "1",
        "PPM_EXCL": "1", "SBANK_ADAPT": "1", "X86X": "1",
        "APM2X": "1",
    })
    r = subprocess.run(
        [sys.executable, "-m", "cmix_tpu.runner", "t", str(src),
         str(out), "--block-size", "2048", "--tbits", "12",
         "--lstm", "0", "--max-batch", "4"],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]


_GATE_NAMES = [
    "CMIX_N_IND", "WIKI", "X86X", "CMIX_MATCH_ORDERS", "CMIX_PPM_ORDERS",
    "PPM_EXCL", "CMIX_SBANK_COLS", "SBANK_ADAPT", "VMATCH", "LMS",
    "BANK_CH", "MIX_DYN2", "MIX_KIND", "MIX_AUX", "MIX_LR", "MIX_TAU",
    "MIX_BOOST", "MIX_BOOST_N", "W_APM_LEARN", "MIX_NORM", "STAT_NORM",
    "APM2X", "APM_FIXED", "CNT_CAP", "DMC_LEVELS", "MIX_DYN3",
    "MIX_DYN4", "JPEGX", "GRID2", "BANK_CK", "PPM_UPD", "STEMX",
    "APM3X", "MATCH2", "CTX2", "SSE2", "RUNX"]


def _clean_env():
    env = dict(os.environ)
    for k in _GATE_NAMES:
        env.pop(k, None)
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo"})
    return env


@pytest.mark.slow
def test_gates_in_header_decode_clean_env(tmp_path):
    """Encode with non-default gates set in the environment; decode in a
    CLEAN environment.  The archive's gate record (header v3) must
    reconstruct the encoding ensemble -- env drift cannot desync."""
    src = tmp_path / "in.bin"
    data = b"The quick brown fox jumps over the lazy dog. " * 120
    src.write_bytes(data)
    out = tmp_path / "out.tcmx"
    back = tmp_path / "back.bin"
    env_enc = _clean_env()
    env_enc.update({"PPM_EXCL": "1", "MIX_DYN2": "1",
                    "CMIX_MATCH_ORDERS": "3,5,8"})
    r = subprocess.run(
        [sys.executable, "-m", "cmix_tpu.runner", "c", str(src),
         str(out), "--block-size", "2048", "--tbits", "12",
         "--lstm", "0", "--max-batch", "4"],
        env=env_enc, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "-m", "cmix_tpu.runner", "d", str(out),
         str(back), "--max-batch", "4"],
        env=_clean_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert back.read_bytes() == data


def test_decode_structured_errors():
    """Malformed archives raise FormatError with a clear message (not
    late asserts): bad magic, truncation, version and gate mismatches."""
    import struct
    import pytest
    from cmix_tpu.engine import FormatError
    from cmix_tpu.runner import decompress, _HDR, _HDR_LEN, MAGIC
    from cmix_tpu.version import FORMAT_VERSION

    with pytest.raises(FormatError, match="bad magic"):
        decompress(b"NOPE" + b"\0" * (_HDR_LEN + 2))
    with pytest.raises(FormatError, match="truncated"):
        decompress(MAGIC + b"\0" * 4)

    def hdr(ver, glen=0):
        return MAGIC + struct.pack(
            _HDR, ver, 0, 11, 12, 12, 12, 12, 0, 11, 1, 1, 0, 1, 0, 0, 0,
            b"\0" * 8, b"\xff" * 32) + struct.pack("<H", glen)

    with pytest.raises(FormatError, match="version"):
        decompress(hdr(FORMAT_VERSION + 7))
    with pytest.raises(FormatError, match="truncated"):
        decompress(hdr(FORMAT_VERSION, glen=40))  # gate record cut off
    with pytest.raises(FormatError, match="unknown model gate"):
        decompress(hdr(FORMAT_VERSION, glen=7) + b"BOGUS=1")
