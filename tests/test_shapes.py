"""Shape-coverage regression tests (round-2 scale-desync class).

The round-2 scale runs failed because seg_size was not recorded in the
archive header: encode ran at seg_size=2048, decode derived the default
4096, and the dictionary pretrainer padded its stream to a multiple of
the segment -- two different pretrained base states, desync from byte 0
of every block (work/RESULTS.md "Scale run").  These tests pin the two
mechanisms separately:

* every compilation-relevant EngineConfig field must survive the
  header round-trip (structural test, catches the whole class), and
* a dictionary archive coded at a NON-default seg_size must decode in a
  fresh call (end-to-end test of the failing path).

Big-block coverage (256K+) can't fit the CPU test budget; the on-chip
matrix lives in work/scale_debug.py and its results in work/RESULTS.md.
"""

import struct
import tempfile
import os

import pytest

from cmix_tpu.engine import EngineConfig, FormatError
from cmix_tpu.runner import compress, decompress, _HDR, _HDR_LEN


def _mk_dict(data: bytes) -> str:
    words = sorted(set(
        w.lower() for w in data.decode("latin-1").split() if w.isalpha()))
    f = tempfile.NamedTemporaryFile("w", suffix=".dic", delete=False)
    f.write("\n".join(words))
    f.close()
    return f.name


@pytest.mark.slow
def test_header_reconstructs_config():
    """Every EngineConfig field that selects the compiled executable must
    come back identical from the archive header."""
    cfg = EngineConfig(block_size=4096, tbits=13, mbits=12, ibits=11,
                       pbits=13, lstm_hidden=32, lstm_layers=1,
                       lstm_horizon=4, dmc_nodes=8192, seg_size=512)
    arch = compress(b"header config probe " * 40, cfg)
    hdr = struct.unpack(_HDR, arch[4:4 + _HDR_LEN])
    (_, _, log_bs, tbits, mbits, ibits, pbits, dmc_log, log_seg,
     lstm_layers, lstm_horizon, lstm_hidden, _, _, _, _, _, _) = hdr
    back = EngineConfig(block_size=1 << log_bs, tbits=tbits, mbits=mbits,
                        ibits=ibits, pbits=pbits, lstm_hidden=lstm_hidden,
                        lstm_layers=lstm_layers, lstm_horizon=lstm_horizon,
                        dmc_nodes=(1 << dmc_log) if dmc_log else 0,
                        seg_size=1 << log_seg)
    assert back == cfg


@pytest.mark.slow
def test_nondefault_seg_size_dict_roundtrip():
    """The exact round-2 failure shape, shrunk: dictionary pretraining
    + a seg_size the decoder would not derive by default."""
    with open("/root/reference/COPYING", "rb") as f:
        data = f.read()[:6000]
    cfg = EngineConfig(block_size=4096, tbits=13, mbits=13, ibits=11,
                       lstm_hidden=0, seg_size=512)
    dic = _mk_dict(data)
    try:
        arch = compress(data, cfg, dictionary=dic)
        assert decompress(arch, dictionary=dic) == data
    finally:
        os.unlink(dic)


def test_pretrain_state_independent_of_seg_size():
    """The pretrained base state must not depend on the host-chunking
    seg_size (the padding bug made it depend on it)."""
    from cmix_tpu.utils.checkpoint import pretrain_cache_key
    a = EngineConfig(block_size=8192, tbits=12, lstm_hidden=0, seg_size=512)
    b = EngineConfig(block_size=8192, tbits=12, lstm_hidden=0, seg_size=2048)
    assert pretrain_cache_key(a, b"x" * 100) == \
        pretrain_cache_key(b, b"x" * 100)


def test_config_validation():
    with pytest.raises(FormatError, match="power of two"):
        EngineConfig(block_size=3000)
    with pytest.raises(FormatError, match="dmc_nodes"):
        EngineConfig(dmc_nodes=1 << 17)


@pytest.mark.slow
@pytest.mark.parametrize("blk,dict_on", [
    (1 << 14, False),
    pytest.param(1 << 16, True, marks=pytest.mark.skipif(
        not os.environ.get("RUN_SLOW"),
        reason="~15 min on 2 vCPU; RUN_SLOW=1 enables (the dict+seg "
               "regression mechanism is already covered above)")),
])
def test_bigger_block_roundtrip(blk, dict_on):
    """Block sizes above the old 2K-test comfort zone (the round-2 bug
    first appeared at a block size CI never exercised)."""
    with open("/root/reference/src/models/paq8.cpp", "rb") as f:
        data = f.read()[:blk + blk // 2]             # spans 2 blocks
    cfg = EngineConfig(block_size=blk, tbits=15, mbits=14, ibits=12,
                       lstm_hidden=0, dmc_nodes=8192, seg_size=2048)
    dic = _mk_dict(data) if dict_on else None
    try:
        arch = compress(data, cfg, dictionary=dic)
        assert decompress(arch, dictionary=dic) == data
    finally:
        if dic:
            os.unlink(dic)
