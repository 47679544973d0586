"""WRTW codeword-aware word contexts: tracker semantics + dict roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cmix_tpu.contexts.hashes as H


def _feed(byts):
    cs = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (1,) + (1,) * x.ndim),
        H.init_ctx_state())
    for b in byts:
        cs = H.update_ctx_state_batched(cs, jnp.full((1,), b, jnp.uint32))
    return cs


def test_codeword_completion_sets_last_word():
    prev = H.WRTW
    H.WRTW = 1
    try:
        # 1-byte codeword 0x93 then a space
        cs = _feed([0x93, 0x20])
        lw1 = int(np.asarray(cs["last_word"])[0])
        assert lw1 != 0
        # the same codeword again yields the same word identity
        cs2 = _feed([0x41, 0x20, 0x93, 0x20])
        assert int(np.asarray(cs2["last_word"])[0]) == lw1
        # 2-byte codeword (lead 0xC5): completes after its continuation
        cs3 = _feed([0xC5])
        assert int(np.asarray(cs3["cwrem"])[0]) == 1
        cs3 = H.update_ctx_state_batched(
            cs3, jnp.full((1,), 0x07, jnp.uint32))
        assert int(np.asarray(cs3["cwrem"])[0]) == 0
        assert int(np.asarray(cs3["last_word"])[0]) not in (0, lw1)
    finally:
        H.WRTW = prev


def test_wrtw_off_is_inert():
    prev = H.WRTW
    H.WRTW = 0
    try:
        cs = _feed([0x93, 0xC5, 0x07, 0x20])
        assert int(np.asarray(cs["cwrem"])[0]) == 0
        assert int(np.asarray(cs["cwacc"])[0]) == 0
        assert int(np.asarray(cs["last_word"])[0]) == 0
    finally:
        H.WRTW = prev


@pytest.mark.slow
def test_dict_mode_routes_wrtw_and_roundtrips(tmp_path):
    from cmix_tpu.engine import EngineConfig
    from cmix_tpu.runner import compress, decompress
    data = (b"the quick brown fox jumps over the lazy dog. " * 150)[:6000]
    dic = tmp_path / "mini.dic"
    dic.write_bytes(b"the\nquick\nbrown\nfox\njumps\nover\nlazy\ndog\n")
    cfg = EngineConfig(block_size=2048, tbits=12, mbits=12, ibits=10,
                       lstm_hidden=0, dmc_nodes=4096)
    arch = compress(data, cfg, max_batch=2, dictionary=str(dic))
    assert decompress(arch, max_batch=2, dictionary=str(dic)) == data
    # the archive pins WRTW in its gate record (transform applied)
    assert b"WRTW=1" in arch[:4096]
