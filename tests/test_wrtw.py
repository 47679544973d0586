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


def test_wrtw2_codeword_matches_letter_identity():
    """WRTW=2: a completed codeword latches the SAME last_word/last_stem
    the letter machinery produces for the spelled-out word (the point of
    the in-model dictionary decode, fxcmv1.cpp:353-438)."""
    words = ["hello", "compression", "cats"]
    wt, st = H.build_wrtw_tables(words)
    tab = (jnp.asarray(wt), jnp.asarray(st))
    prev = H.WRTW
    try:
        for wid, w in enumerate(words):
            # letter path (untransformed text)
            H.WRTW = 0
            cs_raw = _feed(list(w.encode()) + [0x20])
            lw_raw = int(np.asarray(cs_raw["last_word"])[0])
            ls_raw = int(np.asarray(cs_raw["last_stem"])[0])
            # codeword path (WRT-transformed text): 1-byte code 0x80+wid
            H.WRTW = 2
            cs = jax.tree_util.tree_map(
                lambda x: jnp.tile(x[None], (1,) + (1,) * x.ndim),
                H.init_ctx_state())
            for b in [0x80 + wid, 0x20]:
                cs = H.update_ctx_state_batched(
                    cs, jnp.full((1,), b, jnp.uint32), wrtw_tab=tab)
            assert int(np.asarray(cs["last_word"])[0]) == lw_raw
            assert int(np.asarray(cs["last_stem"])[0]) == ls_raw
        # suffix rule sanity: "compression" stems to hash("compress"),
        # i.e. stem != word, while "hello" stems to itself
        assert wt[0] == st[0]
        assert wt[1] != st[1]
    finally:
        H.WRTW = prev


def test_wrtw2_multibyte_codeword_id():
    """2-/3-byte codeword ids decode to the right table rows."""
    words = ["w%d" % i for i in range(70)]
    wt, st = H.build_wrtw_tables(words)
    tab = (jnp.asarray(wt), jnp.asarray(st))
    prev = H.WRTW
    H.WRTW = 2
    try:
        # id 66 = N1 + 2 -> lead 0xC0, continuation 0x02
        cs = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (1,) + (1,) * x.ndim),
            H.init_ctx_state())
        for b in [0xC0, 0x02, 0x20]:
            cs = H.update_ctx_state_batched(
                cs, jnp.full((1,), b, jnp.uint32), wrtw_tab=tab)
        assert int(np.asarray(cs["last_word"])[0]) == int(wt[66])
    finally:
        H.WRTW = prev


@pytest.mark.slow
def test_wrtw2_engine_roundtrip(tmp_path):
    """Engine-level encode/decode equality with WRTW=2 tables active."""
    import cmix_tpu.engine as E
    from cmix_tpu.runner import (get_transcoder, _group_state,
                                 _split_blocks, _register_wrtw_tables)
    from cmix_tpu.preprocess.wrt import Dictionary, transform
    dic = tmp_path / "mini.dic"
    dic.write_bytes(b"the\nquick\nbrown\nfox\njumps\nover\nlazy\ndog\n")
    d = Dictionary(str(dic))
    _register_wrtw_tables(d, b"test-fp")
    data = (b"the quick brown fox jumps over the lazy dog. " * 60)[:2048]
    payload, _ = transform(data, d)
    prev = E.gates_blob()
    try:
        E.update_gates({"WRTW": 2})
        cfg = E.EngineConfig(block_size=1024, tbits=12, mbits=12,
                             ibits=10, lstm_hidden=0, dmc_nodes=4096)
        trans = get_transcoder(cfg)
        blocks = _split_blocks(payload, cfg.block_size)
        b = blocks.shape[0]
        sh, pb = _group_state(cfg, b)
        _, comp, clen = trans(sh, pb, jnp.asarray(blocks),
                              jnp.zeros((b, cfg.comp_size), jnp.uint8),
                              jnp.int32(E.MODE_ENCODE))
        sh, pb = _group_state(cfg, b)
        dec, _, _ = trans(sh, pb, jnp.zeros_like(jnp.asarray(blocks)),
                          comp, jnp.int32(E.MODE_DECODE))
        got = np.asarray(dec).reshape(-1).tobytes()[:len(payload)]
        assert got == payload
    finally:
        E.apply_gates(prev)
