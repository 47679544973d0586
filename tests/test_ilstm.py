"""Integer LSTM (portable profile) unit tests: learning + roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmix_tpu.mixer.ilstm import (
    ILstmConfig, init_ilstm_shared, init_ilstm_perblock,
    ilstm_shared_byte_update)


def _run(seq, n_steps, hidden=64, horizon=4, b=1):
    cfg = ILstmConfig(hidden=hidden, horizon=horizon)
    sh = init_ilstm_shared(cfg)
    pb = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim),
        init_ilstm_perblock(cfg))
    step = jax.jit(lambda sh, pb, by: ilstm_shared_byte_update(
        cfg, sh, pb, by))
    for i in range(n_steps):
        sh, pb = step(sh, pb, jnp.full((b,), seq[i % len(seq)], jnp.int32))
    return sh, pb, seq[n_steps % len(seq)]


def test_learns_repeated_pattern():
    sh, pb, nxt = _run(b"abcabcabcabc", 1800)
    q = np.asarray(pb["qcum"])
    p = (q[0, nxt + 1] - q[0, nxt]) / max(int(q[0, -1]), 1)
    assert p > 0.25, f"p(correct)={p} after 1800 repeated bytes"


def test_qcum_monotone_and_bounded():
    sh, pb, _ = _run(b"hello world ", 64)
    q = np.asarray(pb["qcum"])
    assert (np.diff(q, axis=1) >= 0).all()
    assert (q[:, 0] == 0).all()


def test_weights_bounded():
    from cmix_tpu.mixer.ilstm import W_CLIP, PRE_CLIP
    sh, _, _ = _run(b"aaaabbbb", 600)
    assert int(np.abs(np.asarray(sh["wh"])).max()) <= W_CLIP
    assert int(np.abs(np.asarray(sh["wo"])).max()) <= W_CLIP
    assert int(np.abs(np.asarray(sh["bo"])).max()) <= PRE_CLIP


@pytest.mark.slow
def test_port_lstm_roundtrip():
    """PORT archives with the integer LSTM on decode bit-exactly."""
    from cmix_tpu import engine, runner
    from cmix_tpu.engine import EngineConfig
    from cmix_tpu.runner import compress, decompress
    prev = engine.gates_blob()
    try:
        if engine.update_gates({"PORT": 1}):
            # the transcoder cache is keyed by EngineConfig only; gates
            # are baked in at trace time, so a gate flip must drop it
            runner._TRANSCODER_CACHE.clear()
        with open("/root/reference/COPYING", "rb") as f:
            data = f.read()[:5000]
        cfg = EngineConfig(block_size=2048, tbits=12, mbits=12, ibits=10,
                           lstm_hidden=32, lstm_horizon=4, dmc_nodes=4096)
        arch = compress(data, cfg, max_batch=2)
        assert decompress(arch, max_batch=2) == data
    finally:
        if engine.apply_gates(prev):
            runner._TRANSCODER_CACHE.clear()


def _run_cfg(cfg, seq, n_steps, b=1):
    sh = init_ilstm_shared(cfg)
    pb = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim),
        init_ilstm_perblock(cfg))
    step = jax.jit(lambda sh, pb, by: ilstm_shared_byte_update(
        cfg, sh, pb, by))
    for i in range(n_steps):
        sh, pb = step(sh, pb, jnp.full((b,), seq[i % len(seq)], jnp.int32))
    return sh, pb, seq[n_steps % len(seq)]


def test_adam_learns_and_bounded():
    """Integer Adam (ILSTM_ADAM): learns the repeated pattern at least
    as well as SGD, weights stay inside the portability clips."""
    from cmix_tpu.mixer.ilstm import W_CLIP
    cfg = ILstmConfig(hidden=64, horizon=4, adam=True)
    sh, pb, nxt = _run_cfg(cfg, b"abcabcabcabc", 1800)
    q = np.asarray(pb["qcum"])
    p = (q[0, nxt + 1] - q[0, nxt]) / max(int(q[0, -1]), 1)
    assert p > 0.25, f"p(correct)={p} after 1800 bytes (adam)"
    assert int(np.abs(np.asarray(sh["wh"])).max()) <= W_CLIP
    assert int(np.abs(np.asarray(sh["wo"])).max()) <= W_CLIP


def test_adam_state_shapes():
    cfg = ILstmConfig(hidden=32, horizon=2, adam=True)
    sh = init_ilstm_shared(cfg)
    for k in ("wx", "wh", "wo", "b", "bo"):
        assert sh["m_" + k].shape == sh[k].shape
        assert sh["v_" + k].shape == sh[k].shape
