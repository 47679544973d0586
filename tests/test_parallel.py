"""Sharded transcoder tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmix_tpu.engine import EngineConfig, MODE_ENCODE, MODE_DECODE
from cmix_tpu.parallel.mesh import (
    make_mesh, make_sharded_transcoder, sharded_batched_state)


CFG = EngineConfig(block_size=256, tbits=10, mbits=10, ibits=8, lstm_hidden=0)


def test_devices():
    assert len(jax.devices()) == 8


def test_sharded_encode_decode_roundtrip():
    mesh = make_mesh(4, 2)
    trans = make_sharded_transcoder(CFG, mesh)
    b = 8
    data = np.frombuffer(
        open("/root/reference/COPYING", "rb").read()[:b * CFG.block_size],
        dtype=np.uint8).reshape(b, CFG.block_size)

    state = sharded_batched_state(CFG, b, mesh)
    comp0 = jnp.zeros((b, CFG.comp_size), dtype=jnp.uint8)
    hist, out, out_len = trans(state, jnp.asarray(data), comp0,
                               jnp.int32(MODE_ENCODE))
    out, out_len = np.asarray(out), np.asarray(out_len)
    assert np.array_equal(np.asarray(hist), data)

    comp = np.zeros((b, CFG.comp_size), dtype=np.uint8)
    for i in range(b):
        comp[i, :out_len[i]] = out[i, :out_len[i]]
    state2 = sharded_batched_state(CFG, b, mesh)
    inp0 = jnp.zeros((b, CFG.block_size), dtype=jnp.uint8)
    hist2, _, _ = trans(state2, inp0, jnp.asarray(comp), jnp.int32(MODE_DECODE))
    assert np.array_equal(np.asarray(hist2), data)


def test_sharded_matches_unsharded():
    """dp/tp sharding must not change a single bit of the stream."""
    from cmix_tpu.runner import get_transcoder, _batched_state
    mesh = make_mesh(4, 2)
    strans = make_sharded_transcoder(CFG, mesh)
    b = 4
    data = np.frombuffer(
        open("/root/reference/README", "rb").read()[:b * CFG.block_size],
        dtype=np.uint8).reshape(b, CFG.block_size)
    comp0 = jnp.zeros((b, CFG.comp_size), dtype=jnp.uint8)

    st1 = sharded_batched_state(CFG, b, mesh)
    _, out1, len1 = strans(st1, jnp.asarray(data), comp0, jnp.int32(MODE_ENCODE))

    utrans = get_transcoder(CFG)
    st2 = _batched_state(CFG, b)
    _, out2, len2 = utrans(st2, jnp.asarray(data), comp0, jnp.int32(MODE_ENCODE))

    assert np.array_equal(np.asarray(len1), np.asarray(len2))
    for i in range(b):
        L = int(np.asarray(len1)[i])
        assert np.array_equal(np.asarray(out1)[i, :L], np.asarray(out2)[i, :L])


def test_graft_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    jax.jit(fn)(*args)
    __graft_entry__.dryrun_multichip(8)
