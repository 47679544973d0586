"""Sharded transcoder tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmix_tpu.engine import EngineConfig, MODE_ENCODE, MODE_DECODE
from cmix_tpu.parallel.mesh import (
    make_mesh, make_sharded_transcoder, sharded_group_state)


CFG = EngineConfig(block_size=256, tbits=10, mbits=10, ibits=8, lstm_hidden=0)


def test_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_sharded_encode_decode_roundtrip():
    mesh = make_mesh(4, 2)
    trans = make_sharded_transcoder(CFG, mesh)
    b = 8
    data = np.frombuffer(
        open("/root/reference/COPYING", "rb").read()[:b * CFG.block_size],
        dtype=np.uint8).reshape(b, CFG.block_size)

    sh, pb = sharded_group_state(CFG, b, mesh)
    comp0 = jnp.zeros((b, CFG.comp_size), dtype=jnp.uint8)
    hist, out, out_len = trans(sh, pb, jnp.asarray(data), comp0,
                               jnp.int32(MODE_ENCODE))
    out, out_len = np.asarray(out), np.asarray(out_len)
    assert np.array_equal(np.asarray(hist), data)

    comp = np.zeros((b, CFG.comp_size), dtype=np.uint8)
    for i in range(b):
        comp[i, :out_len[i]] = out[i, :out_len[i]]
    sh2, pb2 = sharded_group_state(CFG, b, mesh)
    inp0 = jnp.zeros((b, CFG.block_size), dtype=jnp.uint8)
    hist2, _, _ = trans(sh2, pb2, inp0, jnp.asarray(comp), jnp.int32(MODE_DECODE))
    assert np.array_equal(np.asarray(hist2), data)


def test_sharded_roundtrip_same_mesh():
    """Archives are decodable on the mesh configuration that coded them.

    (v2's f32 model math is bit-stable only within one executable shape:
    platform + per-call batch + sharding.  exec_batch is recorded in the
    archive header; cross-topology portability is a documented limitation
    -- see engine.py docstring.)
    """
    mesh = make_mesh(2, 2)
    strans = make_sharded_transcoder(CFG, mesh)
    b = 4
    data = np.frombuffer(
        open("/root/reference/README", "rb").read()[:b * CFG.block_size],
        dtype=np.uint8).reshape(b, CFG.block_size)
    comp0 = jnp.zeros((b, CFG.comp_size), dtype=jnp.uint8)

    sh1, pb1 = sharded_group_state(CFG, b, mesh)
    _, out1, len1 = strans(sh1, pb1, jnp.asarray(data), comp0, MODE_ENCODE)
    comp = np.zeros((b, CFG.comp_size), dtype=np.uint8)
    for i in range(b):
        comp[i, :len1[i]] = out1[i, :len1[i]]
    sh2, pb2 = sharded_group_state(CFG, b, mesh)
    hist, _, _ = strans(sh2, pb2, jnp.zeros((b, CFG.block_size), jnp.uint8),
                        jnp.asarray(comp), MODE_DECODE)
    assert np.array_equal(np.asarray(hist), data)


@pytest.mark.slow
def test_portable_cross_executable():
    """PORT=1: an archive encoded by ONE executable (unsharded) decodes
    bit-exactly under a DIFFERENT executable (4x2-sharded mesh), and the
    sharded encoder produces the IDENTICAL archive -- integer model math
    makes results independent of platform/sharding/reduction order.
    (The f32 fast profile documents the opposite: same-executable only.)
    """
    from cmix_tpu import engine
    from cmix_tpu.engine import make_transcoder, init_shared, init_perblock
    pcfg = EngineConfig(block_size=256, tbits=10, mbits=10, ibits=8,
                        lstm_hidden=0, dmc_nodes=8192)  # DMC in PORT:
    #                     integer end-to-end since round 3
    prev = engine.gates_blob()
    engine.apply_gates(b"PORT=1")
    try:
        b = 8
        data = np.frombuffer(
            open("/root/reference/COPYING", "rb").read()[
                :b * pcfg.block_size],
            dtype=np.uint8).reshape(b, pcfg.block_size)
        comp0 = jnp.zeros((b, pcfg.comp_size), dtype=jnp.uint8)

        def plain_state():
            sh = init_shared(pcfg)
            pb = jax.tree_util.tree_map(
                lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim),
                init_perblock(pcfg))
            return sh, pb

        # executable 1: unsharded encode
        trans = make_transcoder(pcfg)
        sh, pb = plain_state()
        _, out1, len1 = trans(sh, pb, jnp.asarray(data), comp0,
                              jnp.int32(MODE_ENCODE))
        out1, len1 = np.asarray(out1), np.asarray(len1)

        # executable 2: 4x2-sharded mesh -- encode must be bit-identical
        mesh = make_mesh(4, 2)
        strans = make_sharded_transcoder(pcfg, mesh)
        sh2, pb2 = sharded_group_state(pcfg, b, mesh)
        _, out2, len2 = strans(sh2, pb2, jnp.asarray(data), comp0,
                               MODE_ENCODE)
        out2, len2 = np.asarray(out2), np.asarray(len2)
        assert np.array_equal(len1, len2)
        for i in range(b):
            assert np.array_equal(out1[i, :len1[i]], out2[i, :len2[i]]), \
                f"sharded archive differs for block {i}"

        # and the sharded executable decodes the unsharded archive
        comp = np.zeros((b, pcfg.comp_size), dtype=np.uint8)
        for i in range(b):
            comp[i, :len1[i]] = out1[i, :len1[i]]
        sh3, pb3 = sharded_group_state(pcfg, b, mesh)
        hist, _, _ = strans(sh3, pb3,
                            jnp.zeros((b, pcfg.block_size), jnp.uint8),
                            jnp.asarray(comp), MODE_DECODE)
        assert np.array_equal(np.asarray(hist), data)
    finally:
        engine.apply_gates(prev)


@pytest.mark.slow
def test_graft_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    jax.jit(fn)(*args)
    __graft_entry__.dryrun_multichip(8)
