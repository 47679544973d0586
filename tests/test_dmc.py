"""DMC model unit tests (cf. paq8 dmcModel, src/models/paq8.cpp:7597-7822)."""

import numpy as np
import jax.numpy as jnp

from cmix_tpu.models.dmc import (
    init_dmc_perblock, predict_tree, byte_update, N_BASE, DMC_KEYS)


def _batched(n_nodes, b):
    import jax
    pb = init_dmc_perblock(n_nodes)
    return jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim), pb)


def test_initial_prediction_uniform():
    pb = _batched(8192, 2)
    p = np.asarray(predict_tree(pb))
    assert p.shape == (2, 256)
    assert np.allclose(p[:, 1:], 0.5, atol=1e-5)


def test_learns_repeated_byte():
    pb = _batched(8192, 1)
    for _ in range(30):
        pb = dict(pb, **byte_update(
            {k: pb[k] for k in DMC_KEYS},
            jnp.asarray([0x41])))
    p = np.asarray(predict_tree(pb))[0]
    # after seeing 'A' (01000001) repeatedly, the root bit (node 1,
    # predicting the top bit = 0) must be confident low
    assert p[1] < 0.15
    # node for prefix 0b01 at level 2 is node 0b101=5; next bit is 0
    assert p[5] < 0.2


def test_cloning_grows_and_freezes():
    pb = _batched(N_BASE + 8, 1)     # nearly-full pool
    data = (b"the quick brown fox " * 8)
    for ch in data:
        pb = dict(pb, **byte_update(
            {k: pb[k] for k in DMC_KEYS},
            jnp.asarray([ch])))
    top = int(np.asarray(pb["dmc_top"])[0])
    n = pb["dmc_nxt"].shape[-1]
    assert N_BASE < top <= n          # cloned, then froze at the cap
    # machine stays well-formed: all (packed) pointers inside the pool
    w = np.asarray(pb["dmc_nxt"])
    assert int((w & 0xFFFF).max()) < n and int((w >> 16).max()) < n


def test_distinct_streams_distinct_state():
    pb = _batched(8192, 2)
    for i in range(40):
        byte = jnp.asarray([0x41, 0x42])
        pb = dict(pb, **byte_update(
            {k: pb[k] for k in DMC_KEYS}, byte))
    p = np.asarray(predict_tree(pb))
    # lane 0 saw 'A' (bit1 of 01000001 = 1), lane 1 'B' (01000010):
    # at node 64+1 (prefix 0100000) they must disagree about the last bits
    assert p[0, 127] != p[1, 127] or p[0, 255 // 2] != p[1, 255 // 2] or \
        abs(p[0, 1] - p[1, 1]) < 0.2  # both learned high-bit=0 equally
    assert p[0, 1] < 0.2 and p[1, 1] < 0.2


def test_pallas_walk_matches_xla():
    """The Pallas count-word walk (TPU path) is bit-identical to the
    XLA gather walk -- pure integer data movement, so enabling the
    kernel cannot change the format (models/dmc.py _counts_pallas)."""
    import numpy as np
    import jax.numpy as jnp
    from cmix_tpu.models import dmc

    B, N = 4, dmc.N_BASE + 64
    pb = dmc.init_dmc_perblock(N)
    pb = {k: jnp.tile(v[None], (B,) + (1,) * v.ndim) for k, v in pb.items()}
    # advance the machines with a few distinct byte streams so the
    # walk traverses cloned/grown regions too
    rng = np.random.RandomState(3)
    for t in range(200):
        pb.update(dmc.byte_update(
            {k: pb[k] for k in dmc.DMC_KEYS},
            jnp.asarray(rng.randint(0, 256, size=B))))
    ref = dmc._counts_xla(pb["dmc_nxt"], pb["dmc_cnt"], pb["dmc_cur"])
    ker = dmc._counts_pallas(pb["dmc_nxt"], pb["dmc_cnt"], pb["dmc_cur"],
                             interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(ker))


def test_fused_kernel_matches_xla():
    """The r5 fused apply+walk kernel (TPU path of predict_step) is
    bit-identical to the XLA scatters+gathers path, including pending-
    descriptor application and the vis/wn side outputs."""
    import numpy as np
    import jax.numpy as jnp
    from cmix_tpu.models import dmc

    B, N = 4, 5120                     # whole-tile pool (N % 1024 == 0)
    pb = dmc.init_dmc_perblock(N)
    pb = {k: jnp.tile(v[None], (B,) + (1,) * v.ndim) for k, v in pb.items()}
    rng = np.random.RandomState(7)
    for t in range(60):
        # run the deferred flow on the XLA path to build real pending
        # descriptors + grown machines
        upd, walk = dmc.predict_step(pb)
        pb.update(upd)
        pb.update(dmc.plan_step(
            {k: pb[k] for k in dmc.DMC_KEYS}, walk,
            jnp.asarray(rng.randint(0, 256, size=B))))
    nxt_r, cnt_r = dmc._apply_xla(pb["dmc_nxt"], pb["dmc_cnt"], pb)
    cw_r, vis_r, wn_r = dmc._walk_xla(nxt_r, cnt_r, pb["dmc_cur"])
    nxt_k, cnt_k, cw_k, vis_k, wn_k = dmc._fused_pallas(
        pb["dmc_nxt"], pb["dmc_cnt"], pb["dmc_cur"],
        pb["dmc_uX"], pb["dmc_uXC"], pb["dmc_uS"], pb["dmc_uSW"],
        pb["dmc_uU"], pb["dmc_uUW"], interpret=True)
    for r, k in ((nxt_r, nxt_k), (cnt_r, cnt_k), (cw_r, cw_k),
                 (vis_r, vis_k), (wn_r, wn_k)):
        assert np.array_equal(np.asarray(r), np.asarray(k))

def test_fused_kernel_matches_xla_trimmed_levels():
    """DMC_LEVELS<8 trims the kernel's serial fetch chain (the r5 speed
    lever); outputs must still match the XLA path bit-for-bit at the
    same levels, including the residual-gather flow in plan_step."""
    import numpy as np
    import jax.numpy as jnp
    from cmix_tpu.models import dmc

    old = dmc.DMC_LEVELS
    dmc.DMC_LEVELS = 6
    try:
        B, N = 4, 5120
        pb = dmc.init_dmc_perblock(N)
        pb = {k: jnp.tile(v[None], (B,) + (1,) * v.ndim)
              for k, v in pb.items()}
        rng = np.random.RandomState(11)
        for t in range(60):
            upd, walk = dmc.predict_step(pb)
            pb.update(upd)
            pb.update(dmc.plan_step(
                {k: pb[k] for k in dmc.DMC_KEYS}, walk,
                jnp.asarray(rng.randint(0, 256, size=B))))
        nxt_r, cnt_r = dmc._apply_xla(pb["dmc_nxt"], pb["dmc_cnt"], pb)
        cw_r, vis_r, wn_r = dmc._walk_xla(nxt_r, cnt_r, pb["dmc_cur"])
        nxt_k, cnt_k, cw_k, vis_k, wn_k = dmc._fused_pallas(
            pb["dmc_nxt"], pb["dmc_cnt"], pb["dmc_cur"],
            pb["dmc_uX"], pb["dmc_uXC"], pb["dmc_uS"], pb["dmc_uSW"],
            pb["dmc_uU"], pb["dmc_uUW"], interpret=True, levels=6)
        assert cw_k.shape == cw_r.shape == (B, 64)
        assert wn_k.shape == wn_r.shape == (B, 32)
        for r, k in ((nxt_r, nxt_k), (cnt_r, cnt_k), (cw_r, cw_k),
                     (vis_r, vis_k), (wn_r, wn_k)):
            assert np.array_equal(np.asarray(r), np.asarray(k))
    finally:
        dmc.DMC_LEVELS = old
