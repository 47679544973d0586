"""Multi-chip / multi-host sharding of the transcoder.

The reference is single-threaded (SURVEY.md section 2.8); parallelism here
is first-class and uses the only semantics-preserving axes the format
allows:

* ``dp`` (data/block parallel): independent blocks' positional state is
  sharded across devices; the shared model is replicated (or tp-sharded).
  This is the throughput axis.
* ``tp`` (table/tensor parallel): the shared model's large hash tables
  (context bank, match table, indirect-hash, order-1 direct) are sharded
  on their table dimension.  XLA (GSPMD) turns the per-byte row gathers /
  path scatters into ICI-routed collective lookups -- trading latency for
  table capacity beyond one chip's HBM, the TPU answer to cmix's 2 GB
  shared map + 13.7 GB PPMD arena (src/context-manager.h:24,
  src/predictor.cpp:101).

pp/ep do not map to this architecture: the format has no layer pipeline
and no routed experts (the model bank is dense -- every model fires every
byte).  Those axes would add communication without widening a bottleneck.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmix_tpu.engine import (
    EngineConfig, init_shared, init_perblock, init_coder, make_segment_fn,
    make_seg_compactor, MODE_DECODE, U8)


def make_mesh(n_dp, n_tp=1, devices=None):
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_tp
    arr = np.array(devices[:n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(arr, ("dp", "tp"))


# shared-state arrays whose table axis is sharded over tp
_SH_TP = {
    "bank": 1,        # (NM, R, 256) -> shard rows
    "aux_tbl": 0,     # flat match+indirect arena
    "d12": 0,         # (256+65536, 256)
    "ppm": 1,         # (NP, R, 256) -> shard rows
    "sbank": 1,       # (NS, R, 256) -> shard rows
    # (run channels live in bank row-header slot 0 since r5 and shard
    # with the bank rows)
}


def shared_shardings(mesh, cfg):
    sh = init_shared(cfg)

    def spec_for(path, x):
        key = path[-1].key if hasattr(path[-1], "key") else None
        if key is not None and re.fullmatch(r"bank\d*", key):
            # bank chunks ("bank2", ...) inherit the base "bank" spec.
            # Exact-match the chunk naming so an unrelated future key
            # like "bank_stats2" cannot silently inherit the tp spec.
            key = "bank"
        if key in _SH_TP:
            axes = [None] * x.ndim
            axes[_SH_TP[key]] = "tp"
            return P(*axes)
        return P(*([None] * x.ndim))

    return jax.tree_util.tree_map_with_path(spec_for, sh)


def perblock_shardings(mesh, cfg):
    pb = init_perblock(cfg)
    return jax.tree_util.tree_map(
        lambda x: P(*(["dp"] + [None] * x.ndim)), pb)


def make_sharded_transcoder(cfg: EngineConfig, mesh: Mesh):
    """Host-looped segmented transcoder with dp-sharded blocks and
    tp-sharded shared tables. Same contract as engine.make_transcoder."""
    ns = lambda s: NamedSharding(mesh, s)
    sh_shard = jax.tree_util.tree_map(ns, shared_shardings(mesh, cfg))
    pb_shard = jax.tree_util.tree_map(ns, perblock_shardings(mesh, cfg))
    dp = ns(P("dp"))
    dp_t = ns(P(None, "dp"))
    cd_shard = jax.tree_util.tree_map(lambda _: dp, init_coder(cfg))
    seg_jit = jax.jit(
        make_segment_fn(cfg),
        in_shardings=(sh_shard, pb_shard, cd_shard, None, dp_t, dp, dp),
        out_shardings=(sh_shard, pb_shard, cd_shard, dp_t, dp_t),
        donate_argnums=(0, 1, 2))
    # no donation for the compactor: its uint8 outputs can never reuse
    # the uint32 emission buffers (same fix as engine.make_transcoder --
    # donating only produced "donated buffers were not usable" warnings)
    comp_jit = jax.jit(
        make_seg_compactor(cfg),
        in_shardings=(dp_t, dp_t),
        out_shardings=(dp, dp))

    def transcode(sh, pb, inp, comp, mode):
        b = int(inp.shape[0])
        cd = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim),
            init_coder(cfg))
        comp = jnp.asarray(comp)
        mode = jnp.broadcast_to(jnp.asarray(mode, jnp.int32), (b,))
        xc = (comp[:, 0].astype(jnp.uint32) << jnp.uint32(24)) \
            | (comp[:, 1].astype(jnp.uint32) << jnp.uint32(16)) \
            | (comp[:, 2].astype(jnp.uint32) << U8) \
            | comp[:, 3].astype(jnp.uint32)
        cd["xc"] = jnp.where(mode == MODE_DECODE, xc, cd["xc"])
        cd["rptr"] = jnp.where(mode == MODE_DECODE, 4, 0).astype(jnp.int32)
        inp_T = jnp.transpose(jnp.asarray(inp))
        n_segs = cfg.block_size // cfg.seg_size
        parts = [[] for _ in range(b)]
        for si in range(n_segs):
            seg = inp_T[si * cfg.seg_size:(si + 1) * cfg.seg_size]
            sh, pb, cd, e32, c32 = seg_jit(
                sh, pb, cd, jnp.int32(si * cfg.seg_size), seg, comp, mode)
            seg_out, seg_len = comp_jit(e32, c32)
            seg_out = np.asarray(seg_out)
            seg_len = np.asarray(seg_len)
            for i in range(b):
                parts[i].append(seg_out[i, :seg_len[i]].tobytes())
        x1 = np.asarray(cd["x1"])
        hist = np.asarray(pb["hist"])
        out = np.zeros((b, cfg.comp_size), dtype=np.uint8)
        out_len = np.zeros(b, dtype=np.int64)
        for i in range(b):
            stream = b"".join(parts[i]) + bytes(
                [(int(x1[i]) >> (24 - 8 * j)) & 0xFF for j in range(4)])
            L = min(len(stream), cfg.comp_size)
            out[i, :L] = np.frombuffer(stream[:L], dtype=np.uint8)
            out_len[i] = len(stream)
        return hist, out, out_len

    return transcode


def sharded_group_state(cfg, b, mesh):
    """(sh, pb) placed according to the mesh shardings."""
    sh = init_shared(cfg)
    pb = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim), init_perblock(cfg))
    sh = jax.tree_util.tree_map(
        jax.device_put, sh,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                               shared_shardings(mesh, cfg)))
    pb = jax.tree_util.tree_map(
        jax.device_put, pb,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                               perblock_shardings(mesh, cfg)))
    return sh, pb
