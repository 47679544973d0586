"""Multi-chip / multi-host sharding of the transcoder.

The reference is single-threaded (SURVEY.md section 2.8); parallelism here
is first-class and uses the only semantics-preserving axes the format
allows:

* ``dp`` (data/block parallel): independent blocks sharded across devices.
  Each device runs the identical serial per-byte model on its shard; no
  collectives inside the scan.  This is the throughput axis.
* ``tp`` (table/tensor parallel): the large hash tables (bank rows, match
  tables, order-1 direct, indirect-hash) are sharded on their table
  dimension.  XLA (GSPMD) turns the per-byte row gathers/scatters into
  ICI-routed collective lookups -- this trades latency for the ability to
  hold reference-scale (multi-GB) tables that exceed one chip's HBM, the
  TPU answer to cmix's 2 GB shared map + 13.7 GB PPMD arena
  (src/context-manager.h:24, src/predictor.cpp:101).

pp/ep do not map to this architecture: the format has no layer pipeline
and no routed experts (the model bank is dense -- every model fires every
byte).  Those axes would add communication without widening a bottleneck.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmix_tpu.engine import (
    EngineConfig, init_state, init_coder, make_segment_fn,
    make_seg_compactor, MODE_DECODE, U8)


def make_mesh(n_dp, n_tp=1, devices=None):
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_tp
    arr = np.array(devices[:n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(arr, ("dp", "tp"))


# state arrays whose *table* axis is sharded over tp (axis index counts the
# per-block axes, i.e. excludes the leading batch dim).
_TP_SHARDED = {
    "bank": 2,        # (B, NM, R, 256) -> shard rows
    "match_tbl": 2,   # (B, NM, msize) -> shard msize
    "d1": 1,          # (B, 256, 256)
    "ind_tbl": 1,
}


def state_shardings(mesh, cfg):
    """PartitionSpec pytree for a batched engine state."""
    st = init_state(cfg)

    def spec_for(path, x):
        key = path[-1].key if hasattr(path[-1], "key") else None
        nd = x.ndim + 1  # plus batch dim
        if key in _TP_SHARDED:
            axes = [None] * nd
            axes[0] = "dp"
            axes[_TP_SHARDED[key]] = "tp"
            return P(*axes)
        return P(*(["dp"] + [None] * (nd - 1)))

    return jax.tree_util.tree_map_with_path(spec_for, st)


def make_sharded_transcoder(cfg: EngineConfig, mesh: Mesh):
    """Host-looped segmented transcoder with dp-sharded blocks and
    tp-sharded tables. Same contract as engine.make_transcoder."""
    ns = lambda s: NamedSharding(mesh, s)
    st_shard = jax.tree_util.tree_map(ns, state_shardings(mesh, cfg))
    dp = ns(P("dp"))
    dp_t = ns(P(None, "dp"))     # time-major outputs: (S, B, ...)
    cd_shard = jax.tree_util.tree_map(lambda _: dp, init_coder(cfg))
    seg_jit = jax.jit(
        make_segment_fn(cfg),
        in_shardings=(st_shard, cd_shard, dp_t, dp, None),
        out_shardings=(st_shard, cd_shard, dp_t, dp_t),
        donate_argnums=(0, 1))
    comp_jit = jax.jit(
        make_seg_compactor(cfg),
        in_shardings=(dp_t, dp_t),
        out_shardings=(dp, dp),
        donate_argnums=(0, 1))

    def transcode(state, inp, comp, mode):
        b = int(inp.shape[0])
        cd = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim),
            init_coder(cfg))
        comp = jnp.asarray(comp)
        if int(np.asarray(mode)) == MODE_DECODE:
            xc = (comp[:, 0].astype(jnp.uint32) << jnp.uint32(24)) \
                | (comp[:, 1].astype(jnp.uint32) << jnp.uint32(16)) \
                | (comp[:, 2].astype(jnp.uint32) << U8) \
                | comp[:, 3].astype(jnp.uint32)
            cd["xc"] = xc
            cd["rptr"] = jnp.full(b, 4, jnp.int32)
        inp_T = jnp.transpose(jnp.asarray(inp))
        mode = jnp.int32(mode)
        n_segs = cfg.block_size // cfg.seg_size
        parts = [[] for _ in range(b)]
        for si in range(n_segs):
            seg = inp_T[si * cfg.seg_size:(si + 1) * cfg.seg_size]
            state, cd, e32, c32 = seg_jit(state, cd, seg, comp, mode)
            seg_out, seg_len = comp_jit(e32, c32)
            seg_out = np.asarray(seg_out)
            seg_len = np.asarray(seg_len)
            for i in range(b):
                parts[i].append(seg_out[i, :seg_len[i]].tobytes())
        x1 = np.asarray(cd["x1"])
        hist = np.asarray(state["hist"])
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


def sharded_batched_state(cfg, b, mesh):
    st = init_state(cfg)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (b,) + x.shape), st)
    shards = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), state_shardings(mesh, cfg))
    return jax.tree_util.tree_map(jax.device_put, batched, shards)
