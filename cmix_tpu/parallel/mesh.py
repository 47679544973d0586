"""Multi-chip / multi-host sharding of the transcoder.

The reference is single-threaded (SURVEY.md section 2.8); parallelism here
is first-class and uses the only semantics-preserving axes the format
allows:

* ``dp`` (data/block parallel): independent blocks sharded across devices.
  Each device runs the identical serial per-bit model on its shard; no
  collectives inside the per-bit loop.  This is the throughput axis.
* ``tp`` (table/tensor parallel): the large hash tables (bank states,
  match tables, order-1 direct, indirect-hash) are sharded on their table
  dimension.  XLA (GSPMD) turns the per-bit gathers/scatters into
  ICI-routed collective lookups -- this trades latency for the ability to
  hold reference-scale (multi-GB) tables that exceed one chip's HBM, the
  TPU answer to cmix's 2 GB shared map + 13.7 GB PPMD arena
  (src/context-manager.h:24, src/predictor.cpp:101).

pp/ep do not map to this architecture: the format has no layer pipeline
and no routed experts (the model bank IS dense -- every model fires every
bit).  Those axes would add communication without widening any bottleneck.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmix_tpu.engine import EngineConfig, init_state


def make_mesh(n_dp, n_tp=1, devices=None):
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_tp
    arr = np.array(devices[:n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(arr, ("dp", "tp"))


# state arrays whose *table* axis is sharded over tp (axis index counts the
# per-block axes, i.e. excludes the leading batch dim).
_TP_SHARDED = {
    "bank_state": 2,   # (B, N_BANK, tsize) -> shard tsize
    "match_tbl": 2,    # (B, N_MATCH, msize) -> shard msize
    "d1_p": 1,
    "d1_c": 1,
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
    """Jitted transcoder with dp-sharded blocks and tp-sharded tables."""
    from cmix_tpu.engine import make_transcode_fn, make_compactor

    ns = lambda s: NamedSharding(mesh, s)
    st_shard = jax.tree_util.tree_map(ns, state_shardings(mesh, cfg))
    dp = ns(P("dp"))
    dp_t = ns(P(None, "dp"))     # time-major scan outputs: (N, B, ...)
    scan_fn = jax.jit(
        make_transcode_fn(cfg),
        in_shardings=(st_shard, dp, dp, None),
        out_shardings=(dp, dp_t, dp_t, dp, dp),
        donate_argnums=(0,))
    compact_fn = jax.jit(
        make_compactor(cfg),
        in_shardings=(dp_t, dp_t, dp, dp),
        out_shardings=(dp, dp),
        donate_argnums=(0, 1))

    def transcode(state, inp, comp, mode):
        hist, e32, c32, total, x1 = scan_fn(state, inp, comp, mode)
        out, out_len = compact_fn(e32, c32, total, x1)
        return hist, out, out_len

    return transcode


def sharded_batched_state(cfg, b, mesh):
    st = init_state(cfg)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (b,) + x.shape), st)
    shards = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), state_shardings(mesh, cfg))
    return jax.tree_util.tree_map(jax.device_put, batched, shards)
