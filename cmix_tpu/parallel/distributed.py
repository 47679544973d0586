"""Multi-host execution: process init, state broadcast, ordered gather.

The reference has no distribution at all (SURVEY.md section 2.8); this is
the TPU-native scaling layer on top of parallel/mesh.py.  One JAX process
runs per host; hosts are an outer factor of the ``dp`` mesh axis, so every
host codes its own contiguous span of blocks and the shared model tables
are either replicated (small) or tp-sharded (large).  Collectives ride
ICI within a slice and DCN across hosts; nothing global happens inside
the per-bit loop -- only at job start (broadcast of pretrained state) and
job end (ordered gather of the variable-length compressed streams).

Design points:
* **Block ownership** is static: host h owns blocks [h*B/H, (h+1)*B/H).
  The archive's block table is order-preserving, so the gather only has
  to concatenate per-host results in host order -- no resharding.
* **Variable-length gather**: compressed lengths are all-gathered first
  (fixed-size int vector), then payload bytes are exchanged padded to
  the per-group max and trimmed host-side.  Both go through a single
  jitted all_gather over the mesh; with one process this degenerates to
  identity (exercised by tests and the dryrun).
* **Pretrained-state broadcast**: process 0 computes / loads the cached
  pretrained shared state and broadcasts it by placing it replicated on
  the global mesh -- jax.make_array_from_single_device_arrays handles
  the device transfer; other processes pass zeros of the right shape.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Bring up jax.distributed when running multi-process.

    No-op for single-process runs (the common single-host case).  For a
    pod slice, the TPU runtime usually auto-detects everything and
    ``jax.distributed.initialize()`` with no arguments is enough.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_count(), jax.process_index()


def global_mesh(n_dp=None, n_tp=1):
    """Mesh over ALL processes' devices: ('dp', 'tp'), dp-major so each
    host's local devices hold contiguous dp ranks (contiguous blocks)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    if n_dp is None:
        n_dp = n // n_tp
    assert n_dp * n_tp == n, (n_dp, n_tp, n)
    return Mesh(np.array(devs).reshape(n_dp, n_tp), ("dp", "tp"))


def host_block_span(n_blocks: int):
    """[lo, hi) of block indices this process owns (static ownership)."""
    h, nh = jax.process_index(), jax.process_count()
    per = -(-n_blocks // nh)
    return min(h * per, n_blocks), min((h + 1) * per, n_blocks)


def make_ordered_gather(mesh: Mesh):
    """Returns gather(lens, payload) -> (all_lens, all_payload):
    fixed-size all-gather over the dp axis, order-preserving.

    lens: int32 (B_local,); payload: uint8 (B_local, cap).  Results have
    the global B and keep block order (dp-major mesh ⇒ host order).
    """
    def fn(lens, payload):
        def body(ln, pl):
            ln_all = jax.lax.all_gather(ln, "dp", tiled=True)
            pl_all = jax.lax.all_gather(pl, "dp", tiled=True)
            return ln_all, pl_all

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("dp"), P("dp", None)),
            out_specs=(P(), P()), check_vma=False)(lens, payload)

    return jax.jit(fn)


def broadcast_state(state, mesh: Mesh):
    """Replicate a host-local pytree (e.g. pretrained shared state) onto
    every device of the mesh.  Call with identical values on every
    process (load from the shared cache) or rely on process 0's values
    having been written to the cache first."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), repl), state)


def gather_streams(mesh, out, out_len):
    """Host-side helper: (out uint8 (B_local, cap), out_len (B_local,))
    -> list of bytes for ALL blocks in block order."""
    g = make_ordered_gather(mesh)
    lens, payload = g(jnp.asarray(out_len, jnp.int32), jnp.asarray(out))
    lens = np.asarray(jax.device_get(lens))
    payload = np.asarray(jax.device_get(payload))
    return [payload[i, :lens[i]].tobytes() for i in range(len(lens))]
