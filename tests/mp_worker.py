"""Worker for the two-process multi-host test (test_distributed.py).

Run as: mp_worker.py <process_id> <num_processes> <coordinator>
Each process brings 4 virtual CPU devices; the global mesh is dp=8.
Exercises: jax.distributed init, global dp-major mesh, cross-process
ordered gather (block order preserved), replicated state broadcast.
Prints OK on success (parent asserts).
"""
import os
import sys

pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from cmix_tpu.parallel.distributed import (  # noqa: E402
    init_distributed, global_mesh, host_block_span, broadcast_state,
    make_ordered_gather)

n, p = init_distributed(coordinator=coord, num_processes=nproc,
                        process_id=pid)
assert n == nproc and p == pid, (n, p)
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

mesh = global_mesh(n_dp=4 * nproc, n_tp=1)
lo, hi = host_block_span(4 * nproc)
assert (lo, hi) == (4 * pid, 4 * pid + 4), (lo, hi)

# per-process local spans: block i carries length i+1 and payload fill i
local_lens = np.arange(lo, hi, dtype=np.int32) + 1
local_pay = np.tile(np.arange(lo, hi, dtype=np.uint8)[:, None], (1, 16))

# place local shards on the global dp mesh
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
sh = NamedSharding(mesh, P("dp"))
sh2 = NamedSharding(mesh, P("dp", None))
g_lens = jax.make_array_from_process_local_data(sh, local_lens)
g_pay = jax.make_array_from_process_local_data(sh2, local_pay)

g = make_ordered_gather(mesh)
lens_all, pay_all = g(g_lens, g_pay)
lens_all = np.asarray(jax.device_get(lens_all))
pay_all = np.asarray(jax.device_get(pay_all))
assert np.array_equal(lens_all, np.arange(4 * nproc) + 1), lens_all
for i in range(4 * nproc):
    assert (pay_all[i] == i).all(), (i, pay_all[i])

# broadcast: both processes provide identical state; replicated result
state = {"w": np.arange(32, dtype=np.float32)}
rep = broadcast_state(state, mesh)
assert rep["w"].sharding.is_fully_replicated
np.testing.assert_array_equal(np.asarray(rep["w"]), state["w"])

print("OK", flush=True)
