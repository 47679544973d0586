"""On-chip microbench: Pallas DMC walk vs XLA gather walk (B=256)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

from cmix_tpu.models import dmc


def main():
    B, N = 256, 16384
    pb = dmc.init_dmc_perblock(N)
    pb = {k: jnp.tile(v[None], (B,) + (1,) * v.ndim)
          for k, v in pb.items()}
    rng = np.random.RandomState(3)
    upd = jax.jit(lambda s, b: dmc.byte_update(s, b))
    for t in range(64):
        pb.update(upd({k: pb[k] for k in dmc.DMC_KEYS},
                      jnp.asarray(rng.randint(0, 256, size=B))))

    f_x = jax.jit(dmc._counts_xla)
    f_p = jax.jit(lambda n, c, u: dmc._counts_pallas(n, c, u, group=1))
    f_p4 = jax.jit(lambda n, c, u: dmc._counts_pallas(n, c, u, group=4))
    f_p8 = jax.jit(lambda n, c, u: dmc._counts_pallas(n, c, u, group=8))
    a = f_x(pb["dmc_nxt"], pb["dmc_cnt"], pb["dmc_cur"])
    b = f_p(pb["dmc_nxt"], pb["dmc_cnt"], pb["dmc_cur"])
    ok = np.array_equal(np.asarray(a), np.asarray(b))
    print("bit-identical on chip:", ok, flush=True)
    for name, f in (("xla", f_x), ("pallas-g1", f_p), ("pallas-g4", f_p4), ("pallas-g8", f_p8)):
        t0 = time.time()
        for _ in range(50):
            r = f(pb["dmc_nxt"], pb["dmc_cnt"], pb["dmc_cur"])
        jax.block_until_ready(r)
        dt = (time.time() - t0) / 50
        print(f"{name}: {dt*1e3:.3f} ms/walk (B={B})", flush=True)


main()
