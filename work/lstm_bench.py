"""Microbench: lstm_shared_byte_update on chip, stock vs unrolled scan."""
import os
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

from cmix_tpu.mixer import lstm as L

B = 256
cfg = L.LstmConfig()


def run(tag):
    sh = L.init_lstm_shared(cfg)
    pb = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (B,) + (1,) * x.ndim),
        L.init_lstm_perblock(cfg))
    bytes_b = jnp.full((B,), 65, jnp.int32)

    @jax.jit
    def stepf(sh, pb, by):
        return L.lstm_shared_byte_update(cfg, sh, pb, by)

    sh, pb = stepf(sh, pb, bytes_b)
    jax.block_until_ready(pb["qcum"])
    t0 = time.time()
    for _ in range(30):
        sh, pb = stepf(sh, pb, bytes_b)
    jax.block_until_ready(pb["qcum"])
    dt = (time.time() - t0) / 30 * 1e3
    print(f"{tag}: {dt:.3f} ms/byte-step  qcum0={float(pb['qcum'][0, -1]):.1f}",
          flush=True)
    return pb


p1 = run("unroll8")
L._SCAN_UNROLL = 1
p2 = run("unroll1")
print("qcum equal:", bool(jnp.array_equal(p1["qcum"], p2["qcum"])), flush=True)
