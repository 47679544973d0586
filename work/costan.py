"""XLA cost analysis of one byte_step: find the bandwidth hogs."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cmix_tpu.engine import (
    EngineConfig, make_byte_step, init_shared, init_perblock, init_coder,
    MODE_ENCODE)


def analyze(cfg, b, label):
    step = make_byte_step(cfg)

    def one(sh, pb, cd, comp, byte_b):
        mode = jnp.full((b,), MODE_ENCODE, jnp.int32)
        return step(sh, pb, cd, comp, byte_b, jnp.int32(0), mode)

    sh = init_shared(cfg)
    pb = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim),
        init_perblock(cfg))
    cd = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim), init_coder(cfg))
    comp = jnp.zeros((b, cfg.comp_size), dtype=jnp.uint8)
    byte_b = jnp.zeros((b,), jnp.uint8)
    jitted = jax.jit(one, donate_argnums=(0, 1, 2))
    lowered = jitted.lower(sh, pb, cd, comp, byte_b)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    keys = sorted(ca.keys())
    print(f"== {label}")
    for k in keys:
        v = ca[k]
        if isinstance(v, float) and v > 1e6:
            print(f"  {k:40s} {v:,.0f}")
    # state sizes
    tot = sum(np.prod(x.shape) * x.dtype.itemsize
              for x in jax.tree_util.tree_leaves(sh))
    totp = sum(np.prod(x.shape) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(pb))
    print(f"  sh bytes {tot/1e6:.1f} MB   pb bytes {totp/1e6:.1f} MB")
    # time it raw (single step, not scan)
    out = jitted(sh, pb, cd, comp, byte_b)
    jax.block_until_ready(out)
    sh2, pb2, cd2, ys = out
    t0 = time.time()
    for _ in range(20):
        sh2, pb2, cd2, ys = jitted(sh2, pb2, cd2, comp, byte_b)
    jax.block_until_ready(ys)
    dt = (time.time() - t0) / 20
    print(f"  unscanned step: {dt*1e3:.2f} ms")


def main():
    base = dict(block_size=1 << 14, tbits=18, mbits=18, ibits=16,
                lstm_hidden=256, seg_size=256)
    analyze(EngineConfig(**base), 256, "full step B=256")
    analyze(EngineConfig(**{**base, "dmc_nodes": 0}), 256,
            "no-dmc step B=256")


if __name__ == "__main__":
    main()
