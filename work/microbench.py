"""Per-byte-step latency breakdown on the real chip.

Times a steady-state segment scan at several configs/batches to locate
the hot components. Diagnostics to stderr, summary table to stdout.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def time_cfg(name, cfg, b, n_iter=3):
    from cmix_tpu.engine import (
        make_segment_fn, init_shared, init_perblock, init_coder,
        MODE_ENCODE)
    seg_jit = jax.jit(make_segment_fn(cfg), donate_argnums=(0, 1, 2))
    sh = init_shared(cfg)
    pb = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim),
        init_perblock(cfg))
    cd = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim), init_coder(cfg))
    comp = jnp.zeros((b, cfg.comp_size), dtype=jnp.uint8)
    mode = jnp.full((b,), MODE_ENCODE, jnp.int32)
    rng = np.random.default_rng(0)
    seg = jnp.asarray(rng.integers(32, 127, (cfg.seg_size, b), np.uint8))
    t0 = time.time()
    sh, pb, cd, e32, c32 = seg_jit(sh, pb, cd, jnp.int32(0), seg, comp, mode)
    jax.block_until_ready(e32)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n_iter):
        sh, pb, cd, e32, c32 = seg_jit(
            sh, pb, cd, jnp.int32(0), seg, comp, mode)
    jax.block_until_ready(e32)
    dt = (time.time() - t0) / n_iter
    per_byte_ms = dt / cfg.seg_size * 1e3
    mbs = cfg.seg_size * b / dt / (1 << 20)
    print(f"{name:32s} B={b:4d} compile={compile_s:6.1f}s "
          f"seg={dt:6.3f}s {per_byte_ms:7.3f} ms/byte {mbs:8.3f} MB/s",
          flush=True)
    return per_byte_ms, mbs


def main():
    from cmix_tpu.engine import EngineConfig
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    base = dict(block_size=1 << 14, tbits=18, mbits=18, ibits=16,
                lstm_hidden=256, seg_size=256)
    cases = [
        ("full (bench cfg)", EngineConfig(**base), 256),
        ("no lstm", EngineConfig(**{**base, "lstm_hidden": 0}), 256),
        ("no dmc", EngineConfig(**{**base, "dmc_nodes": 0}), 256),
        ("no lstm no dmc",
         EngineConfig(**{**base, "lstm_hidden": 0, "dmc_nodes": 0}), 256),
        ("full B=512", EngineConfig(**base), 512),
        ("full B=1024", EngineConfig(**base), 1024),
    ]
    for name, cfg, b in cases:
        try:
            time_cfg(name, cfg, b)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
