"""Microbench: bank-table gather/scatter layouts on the real chip.

Current engine layout: chunked (<=64, R, 256) tables indexed as
``tbl[m[None, :], rowi[:, lo:hi]]`` (2D gather: model axis x row axis).
Candidate: ONE flat (NM*R, 256) table indexed as
``tbl[m*R + rowi]`` (single index vector of B*NM rows) -- removes the
leading model axis entirely, which is also what the >=65-way backend
cliff was about.

Prints per-layout times for gather, scatter, and gather+update+scatter.
"""
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

B = int(os.environ.get("B", 256))
NM = int(os.environ.get("NM", 64))
R = 1 << (int(os.environ.get("TB", 18)) - 8)


def timeit(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    tbl2 = jnp.zeros((NM, R, 256), jnp.uint32)
    tblf = jnp.zeros((NM * R, 256), jnp.uint32)
    rowi = jax.random.randint(key, (B, NM), 0, R, jnp.int32)
    newrows = jnp.ones((B, NM, 256), jnp.uint32)
    m = jnp.arange(NM)

    g2 = jax.jit(lambda t, r: t[m[None, :], r])
    gf = jax.jit(lambda t, r: t[(m[None, :] * R + r).reshape(-1)]
                 .reshape(B, NM, 256))
    s2 = jax.jit(lambda t, r, v: t.at[m[None, :], r].set(v),
                 donate_argnums=(0,))
    sf = jax.jit(lambda t, r, v: t.at[(m[None, :] * R + r).reshape(-1)]
                 .set(v.reshape(-1, 256)), donate_argnums=(0,))

    print(f"B={B} NM={NM} R={R}  (table {NM * R * 256 * 4 >> 20} MiB)")
    print(f"gather 2D   : {timeit(g2, tbl2, rowi):8.3f} ms")
    print(f"gather flat : {timeit(gf, tblf, rowi):8.3f} ms")
    t = jnp.zeros((NM, R, 256), jnp.uint32)
    out = s2(t, rowi, newrows)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(20):
        out = s2(out, rowi, newrows)
    jax.block_until_ready(out)
    print(f"scatter 2D  : {(time.time() - t0) / 20 * 1e3:8.3f} ms")
    t = jnp.zeros((NM * R, 256), jnp.uint32)
    out = sf(t, rowi, newrows)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(20):
        out = sf(out, rowi, newrows)
    jax.block_until_ready(out)
    print(f"scatter flat: {(time.time() - t0) / 20 * 1e3:8.3f} ms")

    # fused gather+elementwise+scatter (the real per-step pattern)
    def gus2(t, r):
        rows = t[m[None, :], r]
        return t.at[m[None, :], r].set(rows + 1)

    def gusf(t, r):
        fi = (m[None, :] * R + r).reshape(-1)
        rows = t[fi]
        return t.at[fi].set(rows + 1)

    j2 = jax.jit(gus2, donate_argnums=(0,))
    jf = jax.jit(gusf, donate_argnums=(0,))
    for name, jfn, shape in (("g+u+s 2D  ", j2, (NM, R, 256)),
                             ("g+u+s flat", jf, (NM * R, 256))):
        t = jnp.zeros(shape, jnp.uint32)
        out = jfn(t, rowi)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(20):
            out = jfn(out, rowi)
        jax.block_until_ready(out)
        print(f"{name}: {(time.time() - t0) / 20 * 1e3:8.3f} ms")


main()
