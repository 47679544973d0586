"""Minimal repro attempt: Pallas kernel inside lax.scan, run twice.

Round-3 observation (models/dmc.py): with the DMC walk Pallas kernel
inside the transcoder's scan, the SECOND transcode of a process dies
with 'TPU backend error (Internal)' on the axon runtime; the first
always succeeds, and the same kernel standalone (no scan) is stable
across many calls.  This strips the engine away: a trivial copy-ish
kernel inside a lax.scan, jitted, executed repeatedly with fresh
buffers.  PASS = no fault (runtime fixed; flip DMC_PALLAS default),
FAIL = the upstream report artifact (work/pallas_repro_report.md).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np


def make_fn(B, N):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.uint32(1)

    def walk(x):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, N // 1024, 8, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, N // 1024, 8, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N // 1024, 8, 128),
                                           jnp.uint32),
        )(x.reshape(B, N // 1024, 8, 128)).reshape(B, N)

    def scanned(tbl, steps):
        def body(carry, _):
            t = walk(carry)
            return t, jnp.sum(t[:, 0])
        out, ys = jax.lax.scan(body, tbl, None, length=steps)
        return out, ys

    return jax.jit(scanned, static_argnums=1)


def main():
    B, N, steps = 256, 16384, 64
    fn = make_fn(B, N)
    for call in range(1, 5):
        x = jnp.zeros((B, N), jnp.uint32)
        t0 = time.time()
        try:
            out, ys = fn(x, steps)
            np.asarray(ys)
            print(f"call {call}: ok ({time.time() - t0:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - the fault IS the data
            print(f"call {call}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            return
    # Phase 2: the r3 failure mode was the SECOND COMPILE of a
    # pallas-in-scan program in one process (second transcode).  Force
    # fresh compiles with distinct shapes.
    for i, (B2, N2) in enumerate([(128, 16384), (64, 32768), (256, 8192)],
                                 start=1):
        fn2 = make_fn(B2, N2)
        x = jnp.zeros((B2, N2), jnp.uint32)
        t0 = time.time()
        try:
            out, ys = fn2(x, 32)
            np.asarray(ys)
            print(f"recompile {i} ({B2}x{N2}): ok "
                  f"({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"recompile {i} ({B2}x{N2}): FAIL "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            return
    print("PASS: pallas-in-scan stable across repeated calls AND "
          "recompiles", flush=True)


main()
