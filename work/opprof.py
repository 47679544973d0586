"""Capture a device trace of byte_step and print per-op time ranking."""

import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cmix_tpu.engine import (
    EngineConfig, make_byte_step, init_shared, init_perblock, init_coder,
    MODE_ENCODE)

TRACE_DIR = "/root/repo/work/trace1"


def main():
    b = 256
    cfg = EngineConfig(block_size=1 << 14, tbits=18, mbits=18, ibits=16,
                       lstm_hidden=256, seg_size=256)
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
    import shutil
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jitted = jax.jit(one, donate_argnums=(0, 1, 2))
    out = jitted(sh, pb, cd, comp, byte_b)
    jax.block_until_ready(out)
    sh, pb, cd, ys = out
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            sh, pb, cd, ys = jitted(sh, pb, cd, comp, byte_b)
        jax.block_until_ready(ys)

    xs = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True))
    xs = xs[-1:]
    print("xplanes:", xs, file=sys.stderr)
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(xs, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    with open("/root/repo/work/hlo_stats_raw.txt", "w") as f:
        f.write(data)
    import json
    # newer xprof returns gviz JSON ({"cols":[...],"rows":[...]})
    tab = json.loads(data)
    colids = [c["id"] for c in tab["cols"]]
    rows = []
    for r in tab["rows"]:
        rows.append({cid: (cell or {}).get("v")
                     for cid, cell in zip(colids, r["c"])})
    tot = sum(float(r.get("total_self_time") or 0) for r in rows)
    rows.sort(key=lambda r: -float(r.get("total_self_time") or 0))
    print(f"total self time (us): {tot:,.0f}")
    for r in rows[:45]:
        t = float(r.get("total_self_time") or 0)
        cat = (r.get("category") or "")[:18]
        name = (r.get("hlo_op_name") or "")[:44]
        expr = (r.get("hlo_op_expression") or "")[:110]
        bw = r.get("measured_memory_bw") or 0
        print(f"{t:10,.0f} {100 * t / tot:5.1f}%  {cat:18s} {name:44s} "
              f"bw={float(bw):7.1f}  {expr}")


if __name__ == "__main__":
    main()
