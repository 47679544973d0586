"""Flake-proof probe harness (round 4+): one file per SUBPROCESS.

The axon tunnel accumulates server-side reservations across a process's
transcoder executions (work/RESULTS.md r3 'Backend flake'), so probe3's
three-files-one-process layout started failing on the second file at
big-table configs.  This harness execs itself per file; gate env vars
pass through; the compile cache makes the per-file restart cheap.

Usage (same env knobs as probe3):  python work/probe4.py
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

FILES = tuple(os.environ.get(
    "FILES", "text100k,exe100k,dict100k").split(","))


def run_one(name):
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass
    import numpy as np
    import jax.numpy as jnp
    from cmix_tpu.engine import EngineConfig, MODE_ENCODE
    from cmix_tpu.runner import get_transcoder, _group_state, _split_blocks

    cfg = EngineConfig(block_size=int(os.environ.get("BLKSZ", 1 << 14)),
                       tbits=int(os.environ.get("TBITS", 22)),
                       mbits=int(os.environ.get("MBITS", 20)),
                       ibits=int(os.environ.get("IBITS", 18)),
                       pbits=int(os.environ.get("PBITS", 22)),
                       lstm_hidden=int(os.environ.get("LSTM_H", 256)),
                       lstm_horizon=int(os.environ.get("LSTM_WIN", 8)),
                       dmc_nodes=int(os.environ.get("DMC_N", 16384)),
                       seg_size=int(os.environ.get("SEGSZ", 2048)))
    trans = get_transcoder(cfg)
    data = open(f"/root/repo/testdata/{name}.raw", "rb").read()
    blocks = _split_blocks(data, cfg.block_size)
    b = blocks.shape[0]
    sh, pb = _group_state(cfg, b)
    t0 = time.time()
    _, _, out_len = trans(
        sh, pb, jnp.asarray(blocks),
        jnp.zeros((b, cfg.comp_size), jnp.uint8),
        jnp.int32(MODE_ENCODE))
    bpb = 8 * int(np.asarray(out_len).sum()) / len(data)
    print(f"{name}={bpb:.4f}({time.time() - t0:.0f}s)", flush=True)


def main():
    if os.environ.get("PROBE_SCRIPT"):
        # queue-runner dispatch: run an arbitrary probe script instead
        # (single-compile-per-process discipline is the script's job)
        os.execv(sys.executable,
                 [sys.executable, os.environ["PROBE_SCRIPT"]])
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
        return
    t00 = time.time()
    outs = []
    settle = int(os.environ.get("SETTLE", 60))
    for i, name in enumerate(FILES):
        if i and settle:
            time.sleep(settle)   # let the previous client's teardown
            #                      drain on the tunnel server
        r = subprocess.run([sys.executable, __file__, name],
                           capture_output=True, text=True, timeout=2400)
        line = [l for l in r.stdout.splitlines() if l.startswith(name)]
        outs.append(line[0] if line else f"{name}=FAIL")
        print(outs[-1], flush=True)
        if not line:
            sys.stderr.write(r.stderr[-1500:] + "\n")
    print("TOTAL", " ".join(outs), f"{time.time() - t00:.0f}s", flush=True)


main()
