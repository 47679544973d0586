"""JPEGX/GRID2/MIX_KIND gates on a real JPEG (grace_hopper, 61306 B).

Target (VERDICT item 7): archive <= 0.88x original.  Round-1 recoded
baseline: 0.952x.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

path = ("/opt/venv/lib/python3.12/site-packages/matplotlib/"
        "mpl-data/sample_data/grace_hopper.jpg")


def main():
    from cmix_tpu import engine
    from cmix_tpu.engine import EngineConfig
    import cmix_tpu.runner as runner

    with open(path, "rb") as f:
        data = f.read()
    os.environ["CMIX_JPEGC"] = "1"
    cfg = EngineConfig(block_size=1 << 14, tbits=20, mbits=18, ibits=16,
                       lstm_hidden=256, seg_size=2048)
    combos = [
        ("base", {}),
        ("jpegx", {"JPEGX": 1}),
        ("jpegx+grid2", {"JPEGX": 1, "GRID2": 1}),
        ("jpegx+grid2+kind", {"JPEGX": 1, "GRID2": 1, "MIX_KIND": 1}),
    ]
    for label, gates in combos:
        zero = {k: 0 for k in ("JPEGX", "GRID2", "MIX_KIND")}
        zero.update(gates)
        if engine.update_gates(zero):
            runner._TRANSCODER_CACHE.clear()
        t0 = time.time()
        arch = runner.compress(data, cfg)
        print(f"{label}: {len(data)} -> {len(arch)} "
              f"({len(arch) / len(data):.4f}) in {time.time() - t0:.0f}s",
              flush=True)


main()
