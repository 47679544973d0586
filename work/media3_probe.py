"""Media gates on the NATURAL corpus (testdata/media: real photo,
terrain, signal -- tools/make_media_corpus.py), full CLI pipeline so
detection/recoding/kind-routing all engage.  VERDICT r2 Weak #6: the
old probe corpus was synthetic noise."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

FILES = ["photo24.bmp", "photo8.bmp", "terrain8.bmp", "signal16.wav"]


def main():
    from cmix_tpu import engine
    from cmix_tpu.engine import EngineConfig
    import cmix_tpu.runner as runner

    cfg = EngineConfig(block_size=1 << 14, tbits=20, mbits=18, ibits=16,
                       lstm_hidden=256, seg_size=2048)
    combos = [
        ("base", {}),
        ("grid2", {"GRID2": 1}),
        ("grid2+lms2+kind", {"GRID2": 1, "LMS": 2, "MIX_KIND": 1}),
    ]
    for label, gates in combos:
        zero = {k: 0 for k in ("GRID2", "LMS", "MIX_KIND")}
        zero.update(gates)
        if engine.update_gates(zero):
            runner._TRANSCODER_CACHE.clear()
        tot_in = tot_out = 0
        t0 = time.time()
        per = []
        for f in FILES:
            data = open(f"/root/repo/testdata/media/{f}", "rb").read()
            arch = runner.compress(data, cfg)
            per.append(f"{f}:{len(arch)/len(data):.4f}")
            tot_in += len(data)
            tot_out += len(arch)
        print(f"{label}: total {tot_out/tot_in:.4f} "
              f"({' '.join(per)}) in {time.time()-t0:.0f}s", flush=True)


main()
