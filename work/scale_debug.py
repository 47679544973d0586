"""Bisect the 50 MiB scale decode desync.

Runs compress+decompress on a corpus slice at the scale config
(blk=256K, tbits=22, dict, scale gates) and reports the first
mismatching block.  Usage: scale_debug.py MB [blk_log2] [tbits] [dict01]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

MB = float(sys.argv[1]) if len(sys.argv) > 1 else 2
BLK = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 18)
TBITS = int(sys.argv[3]) if len(sys.argv) > 3 else 22
DICT = (sys.argv[4] != "0") if len(sys.argv) > 4 else True


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass
    import numpy as np
    from cmix_tpu.engine import EngineConfig
    from cmix_tpu.runner import compress, decompress

    data = open("/root/repo/work/scale50m.raw", "rb").read()[
        :int(MB * (1 << 20))]
    dic = "/root/repo/cmix_tpu/data/english.dic" if DICT else None
    cfg = EngineConfig(block_size=BLK, tbits=TBITS, seg_size=2048)
    t0 = time.time()
    arch = compress(data, cfg, max_batch=256, dictionary=dic)
    print(f"enc {len(data)} -> {len(arch)} in {time.time()-t0:.0f}s",
          flush=True)
    try:
        back = decompress(arch, max_batch=256, dictionary=dic)
        ok = back == data
        print("roundtrip", ok, flush=True)
        if not ok:
            n = min(len(back), len(data))
            for j in range(n):
                if back[j] != data[j]:
                    print("first mismatch at", j, "block", j // BLK)
                    break
    except Exception as e:
        print("DECODE FAIL:", e, flush=True)


main()
