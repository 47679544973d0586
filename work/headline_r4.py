"""Round-4 headline scale run: 110 MiB NATURAL TEXT, tbits=24, roundtrip.

VERDICT #4 + #6 in one run: natural-language corpus (not site-packages
code), reference-anchored at its 100 KB / 1 MiB prefixes (cmix -n run
on the same bytes), at the never-before-run tbits=24 capacity, with
full decode + byte-compare.  Uses the public API (compress/decompress)
so preprocessing, dictionary pretraining, resume journal, and the
archive container are all in the loop.
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass


def main():
    from cmix_tpu.engine import EngineConfig
    from cmix_tpu import runner

    with open("/root/repo/testdata/text100m.raw", "rb") as f:
        data = f.read()
    print(f"corpus: {len(data)} bytes "
          f"sha {hashlib.sha256(data).hexdigest()[:16]}", flush=True)
    cfg = EngineConfig(block_size=1 << 18, tbits=24, mbits=22, ibits=18,
                       pbits=23, lstm_hidden=256, seg_size=2048)
    dic = "/root/repo/cmix_tpu/data/english.dic"
    t0 = time.time()
    arch = runner.compress(data, cfg, max_batch=192, dictionary=dic,
                           resume_path="/root/repo/work/headline_r4.resume")
    enc_s = time.time() - t0
    bpb = 8.0 * len(arch) / len(data)
    print(f"ENC {len(data)} -> {len(arch)} bytes  bpb={bpb:.4f}  "
          f"{enc_s:.0f}s  {len(data) / (1 << 20) / enc_s:.3f} MB/s",
          flush=True)
    with open("/root/repo/work/headline_r4.tcmx", "wb") as f:
        f.write(arch)
    t0 = time.time()
    back = runner.decompress(arch, max_batch=192, dictionary=dic)
    dec_s = time.time() - t0
    ok = back == data
    print(f"DEC {dec_s:.0f}s  {len(data) / (1 << 20) / dec_s:.3f} MB/s  "
          f"roundtrip={ok}", flush=True)
    import resource
    print(f"peak_rss={resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6:.2f} GB",
          flush=True)


main()
