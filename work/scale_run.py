"""Scale run (VERDICT item 4): compress a ~64 MiB non-repeated corpus
end-to-end through the CLI pipeline (segmentation + engine), decode it
back, and record bpb / MB/s / wall / peak RSS.

Usage: scale_run.py [mb] [blk_log2] [max_batch] [tbits]
Env DICT=path|auto enables the WRT dictionary + pretraining pipeline.
Corpus: distinct Python/JSON/text sources from site-packages (deduped,
deterministic sorted walk) -- enwik8-class volume; regenerated on the
fly, not committed.
"""
import hashlib
import os
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 64
BLK = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 14)
MAXB = int(sys.argv[3]) if len(sys.argv) > 3 else 256
TBITS = int(sys.argv[4]) if len(sys.argv) > 4 else 18


def build_corpus(need):
    cache = f"/root/repo/work/scale{need >> 20}m.raw"
    if os.path.exists(cache) and os.path.getsize(cache) == need:
        return open(cache, "rb").read()
    sp = "/opt/venv/lib/python3.12/site-packages"
    seen, parts, total = set(), [], 0
    for exts in ((".py",), (".json", ".txt", ".h")):
        for dp, dn, fn in sorted(os.walk(sp)):
            dn.sort()
            for f in sorted(fn):
                if not f.endswith(exts):
                    continue
                try:
                    b = open(os.path.join(dp, f), "rb").read()
                except OSError:
                    continue
                if not (512 <= len(b) <= 500000):
                    continue
                h = hashlib.sha256(b).digest()
                if h in seen:
                    continue
                seen.add(h)
                parts.append(b)
                total += len(b)
                if total >= need:
                    blob = b"".join(parts)[:need]
                    open(cache, "wb").write(blob)
                    return blob
        if total >= need:
            break
    raise SystemExit(f"only {total} bytes available")


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass
    from cmix_tpu.engine import EngineConfig
    from cmix_tpu.runner import compress, decompress

    data = build_corpus(MB << 20)
    cfg = EngineConfig(block_size=BLK, tbits=TBITS,
                      mbits=int(os.environ.get("MBITS", 20)),
                      ibits=int(os.environ.get("IBITS", 16)),
                      pbits=int(os.environ.get("PBITS", 20)),
                      seg_size=2048)
    dic = os.environ.get("DICT")
    if dic == "auto":
        dic = "/root/repo/cmix_tpu/data/english.dic"
    print(f"corpus {len(data)} B  blk={BLK} maxb={MAXB} tbits={TBITS} "
          f"dict={dic}", flush=True)
    t0 = time.time()
    arch = compress(data, cfg, max_batch=MAXB, dictionary=dic,
                    resume_path="/root/repo/work/scale.resume")
    enc_s = time.time() - t0
    bpb = 8 * len(arch) / len(data)
    print(f"ENC {len(data)} -> {len(arch)} bytes  bpb={bpb:.4f}  "
          f"{enc_s:.0f}s  {len(data) / enc_s / 1e6:.3f} MB/s", flush=True)
    open("/root/repo/work/scale.tcmx", "wb").write(arch)
    t0 = time.time()
    back = decompress(arch, max_batch=MAXB, dictionary=dic)
    dec_s = time.time() - t0
    ok = back == data
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"DEC {dec_s:.0f}s  {len(data) / dec_s / 1e6:.3f} MB/s  "
          f"roundtrip={ok}  peak_rss={rss:.2f} GB", flush=True)


main()
