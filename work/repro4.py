import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass
from cmix_tpu.engine import EngineConfig
from cmix_tpu.runner import compress, decompress
cfg = EngineConfig(block_size=1 << 14,
                   tbits=int(os.environ.get("TB", 23)),
                   mbits=int(os.environ.get("MB", 20)),
                   ibits=16, pbits=int(os.environ.get("PB", 20)),
                   lstm_hidden=256, seg_size=2048)
data = open("/root/repo/testdata/text100k.raw", "rb").read()[:65536]
t0 = time.time()
arch = compress(data, cfg, max_batch=8)
ok = decompress(arch) == data
print(f"headline-shape ok={ok} {len(arch)}B ({time.time()-t0:.0f}s)",
      flush=True)
