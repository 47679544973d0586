import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
if os.environ.get("USE_CACHE", "1") != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    except Exception:
        pass
import numpy as np
import jax.numpy as jnp
from cmix_tpu.engine import EngineConfig, MODE_ENCODE
from cmix_tpu.runner import get_transcoder, _group_state, _split_blocks

cfg = EngineConfig(block_size=1 << 14,
                   tbits=int(os.environ.get("TB", 22)),
                   mbits=20, ibits=18, pbits=22,
                   lstm_hidden=int(os.environ.get("LH", 256)),
                   seg_size=2048)
trans = get_transcoder(cfg)
data = open("/root/repo/testdata/text100k.raw", "rb").read()[:32768]
blocks = _split_blocks(data, cfg.block_size)
b = blocks.shape[0]
sh, pb = _group_state(cfg, b)
t0 = time.time()
_, _, out_len = trans(sh, pb, jnp.asarray(blocks),
                      jnp.zeros((b, cfg.comp_size), jnp.uint8),
                      jnp.int32(MODE_ENCODE))
print(f"ok lens={np.asarray(out_len).tolist()} ({time.time()-t0:.0f}s)",
      flush=True)
