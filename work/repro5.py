"""Flake mitigation test: 3 transcodes, clear_caches between."""
import os, sys, time, gc
sys.path.insert(0, "/root/repo")
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass
import numpy as np
import jax.numpy as jnp
from cmix_tpu.engine import EngineConfig, MODE_ENCODE
from cmix_tpu.runner import get_transcoder, _group_state, _split_blocks

MODE = os.environ.get("MIT", "none")
cfg = EngineConfig(block_size=1 << 14, tbits=22, mbits=20, ibits=18,
                   pbits=22, lstm_hidden=256, seg_size=2048)
for it, name in enumerate(("text100k", "exe100k", "dict100k")):
    trans = get_transcoder(cfg)
    data = open(f"/root/repo/testdata/{name}.raw", "rb").read()
    blocks = _split_blocks(data, cfg.block_size)
    b = blocks.shape[0]
    sh, pb = _group_state(cfg, b)
    t0 = time.time()
    _, _, out_len = trans(sh, pb, jnp.asarray(blocks),
                          jnp.zeros((b, cfg.comp_size), jnp.uint8),
                          jnp.int32(MODE_ENCODE))
    print(f"{name}: bpb={8*int(np.asarray(out_len).sum())/len(data):.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    if MODE == "clear":
        from cmix_tpu import runner
        runner._TRANSCODER_CACHE.clear()
        del trans, sh, pb, out_len
        gc.collect()
        jax.clear_caches()
print("ALL THREE OK", flush=True)
