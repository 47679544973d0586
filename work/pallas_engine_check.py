"""Engine-level Pallas stability check (r5): DMC_PALLAS=1, TWO
transcoder compiles+runs in ONE process — the exact r3 crash mode
("TPU backend error (Internal)" on the second transcode).  PASS here
(plus work/pallas_repro.py) clears the way to flip DMC_PALLAS default
and build the bank row-update kernel class.
"""
import os
import sys
import time

os.environ["DMC_PALLAS"] = "1"
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


def one(name, blksz, tbits):
    cfg = EngineConfig(block_size=blksz, tbits=tbits, mbits=tbits - 2,
                       ibits=18, pbits=tbits, lstm_hidden=256,
                       seg_size=2048)
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
    print(f"{name} tbits={tbits}: bpb={bpb:.4f} ({time.time() - t0:.0f}s)",
          flush=True)


one("text100k", 1 << 14, 22)
one("text100k", 1 << 15, 22)   # different shape => fresh compile
print("PASS: two pallas-in-scan transcodes in one process", flush=True)
