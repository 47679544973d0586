"""Speed-ratio frontier point (VERDICT r4 #8): one (B, bpb, MB/s) point
at the QUALITY config (tbits=22, 128 KB blocks) on natural text.

Env: FB = number of blocks (1/8/64/256); data = first FB*128KB of
testdata/text100m.raw.  Encodes cold (compile), encodes hot (timed),
decodes (timed), asserts byte-equality.  Prints one line.
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

import numpy as np
import jax.numpy as jnp


def main():
    from cmix_tpu.engine import EngineConfig, MODE_ENCODE, MODE_DECODE
    from cmix_tpu.runner import get_transcoder, _group_state, _split_blocks

    fb = int(os.environ.get("FB", 8))
    blk = int(os.environ.get("BLKSZ", 1 << 17))
    data = open("/root/repo/testdata/text100m.raw", "rb").read(fb * blk)
    cfg = EngineConfig(block_size=blk,
                       tbits=int(os.environ.get("TBITS", 22)),
                       mbits=20, ibits=18, pbits=22,
                       lstm_hidden=256, seg_size=2048)
    trans = get_transcoder(cfg)
    blocks = _split_blocks(data, cfg.block_size)
    b = blocks.shape[0]
    assert b == fb, (b, fb)
    inp = jnp.asarray(blocks)
    comp0 = jnp.zeros((b, cfg.comp_size), jnp.uint8)

    t0 = time.time()
    sh, pb = _group_state(cfg, b)
    _, comp, clen = trans(sh, pb, inp, comp0, jnp.int32(MODE_ENCODE))
    comp = jax.block_until_ready(comp)
    t_cold = time.time() - t0

    sh, pb = _group_state(cfg, b)
    t0 = time.time()
    _, comp, clen = trans(sh, pb, inp, comp0, jnp.int32(MODE_ENCODE))
    comp = jax.block_until_ready(comp)
    t_enc = time.time() - t0

    sh, pb = _group_state(cfg, b)
    t0 = time.time()
    dec, _, _ = trans(sh, pb, jnp.zeros_like(inp), comp,
                      jnp.int32(MODE_DECODE))
    dec = jax.block_until_ready(dec)
    t_dec = time.time() - t0

    ok = np.asarray(dec).astype(np.uint8).tobytes()[:len(data)] == data
    bpb = 8 * int(np.asarray(clen).sum()) / len(data)
    mb = len(data) / (1 << 20)
    print(f"frontier B={fb} bpb={bpb:.4f} enc={mb / t_enc:.5f}MB/s "
          f"dec={mb / t_dec:.5f}MB/s cold={t_cold:.0f}s "
          f"roundtrip={ok}", flush=True)


main()
