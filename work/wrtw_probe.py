"""WRTW A/B: engine-only transcode of a WRT-TRANSFORMED payload.

Transforms nat1m (or FILE env) with the shipped dictionary host-side,
then measures the raw transcoder on the transformed bytes with the
current env gates (set WRTW=0/1 outside).  Prints one line."""
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
    from cmix_tpu.engine import EngineConfig, MODE_ENCODE
    from cmix_tpu.runner import get_transcoder, _group_state, _split_blocks
    from cmix_tpu.preprocess.wrt import transform, Dictionary

    name = os.environ.get("FILE", "nat1m")
    data = open(f"/root/repo/testdata/{name}.raw", "rb").read()
    d = Dictionary("/root/repo/cmix_tpu/data/english.dic")
    if int(os.environ.get("WRTW", "0")) >= 2:
        from cmix_tpu.runner import _register_wrtw_tables
        _register_wrtw_tables(d, b"probe")
    payload, seg_meta = transform(data, d)
    cfg = EngineConfig(block_size=int(os.environ.get("BLKSZ", 1 << 17)),
                       tbits=int(os.environ.get("TBITS", 22)),
                       mbits=20, ibits=18, pbits=22,
                       lstm_hidden=256, seg_size=2048)
    trans = get_transcoder(cfg)
    blocks = _split_blocks(payload, cfg.block_size)
    b = blocks.shape[0]
    sh, pb = _group_state(cfg, b)
    t0 = time.time()
    _, _, out_len = trans(sh, pb, jnp.asarray(blocks),
                          jnp.zeros((b, cfg.comp_size), jnp.uint8),
                          jnp.int32(MODE_ENCODE))
    bpb = 8 * int(np.asarray(out_len).sum()) / len(data)
    print(f"{name}-wrt={bpb:.4f} (payload {len(payload)}B, "
          f"{time.time() - t0:.0f}s, WRTW={os.environ.get('WRTW', '0')})",
          flush=True)


main()
