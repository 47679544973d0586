"""Encode-only bpb probe on the three 100KB parity files (one compile,
three runs -- same shapes).  Reference bars (cmix v21 -n, measured):
text100k 0.642 | exe100k 1.567 | dict100k 2.148."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from cmix_tpu.engine import EngineConfig, MODE_ENCODE
    from cmix_tpu.runner import get_transcoder, _group_state, _split_blocks

    cfg = EngineConfig(block_size=int(os.environ.get("BLKSZ", 1 << 14)),
                       tbits=int(os.environ.get("TBITS", 22)),
                       mbits=int(os.environ.get("MBITS", 20)),
                       ibits=int(os.environ.get("IBITS", 18)),
                       pbits=int(os.environ.get("PBITS", 22)),
                       lstm_hidden=int(os.environ.get("LSTM_H", 256)),
                       lstm_horizon=int(os.environ.get("LSTM_WIN", 8)),
                       dmc_nodes=int(os.environ.get("DMC_N", 16384)),
                       seg_size=int(os.environ.get("SEGSZ", 2048)))
    trans = get_transcoder(cfg)
    res = []
    t00 = time.time()
    for name in ("text100k", "exe100k", "dict100k"):
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
        res.append(f"{name}={bpb:.4f}({time.time() - t0:.0f}s)")
        print(res[-1], flush=True)
    print("TOTAL", " ".join(res), f"{time.time() - t00:.0f}s", flush=True)


main()
