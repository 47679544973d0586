"""Quick bpb probe on real data: engine encode of testdata blocks.

Usage: ratio_probe.py [dmc_nodes] [file] [n_blocks]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass


def main():
    dmc_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    path = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/testdata/text100k.raw"
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    import os
    import cmix_tpu.engine as eng
    if "MIX_LR" in os.environ:
        eng.MIX_LR = float(os.environ["MIX_LR"])
    if "MIX_TAU" in os.environ:
        eng.MIX_TAU = float(os.environ["MIX_TAU"])
    from cmix_tpu.engine import EngineConfig, MODE_ENCODE
    from cmix_tpu.runner import get_transcoder, _group_state, _split_blocks
    print(f"lr={eng.MIX_LR} tau={eng.MIX_TAU}", end=" ")

    cfg = EngineConfig(
        block_size=1 << 14,
        tbits=int(os.environ.get("TBITS", 18)),
        mbits=int(os.environ.get("MBITS", 18)),
        ibits=int(os.environ.get("IBITS", 16)),
        pbits=int(os.environ.get("PBITS", 20)),
        lstm_hidden=int(os.environ.get("LSTM_H", 256)),
        lstm_layers=int(os.environ.get("LSTM_L", 2)),
        lstm_horizon=int(os.environ.get("LSTM_W", 8)),
        seg_size=2048, dmc_nodes=dmc_nodes)
    tags = [f"t/m/i/p={cfg.tbits}/{cfg.mbits}/{cfg.ibits}/{cfg.pbits}",
            f"W={cfg.lstm_horizon}"]
    if eng.MIX_BOOST:
        tags.append(f"boost={eng.MIX_BOOST}/{eng.MIX_BOOST_N:g}")
    if len(eng.PPM_ORDERS) != 10:
        tags.append(f"ppm={len(eng.PPM_ORDERS)}")
    if eng.MATCH_ORDERS != (5, 8, 12, 20):
        tags.append(f"match={len(eng.MATCH_ORDERS)}")
    if eng.N_SBANK != 10:
        tags.append(f"sbank={eng.N_SBANK}")
    if eng.N_IND != 4:
        tags.append(f"ind={eng.N_IND}")
    if eng.PPM_EXCL:
        tags.append("excl")
    if eng.MIX_AUX:
        tags.append("aux2")
    if eng.MIX_DYN2:
        tags.append("dyn2")
    if eng.VMATCH:
        tags.append("vm")
    print(" ".join(tags), end=" ")
    data = open(path, "rb").read()[:nb << 14]
    blocks = _split_blocks(data, cfg.block_size)
    b = blocks.shape[0]
    trans = get_transcoder(cfg)
    comp0 = jnp.zeros((b, cfg.comp_size), dtype=jnp.uint8)
    sh, pb = _group_state(cfg, b)
    t0 = time.time()
    hist, out, out_len = trans(sh, pb, jnp.asarray(blocks), comp0,
                               jnp.int32(MODE_ENCODE))
    dt = time.time() - t0
    comp = int(np.asarray(out_len).sum())
    bpb = 8.0 * comp / len(data)
    print(f"dmc={dmc_nodes} file={path.split('/')[-1]} n={len(data)} "
          f"-> {comp} bytes  bpb={bpb:.4f}  ({dt:.0f}s)")


if __name__ == "__main__":
    main()
