"""tp-capacity ratio point (VERDICT r4 #7): does tp=2 at DOUBLE table
capacity buy ratio over tp=1 at single capacity -- the entire
justification of the tp axis (parallel/mesh.py tp sharding).

Runs on a 2-device virtual CPU mesh.  Usage:
    TP=1 TBITS=22 python work/tp_capacity.py   # baseline
    TP=2 TBITS=23 python work/tp_capacity.py   # doubled, tp-sharded
Prints one line: tpcap tp=<n> tbits=<n> bpb=<x> (<s>s, <bytes>B)
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp


def main():
    from cmix_tpu.engine import EngineConfig, MODE_ENCODE
    from cmix_tpu.runner import get_transcoder, _group_state, _split_blocks
    from cmix_tpu.parallel import mesh as pmesh

    tp = int(os.environ.get("TP", 1))
    tbits = int(os.environ.get("TBITS", 22))
    nbytes = int(os.environ.get("NBYTES", 1 << 20))
    data = open("/root/repo/testdata/nat1m.raw" if os.path.exists("/root/repo/testdata/nat1m.raw") else "/root/repo/testdata/text100k.raw", "rb").read()[:nbytes]
    cfg = EngineConfig(block_size=int(os.environ.get("BLKSZ", 1 << 17)),
                       tbits=tbits, mbits=int(os.environ.get("MBITS", 20)),
                       ibits=16, pbits=int(os.environ.get("PBITS", 22)),
                       lstm_hidden=int(os.environ.get("LSTM_H", 256)),
                       seg_size=2048)
    blocks = _split_blocks(data, cfg.block_size)
    b = blocks.shape[0]
    t0 = time.time()
    if tp == 1:
        trans = get_transcoder(cfg)
        sh, pb = _group_state(cfg, b)
        _, out, out_len = trans(
            sh, pb, jnp.asarray(blocks),
            jnp.zeros((b, cfg.comp_size), jnp.uint8),
            jnp.int32(MODE_ENCODE))
    else:
        m = pmesh.make_mesh(1, tp)
        trans = pmesh.make_sharded_transcoder(cfg, m)
        sh, pb = pmesh.sharded_group_state(cfg, b, m)
        _, out, out_len = trans(
            sh, pb, jnp.asarray(blocks),
            np.zeros((b, cfg.comp_size), np.uint8), MODE_ENCODE)
    total = int(np.asarray(out_len).sum())
    bpb = 8.0 * total / len(data)
    print(f"tpcap tp={tp} tbits={tbits} bpb={bpb:.4f} "
          f"({time.time() - t0:.0f}s, {total}B)", flush=True)


main()
