"""Encode-only bpb probe on the bench corpus (shrunk) -- for bisecting
the bench-bpb regression. Usage: regress_probe.py [mb] [repo_root]"""
import os
import sys
import time

root = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
sys.path.insert(0, root)
mb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0


def build_corpus(mb):
    # non-repeated mixed corpus (see tools/make_bench_corpus.py)
    with open("/root/repo/testdata/bench4m.raw", "rb") as f:
        blob = f.read()
    need = int(mb * (1 << 20))
    assert need <= len(blob), "corpus only has 4 MiB of distinct data"
    return blob[:need]


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
                       tbits=int(os.environ.get("TBITS", 18)),
                       mbits=int(os.environ.get("MBITS", 18)),
                       ibits=int(os.environ.get("IBITS", 16)),
                       pbits=int(os.environ.get("PBITS", 20)),
                       lstm_hidden=int(os.environ.get("LSTM_H", 256)),
                       lstm_horizon=int(os.environ.get("LSTM_WIN", 8)),
                       dmc_nodes=int(os.environ.get("DMC_N", 16384)),
                       seg_size=int(os.environ.get("SEGSZ", 2048)))
    data = build_corpus(mb)
    blocks = _split_blocks(data, cfg.block_size)
    b = blocks.shape[0]
    trans = get_transcoder(cfg)
    comp0 = jnp.zeros((b, cfg.comp_size), dtype=jnp.uint8)
    inp = jnp.asarray(blocks)
    t0 = time.time()
    sh, pb = _group_state(cfg, b)
    _, out, out_len = trans(sh, pb, inp, comp0, jnp.int32(MODE_ENCODE))
    out_len = np.asarray(out_len)
    t1 = time.time() - t0
    comp_bytes = int(out_len.sum())
    bpb = 8.0 * comp_bytes / len(data)
    hot = ""
    if os.environ.get("PROBE_HOT") == "1":   # second pass: compile cached
        t0 = time.time()
        sh, pb = _group_state(cfg, b)
        _, _, _ = trans(sh, pb, inp, comp0, jnp.int32(MODE_ENCODE))
        hot = f" hot={time.time()-t0:.0f}s"
    print(f"corpus={len(data)} b={b} -> {comp_bytes} bytes "
          f"bpb={bpb:.4f} ({t1:.0f}s{hot})", flush=True)


main()
