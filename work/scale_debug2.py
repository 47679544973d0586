"""Pinpoint the scale desync: decode the payload block streams directly
and diff against the encode-side payload, before untransform.

Usage: scale_debug2.py MB [blk_log2] [tbits] [dict01]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

MB = float(sys.argv[1]) if len(sys.argv) > 1 else 2
BLK = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 18)
TBITS = int(sys.argv[3]) if len(sys.argv) > 3 else 22
DICT = (sys.argv[4] != "0") if len(sys.argv) > 4 else True


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass
    import numpy as np
    import jax.numpy as jnp
    from cmix_tpu.engine import EngineConfig, MODE_ENCODE, MODE_DECODE
    from cmix_tpu.runner import (
        get_transcoder, _group_state, _split_blocks, _load_dictionary,
        _pretrained_base, _vocab_bitmap, _vocab_force)
    from cmix_tpu.preprocess.wrt import (
        transform, block_strides, block_kinds, block_jpeg_coords)

    data = open("/root/repo/work/scale50m.raw", "rb").read()[
        :int(MB * (1 << 20))]
    d, dict_bytes, fp = (None, b"", None)
    base = None
    if DICT:
        d, dict_bytes, fp = _load_dictionary(
            "/root/repo/cmix_tpu/data/english.dic")
    payload, meta = transform(data, d)
    cfg = EngineConfig(block_size=BLK, tbits=TBITS, seg_size=2048)
    if DICT:
        base = _pretrained_base(cfg, dict_bytes)
    blocks = _split_blocks(payload, cfg.block_size)
    nb, n = blocks.shape[0], cfg.block_size
    vocab = _vocab_bitmap(payload)
    vforce = jnp.asarray(_vocab_force(vocab))
    frl = block_strides(meta, nb, n)
    bk = block_kinds(meta, nb, n)
    jc = block_jpeg_coords(meta, nb, n)
    trans = get_transcoder(cfg)

    def group(inp, comp, modes):
        sh, pb = _group_state(cfg, nb, base)
        sh["vocab_force"] = jnp.array(vforce)
        pb["rec_forced"] = jnp.asarray(frl)
        pb["blk_kind"] = jnp.asarray(bk)
        pb["jpeg_rel0"] = jnp.asarray(jc[0])
        pb["jpeg_clen"] = jnp.asarray(jc[1])
        return trans(sh, pb, jnp.asarray(inp), jnp.asarray(comp),
                     jnp.asarray(modes))

    t0 = time.time()
    comp0 = np.zeros((nb, cfg.comp_size), dtype=np.uint8)
    hist, out, out_len = group(
        blocks, comp0, np.full(nb, MODE_ENCODE, np.int32))
    out, out_len = np.asarray(out), np.asarray(out_len)
    print(f"enc {time.time()-t0:.0f}s lens={out_len.tolist()}", flush=True)

    comp = np.zeros((nb, cfg.comp_size), dtype=np.uint8)
    modes = np.full(nb, MODE_DECODE, np.int32)
    for i in range(nb):
        L = int(out_len[i])
        if L >= n:
            comp[i] = 0
            modes[i] = MODE_ENCODE
        else:
            comp[i, :L] = out[i, :L]
    inp = np.zeros((nb, n), dtype=np.uint8)
    for i in range(nb):
        if modes[i] == MODE_ENCODE:
            inp[i] = blocks[i]
    t0 = time.time()
    hist2, _, _ = group(inp, comp, modes)
    hist2 = np.asarray(hist2)
    print(f"dec {time.time()-t0:.0f}s", flush=True)
    bad = []
    for i in range(nb):
        diff = np.nonzero(hist2[i] != blocks[i])[0]
        if diff.size:
            bad.append((i, int(diff[0]), int(diff.size)))
    print("bad blocks (idx, first_byte, n_diff):", bad[:20], flush=True)
    if bad:
        i, j, _ = bad[0]
        print("enc bytes", blocks[i, j-4:j+8].tolist())
        print("dec bytes", hist2[i, j-4:j+8].tolist())
        print("seg of first diff:", j // cfg.seg_size,
              "pos in seg:", j % cfg.seg_size)


main()
