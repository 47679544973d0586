"""Benchmark: encode+decode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the measured reference cmix v21 on this repo's
corpus (work/baseline_measured.json: ~0.000123 MB/s combined enc+dec on
text100k, single CPU thread -- cmix has no parallelism, SURVEY.md 2.8).

Diagnostics (ratio, roundtrip, compile time) go to stderr; stdout carries
only the JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_corpus(mb=4):
    """4 MiB of NON-REPEATED mixed real data (testdata/bench4m.raw --
    GPL text, word list, ELF fragments, Python/JSON sources, Unicode
    tables; see tools/make_bench_corpus.py).  Round 1 repeated 300 KB
    ~13x, which let cross-block match models memorize the corpus and
    made the bench bpb meaningless as a ratio claim; this corpus has no
    repeated content (xz -6 reference: 1.414 bpb)."""
    p = "/root/repo/testdata/bench4m.raw"
    if os.path.exists(p):
        with open(p, "rb") as f:
            return f.read()[:mb << 20]
    blob = bytes(range(256)) * 4096         # degraded fallback
    need = mb << 20
    return (blob * (need // len(blob) + 1))[:need]


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from cmix_tpu.engine import EngineConfig, MODE_ENCODE, MODE_DECODE
    from cmix_tpu.runner import get_transcoder, _group_state, _split_blocks

    log(f"devices: {jax.devices()}")
    # Bench SPEED PROFILE (r5-measured; each lever documented):
    # - DMC_LEVELS=7 trims the DMC kernel's serial fetch chain
    #   (383 -> 191 fetches/block): +6.5% at +0.6% bpb (A1e).
    # - lstm_horizon=4 halves the BPTT window: +3% at +0.16% bpb (Cz2)
    #   (and is the v19 quality default too -- it WINS ratio at
    #   quality configs, Cz3).
    # - The v19 quality-default adoptions PPM_CK/PPM_DEEP/BANK_CH=3/
    #   CTX4 are pinned OFF here: at the bench's tbits=18 tables they
    #   cost ~7-10% speed with no measurable bpb return (A1d); the
    #   bench measures the throughput point of the frontier, and this
    #   block is the recorded definition of that point.
    import cmix_tpu.engine as _engine
    _engine.update_gates({"DMC_LEVELS": int(os.environ.get("BDMC_L", 7)),
                          "PPM_CK": int(os.environ.get("BPPM_CK", 0)),
                          "PPM_DEEP": int(os.environ.get("BPPM_DEEP", 0)),
                          "BANK_CH": int(os.environ.get("BBANK_CH", 1)),
                          "CTX4": int(os.environ.get("BCTX4", 0))})
    cfg = EngineConfig(block_size=1 << 14, tbits=18, mbits=18, ibits=16,
                       lstm_hidden=256, seg_size=2048,
                       dmc_nodes=int(os.environ.get("BDMC_N", 16384)),
                       lstm_horizon=int(os.environ.get("BLSTM_WIN", 4)))
    data = build_corpus(mb=4)
    blocks = _split_blocks(data, cfg.block_size)
    b = blocks.shape[0]
    trans = get_transcoder(cfg)
    comp0 = jnp.zeros((b, cfg.comp_size), dtype=jnp.uint8)
    inp = jnp.asarray(blocks)

    # --- encode (first call compiles)
    t0 = time.time()
    sh, pb = _group_state(cfg, b)
    hist, out, out_len = trans(sh, pb, inp, comp0, jnp.int32(MODE_ENCODE))
    out = np.asarray(out)
    out_len = np.asarray(out_len)
    t_compile_enc = time.time() - t0
    log(f"encode compile+first: {t_compile_enc:.1f}s")

    sh, pb = _group_state(cfg, b)
    t0 = time.time()
    hist, out_j, len_j = trans(sh, pb, inp, comp0, jnp.int32(MODE_ENCODE))
    out = np.asarray(out_j)
    out_len = np.asarray(len_j)
    enc_s = time.time() - t0
    comp_bytes = int(out_len.sum())
    mb = len(data) / (1 << 20)
    bpb = 8.0 * comp_bytes / len(data)
    log(f"encode: {enc_s:.2f}s  {mb / enc_s:.3f} MB/s  bpb={bpb:.3f}")

    # --- decode
    comp = np.zeros((b, cfg.comp_size), dtype=np.uint8)
    for i in range(b):
        comp[i, :out_len[i]] = out[i, :out_len[i]]
    sh, pb = _group_state(cfg, b)
    inp0 = jnp.zeros((b, cfg.block_size), dtype=jnp.uint8)
    compj = jnp.asarray(comp)
    t0 = time.time()
    hist2, _, _ = trans(sh, pb, inp0, compj, jnp.int32(MODE_DECODE))
    hist2 = np.asarray(hist2)
    dec_s = time.time() - t0
    ok = np.array_equal(hist2, blocks)
    log(f"decode: {dec_s:.2f}s  {mb / dec_s:.3f} MB/s  roundtrip: {ok}")

    if not ok:
        print(json.dumps({"metric": "encode+decode MB/s/chip",
                          "value": 0.0, "unit": "MB/s",
                          "vs_baseline": 0.0}))
        return

    value = 2 * mb / (enc_s + dec_s)
    baseline = 0.000123  # measured cmix combined enc+dec MB/s (text100k)
    # ratio anchor: reference cmix v21 on the first 100 KB of this very
    # corpus: 102400 -> 8804 B = 0.688 bpb (456 s, measured r3); our
    # engine on the same slice is the first blocks of this run.
    print(json.dumps({
        "metric": "encode+decode MB/s/chip (4MB mixed corpus, "
                  f"bpb={bpb:.3f}, roundtrip ok; cmix anchor on "
                  "the corpus' first 100KB: 0.688 bpb)",
        "value": round(value, 4),
        "unit": "MB/s",
        "vs_baseline": round(value / baseline, 1),
    }))


if __name__ == "__main__":
    main()
