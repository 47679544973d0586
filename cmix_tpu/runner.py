"""Archive container + compress/decompress drivers + CLI.

Capability parity with the reference CLI runner (src/runner.cpp:270-330):
modes compress/decompress, archive header with original length
(runner.cpp:34-86), stored-block fallback (runner.cpp:96-99 `-s` / store
path), and the cross-entropy report (runner.cpp:322-327).  TPU-first
difference: the input is split into fixed-size blocks that are compressed
*in parallel* as a batch (the reference is strictly single-stream).

Archive format v1:
  magic 'TCMX' | u8 version | u8 flags | u8 log2(block_size) | u8 tbits
  | u8 mbits | u8 ibits | u64 orig_len | u32 n_blocks
  | n_blocks * u32 comp_len   (high bit set => block stored raw)
  | concatenated block streams
"""

import argparse
import struct
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from cmix_tpu.version import FORMAT_VERSION, MAGIC
from cmix_tpu.engine import (
    EngineConfig, init_state, make_transcoder, MODE_ENCODE, MODE_DECODE)

_RAW_FLAG = 0x80000000

_TRANSCODER_CACHE = {}


def get_transcoder(cfg: EngineConfig):
    if cfg not in _TRANSCODER_CACHE:
        _TRANSCODER_CACHE[cfg] = make_transcoder(cfg)
    return _TRANSCODER_CACHE[cfg]


def _batched_state(cfg, b):
    st = init_state(cfg)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (b,) + x.shape), st)


def _split_blocks(data: bytes, n: int):
    nb = max(1, -(-len(data) // n))
    arr = np.zeros((nb, n), dtype=np.uint8)
    flat = np.frombuffer(data, dtype=np.uint8)
    for i in range(nb):
        chunk = flat[i * n:(i + 1) * n]
        arr[i, :len(chunk)] = chunk
    return arr


def compress(data: bytes, cfg: EngineConfig = EngineConfig(),
             max_batch: int = 64) -> bytes:
    """Compress ``data`` into a TCMX archive."""
    n = cfg.block_size
    blocks = _split_blocks(data, n)
    nb = blocks.shape[0]
    trans = get_transcoder(cfg)

    streams = []
    for lo in range(0, nb, max_batch):
        batch = blocks[lo:lo + max_batch]
        b = batch.shape[0]
        state = _batched_state(cfg, b)
        comp0 = jnp.zeros((b, cfg.comp_size), dtype=jnp.uint8)
        _, out, out_len = trans(state, jnp.asarray(batch), comp0,
                                jnp.int32(MODE_ENCODE))
        out = np.asarray(out)
        out_len = np.asarray(out_len)
        for i in range(b):
            L = int(out_len[i])
            blk = bytes(batch[i].tobytes())
            if L >= n:                       # incompressible: store raw
                real = blk[:min(n, len(data) - (lo + i) * n)]
                streams.append((True, real))
            else:
                streams.append((False, bytes(out[i, :L].tobytes())))

    header = MAGIC + struct.pack(
        "<BBBBBBHQI", FORMAT_VERSION, 0, cfg.block_size.bit_length() - 1,
        cfg.tbits, cfg.mbits, cfg.ibits, cfg.lstm_hidden, len(data), nb)
    lens = b"".join(
        struct.pack("<I", (len(s) | (_RAW_FLAG if raw else 0)))
        for raw, s in streams)
    return header + lens + b"".join(s for _, s in streams)


def decompress(archive: bytes, max_batch: int = 64) -> bytes:
    assert archive[:4] == MAGIC, "bad magic"
    (ver, _flags, log_bs, tbits, mbits, ibits, lstm_hidden, orig_len,
     nb) = struct.unpack("<BBBBBBHQI", archive[4:4 + 20])
    assert ver == FORMAT_VERSION, f"format version {ver} unsupported"
    cfg = EngineConfig(block_size=1 << log_bs, tbits=tbits, mbits=mbits,
                       ibits=ibits, lstm_hidden=lstm_hidden)
    off = 4 + 20
    lens = struct.unpack("<" + "I" * nb, archive[off:off + 4 * nb])
    off += 4 * nb
    streams = []
    for L in lens:
        raw = bool(L & _RAW_FLAG)
        L &= ~_RAW_FLAG
        streams.append((raw, archive[off:off + L]))
        off += L

    trans = get_transcoder(cfg)
    n = cfg.block_size
    out_parts = [None] * nb
    coded = [(i, s) for i, (raw, s) in enumerate(streams) if not raw]
    for i, (raw, s) in enumerate(streams):
        if raw:
            out_parts[i] = s
    for lo in range(0, len(coded), max_batch):
        group = coded[lo:lo + max_batch]
        b = len(group)
        comp = np.zeros((b, cfg.comp_size), dtype=np.uint8)
        for j, (_, s) in enumerate(group):
            comp[j, :len(s)] = np.frombuffer(s, dtype=np.uint8)
        state = _batched_state(cfg, b)
        inp0 = jnp.zeros((b, n), dtype=jnp.uint8)
        hist, _, _ = trans(state, inp0, jnp.asarray(comp),
                           jnp.int32(MODE_DECODE))
        hist = np.asarray(hist)
        for j, (i, _) in enumerate(group):
            out_parts[i] = bytes(hist[j].tobytes())
    result = b"".join(out_parts)
    return result[:orig_len]


# ----------------------------------------------------------------------- CLI


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="tpu-cmix",
        description="TPU-native context-mixing compressor (cmix-class)")
    ap.add_argument("mode", choices=["c", "d", "t"],
                    help="c=compress d=decompress t=roundtrip-test")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--block-size", type=int, default=1 << 16)
    ap.add_argument("--tbits", type=int, default=18)
    ap.add_argument("--max-batch", type=int, default=64)
    args = ap.parse_args(argv)

    with open(args.input, "rb") as f:
        data = f.read()
    t0 = time.time()
    if args.mode in ("c", "t"):
        cfg = EngineConfig(block_size=args.block_size, tbits=args.tbits)
        out = compress(data, cfg, max_batch=args.max_batch)
        if args.mode == "t":
            back = decompress(out, max_batch=args.max_batch)
            assert back == data, "ROUNDTRIP FAILED"
        with open(args.output, "wb") as f:
            f.write(out)
        dt = time.time() - t0
        bpb = 8.0 * len(out) / max(1, len(data))
        print(f"{len(data)} bytes -> {len(out)} bytes in {dt:.2f} s")
        print(f"cross entropy: {bpb:.4f}")
    else:
        out = decompress(data, max_batch=args.max_batch)
        with open(args.output, "wb") as f:
            f.write(out)
        print(f"{len(data)} bytes -> {len(out)} bytes in "
              f"{time.time() - t0:.2f} s")


if __name__ == "__main__":
    main()
