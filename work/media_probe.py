"""Media routing probe (VERDICT item 6): BMP + WAV corpus, gates off vs
kind-routed media models (LMS=2 strided LPC + GRID2 pixel contexts +
MIX_KIND filetype-gated mixer rows).  Set gates via env; prints bpb."""
import os
import struct
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def bmp24(w, h, seed):
    """Smooth shaded 24bpp image + mild noise (predictable pixels)."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (96 + 80 * np.sin(x / 37.0) * np.cos(y / 23.0)
            + 40 * (x + y) / (w + h))
    img = np.stack([base + 12 * np.sin(x / 11.0),
                    base,
                    base - 10 * np.cos(y / 7.0)], axis=2)
    img = np.clip(img + rng.randn(h, w, 3) * 3, 0, 255).astype(np.uint8)
    row = w * 3
    pad = (-row) % 4
    pixels = b"".join(img[h - 1 - r].tobytes() + b"\0" * pad
                      for r in range(h))
    off = 54
    hdr = (b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(pixels), 2835, 2835, 0, 0))
    return hdr + pixels


def wav16(n, seed):
    """Two-channel 16-bit sine mixture + mild noise."""
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    sig = (6000 * np.sin(2 * np.pi * t / 97.0)
           + 3000 * np.sin(2 * np.pi * t / 23.0))
    l = np.clip(sig + rng.randn(n) * 120, -32000, 32000).astype("<i2")
    r = np.clip(0.8 * sig + rng.randn(n) * 120, -32000, 32000).astype("<i2")
    frames = np.stack([l, r], 1).tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(frames)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100,
                                   44100 * 4, 4, 16)
           + b"data" + struct.pack("<I", len(frames)))
    return hdr + frames


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass
    from cmix_tpu.engine import EngineConfig
    from cmix_tpu.runner import compress

    data = (bmp24(320, 200, 1) + wav16(60000, 2) + bmp24(200, 160, 3))
    cfg = EngineConfig(block_size=1 << 14, tbits=20, seg_size=2048)
    t0 = time.time()
    arch = compress(data, cfg, max_batch=32)
    bpb = 8 * len(arch) / len(data)
    print(f"media corpus {len(data)} B -> {len(arch)}  bpb={bpb:.4f} "
          f"({time.time() - t0:.0f}s)  gates: LMS={os.environ.get('LMS')} "
          f"GRID2={os.environ.get('GRID2')} "
          f"MIX_KIND={os.environ.get('MIX_KIND')}", flush=True)


main()
