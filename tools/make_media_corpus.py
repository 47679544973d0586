"""Build a NATURAL media test corpus (testdata/media/) from data that
ships with the installed packages -- real photo / terrain / signal
content, not synthetic noise (VERDICT.md r2 Weak #6: the media gates
were only ever measured on a mostly-noise corpus, which measures
nothing).

  photo24.bmp   grace_hopper.jpg decoded to 24-bit BMP (512x600 photo)
  photo8.bmp    same image, 8-bit grayscale BMP
  terrain8.bmp  jacksboro fault DEM, normalized to 8-bit grayscale
  signal16.wav  EEG traces scaled to 16-bit PCM mono WAV (real signal)
  grace_hopper.jpg  the JPEG itself (JPEGX probe input)

Deterministic; regenerate with `python tools/make_media_corpus.py`.
"""
import os
import struct

import numpy as np

SD = "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/sample_data"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "testdata", "media")


def write_bmp(path, arr):
    """Minimal BMP writer: arr (H, W) uint8 -> 8-bit paletted, or
    (H, W, 3) uint8 RGB -> 24-bit."""
    h, w = arr.shape[:2]
    gray = arr.ndim == 2
    bpp = 8 if gray else 24
    rowb = (w * (bpp // 8) + 3) & ~3
    pal = b"".join(struct.pack("<BBBB", i, i, i, 0)
                   for i in range(256)) if gray else b""
    off = 14 + 40 + len(pal)
    size = off + rowb * h
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, rowb * h,
                       2835, 2835, 256 if gray else 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):          # bottom-up
        if gray:
            r = arr[y].tobytes()
        else:
            r = arr[y, :, ::-1].tobytes()   # BGR
        rows.append(r + b"\0" * (rowb - len(r)))
    with open(path, "wb") as f:
        f.write(hdr + info + pal + b"".join(rows))


def write_wav(path, pcm16):
    n = len(pcm16) * 2
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                      16000, 2, 16))
        f.write(b"data" + struct.pack("<I", n) + pcm16.tobytes())


def main():
    os.makedirs(OUT, exist_ok=True)
    from PIL import Image
    img = Image.open(os.path.join(SD, "grace_hopper.jpg"))
    rgb = np.asarray(img.convert("RGB"))
    write_bmp(os.path.join(OUT, "photo24.bmp"), rgb)
    write_bmp(os.path.join(OUT, "photo8.bmp"),
              np.asarray(img.convert("L")))

    dem = np.load(os.path.join(SD, "jacksboro_fault_dem.npz"))["elevation"]
    lo, hi = float(dem.min()), float(dem.max())
    g = np.clip((dem - lo) / (hi - lo) * 255.0, 0, 255).astype(np.uint8)
    write_bmp(os.path.join(OUT, "terrain8.bmp"), g)

    eeg = np.fromfile(os.path.join(SD, "eeg.dat"), dtype=">f8")
    eeg = eeg[np.isfinite(eeg)]
    s = eeg - eeg.mean()
    s = s / max(1e-9, np.abs(s).max())
    pcm = np.round(s * 30000).astype("<i2")
    pcm = np.tile(pcm, 8)                   # ~100 KB of real signal
    write_wav(os.path.join(OUT, "signal16.wav"), pcm)

    import shutil
    shutil.copy(os.path.join(SD, "grace_hopper.jpg"),
                os.path.join(OUT, "grace_hopper.jpg"))
    for f in sorted(os.listdir(OUT)):
        print(f, os.path.getsize(os.path.join(OUT, f)))


if __name__ == "__main__":
    main()
