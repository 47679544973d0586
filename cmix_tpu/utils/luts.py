"""Deterministic integer LUTs: the numeric substrate of the format.

The reference mixes float (logistic sigmoid LUT, src/mixer/sigmoid.cpp:5-25)
and integer 12-bit probability domains (fxcmv1.cpp:153-189 squash/stretch,
paq8.cpp squash/stretch).  We standardize on the 12-bit integer domain for
everything that feeds the arithmetic coder, because integer math is exact:
XLA fusion/reassociation cannot change results, so encode==decode is
guaranteed even across recompilations.

Domains:
  p12:     probability in [1, 4095] representing p = p12/4096.
  stretch: st in [-2047, 2047] representing round(256*ln(p/(1-p))) clamped.
  p16:     coder probability in [1, 65535] (p16 = p12 << 4, clamped).

LUTs are generated once with float64 numpy and frozen to
``cmix_tpu/data/luts.npz`` at first import; the committed file is canonical
(regeneration must be bit-identical or FORMAT_VERSION bumps).
"""

import os

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "data")
_LUT_PATH = os.path.abspath(os.path.join(_DATA_DIR, "luts.npz"))

STRETCH_SCALE = 256.0  # st = 256 * ln(p/(1-p))
ST_MAX = 2047          # stretch clamp
P12_MAX = 4095


def _generate():
    # squash: st in [-2047,2047] -> p12 in [1,4095]
    x = np.arange(-ST_MAX, ST_MAX + 1, dtype=np.float64) / STRETCH_SCALE
    p = 1.0 / (1.0 + np.exp(-x))
    squash = np.clip(np.rint(p * 4096.0), 1, P12_MAX).astype(np.int32)

    # stretch: p12 in [0,4095] -> st in [-2047,2047]; p=0 treated as p=1/8192
    p12 = np.arange(4096, dtype=np.float64)
    pp = np.clip((p12 + 0.5) / 4096.0, 1e-6, 1 - 1e-6)
    st = np.clip(np.rint(STRETCH_SCALE * np.log(pp / (1.0 - pp))),
                 -ST_MAX, ST_MAX).astype(np.int32)

    # recip16[n] = round(65536 / (n + 1.5)): adaptive count-based learning
    # rates (reference Direct uses 1/(count+delta), src/models/direct.cpp:24)
    n = np.arange(1024, dtype=np.float64)
    recip16 = np.rint(65536.0 / (n + 1.5)).astype(np.int32)

    return {"squash": squash, "stretch": st, "recip16": recip16}


def _load():
    if os.path.exists(_LUT_PATH):
        with np.load(_LUT_PATH) as z:
            return {k: z[k] for k in z.files}
    luts = _generate()
    os.makedirs(os.path.dirname(_LUT_PATH), exist_ok=True)
    np.savez(_LUT_PATH, **luts)
    return luts


_LUTS = _load()
SQUASH_LUT = _LUTS["squash"]          # shape (4095*2+1,) int32, index st+2047
STRETCH_LUT = _LUTS["stretch"]        # shape (4096,) int32, index p12
RECIP16_LUT = _LUTS["recip16"]        # shape (1024,) int32


def squash_np(st):
    """Numpy reference: stretch -> p12."""
    st = np.clip(st, -ST_MAX, ST_MAX)
    return SQUASH_LUT[st + ST_MAX]


def stretch_np(p12):
    """Numpy reference: p12 -> stretch."""
    return STRETCH_LUT[np.clip(p12, 0, P12_MAX)]
