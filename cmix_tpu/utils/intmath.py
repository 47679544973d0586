"""Gather-free integer transcendentals: the portable-mode math substrate.

Portable archives (engine gate PORT=1) must decode bit-exactly on a
DIFFERENT executable -- other platform (TPU encode -> CPU decode), other
sharding, other XLA version.  Floating-point cannot give that: XLA may
contract mul+add into FMA, matmul accumulation order differs per
backend, and transcendentals (log/exp/sigmoid/tanh) are approximated
differently everywhere -- the same drift the reference documents for
``-Ofast`` archives (/root/reference/README:16).  Integer ops have none
of these failure modes: int add/mul/shift/div are exactly specified and
integer addition is associative, so ANY reduction order gives the same
result.

These routines therefore compute stretch (256*ln(p/(1-p))) and squash
(its inverse) entirely with vector integer ops -- binary-search
floor-log2, fixed-point polynomials for log2(1+u)/2^u, and integer
division.  No table gathers: dynamic gathers run at ~12 ns/element on
the TPU scalar core, while these are dense VPU ops.

Domains (matching the engine's packed slot fields):
  p12:  probability in [1, 4095], p = p12/4096
  st13: stretch in [1024, 7168] = round(256*ln(p/(1-p))) + 4096,
        i.e. +-12 ln units (the engine's ST_CLAMP)
  p16:  coder probability in [64, 65472]

Accuracy (tested): stretch13_from_p12 within 1 unit of the float64
rounding; squash12/squash16 within 2/24 units -- far below the model's
own quantization noise.  The POLY coefficients are frozen format
constants (FORMAT_VERSION bumps if they change).
"""

import numpy as np
import jax.numpy as jnp

ST13_BIAS = 4096
ST13_MIN, ST13_MAX = 1024, 7168          # +-12.0 in ln units * 256
_LOG2_C1, _LOG2_C2, _LOG2_C3 = 46559, -18915, 5124
#   log2(1+u) ~ (C1*u + C2*u^2 + C3*u^3) / 2^15, u in [0,1) 15-bit,
#   endpoint-exact least squares, |err| <= 1.1e-3 log2 units
_EXP2_C1, _EXP2_C2, _EXP2_C3 = 22804, 7371, 2593
#   2^u - 1   ~ (C1*u + C2*u^2 + C3*u^3) / 2^15, |err| <= 1.7e-4
_LN2_256_x16 = 2839                      # round(256*ln2 * 16)
_INV_LN2_256 = 2955                      # round(2^19 / (256*ln2))


def _floor_log2(x):
    """Elementwise floor(log2(x)) for int32 x >= 1 (< 2^24)."""
    e = jnp.zeros_like(x)
    for k in (16, 8, 4, 2, 1):
        big = x >= (1 << k)
        e = e + jnp.where(big, k, 0)
        x = jnp.where(big, x >> k, x)
    return e


def log2_fix15(x):
    """Elementwise log2(x) in 15-bit fixed point, x int32 in [1, 2^16)."""
    e = _floor_log2(x)
    m = x << (15 - e)                    # mantissa in [2^15, 2^16)
    u = m - (1 << 15)                    # frac in [0, 2^15)
    h = (_LOG2_C3 * u) >> 15
    h = ((h + _LOG2_C2) * u) >> 15
    h = ((h + _LOG2_C1) * u) >> 15
    return (e << 15) + h


def stretch13_from_p12(p12):
    """p12 [1,4095] -> st13 [1024,7168]; integer twin of
    round(256*ln(p/(1-p))) + 4096 (on the p+=0.5/4096 centering the
    engine's float path effectively uses via its clip)."""
    a = 2 * p12 + 1                      # center of the p12 bucket, /8192
    b = 2 * (4096 - p12) - 1
    ld = log2_fix15(a) - log2_fix15(b)   # log2(p/(1-p)), 15-bit frac
    st = (jnp.int32(ST13_BIAS)
          + (((ld >> 4) * _LN2_256_x16) >> 15))
    return jnp.clip(st, ST13_MIN, ST13_MAX)


def _exp2_parts(st13x):
    """For x = st13 - 4096 (+-3072): returns (z, k) with
    2^(x/(256 ln2)) = z * 2^(k-15), z in [2^15, 2^16)."""
    y = (st13x * _INV_LN2_256) >> 4      # log2-domain, 15-bit frac
    k = y >> 15                          # floor toward -inf (arith shift)
    g = y - (k << 15)                    # frac in [0, 2^15)
    h = (_EXP2_C3 * g) >> 15
    h = ((h + _EXP2_C2) * g) >> 15
    h = ((h + _EXP2_C1) * g) >> 15
    return (1 << 15) + h, k


def squash16(st13):
    """st13 -> p16 in [64, 65472]: integer twin of
    round(65536 * sigmoid((st13-4096)/256))."""
    st13 = jnp.clip(st13, ST13_MIN, ST13_MAX)
    z, k = _exp2_parts(st13 - ST13_BIAS)
    # p = z*2^(k-15) / (z*2^(k-15) + 1) = z / (z + 2^(15-k)); k<=15 side
    sh = 15 - k                              # in [-2, 33]
    shc = jnp.clip(sh, 0, 30).astype(jnp.uint32)
    denom = z.astype(jnp.uint32) + (jnp.uint32(1) << shc)
    num = z.astype(jnp.uint32) << jnp.uint32(16)
    p16 = (num // denom).astype(jnp.int32)
    p16 = jnp.where(sh > 30, 0, p16)         # p below representable floor
    return jnp.clip(p16, 64, 65472)


def squash12(st13):
    """st13 -> p12 in [1, 4095]."""
    st13 = jnp.clip(st13, ST13_MIN, ST13_MAX)
    z, k = _exp2_parts(st13 - ST13_BIAS)
    sh = 15 - k
    shc = jnp.clip(sh, 0, 30).astype(jnp.uint32)
    denom = (z.astype(jnp.uint32) + (jnp.uint32(1) << shc)).astype(jnp.int32)
    p12 = (z << 12) // denom
    p12 = jnp.where(sh > 30, 0, p12)
    return jnp.clip(p12, 1, 4095)


# ----------------------------------------------------- numpy reference twins


def stretch13_np(p12):
    p = (2.0 * np.asarray(p12, np.float64) + 1.0) / 8192.0
    st = np.rint(256.0 * np.log(p / (1.0 - p))) + 4096.0
    return np.clip(st, ST13_MIN, ST13_MAX).astype(np.int64)


def squash16_np(st13):
    x = (np.clip(np.asarray(st13, np.float64), ST13_MIN, ST13_MAX)
         - 4096.0) / 256.0
    return np.clip(np.rint(65536.0 / (1.0 + np.exp(-x))),
                   64, 65472).astype(np.int64)


def squash12_np(st13):
    x = (np.clip(np.asarray(st13, np.float64), ST13_MIN, ST13_MAX)
         - 4096.0) / 256.0
    return np.clip(np.rint(4096.0 / (1.0 + np.exp(-x))),
                   1, 4095).astype(np.int64)
