"""Portable integer LSTM byte mixer (the PORT-profile twin of lstm.py).

The float LSTM cannot be part of the portable format: its weights evolve
by float matmuls whose accumulation order differs per executable, so
encode/decode on different builds diverge -- exactly the reference's
``-Ofast`` archive-portability failure (/root/reference/README:16).
Until round 4 the portable profile simply amputated the LSTM
(lstm_hidden=0, ~+2.8% bpb on text).  This module is a re-specified
integer LSTM: every operation is int32 add/mul/shift/div (associative,
exactly specified on every backend -- the utils/intmath.py argument), so
the PORT profile keeps a recurrent byte model.

Spec differences from the float twin (this is a DIFFERENT, format-
defining algorithm, not an approximation of lstm.cpp):

* one layer, fused gates (input gate = 1 - forget, the reference's
  coupling, src/mixer/lstm-layer.cpp:75).  The coupling bounds the cell
  state to +-1.0 by induction, which replaces layer norm as the
  stability mechanism (integer LN would need integer rsqrt for a
  quantity the backward pass also needs; the coupled cell makes both
  unnecessary).
* truncated BPTT over the engine's horizon window with the loss
  injected at every position (like lstm.cpp:87-118), backward pass
  hand-derived in fixed point (jax.grad cannot differentiate integer
  ops -- and a float backward would break portability anyway).
* plain SGD with gradient clipping instead of Adam (integer Adam needs
  a per-weight Newton isqrt each byte; measured quality kept within the
  portable bar without it).

Fixed-point domains:
  activations h, c, gate outputs: Q12 (4096 = 1.0), |.| <= 4096
  pre-activations, gradients:     Q12, clipped
  weights Wh/Wo:                  Q16, |.| <= 4*65536 (keeps the hi/lo
                                  split dot exact over H=256 sums)
  weights Wx/b/bo:                Q12 pre-activation contributions
  qcum:                           int32 cumulative, ~2^16 total
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from cmix_tpu.utils.intmath import squash12

W_CLIP = 4 * 65536          # Q16 weight bound (exactness of _dot16)
PRE_CLIP = 32760            # Q12 pre-activation bound (+-8 real)
G_CLIP = 1 << 14            # per-step gradient bound (+-4 in Q12)
# Every gradient contraction below pre-shifts its factors so the int32
# sum over B <= 256 blocks stays under 2^31 -- the exactness contract.


@dataclass(frozen=True)
class ILstmConfig:
    hidden: int = 256
    horizon: int = 8

    def __post_init__(self):
        # exactness bound of _dot16: |a| <= 4096 (Q12) times
        # |w_hi| <= W_CLIP >> 8 = 1024 times H must stay below 2^31;
        # H = 256 leaves 4x margin, H = 512 can hit exactly 2^31 with
        # saturated weights (wraparound would be backend-lowering
        # dependent, breaking the portable profile's contract)
        if self.hidden > 256:
            raise ValueError(
                f"ILstm hidden={self.hidden} > 256 breaks the _dot16 "
                "int32 exactness bound (PORT profile)")
    lr_wx: int = 192         # Q16 learning rates (lr/65536 per unit grad)
    lr_wh: int = 96
    lr_wo: int = 96
    lr_b: int = 48
    # Integer Adam-class optimizer (gate ILSTM_ADAM; VERDICT r4 #9).
    # Per-weight first/second-moment EMAs in int32 and a POWER-OF-2
    # denominator: s = ceil(bits(v)/2) approximates log2(sqrt(v)), so
    # the normalized step is (m << 12) >> s -- within 2x of true
    # m/sqrt(v), needs no integer division anywhere (the exactness/
    # portability contract), and fixes the plain-SGD path's floor-
    # division small-gradient asymmetry (grad // nrm floors toward
    # -inf, so tiny negative gradients moved weights while tiny
    # positive ones did not).
    adam: bool = False
    alr_wx: int = 40         # Q12 Adam step sizes (step ~ alr per byte
    alr_wh: int = 20         # at full |m/sqrt(v)| = 1)
    alr_wo: int = 20
    alr_b: int = 10


def init_ilstm_shared(cfg: ILstmConfig, seed: int = 0x5A17):
    """Deterministic integer init: a format-specified xorshift stream
    quantized to small Q16/Q12 weights (replaces srand(0xDEADBEEF),
    reference predictor.cpp:26)."""
    h = cfg.hidden

    ctr = [0]

    def rnd(n, scale):
        # counter-based splitmix32: each value is an independent integer
        # hash of (seed, index) -- fully vectorized (the sequential
        # xorshift chain cost seconds of scalar Python per coding
        # group), deterministic on every backend, no float anywhere
        i = np.arange(ctr[0], ctr[0] + n, dtype=np.uint64)
        ctr[0] += n
        z = (np.uint64(seed) + i * np.uint64(0x9E3779B97F4A7C15)) \
            & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z &= np.uint64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z &= np.uint64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(31))) & np.uint64(0xFFFFFFFF)
        return ((z % np.uint64(2 * scale + 1)).astype(np.int64)
                - scale).astype(np.int32)

    sh = {
        "wx": jnp.asarray(rnd(256 * 3 * h, 256).reshape(256, 3 * h)),
        "wh": jnp.asarray(rnd(h * 3 * h, 2048).reshape(h, 3 * h)),
        "wo": jnp.asarray(rnd(h * 256, 2048).reshape(h, 256)),
        "b": jnp.zeros(3 * h, jnp.int32),
        "bo": jnp.zeros(256, jnp.int32),
    }
    if cfg.adam:
        for k in ("wx", "wh", "wo", "b", "bo"):
            sh["m_" + k] = jnp.zeros_like(sh[k])
            sh["v_" + k] = jnp.zeros_like(sh[k])
    return sh


def init_ilstm_perblock(cfg: ILstmConfig):
    h, W = cfg.hidden, cfg.horizon
    return {
        "h": jnp.zeros(h, jnp.int32),
        "c": jnp.zeros(h, jnp.int32),
        "h0": jnp.zeros(h, jnp.int32),
        "c0": jnp.zeros(h, jnp.int32),
        "ring": jnp.zeros(W, jnp.int32),
        # integer cumulative next-byte distribution, ~2^16 total mass
        "qcum": jnp.asarray(np.arange(257, dtype=np.int64) * 256,
                            dtype=jnp.int32),
    }


def _dot16(eq, a, w):
    """Exact integer contraction with Q16 weights: (sum a*w) >> 16.
    w hi/lo split keeps every partial product < 2^23 and sums over
    H <= 256 below 2^31 with 4x margin (a is Q12, |a| <= 4096;
    H = 512 with saturated weights can reach exactly 2^31 -- enforced
    by ILstmConfig.__post_init__)."""
    w_hi = w >> 8
    w_lo = w - (w_hi << 8)
    return ((jnp.einsum(eq, a, w_hi) >> 8)
            + (jnp.einsum(eq, a, w_lo) >> 16))


def _sig12(pre):
    """sigmoid of a Q12 pre-activation -> Q12 in [1, 4095]."""
    return squash12(4096 + (jnp.clip(pre, -PRE_CLIP, PRE_CLIP) >> 4))


def _tanh12(x):
    """tanh of a Q12 value -> Q12 in [-4094, 4094]."""
    return 2 * squash12(4096 + (jnp.clip(x, -PRE_CLIP, PRE_CLIP) >> 3)) \
        - 4096


def _cell(sh, h, c, byte):
    """One integer cell step.  h, c (B, H) Q12; byte (B,) int32.
    Returns (h2, c2, stash) with everything the backward pass needs."""
    H = h.shape[1]
    pre = (sh["wx"][byte] + _dot16("bh,hk->bk", h, sh["wh"])
           + sh["b"][None])
    pre = jnp.clip(pre, -PRE_CLIP, PRE_CLIP)
    f = _sig12(pre[:, :H])
    g = _tanh12(pre[:, H:2 * H])
    o = _sig12(pre[:, 2 * H:])
    c2 = (f * c + (4096 - f) * g) >> 12          # |c2| <= 4096 (coupled)
    tc = _tanh12(c2)
    h2 = (o * tc) >> 12
    return h2, c2, (h, c, f, g, o, tc)


def _softmax_parts(sh, h):
    """Integer softmax pieces of the output head: (p15 (B, 256), vi,
    total).  All-integer: exp via intmath's exp2 polynomial."""
    from cmix_tpu.utils.intmath import _exp2_parts
    logits = jnp.clip(sh["bo"][None] + _dot16("bh,hk->bk", h, sh["wo"]),
                      -(3072 << 4), 3072 << 4)   # Q12, +-12 real
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    st13x = jnp.maximum(logits >> 4, -3072)      # 256*ln units, <= 0
    z, k = _exp2_parts(st13x)                    # val = z * 2^(k-15)
    # scale so the max-logit entry reads ~2^15..2^16 (k <= 0 after the
    # max subtraction): vi = z * 2^k, i.e. z >> (-k)
    s = jnp.clip(-k, 0, 31).astype(jnp.uint32)
    vi = jnp.minimum((z.astype(jnp.uint32) >> s).astype(jnp.int32) + 1,
                     65535)                      # [1, 2^16)
    total = jnp.sum(vi, axis=1, keepdims=True)   # < 257*2^16 < 2^25
    p15 = ((vi.astype(jnp.uint32) << jnp.uint32(15))
           // total.astype(jnp.uint32)).astype(jnp.int32)
    return p15, vi, total


def ilstm_shared_byte_update(cfg: ILstmConfig, sh, pb, bytes_b):
    """Integer twin of lstm_shared_byte_update: replay the horizon
    window forward (stashing), run the hand-derived integer backward,
    apply mean-over-batch SGD, slide the window, advance the running
    state, and cache the next-byte integer distribution."""
    B = bytes_b.shape[0]
    H, W = cfg.hidden, cfg.horizon
    ring = pb["ring"]                                        # (B, W)
    targets = jnp.concatenate([ring[:, 1:], bytes_b[:, None]], axis=1)

    # ---- forward replay, stashing per-step state (W is small: unroll)
    h, c = pb["h0"], pb["c0"]
    stash = []
    for j in range(W):
        h, c, st = _cell(sh, h, c, ring[:, j])
        stash.append((ring[:, j], targets[:, j], st, h, c))

    # ---- backward through time (integer)
    gwx = jnp.zeros((256, 3 * H), jnp.int32)
    gwh = jnp.zeros((H, 3 * H), jnp.int32)
    gwo = jnp.zeros((H, 256), jnp.int32)
    gb = jnp.zeros(3 * H, jnp.int32)
    gbo = jnp.zeros(256, jnp.int32)
    dh = jnp.zeros((B, H), jnp.int32)
    dc = jnp.zeros((B, H), jnp.int32)
    for j in range(W - 1, -1, -1):
        byte_j, tgt_j, (h_prev, c_prev, f, g, o, tc), h_j, _ = stash[j]
        p15, _, _ = _softmax_parts(sh, h_j)
        onehot = (jnp.arange(256)[None, :] == tgt_j[:, None])
        dlog = (p15 - jnp.where(onehot, 1 << 15, 0)) >> 3    # Q12
        gbo = gbo + jnp.sum(dlog, axis=0)
        # (h>>4)*(dlog>>4): |.| <= 2^16, x256 batch sum <= 2^24 -- exact
        gwo = gwo + jnp.einsum("bh,bk->hk", h_j >> 4, dlog >> 4)
        dh = jnp.clip(dh + _dot16("bk,hk->bh", dlog, sh["wo"]),
                      -(1 << 15), 1 << 15)
        # cell backward
        do = (dh * tc) >> 12
        dtc = (dh * o) >> 12
        dc = jnp.clip(
            dc + ((dtc * ((4096 * 4096 - tc * tc) >> 12)) >> 12),
            -(1 << 15), 1 << 15)
        df = (dc * (c_prev - g)) >> 12
        dg = (dc * (4096 - f)) >> 12
        dpre_f = (df * ((f * (4096 - f)) >> 12)) >> 12
        dpre_g = (dg * ((4096 * 4096 - g * g) >> 12)) >> 12
        dpre_o = (do * ((o * (4096 - o)) >> 12)) >> 12
        dpre = jnp.clip(jnp.concatenate([dpre_f, dpre_g, dpre_o],
                                        axis=1), -G_CLIP, G_CLIP)
        oh_b = (jnp.arange(256)[None, :]
                == byte_j[:, None]).astype(jnp.int32)        # (B, 256)
        gwx = gwx + jnp.einsum("bv,bk->vk", oh_b, dpre)      # <= 2^22
        # (h>>4)*(dpre>>4): <= 2^18, x256 <= 2^26 -- exact
        gwh = gwh + jnp.einsum("bh,bk->hk", h_prev >> 4, dpre >> 4)
        gb = gb + jnp.sum(dpre, axis=0)
        # backprop through Wh sums over k=3H=768 terms: clip the operand
        # to +-2047 so the hi-split partial sum stays under 2^31
        # (2047 * 2^10 * 768 < 2^31) -- _dot16's exactness precondition
        dh = _dot16("bk,hk->bh", jnp.clip(dpre, -2047, 2047), sh["wh"])
        dc = (dc * f) >> 12

    if cfg.adam:
        # ---- integer Adam (power-of-2 denominator; see ILstmConfig).
        # Scale-free in the raw gradient sums, so the B*W mean division
        # (and its floor asymmetry) disappears entirely.
        def _bits(v):
            n = jnp.zeros_like(v)
            x = v
            for k in (16, 8, 4, 2, 1):
                big = x >= (1 << k)
                n = n + jnp.where(big, k, 0)
                x = jnp.where(big, x >> k, x)
            return n + jnp.where(x > 0, 1, 0)

        # static batch-scale pre-shift (exact arithmetic shift): keeps
        # the raw B*W gradient sums inside the +-2^15 square-safe range
        # without the floor-division bias; Adam's sqrt(v) normalization
        # absorbs the residual power-of-2 scale
        pre_sh = max(0, (B * W).bit_length() - 5)

        def upd(wkey, grad, alr, clip):
            g = jnp.clip(jax.lax.shift_right_arithmetic(grad, pre_sh),
                         -(1 << 15), 1 << 15)
            m = sh["m_" + wkey] + ((g - sh["m_" + wkey] + 4) >> 3)
            g2 = g * g                                   # <= 2^28
            v = sh["v_" + wkey] + ((g2 - sh["v_" + wkey] + 32) >> 6)
            s = (_bits(v) + 1) >> 1                      # ~log2 sqrt(v)
            ratio = jnp.clip(
                jax.lax.shift_right_arithmetic(m << 12, s),
                -8192, 8192)                             # ~Q12 m/sqrt(v)
            w = jnp.clip(sh[wkey] - ((alr * ratio) >> 12), -clip, clip)
            return w, m, v

        new = {}
        for wkey, grad, alr, clip in (
                ("wx", gwx, cfg.alr_wx, PRE_CLIP),
                ("wh", gwh, cfg.alr_wh, W_CLIP),
                ("wo", gwo, cfg.alr_wo, W_CLIP),
                ("b", gb, cfg.alr_b, PRE_CLIP),
                ("bo", gbo, cfg.alr_b, PRE_CLIP)):
            w, m, v = upd(wkey, grad, alr, clip)
            new[wkey] = w
            new["m_" + wkey] = m
            new["v_" + wkey] = v
        sh = new
    else:
        # ---- mean-over-batch SGD (batch-invariant semantics, STAT_NORM
        # spirit), integer division exact everywhere
        nrm = B * W

        def upd(wkey, grad, lr, clip):
            g = jnp.clip(grad // nrm, -G_CLIP, G_CLIP)
            return jnp.clip(sh[wkey] - ((lr * g) >> 12), -clip, clip)

        sh = {
            "wx": upd("wx", gwx, cfg.lr_wx, PRE_CLIP),
            "wh": upd("wh", gwh, cfg.lr_wh, W_CLIP),
            "wo": upd("wo", gwo, cfg.lr_wo, W_CLIP),
            "b": upd("b", gb, cfg.lr_b, PRE_CLIP),
            "bo": upd("bo", gbo, cfg.lr_b, PRE_CLIP),
        }

    # ---- slide the window start over the oldest ring byte (new params)
    h0, c0, _ = _cell(sh, pb["h0"], pb["c0"], ring[:, 0])
    new_ring = jnp.concatenate([ring[:, 1:], bytes_b[:, None]], axis=1)
    # ---- advance the running prediction state; next-byte distribution
    h_new, c_new, _ = _cell(sh, pb["h"], pb["c"], bytes_b)
    _, vi, total = _softmax_parts(sh, h_new)
    p16 = ((vi.astype(jnp.uint32) << jnp.uint32(16))
           // total.astype(jnp.uint32)).astype(jnp.int32)
    qcum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(p16, axis=1)], axis=1)
    pb = {"h": h_new, "c": c_new, "h0": h0, "c0": c0, "ring": new_ring,
          "qcum": qcum}
    return sh, pb
