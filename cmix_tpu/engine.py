"""The unified transcoder engine: predict -> code -> update, per bit, in XLA.

This is the TPU re-architecture of the reference's hot loop
(src/runner.cpp:101-138 + src/predictor.cpp:361-469): instead of a C++
object graph updated per bit, ALL model state is a pytree of fixed-size
arrays advanced by one jitted per-byte step (8 unrolled bit sub-steps)
inside ``lax.scan``.  Independent blocks are batched with ``vmap`` --
that batch axis is where TPU throughput comes from, since the per-bit
serial dependency is irreducible (SURVEY.md section 2.8).

Encode and decode run the SAME compiled coder path: the interval update,
renormalization, and both IO pointers advance identically in both modes;
the only mode-dependent scalar is where the bit comes from (input byte vs
``xc <= xmid``).  One executable => bit-identical model numerics on both
sides -- the structural replacement for the reference's float-determinism
caveat (/root/reference/README:16).

Blocks are padded to ``block_size`` and the padding is *encoded for real*
(costs a handful of bytes, keeps every shape static and every step
unconditional -- no masking traffic).

Model ensemble v1 (format-defining; see FORMAT_VERSION):
  * 21-model "bank": nonstationary bit-history state models over hashed
    contexts (orders 1-8, 12, 16, word, sparse/skip, byte-class, indirect
    history-of-hashes) + run-state models -- capability parity with
    src/models/indirect.cpp + src/contexts/*.
  * exact direct models for order-0/1 (src/models/direct.cpp).
  * two match models, orders 8 and 20 (src/models/match.cpp).
  * 8 context-gated logistic mixers + 1 final mixer, integer fixed-point
    (src/mixer/mixer.cpp), then a 2-APM SSE stage (src/mixer/sse.cpp).
All probability math is integer (12-bit domain, LUT squash/stretch), so
XLA cannot perturb it.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from cmix_tpu.contexts.hashes import (
    init_ctx_state, update_ctx_state, mix32, PRIME2)
from cmix_tpu.states.tables import (
    NS_NEXT, NS_INIT_P12, RUN_NEXT, RUN_INIT_P12)
from cmix_tpu.utils.luts import SQUASH_LUT, STRETCH_LUT, RECIP16_LUT, ST_MAX
from cmix_tpu.mixer.lstm import (
    LstmConfig, init_lstm, lstm_bit_p12, lstm_byte_update)

MODE_ENCODE = 0
MODE_DECODE = 1

M32 = jnp.uint32(0xFFFFFFFF)
U8 = jnp.uint32(8)

# ---------------------------------------------------------------- model bank
# transition 0 = nonstationary, 1 = run map. Context sources: _bank_bases().
N_BANK = 21
_BANK_TRANS = np.zeros(N_BANK, dtype=np.int32)
_BANK_TRANS[19] = 1  # run model over order-1
_BANK_TRANS[20] = 1  # run model over order-2

MATCH_ORDERS = (8, 20)
N_MATCH = len(MATCH_ORDERS)
N_DIRECT = 2

_MIX1_ROWS = np.array([1, 256, 256, 1024, 64, 256, 256, 64], dtype=np.int64)
N_MIX1 = len(_MIX1_ROWS)
_MIX1_OFF = np.concatenate([[0], np.cumsum(_MIX1_ROWS)[:-1]]).astype(np.int32)
_MIX1_TOTAL = int(_MIX1_ROWS.sum())

_W_INIT2 = 4096 // N_MIX1


def n_inputs(cfg):
    """Mixer layer-1 input width (depends on whether the LSTM is on)."""
    return N_BANK + N_DIRECT + N_MATCH + (1 if cfg.lstm_hidden else 0)

LR_SHIFT = 14       # mixer learning rate: dw = (st * err) >> LR_SHIFT
APM_RATE = 6        # SSE node update rate
W_CLAMP = 1 << 15   # |w| bound keeps _mix_dot's int32 accumulator exact


@dataclass(frozen=True)
class EngineConfig:
    block_size: int = 1 << 16   # bytes per block (static shape)
    tbits: int = 18             # log2 slots per bank model
    mbits: int = 18             # log2 slots per match table
    ibits: int = 16             # log2 slots of indirect-hash table
    lstm_hidden: int = 256      # 0 disables the LSTM byte mixer

    @property
    def comp_size(self):
        # worst case is bounded by the p16 clamp (~10 bits/bit) but the
        # host falls back to raw block storage past block_size (runner.py),
        # so modest headroom suffices for the buffer itself.
        return self.block_size + self.block_size // 2 + 64


# ------------------------------------------------------------------- state


def init_state(cfg: EngineConfig):
    """Fresh per-block model state (unbatched). All-int pytree."""
    tsize = 1 << cfg.tbits
    init_p = np.stack([NS_INIT_P12, RUN_INIT_P12])[_BANK_TRANS]  # (NM,256)
    st = {
        "ctx": init_ctx_state(),
        "ind_tbl": jnp.zeros(1 << cfg.ibits, dtype=jnp.uint32),
        "ind_val": jnp.zeros((), dtype=jnp.uint32),
        "bank_state": jnp.zeros((N_BANK, tsize), dtype=jnp.uint8),
        "bank_prob": jnp.asarray(init_p, dtype=jnp.int32),
        "bank_cnt": jnp.zeros((N_BANK, 256), dtype=jnp.int32),
        "d0_p": jnp.full(256, 2048, dtype=jnp.int32),
        "d0_c": jnp.zeros(256, dtype=jnp.int32),
        "d1_p": jnp.full(256 * 256, 2048, dtype=jnp.int32),
        "d1_c": jnp.zeros(256 * 256, dtype=jnp.int32),
        "match_tbl": jnp.zeros((N_MATCH, 1 << cfg.mbits), dtype=jnp.int32),
        "match_ptr": jnp.zeros(N_MATCH, dtype=jnp.int32),
        "match_len": jnp.zeros(N_MATCH, dtype=jnp.int32),
        "match_conf": jnp.full((N_MATCH, 32), 2048, dtype=jnp.int32),
        "w1": jnp.full((_MIX1_TOTAL, n_inputs(cfg)), 4096 // n_inputs(cfg),
                       dtype=jnp.int32),
        "w2": jnp.full((256, N_MIX1), _W_INIT2, dtype=jnp.int32),
        "apm1": _apm_init(256),
        "apm2": _apm_init(64),
        "hist": jnp.zeros(cfg.block_size, dtype=jnp.uint8),
        "t": jnp.zeros((), dtype=jnp.int32),
    }
    if cfg.lstm_hidden:
        st["lstm"] = init_lstm(LstmConfig(hidden=cfg.lstm_hidden))
    return st


def _apm_init(nctx):
    st = (np.arange(33) - 16) * 128
    p12 = SQUASH_LUT[np.clip(st, -ST_MAX, ST_MAX) + ST_MAX]
    row = (p12.astype(np.int64) << 4).astype(np.int32)
    return jnp.asarray(np.tile(row, (nctx, 1)))


def init_coder(cfg: EngineConfig):
    return {
        "x1": jnp.zeros((), dtype=jnp.uint32),
        "x2": M32,
        "xc": jnp.zeros((), dtype=jnp.uint32),
        "total": jnp.zeros((), dtype=jnp.int32),   # bytes emitted so far
        "rptr": jnp.zeros((), dtype=jnp.int32),
    }


# ------------------------------------------------------------ per-byte ctxs


def _bank_bases(cs, ind_val):
    """uint32[N_BANK] per-byte context values for the model bank."""
    oh = cs["ohash"]
    l4 = cs["last4"]
    b1 = l4 & jnp.uint32(0xFF)
    vals = [
        oh[1], oh[2], oh[3], oh[4], oh[5], oh[6], oh[7], oh[8],   # 0-7
        oh[12], oh[16],                                           # 8-9
        cs["word"],                                               # 10
        mix32(cs["last_word"], b1),                               # 11
        (l4 >> U8) & jnp.uint32(0xFF),                            # 12 skip-1
        (l4 >> U8) & jnp.uint32(0xFFFF),                          # 13
        (((l4 >> jnp.uint32(24)) & jnp.uint32(0xFF)) << U8)
        | ((l4 >> U8) & jnp.uint32(0xFF)),                        # 14
        (l4 >> U8) & jnp.uint32(0xFFFFFF),                        # 15
        cs["clsreg"] & jnp.uint32(0xFFFFFF),                      # 16
        mix32(cs["clsreg"] & jnp.uint32(0xFFFF), cs["word"]),     # 17
        ind_val,                                                  # 18
        b1,                                                       # 19 run o1
        l4 & jnp.uint32(0xFFFF),                                  # 20 run o2
    ]
    v = jnp.stack(vals)
    salt = jnp.arange(N_BANK, dtype=jnp.uint32) * PRIME2
    return mix32(v, salt)


# ------------------------------------------------------------------ mixers


def _squash(st):
    lut = jnp.asarray(SQUASH_LUT)
    return lut[jnp.clip(st, -ST_MAX, ST_MAX) + ST_MAX]


def _stretch(p12):
    lut = jnp.asarray(STRETCH_LUT)
    return lut[jnp.clip(p12, 0, 4095)]


def _mix_dot(w_rows, x_st):
    """Integer mixer dot: w 1.12 fixed point, x in stretch units.

    Products are pre-shifted by 8 to keep the int32 accumulator exact for
    up to 4096 inputs (same trick as the reference SIMD mixers,
    src/models/paq8.cpp:399-476).  Integer sum => order-independent.
    """
    prod = (w_rows * x_st) >> 8             # (..., NIN)
    dot = jnp.sum(prod, axis=-1) >> 4       # back to stretch units
    return jnp.clip(dot, -ST_MAX, ST_MAX)


def _mixer_ctx_idxs(cs, bit_ctx_i32, longest):
    """Row index for each layer-1 mixer (int32[N_MIX1])."""
    l4 = cs["last4"]
    idxs = jnp.stack([
        jnp.zeros((), jnp.int32),
        bit_ctx_i32,
        (l4 & jnp.uint32(0xFF)).astype(jnp.int32),
        ((cs["ohash"][2] >> jnp.uint32(22)) & jnp.uint32(1023)).astype(jnp.int32),
        longest,                                                  # 0..63
        ((cs["word"] >> jnp.uint32(24)) & jnp.uint32(0xFF)).astype(jnp.int32),
        (cs["clsreg"] & jnp.uint32(0xFF)).astype(jnp.int32),
        jnp.minimum(cs["linepos"], jnp.uint32(63)).astype(jnp.int32),
    ])
    return idxs + jnp.asarray(_MIX1_OFF)


# --------------------------------------------------------------------- APM


def _apm_predict(tbl, ctx, p12):
    stv = _stretch(p12) + 2048              # [1, 4095]
    t = jnp.clip(stv >> 7, 0, 31)
    frac = stv & 127
    a = tbl[ctx, t]
    b = tbl[ctx, t + 1]
    v = (a * (128 - frac) + b * frac) >> 7
    return jnp.clip(v >> 4, 1, 4095), t


def _apm_update(tbl, ctx, t, bit):
    tgt = bit << 16
    a = tbl[ctx, t]
    b = tbl[ctx, t + 1]
    tbl = tbl.at[ctx, t].set(a + ((tgt - a) >> APM_RATE))
    tbl = tbl.at[ctx, t + 1].set(b + ((tgt - b) >> APM_RATE))
    return tbl


# --------------------------------------------------------------- range coder


def _coder_bit(cd, comp, enc_bit, p16, mode):
    """One shared coder step for both modes.

    Interval math and renormalization are mode-independent (cf.
    src/coder/encoder.cpp:14-29 / decoder.cpp:20-33); the out buffer is
    written even when decoding and the comp buffer is read even when
    encoding -- both harmless, and it keeps a single unconditional path.
    """
    x1, x2, xc = cd["x1"], cd["x2"], cd["xc"]
    r = x2 - x1
    xmid = x1 + (r >> jnp.uint32(16)) * p16 + \
        (((r & jnp.uint32(0xFFFF)) * p16) >> jnp.uint32(16))
    dec_bit = (xc <= xmid).astype(jnp.int32)
    bit = jnp.where(mode == MODE_ENCODE, enc_bit, dec_bit)
    x1 = jnp.where(bit == 1, x1, xmid + jnp.uint32(1))
    x2 = jnp.where(bit == 1, xmid, x2)

    rptr = cd["rptr"]
    nlen = comp.shape[0]
    emit = []
    k = jnp.zeros((), jnp.int32)
    for _ in range(4):
        cond = ((x1 ^ x2) & jnp.uint32(0xFF000000)) == 0
        emit.append((x2 >> jnp.uint32(24)).astype(jnp.uint8))
        nb = comp[jnp.clip(rptr, 0, nlen - 1)].astype(jnp.uint32)
        x1 = jnp.where(cond, x1 << U8, x1)
        x2 = jnp.where(cond, (x2 << U8) | jnp.uint32(0xFF), x2)
        xc = jnp.where(cond, (xc << U8) | nb, xc)
        rptr = rptr + cond.astype(jnp.int32)
        k = k + cond.astype(jnp.int32)
    cd = dict(cd, x1=x1, x2=x2, xc=xc, total=cd["total"] + k, rptr=rptr)
    return cd, bit, jnp.stack(emit), k


# ----------------------------------------------------------------- bit step


def _predict(cfg, state, bases, byte_acc, k):
    """Prediction for bit k (static) of the current byte.

    byte_acc is the bit context accumulator (1..255).
    Returns (p16, aux dict threaded to _update).
    """
    tmask = jnp.uint32((1 << cfg.tbits) - 1)
    cs = state["ctx"]
    bc = byte_acc                               # int32 in [1, 255]
    bit_ctx_u32 = bc.astype(jnp.uint32)

    # bank gather
    idx = (mix32(bases, bit_ctx_u32 * PRIME2) & tmask).astype(jnp.int32)
    m_ar = jnp.arange(N_BANK)
    s = state["bank_state"][m_ar, idx].astype(jnp.int32)
    p_bank = state["bank_prob"][m_ar, s]

    # direct models
    b1 = (cs["last4"] & jnp.uint32(0xFF)).astype(jnp.int32)
    i0 = bc
    i1 = b1 * 256 + bc
    p_d0 = state["d0_p"][i0]
    p_d1 = state["d1_p"][i1]

    # match models
    mm_ar = jnp.arange(N_MATCH)
    exp_byte = state["hist"][
        jnp.clip(state["match_ptr"], 0, cfg.block_size - 1)].astype(jnp.int32)
    exp_prefix = (1 << k) | (exp_byte >> (8 - k))
    alive = (state["match_len"] > 0) & (exp_prefix == bc)
    exp_bit = (exp_byte >> (7 - k)) & 1
    lenb = jnp.minimum(state["match_len"], 31)
    conf = state["match_conf"][mm_ar, lenb]     # p12 that exp_bit is right
    st_conf = _stretch(conf)
    st_match = jnp.where(alive, jnp.where(exp_bit == 1, st_conf, -st_conf), 0)

    parts = [
        _stretch(p_bank),
        jnp.stack([_stretch(p_d0), _stretch(p_d1)]),
        st_match,
    ]
    if cfg.lstm_hidden:
        p_lstm = lstm_bit_p12(state["lstm"], bc, k)
        parts.append(_stretch(p_lstm)[None])
    x_st = jnp.concatenate(parts)

    longest = (jnp.max(jnp.where(alive, lenb, 0)) * 2
               + jnp.max(jnp.where(alive, exp_bit, 0)))
    mix_idx = _mixer_ctx_idxs(cs, bc, longest)
    rows = state["w1"][mix_idx]                 # (N_MIX1, NIN)
    st1 = _mix_dot(rows, x_st[None, :])         # (N_MIX1,)
    p1 = _squash(st1)

    w2row = state["w2"][bc]
    st2 = _mix_dot(w2row, st1)
    p_mix = _squash(st2)

    pa1, t1 = _apm_predict(state["apm1"], b1, p_mix)
    c2 = longest
    pa2, t2 = _apm_predict(state["apm2"], c2, p_mix)
    pa = (pa1 + pa2 + 1) >> 1
    p_final = jnp.clip((p_mix + 3 * pa) >> 2, 1, 4095)

    p16 = jnp.clip(p_final << 4, 64, 65472).astype(jnp.uint32)
    aux = dict(idx=idx, s=s, p_bank=p_bank, i0=i0, i1=i1, p_d0=p_d0,
               p_d1=p_d1, alive=alive, exp_bit=exp_bit, lenb=lenb, conf=conf,
               x_st=x_st, mix_idx=mix_idx, st1=st1, p1=p1, p_mix=p_mix,
               b1=b1, t1=t1, c2=c2, t2=t2, rows=rows, w2row=w2row)
    return p16, aux


def _update(state, aux, bit):
    """Adapt every table/mixer toward the observed bit. Pure."""
    recip = jnp.asarray(RECIP16_LUT)
    bit12 = bit << 12

    def adapt(p, cnt):
        npv = p + (((bit12 - p) * recip[jnp.clip(cnt, 0, 1023)]) >> 16)
        return npv, jnp.minimum(cnt + 1, 255)

    m_ar = jnp.arange(N_BANK)
    s = aux["s"]
    p_new, c_new = adapt(aux["p_bank"], state["bank_cnt"][m_ar, s])
    state["bank_prob"] = state["bank_prob"].at[m_ar, s].set(p_new)
    state["bank_cnt"] = state["bank_cnt"].at[m_ar, s].set(c_new)
    trans = jnp.asarray(np.stack([NS_NEXT, RUN_NEXT]))  # (2,256,2)
    tsel = jnp.asarray(_BANK_TRANS)
    s_next = trans[tsel, s, bit]
    state["bank_state"] = state["bank_state"].at[m_ar, aux["idx"]].set(s_next)

    p0, c0 = adapt(aux["p_d0"], state["d0_c"][aux["i0"]])
    state["d0_p"] = state["d0_p"].at[aux["i0"]].set(p0)
    state["d0_c"] = state["d0_c"].at[aux["i0"]].set(c0)
    p1v, c1v = adapt(aux["p_d1"], state["d1_c"][aux["i1"]])
    state["d1_p"] = state["d1_p"].at[aux["i1"]].set(p1v)
    state["d1_c"] = state["d1_c"].at[aux["i1"]].set(c1v)

    # match confidence: learn P(exp_bit correct | match length)
    mm_ar = jnp.arange(N_MATCH)
    hit = ((aux["exp_bit"] == bit).astype(jnp.int32)) << 12
    upd = aux["conf"] + ((hit - aux["conf"]) >> 5)
    upd = jnp.where(aux["alive"], upd, aux["conf"])
    state["match_conf"] = state["match_conf"].at[mm_ar, aux["lenb"]].set(upd)

    # mixers: gradient step on logistic loss (cf. src/mixer/mixer.cpp:56-72)
    err1 = bit12 - aux["p1"]                        # (N_MIX1,)
    dw1 = (aux["x_st"][None, :] * err1[:, None]) >> LR_SHIFT
    new_rows = jnp.clip(aux["rows"] + dw1, -W_CLAMP, W_CLAMP)
    state["w1"] = state["w1"].at[aux["mix_idx"]].set(new_rows)

    err2 = bit12 - aux["p_mix"]
    dw2 = (aux["st1"] * err2) >> LR_SHIFT
    state["w2"] = state["w2"].at[aux["i0"]].set(
        jnp.clip(aux["w2row"] + dw2, -W_CLAMP, W_CLAMP))

    state["apm1"] = _apm_update(state["apm1"], aux["b1"], aux["t1"], bit)
    state["apm2"] = _apm_update(state["apm2"], aux["c2"], aux["t2"], bit)
    return state


def _match_byte_update(cfg, state, byte_i32, t):
    """Reposition match models at a byte boundary (cf. src/models/match.cpp:48-60)."""
    mmask = jnp.uint32((1 << cfg.mbits) - 1)
    cs = state["ctx"]  # already advanced to include byte
    for mi, order in enumerate(MATCH_ORDERS):
        h = (mix32(cs["ohash"][order], jnp.uint32(0x2545F491)) & mmask
             ).astype(jnp.int32)
        cand = state["match_tbl"][mi, h]            # pos+1 of continuation
        state["match_tbl"] = state["match_tbl"].at[mi, h].set(t + 1)
        ptr, ln = state["match_ptr"][mi], state["match_len"][mi]
        pred = state["hist"][jnp.clip(ptr, 0, cfg.block_size - 1)].astype(jnp.int32)
        ok = (ln > 0) & (pred == byte_i32)
        new_ptr = jnp.where(ok, ptr + 1, cand)
        new_len = jnp.where(ok, jnp.minimum(ln + 1, 65535),
                            jnp.where(cand > 0, 1, 0))
        state["match_ptr"] = state["match_ptr"].at[mi].set(new_ptr)
        state["match_len"] = state["match_len"].at[mi].set(new_len)
    return state


# ---------------------------------------------------------------- byte step


def make_byte_step(cfg: EngineConfig):
    imask = jnp.uint32((1 << cfg.ibits) - 1)

    def byte_step(carry, inp_byte):
        state, cd, comp, mode = carry
        t = state["t"]
        ind_key_prev = (state["ctx"]["last4"] & imask).astype(jnp.int32)
        bases = _bank_bases(state["ctx"], state["ind_val"])

        byte_acc = jnp.ones((), jnp.int32)
        emits, c32 = [], jnp.zeros((), jnp.uint32)
        for k in range(8):
            p16, aux = _predict(cfg, state, bases, byte_acc, k)
            enc_bit = ((inp_byte.astype(jnp.int32) >> (7 - k)) & 1)
            cd, bit, emit4, kk = _coder_bit(cd, comp, enc_bit, p16, mode)
            # pack the <=4 emitted bytes into one uint32 word and the count
            # into a nibble: flat uint32 ys keep XLA's scan lowering fast
            # (multi-dim uint8 ys trigger a pathological CPU compile).
            e32 = (emit4[0].astype(jnp.uint32) << jnp.uint32(24))                 | (emit4[1].astype(jnp.uint32) << jnp.uint32(16))                 | (emit4[2].astype(jnp.uint32) << U8)                 | emit4[3].astype(jnp.uint32)
            emits.append(e32)
            c32 = c32 | (kk.astype(jnp.uint32) << jnp.uint32(4 * k))
            state = _update(state, aux, bit)
            byte_acc = byte_acc * 2 + bit
        # ys as a flat tuple of scalars: under vmap each becomes (B,), the
        # only scan-output shape XLA-CPU handles without a pathological
        # layout pass (a (B,8) ys compiles 100x slower).
        ys = tuple(emits) + (c32,)

        byte = byte_acc & 255
        state["hist"] = jax.lax.dynamic_update_slice(
            state["hist"], byte.astype(jnp.uint8)[None], (t,))

        # indirect history-of-hashes (cf. src/contexts/indirect-hash.cpp:13-17)
        newv = mix32(state["ind_tbl"][ind_key_prev], byte.astype(jnp.uint32))
        state["ind_tbl"] = state["ind_tbl"].at[ind_key_prev].set(newv)

        state["ctx"] = update_ctx_state(state["ctx"], byte.astype(jnp.uint32))
        ind_key_new = (state["ctx"]["last4"] & imask).astype(jnp.int32)
        state["ind_val"] = state["ind_tbl"][ind_key_new]

        state = _match_byte_update(cfg, state, byte, t)
        if cfg.lstm_hidden:
            state["lstm"] = lstm_byte_update(
                LstmConfig(hidden=cfg.lstm_hidden), state["lstm"], byte)
        state["t"] = t + 1
        return (state, cd, comp, mode), ys

    return byte_step


# --------------------------------------------------------------- transcoder


def make_transcode_fn(cfg: EngineConfig):
    """Unjitted batched scan stage ``(state, inp, comp, mode) -> ...``.

    Returns (hist, e32, c32, total, x1): packed per-bit emission words to
    be compacted by ``make_compactor``.  Kept as a separate stage because
    XLA-CPU mis-schedules the fused scan+compaction (runs 1000x slow);
    two executables also let the compaction overlap the next batch later.

    The loop structure is scan-over-time of a vmapped step (NOT
    vmap-of-scan, which lowers pathologically slowly), so the batch axis
    stays innermost where XLA batches the gathers/scatters.
    """
    step = make_byte_step(cfg)

    def vstep(state, cd, comp, byte_b, mode):
        (state, cd, _, _), ys = step((state, cd, comp, mode), byte_b)
        return state, cd, ys

    vstep = jax.vmap(vstep, in_axes=(0, 0, 0, 0, None))

    def transcode(state, inp, comp, mode):
        b = inp.shape[0]
        cd = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (b,) + x.shape),
            init_coder(cfg))
        # prime the decoder with 4 bytes (cf. src/coder/decoder.cpp:5-7)
        xc = (comp[:, 0].astype(jnp.uint32) << jnp.uint32(24)) \
            | (comp[:, 1].astype(jnp.uint32) << jnp.uint32(16)) \
            | (comp[:, 2].astype(jnp.uint32) << U8) \
            | comp[:, 3].astype(jnp.uint32)
        cd = dict(cd)
        cd["xc"] = jnp.where(mode == MODE_DECODE, xc, cd["xc"])
        cd["rptr"] = jnp.where(mode == MODE_DECODE,
                               jnp.full(b, 4, jnp.int32), cd["rptr"])

        def body(carry, byte_b):
            state, cd = carry
            state, cd, ys = vstep(state, cd, comp, byte_b, mode)
            return (state, cd), ys

        (state, cd), ys = jax.lax.scan(
            body, (state, cd), jnp.transpose(inp), length=cfg.block_size)
        e32 = jnp.stack(ys[:8], axis=-1)     # (N, B, 8)
        c32 = ys[8]                          # (N, B)
        return state["hist"], e32, c32, cd["total"], cd["x1"]

    return transcode


def make_compactor(cfg: EngineConfig):
    """Unjitted ``(e32, c32, total, x1) -> (out, out_len)``: compacts the
    packed per-bit emission words into contiguous compressed streams with
    one exclusive cumsum + one scatter per block, and appends the 4-byte
    flush of x1 (cf. src/coder/encoder.cpp:32-39)."""

    def compact(e32, c32, total, x1):
        n = cfg.block_size
        b = e32.shape[1]
        flush = jnp.stack([(x1 >> jnp.uint32(24 - 8 * i)).astype(jnp.uint8)
                           for i in range(4)], axis=-1)       # (B, 4)
        kidx = jnp.arange(8, dtype=jnp.uint32)
        cnts = ((c32[:, :, None] >> (4 * kidx)[None, None, :])
                & jnp.uint32(0xF)).astype(jnp.int32)          # (N, B, 8)
        cnts_t = jnp.transpose(cnts, (1, 0, 2)).reshape(b, n * 8)
        offs = jnp.cumsum(cnts_t, axis=1) - cnts_t            # (B, N*8)
        e_t = jnp.transpose(e32, (1, 0, 2)).reshape(b, n * 8)
        j = jnp.arange(4, dtype=jnp.int32)
        vals = ((e_t[:, :, None]
                 >> (jnp.uint32(24) - 8 * j.astype(jnp.uint32))[None, None, :])
                & jnp.uint32(0xFF)).astype(jnp.uint8)          # (B, N*8, 4)
        pos = offs[:, :, None] + j[None, None, :]
        valid = j[None, None, :] < cnts_t[:, :, None]
        pos = jnp.where(valid, pos, cfg.comp_size).reshape(b, n * 32)
        vals = vals.reshape(b, n * 32)
        fpos = total[:, None] + j[None, :]                     # (B, 4)
        allpos = jnp.concatenate([pos, fpos], axis=1)
        allvals = jnp.concatenate([vals, flush], axis=1)

        def scatter_one(p, v):
            buf = jnp.zeros(cfg.comp_size + 1, dtype=jnp.uint8)
            return buf.at[p].set(v, mode="drop")[:cfg.comp_size]

        return jax.vmap(scatter_one)(allpos, allvals), total + 4

    return compact


def make_transcoder(cfg: EngineConfig):
    """Jitted two-stage transcoder: returns (hist, out, out_len)."""
    scan_fn = jax.jit(make_transcode_fn(cfg), donate_argnums=(0,))
    compact_fn = jax.jit(make_compactor(cfg), donate_argnums=(0, 1))

    def transcode(state, inp, comp, mode):
        hist, e32, c32, total, x1 = scan_fn(state, inp, comp, mode)
        out, out_len = compact_fn(e32, c32, total, x1)
        return hist, out, out_len

    return transcode
