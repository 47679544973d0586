"""The unified transcoder engine v2: byte-tree vectorized predict/update.

TPU re-architecture of the reference's hot loop (src/runner.cpp:101-138 +
src/predictor.cpp:361-469).  v1 translated the per-bit structure directly
(8 sequential sub-steps of small gathers/scatters) and was kernel-latency
bound.  v2 is shaped around what the TPU microbenchmarks actually reward:

* **Byte-tree vectorization**: for each byte, predictions for ALL 255
  bit-context tree nodes are computed at once as dense (256,)-aligned
  vector math; the only per-bit sequential work left is the arithmetic
  coder itself (a handful of scalar ops).  This is the vector analogue of
  the reference's ByteModel::Predict interval walk
  (src/models/byte-model.cpp:8-37) applied to the whole ensemble.
* **Row-granular tables**: hashed model tables are keyed
  ``[model, hash_row, tree_node]``, so each byte needs ONE contiguous row
  gather and ONE row scatter per table -- single-element gathers are ~6x
  slower than row gathers on TPU and were v1's bottleneck.
* **Float32 probability math** (stretch/squash as exp/log, mixers as f32
  dots): elementwise VPU work with no LUT gathers.  Determinism holds
  because encode and decode run the SAME executable -- the mode flag only
  selects where each bit comes from (input byte vs coder state), which is
  the structural replacement for the reference's float-determinism caveat
  (/root/reference/README:16).  Integer math remains where the format
  needs exactness: the range coder (uint32) and table counters.
* **Segmented scan**: the per-byte scan runs in host-chunked segments
  (cfg.seg_size) so no single device execution runs unboundedly long;
  coder emissions leave each segment as packed uint32 ys words and are
  compacted by a separate cumsum+scatter stage.

Model ensemble v2 (format-defining; see FORMAT_VERSION):
  * 21-model bank of per-slot adaptive counter models over hashed contexts
    (orders 1-8, 12, 16, word, word+byte, sparse/skip x4, byte-class x2,
    indirect history-of-hashes, order-1/2 short-context) -- capability
    class of src/models/direct-hash.cpp + src/models/indirect.cpp over
    src/contexts/*.
  * exact order-0 and order-1 direct models (src/models/direct.cpp).
  * two match models, orders 8 and 20 (src/models/match.cpp).
  * LSTM byte mixer (src/mixer/lstm.cpp), trained online per byte.
  * 8 context-gated mixers (level/byte/hash/match/word/class/line gated)
    with per-node bias, a level-gated output mixer, and a 2-APM SSE stage
    (src/mixer/mixer.cpp, src/mixer/sse.cpp) -- all f32.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from cmix_tpu.contexts.hashes import (
    init_ctx_state, update_ctx_state, mix32, PRIME2)
from cmix_tpu.mixer.lstm import (
    LstmConfig, init_lstm, lstm_byte_update)

MODE_ENCODE = 0
MODE_DECODE = 1

M32 = jnp.uint32(0xFFFFFFFF)
U8 = jnp.uint32(8)

N_BANK = 21
MATCH_ORDERS = (8, 20)
N_MATCH = len(MATCH_ORDERS)
N_INPUTS = N_BANK + 2 + N_MATCH + 1   # + d0 + d1 + match x2 + lstm

# layer-1 mixers: (gate, rows). "level" replaces v1's bit_ctx gating: the
# per-node distinction is carried by the bias tables instead, which update
# as dense masked rows (no gather).
_MIX1_ROWS = np.array([1, 8, 256, 1024, 64, 256, 256, 64], dtype=np.int64)
N_MIX1 = len(_MIX1_ROWS)
_MIX1_OFF = np.concatenate([[0], np.cumsum(_MIX1_ROWS)[:-1]]).astype(np.int32)
_MIX1_TOTAL = int(_MIX1_ROWS.sum())

ST_CLAMP = 12.0            # stretch clamp: p in [6e-6, 1-6e-6]
MIX_LR = 6e-3              # mixer learning rate
APM_RATE = 0.02            # SSE node update rate
CNT_CAP = 60               # counter cap: floor adaptive rate ~ 1/62

# static per-node constants (node ids 1..255; 0 unused)
_NODE = np.arange(256)
_LEVEL = np.zeros(256, dtype=np.int32)
for _n in range(1, 256):
    _LEVEL[_n] = _n.bit_length() - 1
# byte interval of node n at level L: [ (n - 2^L) << (8-L), +2^(8-L) )
_SPAN = (256 >> _LEVEL.clip(0, 8)).astype(np.int32)
_LO = ((_NODE - (1 << _LEVEL)) * _SPAN).astype(np.int32)
_LO[0] = 0
_MID = _LO + (_SPAN >> 1)
_HI = _LO + _SPAN
_LVL_ONEHOT = (np.arange(8)[:, None] == _LEVEL[None, :]).astype(np.float32)


@dataclass(frozen=True)
class EngineConfig:
    block_size: int = 1 << 16   # bytes per block (static shape)
    tbits: int = 16             # log2 slots per bank model (rows = 2^(t-8))
    mbits: int = 16             # log2 slots per match table
    ibits: int = 14             # log2 slots of indirect-hash table
    lstm_hidden: int = 256      # 0 disables the LSTM byte mixer
    seg_size: int = 4096        # bytes per device execution segment

    def __post_init__(self):
        object.__setattr__(self, "seg_size",
                           min(self.seg_size, self.block_size))
        assert self.block_size % self.seg_size == 0

    @property
    def rows(self):
        return 1 << max(0, self.tbits - 8)

    @property
    def comp_size(self):
        return self.block_size + self.block_size // 2 + 64

    @property
    def seg_cap(self):
        # per-segment compressed-bytes capacity; the p16 clamp bounds the
        # worst case and the host falls back to raw storage per block
        return 2 * self.seg_size + 64


# ------------------------------------------------------------------- state


def init_state(cfg: EngineConfig):
    """Fresh per-block model state (unbatched pytree)."""
    st = {
        "ctx": init_ctx_state(),
        "ind_tbl": jnp.zeros(1 << cfg.ibits, dtype=jnp.uint32),
        "ind_val": jnp.zeros((), dtype=jnp.uint32),
        # bank slot: p12 (bits 8..19) | cnt (bits 0..7); init p12=2048
        "bank": jnp.full((N_BANK, cfg.rows, 256), 2048 << 8,
                         dtype=jnp.uint32),
        "d0_p": jnp.full(256, 0.5, dtype=jnp.float32),
        "d0_c": jnp.zeros(256, dtype=jnp.float32),
        "d1": jnp.full((256, 256), 2048 << 8, dtype=jnp.uint32),
        "match_tbl": jnp.zeros((N_MATCH, 1 << cfg.mbits), dtype=jnp.int32),
        "match_ptr": jnp.zeros(N_MATCH, dtype=jnp.int32),
        "match_len": jnp.zeros(N_MATCH, dtype=jnp.int32),
        "match_conf": jnp.full((N_MATCH, 32), 0.55, dtype=jnp.float32),
        "w1": jnp.full((_MIX1_TOTAL, N_INPUTS), 1.0 / N_INPUTS,
                       dtype=jnp.float32),
        "bias1": jnp.zeros((N_MIX1, 256), dtype=jnp.float32),
        "w2": jnp.full((8, N_MIX1), 1.0 / N_MIX1, dtype=jnp.float32),
        "bias2": jnp.zeros(256, dtype=jnp.float32),
        "apm1": jnp.tile(_apm_row(), (256, 1)),
        "apm2": jnp.tile(_apm_row(), (64, 1)),
        "hist": jnp.zeros(cfg.block_size, dtype=jnp.uint8),
        "t": jnp.zeros((), dtype=jnp.int32),
    }
    if cfg.lstm_hidden:
        st["lstm"] = init_lstm(LstmConfig(hidden=cfg.lstm_hidden))
    return st


def _apm_row():
    # 33 nodes spanning stretch [-8, 8], stored as probabilities
    stv = (np.arange(33) - 16) * 0.5
    return jnp.asarray(1.0 / (1.0 + np.exp(-stv)), dtype=jnp.float32)


def init_coder(cfg: EngineConfig):
    return {
        "x1": jnp.zeros((), dtype=jnp.uint32),
        "x2": M32,
        "xc": jnp.zeros((), dtype=jnp.uint32),
        "total": jnp.zeros((), dtype=jnp.int32),
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
        b1,                                                       # 19
        l4 & jnp.uint32(0xFFFF),                                  # 20
    ]
    v = jnp.stack(vals)
    salt = jnp.arange(N_BANK, dtype=jnp.uint32) * PRIME2
    return mix32(v, salt)


# ---------------------------------------------------------- float st/squash


def _stretch_f(p):
    p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    return jnp.clip(jnp.log(p / (1.0 - p)), -ST_CLAMP, ST_CLAMP)


def _squash_f(st):
    return jax.nn.sigmoid(st)


# --------------------------------------------------------------- range coder


def _coder_bit(cd, comp, enc_bit, p16, mode):
    """One shared coder step for both modes (uint32 exact; cf.
    src/coder/encoder.cpp:14-29 / decoder.cpp:20-33)."""
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


# ----------------------------------------------------------- tree predictor


def _predict_tree(cfg, state, bases):
    """Predictions for all 256 tree nodes of the current byte.

    Returns (p_tree f32[256] in (0,1), aux dict for _update_tree).
    All arrays are node-aligned: index = tree node id (1..255).
    """
    cs = state["ctx"]
    node = jnp.asarray(_NODE)
    level = jnp.asarray(_LEVEL)

    # ---- bank: one row per model, node-aligned
    rmask = jnp.uint32(cfg.rows - 1)
    rowi = ((bases >> U8) & rmask).astype(jnp.int32)          # (NM,)
    rows = state["bank"][jnp.arange(N_BANK), rowi]            # (NM, 256) u32
    p12 = (rows >> U8).astype(jnp.float32) * (1.0 / 4096.0)
    cnt = (rows & jnp.uint32(0xFF)).astype(jnp.float32)
    st_bank = _stretch_f(p12)                                 # (NM, 256)

    # ---- direct models: d0 is already node-aligned; d1 row by last byte
    b1 = (cs["last4"] & jnp.uint32(0xFF)).astype(jnp.int32)
    st_d0 = _stretch_f(state["d0_p"])                         # (256,)
    d1row = state["d1"][b1]                                   # (256,) u32
    p12_d1 = (d1row >> U8).astype(jnp.float32) * (1.0 / 4096.0)
    st_d1 = _stretch_f(p12_d1)

    # ---- match models: expected byte -> per-node alive mask + signed conf
    exp_byte = state["hist"][
        jnp.clip(state["match_ptr"], 0, cfg.block_size - 1)].astype(jnp.int32)
    lenb = jnp.minimum(state["match_len"], 31)
    conf = state["match_conf"][jnp.arange(N_MATCH), lenb]     # (2,) f32
    # node is on exp_byte's path iff node == (1<<lev) + (exp >> (8-lev))
    exp_pref = (1 << level)[None, :] + (
        exp_byte[:, None] >> (8 - level)[None, :])            # (2, 256)
    alive = (node[None, :] == exp_pref) & (state["match_len"] > 0)[:, None]
    exp_bit = (exp_byte[:, None] >> (7 - level)[None, :]) & 1
    sign = jnp.where(exp_bit == 1, 1.0, -1.0)
    st_conf = _stretch_f(conf)[:, None]
    st_match = jnp.where(alive, sign * st_conf, 0.0)          # (2, 256)

    # ---- LSTM: per-node conditional bit probability from cached cumsum
    if cfg.lstm_hidden:
        qcum = state["lstm"]["qcum"]                          # (257,) f32
        tot_lo = qcum[jnp.asarray(_LO)]
        tot_hi = qcum[jnp.asarray(_HI)]
        mid = qcum[jnp.asarray(_MID)]
        denom = jnp.maximum(tot_hi - tot_lo, 1e-3)
        p_lstm = jnp.clip((tot_hi - mid) / denom, 1e-5, 1 - 1e-5)
        st_lstm = _stretch_f(p_lstm)[None, :]                 # (1, 256)
    else:
        st_lstm = jnp.zeros((1, 256), jnp.float32)

    x = jnp.concatenate([st_bank, st_d0[None], st_d1[None],
                         st_match, st_lstm], axis=0)          # (NIN, 256)

    # ---- layer-1 mixers
    longest = (jnp.max(jnp.where(state["match_len"] > 0, lenb, 0)) * 2
               + jnp.max(jnp.where(state["match_len"] > 0,
                                   (exp_byte >> 7) & 1, 0))).astype(jnp.int32)
    dyn_idx = jnp.stack([
        b1,
        ((cs["ohash"][2] >> jnp.uint32(22)) & jnp.uint32(1023)).astype(jnp.int32),
        longest,
        ((cs["word"] >> jnp.uint32(24)) & jnp.uint32(0xFF)).astype(jnp.int32),
        (cs["clsreg"] & jnp.uint32(0xFF)).astype(jnp.int32),
        jnp.minimum(cs["linepos"], jnp.uint32(63)).astype(jnp.int32),
    ]) + jnp.asarray(_MIX1_OFF[2:])
    w_dyn = state["w1"][dyn_idx]                              # (6, NIN)
    w_const = state["w1"][0]                                  # (NIN,)
    w_level = jax.lax.dynamic_slice_in_dim(state["w1"], 1, 8)  # (8, NIN)
    w_lvl_nodes = w_level[level]                              # (256, NIN)

    dot_const = w_const @ x                                   # (256,)
    dot_dyn = w_dyn @ x                                       # (6, 256)
    dot_level = jnp.sum(w_lvl_nodes.T * x, axis=0)            # (256,)
    dots = jnp.concatenate(
        [dot_const[None], dot_level[None], dot_dyn], axis=0)  # (8, 256)
    dots = dots + state["bias1"]
    p1 = _squash_f(dots)
    st1 = jnp.clip(dots, -ST_CLAMP, ST_CLAMP)                 # (8, 256)

    # ---- layer-2 mixer (level-gated) + per-node bias
    w2n = state["w2"][level]                                  # (256, 8)
    dot2 = jnp.sum(w2n.T * st1, axis=0) + state["bias2"]      # (256,)
    p_mix = _squash_f(dot2)

    # ---- SSE: 2 interpolated APMs over stretch position
    def apm(tbl_row, p):
        tf = jnp.clip((_stretch_f(p) + 8.0) * 2.0, 0.0, 31.999)
        tl = tf.astype(jnp.int32)
        frac = tf - tl.astype(jnp.float32)
        a = tbl_row[tl]
        bb = tbl_row[tl + 1]
        return a * (1 - frac) + bb * frac, tl, frac

    apm1_row = state["apm1"][b1]                              # (33,)
    apm2_row = state["apm2"][longest]
    pa1, t1, f1 = apm(apm1_row, p_mix)
    pa2, t2, f2 = apm(apm2_row, p_mix)
    pa = jnp.clip(0.5 * (pa1 + pa2), 1e-6, 1 - 1e-6)
    st_fin = 0.4 * _stretch_f(p_mix) + 0.6 * _stretch_f(pa)
    p_tree = _squash_f(st_fin)                                # (256,)

    aux = dict(rowi=rowi, p12=p12, cnt=cnt, b1=b1, d1row=d1row,
               p12_d1=p12_d1, alive=alive, exp_bit=exp_bit, lenb=lenb,
               conf=conf, x=x, dyn_idx=dyn_idx, w_const=w_const,
               w_level=w_level, p1=p1, st1=st1, p_mix=p_mix,
               longest=longest, t1=t1, f1=f1, t2=t2, f2=f2, p_tree=p_tree)
    return p_tree, aux


# ------------------------------------------------------------- tree update


def _update_tree(cfg, state, aux, byte):
    """Adapt every model along the byte's 8-node tree path. Pure.

    path node at level k: n_k = 2^k + (byte >> (8-k)); its target is bit
    (byte >> (7-k)) & 1.  Everything is dense masked math over the
    node-aligned arrays followed by one row scatter per table.
    """
    level = jnp.asarray(_LEVEL)
    node = jnp.asarray(_NODE)
    pref = (1 << level) + (byte >> (8 - level))               # (256,)
    on_path = (node == pref).astype(jnp.float32)
    on_path = on_path.at[0].set(0.0)
    target = ((byte >> (7 - level)) & 1).astype(jnp.float32)  # (256,)

    # ---- bank rows: counter update on path slots
    p12, cnt = aux["p12"], aux["cnt"]
    rate = 1.0 / (cnt + 1.6)
    newp = p12 + (target[None, :] - p12) * rate * on_path[None, :]
    newc = jnp.minimum(cnt + on_path[None, :], float(CNT_CAP))
    packed = ((jnp.clip(newp * 4096.0, 1, 4095).astype(jnp.uint32) << U8)
              | newc.astype(jnp.uint32))
    state["bank"] = state["bank"].at[
        jnp.arange(N_BANK), aux["rowi"]].set(packed)

    # ---- d0 (node-aligned table IS the tree; no gather/scatter at all)
    c0 = state["d0_c"]
    r0 = 1.0 / (c0 + 1.6)
    state["d0_p"] = state["d0_p"] + (target - state["d0_p"]) * r0 * on_path
    state["d0_c"] = jnp.minimum(c0 + on_path, float(CNT_CAP))

    # ---- d1 row
    p12d = aux["p12_d1"]
    cntd = (aux["d1row"] & jnp.uint32(0xFF)).astype(jnp.float32)
    rd = 1.0 / (cntd + 1.6)
    newpd = p12d + (target - p12d) * rd * on_path
    newcd = jnp.minimum(cntd + on_path, float(CNT_CAP))
    packd = ((jnp.clip(newpd * 4096.0, 1, 4095).astype(jnp.uint32) << U8)
             | newcd.astype(jnp.uint32))
    state["d1"] = state["d1"].at[aux["b1"]].set(packd)

    # ---- match confidence (per model, one length bucket)
    hit = (aux["exp_bit"].astype(jnp.float32) == target[None, :])
    af = aux["alive"].astype(jnp.float32)
    n_alive = jnp.sum(af * on_path[None, :], axis=1)
    frac_hit = jnp.sum(hit * af * on_path[None, :], axis=1) \
        / jnp.maximum(n_alive, 1.0)
    upd = aux["conf"] + (frac_hit - aux["conf"]) * 0.03 * \
        jnp.minimum(n_alive, 1.0)
    state["match_conf"] = state["match_conf"].at[
        jnp.arange(N_MATCH), aux["lenb"]].set(upd)

    # ---- mixers: logistic-loss gradient on path nodes
    err1 = (target[None, :] - aux["p1"]) * on_path[None, :]   # (8, 256)
    dws = err1 @ aux["x"].T                                   # (8, NIN)
    state["w1"] = state["w1"].at[0].set(aux["w_const"] + MIX_LR * dws[0])
    lvl_onehot = jnp.asarray(_LVL_ONEHOT)                     # (8, 256)
    dl = (err1[1][None, :] * lvl_onehot) @ aux["x"].T         # (8lvl, NIN)
    state["w1"] = jax.lax.dynamic_update_slice_in_dim(
        state["w1"], aux["w_level"] + MIX_LR * dl, 1, axis=0)
    state["w1"] = state["w1"].at[aux["dyn_idx"]].add(MIX_LR * dws[2:])
    state["bias1"] = state["bias1"] + MIX_LR * err1

    err2 = (target - aux["p_mix"]) * on_path                  # (256,)
    dw2 = lvl_onehot @ (err2[:, None] * aux["st1"].T)         # (8lvl, 8mix)
    state["w2"] = state["w2"] + MIX_LR * dw2
    state["bias2"] = state["bias2"] + MIX_LR * err2

    # ---- APMs: update the two interpolation nodes at each path node
    j33 = jnp.arange(33)

    def apm_delta(tl, frac, prow):
        oh_l = (j33[None, :] == tl[:, None]).astype(jnp.float32)
        oh_r = (j33[None, :] == (tl + 1)[:, None]).astype(jnp.float32)
        errn = (target - prow) * on_path
        d = (oh_l * ((1 - frac) * errn)[:, None]
             + oh_r * (frac * errn)[:, None])
        return APM_RATE * jnp.sum(d, axis=0)

    a1 = jnp.clip(state["apm1"][aux["b1"]]
                  + apm_delta(aux["t1"], aux["f1"], aux["p_tree"]),
                  1e-4, 1 - 1e-4)
    state["apm1"] = state["apm1"].at[aux["b1"]].set(a1)
    a2 = jnp.clip(state["apm2"][aux["longest"]]
                  + apm_delta(aux["t2"], aux["f2"], aux["p_tree"]),
                  1e-4, 1 - 1e-4)
    state["apm2"] = state["apm2"].at[aux["longest"]].set(a2)
    return state


def _match_byte_update(cfg, state, byte_i32, t):
    """Reposition match models at a byte boundary (cf. src/models/match.cpp:48-60)."""
    mmask = jnp.uint32((1 << cfg.mbits) - 1)
    cs = state["ctx"]  # already advanced to include byte
    hs = jnp.stack([cs["ohash"][o] for o in MATCH_ORDERS])
    h = (mix32(hs, jnp.uint32(0x2545F491)) & mmask).astype(jnp.int32)
    mm = jnp.arange(N_MATCH)
    cand = state["match_tbl"][mm, h]
    state["match_tbl"] = state["match_tbl"].at[mm, h].set(t + 1)
    ptr, ln = state["match_ptr"], state["match_len"]
    pred = state["hist"][jnp.clip(ptr, 0, cfg.block_size - 1)].astype(jnp.int32)
    ok = (ln > 0) & (pred == byte_i32)
    state["match_ptr"] = jnp.where(ok, ptr + 1, cand)
    state["match_len"] = jnp.where(ok, jnp.minimum(ln + 1, 65535),
                                   jnp.where(cand > 0, 1, 0))
    return state


# ---------------------------------------------------------------- byte step


def make_byte_step(cfg: EngineConfig):
    imask = jnp.uint32((1 << cfg.ibits) - 1)

    def byte_step(carry, inp_byte):
        state, cd, comp, mode = carry
        t = state["t"]
        ind_key_prev = (state["ctx"]["last4"] & imask).astype(jnp.int32)
        bases = _bank_bases(state["ctx"], state["ind_val"])

        p_tree, aux = _predict_tree(cfg, state, bases)
        p16_tree = jnp.clip((p_tree * 65536.0).astype(jnp.int32),
                            64, 65472).astype(jnp.uint32)

        # ---- the only sequential part: 8 coder steps walking the tree
        byte_acc = jnp.ones((), jnp.int32)
        emits, c32 = [], jnp.zeros((), jnp.uint32)
        for k in range(8):
            p16 = p16_tree[byte_acc]
            enc_bit = ((inp_byte.astype(jnp.int32) >> (7 - k)) & 1)
            cd, bit, emit4, kk = _coder_bit(cd, comp, enc_bit, p16, mode)
            e32 = (emit4[0].astype(jnp.uint32) << jnp.uint32(24)) \
                | (emit4[1].astype(jnp.uint32) << jnp.uint32(16)) \
                | (emit4[2].astype(jnp.uint32) << U8) \
                | emit4[3].astype(jnp.uint32)
            emits.append(e32)
            c32 = c32 | (kk.astype(jnp.uint32) << jnp.uint32(4 * k))
            byte_acc = byte_acc * 2 + bit
        # flat (B,)-shaped ys outputs: the only scan-output shape XLA-CPU
        # compiles fast
        ys = tuple(emits) + (c32,)
        byte = byte_acc & 255

        state = _update_tree(cfg, state, aux, byte)

        state["hist"] = jax.lax.dynamic_update_slice(
            state["hist"], byte.astype(jnp.uint8)[None],
            (t % cfg.block_size,))

        # indirect history-of-hashes (cf. src/contexts/indirect-hash.cpp)
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


# ------------------------------------------------------------ segment scan


def make_segment_fn(cfg: EngineConfig):
    """Unjitted batched segment scan: (state, cd, inp_T, comp, mode) ->
    (state, cd, e32 (S,B,8), c32 (S,B)).

    inp_T is time-major (S, B).  Structure is scan-over-vmapped-step (NOT
    vmap-of-scan, which lowers pathologically slowly)."""
    step = make_byte_step(cfg)

    def vstep(state, cd, comp, byte_b, mode):
        (state, cd, _, _), ys = step((state, cd, comp, mode), byte_b)
        return state, cd, ys

    vstep = jax.vmap(vstep, in_axes=(0, 0, 0, 0, None))

    def segment(state, cd, inp_T, comp, mode):
        def body(carry, byte_b):
            state, cd = carry
            state, cd, ys = vstep(state, cd, comp, byte_b, mode)
            return (state, cd), ys

        (state, cd), ys = jax.lax.scan(
            body, (state, cd), inp_T, length=cfg.seg_size)
        e32 = jnp.stack(ys[:8], axis=-1)     # (S, B, 8)
        c32 = ys[8]                          # (S, B)
        return state, cd, e32, c32

    return segment


def make_seg_compactor(cfg: EngineConfig):
    """Unjitted ``(e32, c32) -> (seg_out, seg_len)``: compacts one
    segment's packed emission words into per-block contiguous bytes with
    one exclusive cumsum + one scatter per block."""

    def compact(e32, c32):
        s = cfg.seg_size
        b = e32.shape[1]
        kidx = jnp.arange(8, dtype=jnp.uint32)
        cnts = ((c32[:, :, None] >> (4 * kidx)[None, None, :])
                & jnp.uint32(0xF)).astype(jnp.int32)          # (S, B, 8)
        cnts_t = jnp.transpose(cnts, (1, 0, 2)).reshape(b, s * 8)
        offs = jnp.cumsum(cnts_t, axis=1) - cnts_t            # (B, S*8)
        e_t = jnp.transpose(e32, (1, 0, 2)).reshape(b, s * 8)
        j = jnp.arange(4, dtype=jnp.int32)
        vals = ((e_t[:, :, None]
                 >> (jnp.uint32(24) - 8 * j.astype(jnp.uint32))[None, None, :])
                & jnp.uint32(0xFF)).astype(jnp.uint8)
        pos = offs[:, :, None] + j[None, None, :]
        valid = j[None, None, :] < cnts_t[:, :, None]
        pos = jnp.where(valid, pos, cfg.seg_cap).reshape(b, s * 32)
        vals = vals.reshape(b, s * 32)

        def scatter_one(p, v):
            buf = jnp.zeros(cfg.seg_cap + 1, dtype=jnp.uint8)
            return buf.at[p].set(v, mode="drop")[:cfg.seg_cap]

        seg_len = jnp.sum(cnts_t, axis=1)
        return jax.vmap(scatter_one)(pos, vals), seg_len

    return compact


# --------------------------------------------------------------- transcoder


def make_transcoder(cfg: EngineConfig):
    """Host-looped segmented transcoder: ``transcode(state, inp, comp,
    mode) -> (hist, out, out_len)``.

    encode: inp (B, N) uint8 padded blocks, comp zeros -> compressed.
    decode: comp (B, comp_size) streams, inp zeros -> hist are the bytes.
    Segments bound each device execution's runtime (long single
    executions crash the worker) and let compaction overlap the scan.
    """
    seg_jit = jax.jit(make_segment_fn(cfg), donate_argnums=(0, 1))
    comp_jit = jax.jit(make_seg_compactor(cfg), donate_argnums=(0, 1))

    def transcode(state, inp, comp, mode):
        b = int(inp.shape[0])
        cd = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim),
            init_coder(cfg))
        comp = jnp.asarray(comp)
        is_dec = int(np.asarray(mode)) == MODE_DECODE
        if is_dec:
            xc = (comp[:, 0].astype(jnp.uint32) << jnp.uint32(24)) \
                | (comp[:, 1].astype(jnp.uint32) << jnp.uint32(16)) \
                | (comp[:, 2].astype(jnp.uint32) << U8) \
                | comp[:, 3].astype(jnp.uint32)
            cd["xc"] = xc
            cd["rptr"] = jnp.full(b, 4, jnp.int32)
        inp_T = jnp.transpose(jnp.asarray(inp))
        n_segs = cfg.block_size // cfg.seg_size
        mode = jnp.int32(mode)
        parts = [[] for _ in range(b)]
        for si in range(n_segs):
            seg = inp_T[si * cfg.seg_size:(si + 1) * cfg.seg_size]
            state, cd, e32, c32 = seg_jit(state, cd, seg, comp, mode)
            seg_out, seg_len = comp_jit(e32, c32)
            seg_out = np.asarray(seg_out)
            seg_len = np.asarray(seg_len)
            for i in range(b):
                parts[i].append(seg_out[i, :seg_len[i]].tobytes())
        x1 = np.asarray(cd["x1"])
        hist = np.asarray(state["hist"])
        out = np.zeros((b, cfg.comp_size), dtype=np.uint8)
        out_len = np.zeros(b, dtype=np.int64)
        for i in range(b):
            stream = b"".join(parts[i]) + bytes(
                [(int(x1[i]) >> (24 - 8 * j)) & 0xFF for j in range(4)])
            L = min(len(stream), cfg.comp_size)
            out[i, :L] = np.frombuffer(stream[:L], dtype=np.uint8)
            out_len[i] = len(stream)
        return hist, out, out_len

    return transcode


# ------------------------------------------------------------- pretraining


def reset_stream_state(cfg: EngineConfig, state):
    """Reset per-stream positional state, keep everything learned
    (cf. Pretrain, src/predictor.cpp:471-487 + runner.cpp:206)."""
    fresh = init_state(cfg)
    out = dict(state)
    out["ctx"] = fresh["ctx"]
    out["ind_val"] = fresh["ind_val"]
    out["hist"] = fresh["hist"]
    out["t"] = fresh["t"]
    out["match_tbl"] = fresh["match_tbl"]
    out["match_ptr"] = fresh["match_ptr"]
    out["match_len"] = fresh["match_len"]
    if cfg.lstm_hidden:
        lstm = dict(state["lstm"])
        for k in ("h", "c", "h_prev", "c_prev", "prev_byte", "qcum"):
            lstm[k] = fresh["lstm"][k]
        out["lstm"] = lstm
    return out


def make_pretrainer(cfg: EngineConfig):
    """``(state, data) -> state``: replays a training stream through the
    full model-update path in host-looped segments, then resets
    positional state.  data is padded up to a segment multiple."""
    seg_jit = jax.jit(make_segment_fn(cfg), donate_argnums=(0, 1))

    def pretrain(state, data):
        data = np.asarray(data)
        s = cfg.seg_size
        n = ((len(data) + s - 1) // s) * s
        pad = np.full(n, 32, dtype=np.uint8)
        pad[:len(data)] = data
        stateb = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (1,) + (1,) * x.ndim), state)
        cd = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (1,) + (1,) * x.ndim),
            init_coder(cfg))
        comp = jnp.zeros((1, 8), dtype=jnp.uint8)
        mode = jnp.int32(MODE_ENCODE)
        for si in range(n // s):
            seg = jnp.asarray(pad[si * s:(si + 1) * s][:, None])  # (S, 1)
            stateb, cd, _, _ = seg_jit(stateb, cd, seg, comp, mode)
        state = jax.tree_util.tree_map(lambda x: x[0], stateb)
        return reset_stream_state(cfg, state)

    return pretrain
