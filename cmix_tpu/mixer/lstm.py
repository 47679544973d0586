"""LSTM byte mixer: a recurrent 256-way byte model trained online.

Capability parity with the reference's LSTM stack (src/mixer/byte-mixer.cpp,
src/mixer/lstm.cpp, src/mixer/lstm-layer.cpp): a per-byte recurrent model
whose 256-way softmax is converted to per-bit probabilities by interval
sums (src/mixer/byte-mixer.cpp:22-38 + src/models/byte-model.cpp:8-37) and
fed to the mixer ensemble.  TPU-first redesign:

* fused gate design kept from the reference (input gate = 1 - forget,
  lstm-layer.cpp:75), layer norm per gate (lstm-layer.cpp:85-99)
* dense math is f32 on the MXU; correctness does not depend on float
  semantics because encode and decode share one executable (engine.py),
  and the value fed to the coder is quantized to int12 first
* training is a single-step gradient (jax.grad through the last cell step
  and the output layer) with Adam -- the reference's horizon-100 replayed
  BPTT (lstm.cpp:87-118) costs 100x compute per byte; the horizon can
  grow later without changing this architecture.

Bookkeeping (one byte b observed at position t):
  h_prev/c_prev = hidden after byte t-2,  prev_byte = byte t-1,
  h/c = cell(params, h_prev, c_prev, prev_byte)  [what predicted b]
  1. grads of -log softmax(logits(cell(params, h_prev, c_prev,
     prev_byte)))[b]   -> Adam update
  2. h', c' = cell(new_params, h, c, b); qcum = cumsum softmax(logits(h'))
     [prediction for byte t+1]
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LstmConfig:
    hidden: int = 256
    lr: float = 2e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-6


def init_lstm(cfg: LstmConfig, seed: int = 0x1234):
    """Deterministic init (format-specified PRNG, replaces the reference's
    srand(0xDEADBEEF) at predictor.cpp:26)."""
    h = cfg.hidden
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    scale = 1.0 / np.sqrt(h)
    params = {
        # x_embed(256 rows) + h + bias -> 3 fused gates (f, g, o)
        "wx": jax.random.normal(k1, (256, 3 * h), jnp.float32) * 0.08,
        "wh": jax.random.normal(k2, (h, 3 * h), jnp.float32) * scale,
        "b": jnp.zeros(3 * h, jnp.float32),
        "wo": jax.random.normal(k3, (h, 256), jnp.float32) * scale,
        "bo": jnp.zeros(256, jnp.float32),
    }
    opt = {
        "m": jax.tree_util.tree_map(jnp.zeros_like, params),
        "v": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }
    return {
        "params": params,
        "opt": opt,
        "h": jnp.zeros(h, jnp.float32),
        "c": jnp.zeros(h, jnp.float32),
        "h_prev": jnp.zeros(h, jnp.float32),
        "c_prev": jnp.zeros(h, jnp.float32),
        "prev_byte": jnp.zeros((), jnp.int32),
        # cumulative distribution for the next byte, scaled 2^16 (uniform)
        "qcum": jnp.asarray(
            np.arange(257, dtype=np.float32) * (65536.0 / 256.0)),
    }


def _ln(x):
    m = jnp.mean(x)
    v = jnp.mean(jnp.square(x - m))
    return (x - m) * jax.lax.rsqrt(v + 1e-5)


def _cell(params, h, c, byte):
    """One fused-gate LSTM step (input gate = 1 - forget)."""
    hh = params["wx"][byte] + h @ params["wh"] + params["b"]
    H = h.shape[0]
    f = jax.nn.sigmoid(_ln(hh[:H]))
    g = jnp.tanh(_ln(hh[H:2 * H]))
    o = jax.nn.sigmoid(_ln(hh[2 * H:]))
    c_new = f * c + (1.0 - f) * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _logits(params, h):
    return h @ params["wo"] + params["bo"]


def lstm_bit_p12(lstm_state, byte_acc, k):
    """p12 for bit k of the current byte from the cached distribution.

    byte_acc is the sentinel-bit accumulator (1..255); the byte interval
    is [ (byte_acc - 2^k) << (8-k), +2^(8-k) ).
    """
    qcum = lstm_state["qcum"]
    span = 1 << (8 - k)
    lo = (byte_acc - (1 << k)) << (8 - k)
    total_lo = qcum[lo]
    total_hi = qcum[lo + span]
    mid = qcum[lo + (span >> 1)]
    denom = jnp.maximum(total_hi - total_lo, 1e-3)
    p1 = (total_hi - mid) / denom
    p12 = jnp.clip((p1 * 4096.0).astype(jnp.int32), 1, 4095)
    return p12


def lstm_byte_update(cfg: LstmConfig, st, byte):
    """Adam step on the observed byte, advance, cache next distribution."""
    params, opt = st["params"], st["opt"]

    def loss_fn(p):
        hn, _ = _cell(p, st["h_prev"], st["c_prev"], st["prev_byte"])
        return -jax.nn.log_softmax(_logits(p, hn))[byte]

    grads = jax.grad(loss_fn)(params)

    step = opt["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - jnp.power(jnp.float32(cfg.beta1), t)
    bc2 = 1.0 - jnp.power(jnp.float32(cfg.beta2), t)

    def upd(p, g, m, v):
        m = cfg.beta1 * m + (1 - cfg.beta1) * g
        v = cfg.beta2 * v + (1 - cfg.beta2) * g * g
        return p - cfg.lr * (m / bc1) / (jnp.sqrt(v / bc2) + cfg.eps), m, v

    new_p, new_m, new_v = {}, {}, {}
    for k in params:
        new_p[k], new_m[k], new_v[k] = upd(
            params[k], grads[k], opt["m"][k], opt["v"][k])

    h_new, c_new = _cell(new_p, st["h"], st["c"], byte)
    q = jax.nn.softmax(_logits(new_p, h_new)) * 65536.0
    qcum = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(q)])

    return {
        "params": new_p,
        "opt": {"m": new_m, "v": new_v, "step": step},
        "h": h_new, "c": c_new,
        "h_prev": st["h"], "c_prev": st["c"], "prev_byte": byte,
        "qcum": qcum,
    }


# ----------------------------------------------------- shared-weight batch
# v3 engine: ONE set of LSTM weights serves all B blocks of a coding group
# (the reference's LSTM is per-stream, src/mixer/lstm.cpp; sharing turns
# the per-byte cell into one MXU matmul and divides optimizer-state HBM
# traffic by B, and the weights see B streams of training signal).


def init_lstm_shared(cfg: LstmConfig, seed: int = 0x1234):
    st = init_lstm(cfg, seed)
    return {"params": st["params"], "opt": st["opt"]}


def init_lstm_perblock(cfg: LstmConfig):
    h = cfg.hidden
    return {
        "h": jnp.zeros(h, jnp.float32),
        "c": jnp.zeros(h, jnp.float32),
        "h_prev": jnp.zeros(h, jnp.float32),
        "c_prev": jnp.zeros(h, jnp.float32),
        "prev_byte": jnp.zeros((), jnp.int32),
        "qcum": jnp.asarray(
            np.arange(257, dtype=np.float32) * (65536.0 / 256.0)),
    }


def _cell_b(params, h, c, bytes_b):
    """Batched fused-gate cell: h,c (B,H), bytes_b (B,) int32."""
    hh = params["wx"][bytes_b] + h @ params["wh"] + params["b"][None, :]
    H = h.shape[1]
    m = jnp.mean(hh.reshape(h.shape[0], 3, H), axis=2, keepdims=True)
    v = jnp.mean(jnp.square(hh.reshape(h.shape[0], 3, H) - m), axis=2,
                 keepdims=True)
    hh = ((hh.reshape(h.shape[0], 3, H) - m)
          * jax.lax.rsqrt(v + 1e-5)).reshape(h.shape[0], 3 * H)
    f = jax.nn.sigmoid(hh[:, :H])
    g = jnp.tanh(hh[:, H:2 * H])
    o = jax.nn.sigmoid(hh[:, 2 * H:])
    c_new = f * c + (1.0 - f) * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_shared_byte_update(cfg: LstmConfig, sh, pb, bytes_b):
    """One Adam step on shared params from the batch-mean one-step loss,
    then advance every block and cache next-byte distributions.

    sh: {params, opt}; pb leaves have leading batch dim; bytes_b (B,).
    """
    params, opt = sh["params"], sh["opt"]

    def loss_fn(p):
        hn, _ = _cell_b(p, pb["h_prev"], pb["c_prev"], pb["prev_byte"])
        logits = hn @ p["wo"] + p["bo"][None, :]
        lse = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(
            lse, bytes_b[:, None], axis=1))

    grads = jax.grad(loss_fn)(params)

    step = opt["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - jnp.power(jnp.float32(cfg.beta1), t)
    bc2 = 1.0 - jnp.power(jnp.float32(cfg.beta2), t)

    new_p, new_m, new_v = {}, {}, {}
    for k in params:
        g = grads[k]
        m = cfg.beta1 * opt["m"][k] + (1 - cfg.beta1) * g
        v = cfg.beta2 * opt["v"][k] + (1 - cfg.beta2) * g * g
        new_m[k], new_v[k] = m, v
        new_p[k] = params[k] - cfg.lr * (m / bc1) / (
            jnp.sqrt(v / bc2) + cfg.eps)

    h_new, c_new = _cell_b(new_p, pb["h"], pb["c"], bytes_b)
    logits = h_new @ new_p["wo"] + new_p["bo"][None, :]
    q = jax.nn.softmax(logits, axis=1) * 65536.0
    qcum = jnp.concatenate(
        [jnp.zeros((q.shape[0], 1), jnp.float32),
         jnp.cumsum(q, axis=1)], axis=1)

    sh = {"params": new_p, "opt": {"m": new_m, "v": new_v, "step": step}}
    pb = {"h": h_new, "c": c_new, "h_prev": pb["h"], "c_prev": pb["c"],
          "prev_byte": bytes_b, "qcum": qcum}
    return sh, pb
