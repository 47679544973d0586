"""LSTM byte mixer: a recurrent 256-way byte model trained online.

Capability parity with the reference's LSTM stack (src/mixer/byte-mixer.cpp,
src/mixer/lstm.cpp, src/mixer/lstm-layer.cpp): a stacked recurrent model
whose 256-way softmax is converted to per-bit probabilities by interval
sums (src/mixer/byte-mixer.cpp:22-38 + src/models/byte-model.cpp:8-37) and
fed to the mixer ensemble.  TPU-first redesign:

* fused gate design kept from the reference (input gate = 1 - forget,
  lstm-layer.cpp:75), layer norm per gate (lstm-layer.cpp:85-99),
  stacked layers with the output read from ALL layers' hidden states
  (lstm.cpp output over layer concatenation)
* ONE weight set serves all B blocks of a coding group (the reference's
  LSTM is per-stream): the per-byte cell is one MXU matmul over the
  batch, optimizer HBM traffic is divided by B, and the weights train
  on B streams at once
* truncated BPTT over a ring of the last ``horizon`` bytes, replayed
  under ``jax.grad`` as a ``lax.scan`` with the loss injected at every
  window position -- the reference replays a horizon-100 window per
  byte (lstm.cpp:87-118); the horizon here is a config knob traded
  against step latency
* dense math is f32 on the MXU; correctness does not depend on float
  semantics because encode and decode share one executable (engine.py)
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp


# Unrolling the horizon-W BPTT scan lets XLA fuse across window
# positions (the per-iteration layout copies were ~8% of the byte step
# in the r5 census); identical math, loop structure only.
_SCAN_UNROLL = True      # fully unroll (horizon is small by design)


@dataclass(frozen=True)
class LstmConfig:
    hidden: int = 256
    layers: int = 2
    horizon: int = 8
    lr: float = 2e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-6


def init_lstm_shared(cfg: LstmConfig, seed: int = 0x1234):
    """Deterministic init (format-specified PRNG, replaces the reference's
    srand(0xDEADBEEF) at predictor.cpp:26)."""
    h, L = cfg.hidden, cfg.layers
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = 1.0 / np.sqrt(h)
    params = {
        # layer 0 input: byte embedding rows; layers l>0: h_{l-1} @ wi[l]
        "wx": jax.random.normal(k1, (256, 3 * h), jnp.float32) * 0.08,
        "wh": jax.random.normal(k2, (L, h, 3 * h), jnp.float32) * scale,
        "wi": jax.random.normal(k4, (L, h, 3 * h), jnp.float32) * scale,
        "b": jnp.zeros((L, 3 * h), jnp.float32),
        "wo": jax.random.normal(k3, (L * h, 256), jnp.float32) * scale,
        "bo": jnp.zeros(256, jnp.float32),
    }
    opt = {
        "m": jax.tree_util.tree_map(jnp.zeros_like, params),
        "v": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }
    return {"params": params, "opt": opt}


def init_lstm_perblock(cfg: LstmConfig):
    h, L, W = cfg.hidden, cfg.layers, cfg.horizon
    return {
        "h": jnp.zeros((L, h), jnp.float32),     # running state
        "c": jnp.zeros((L, h), jnp.float32),
        "h0": jnp.zeros((L, h), jnp.float32),    # BPTT window start
        "c0": jnp.zeros((L, h), jnp.float32),
        "ring": jnp.zeros(W, jnp.int32),         # last W bytes
        # cumulative distribution for the next byte, scaled 2^16 (uniform)
        "qcum": jnp.asarray(
            np.arange(257, dtype=np.float32) * (65536.0 / 256.0)),
    }


def _ln_b(x):
    """Per-gate layer norm, batched: x (B, 3, H)."""
    m = jnp.mean(x, axis=2, keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=2, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-5)


def _stack_cell_b(params, h, c, bytes_b):
    """One stacked fused-gate step: h, c (B, L, H), bytes_b (B,) int32."""
    B, L, H = h.shape
    x = params["wx"][bytes_b]                                # (B, 3H)
    hs, cs = [], []
    for lay in range(L):
        if lay > 0:
            x = hs[-1] @ params["wi"][lay]
        pre = x + h[:, lay] @ params["wh"][lay] + params["b"][lay][None]
        pre = _ln_b(pre.reshape(B, 3, H)).reshape(B, 3 * H)
        f = jax.nn.sigmoid(pre[:, :H])
        g = jnp.tanh(pre[:, H:2 * H])
        o = jax.nn.sigmoid(pre[:, 2 * H:])
        c_new = f * c[:, lay] + (1.0 - f) * g
        h_new = o * jnp.tanh(c_new)
        hs.append(h_new)
        cs.append(c_new)
    return jnp.stack(hs, axis=1), jnp.stack(cs, axis=1)


def _logits_b(params, h):
    """h (B, L, H) -> (B, 256) over the layer concatenation."""
    B = h.shape[0]
    return h.reshape(B, -1) @ params["wo"] + params["bo"][None]


def lstm_shared_byte_update(cfg: LstmConfig, sh, pb, bytes_b):
    """One Adam step on shared params from the horizon-replayed loss,
    then advance every block and cache next-byte distributions.

    sh: {params, opt}; pb leaves have leading batch dim; bytes_b (B,).
    """
    params, opt = sh["params"], sh["opt"]
    ring = pb["ring"]                                        # (B, W)
    # replay inputs ring[0..W-1]; targets ring[1..W-1] ++ [new byte]
    targets = jnp.concatenate([ring[:, 1:], bytes_b[:, None]], axis=1)

    def loss_fn(p):
        def step(carry, xt):
            h, c = carry
            inp, tgt = xt
            h, c = _stack_cell_b(p, h, c, inp)
            lse = jax.nn.log_softmax(_logits_b(p, h))
            nll = -jnp.mean(jnp.take_along_axis(lse, tgt[:, None], axis=1))
            return (h, c), nll
        (_, _), nlls = jax.lax.scan(
            step, (pb["h0"], pb["c0"]),
            (jnp.transpose(ring), jnp.transpose(targets)),
            unroll=_SCAN_UNROLL)
        return jnp.mean(nlls)

    grads = jax.grad(loss_fn)(params)

    step = opt["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - jnp.power(jnp.float32(cfg.beta1), t)
    bc2 = 1.0 - jnp.power(jnp.float32(cfg.beta2), t)

    new_p, new_m, new_v = {}, {}, {}
    for k in params:
        g = jnp.clip(grads[k], -10.0, 10.0)    # lstm-layer.cpp:101-106
        m = cfg.beta1 * opt["m"][k] + (1 - cfg.beta1) * g
        v = cfg.beta2 * opt["v"][k] + (1 - cfg.beta2) * g * g
        new_m[k], new_v[k] = m, v
        new_p[k] = params[k] - cfg.lr * (m / bc1) / (
            jnp.sqrt(v / bc2) + cfg.eps)

    # slide the BPTT window start over the oldest ring byte
    h0, c0 = _stack_cell_b(new_p, pb["h0"], pb["c0"], ring[:, 0])
    new_ring = jnp.concatenate([ring[:, 1:], bytes_b[:, None]], axis=1)
    # advance the running prediction state over the new byte
    h_new, c_new = _stack_cell_b(new_p, pb["h"], pb["c"], bytes_b)
    q = jax.nn.softmax(_logits_b(new_p, h_new), axis=1) * 65536.0
    qcum = jnp.concatenate(
        [jnp.zeros((q.shape[0], 1), jnp.float32),
         jnp.cumsum(q, axis=1)], axis=1)

    sh = {"params": new_p, "opt": {"m": new_m, "v": new_v, "step": step}}
    pb = {"h": h_new, "c": c_new, "h0": h0, "c0": c0, "ring": new_ring,
          "qcum": qcum}
    return sh, pb
