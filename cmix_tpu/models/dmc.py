"""Dynamic Markov Coding model, vectorized over blocks.

Capability parity with the reference's dmcModel/dmcForest
(src/models/paq8.cpp:7597-7822): a per-stream bit-level finite-state
machine that starts from a small order-1-flavored braid and *grows* by
cloning heavily-used transitions, so state identity converges to
whatever context lengths the data rewards.

TPU-first redesign, shaped by on-device profiles:

* edge arrays are flat ``(B, 2N)`` (bit-major: edge ``bit*N + node``) so
  the long axis sits on the 128-lane tiling -- ``(B, N, 2)`` forced
  T(2,128) relayout copies of the whole pool every step;
* a per-node probability cache ``dmc_p (B, N)`` is maintained at update
  time (only the <=3 touched nodes per bit change), so prediction needs
  ONE gather per tree node instead of two count gathers -- dynamic
  gathers cost ~12 ns/element on the TPU scalar core, so halving the
  element count halves the model's prediction cost;
* prediction evaluates ALL 255 byte-tree nodes at once by walking the
  pointer graph level-by-level (7 batched gathers), and the per-byte
  update advances the 8 traversed edges with branchless clone decisions
  (``jnp.where`` instead of the reference's data-dependent control
  flow).  When the pool fills, cloning stops deterministically (the
  reference resets instead, paq8.cpp:7654-7660; freezing keeps decode
  bit-exact without a flush).

Initial machine: 16 copies of the 255-node within-byte tree, one per
high nibble of the previous byte (order-0.5); finishing a byte with
value v enters copy v>>4.
"""

import numpy as np
import jax.numpy as jnp

import os

CLONE_TH1 = 2.0     # edge count needed to clone its target
CLONE_TH2 = 2.0     # target's other evidence needed to make a clone worthwhile
CNT_LIMIT = 255.0   # halve a node's counts past this (keeps ratios)
INIT_CNT = 0.2
N_COPIES = 16
N_BASE = N_COPIES * 255
# Tree levels DMC predicts (1..8).  The walk's per-element dynamic
# gathers run on the scalar core (~12 ns/element), and the full 255-node
# walk is the single most expensive model op at large batch; level L
# covers 2^L - 1 nodes, so L=6 halves the cost and leaves the two
# finest bit levels to the other models (p = 0.5 there).
DMC_LEVELS = int(os.environ.get("DMC_LEVELS", "6"))


def init_machine(n_nodes: int):
    """(nxt (2N,) int32, cnt (2N,) f32, p (N,) f32, cur (), top ())."""
    assert n_nodes >= N_BASE + 2, "dmc pool smaller than the base braid"
    nxt = np.zeros(2 * n_nodes, dtype=np.int32)
    for c in range(N_COPIES):
        base = c * 255
        for n in range(1, 256):
            for b in (0, 1):
                if n < 128:
                    nxt[b * n_nodes + base + n - 1] = base + (2 * n + b) - 1
                else:
                    v = ((n << 1) | b) & 0xFF
                    nxt[b * n_nodes + base + n - 1] = (v >> 4) * 255
    cnt = np.full(2 * n_nodes, INIT_CNT, dtype=np.float32)
    p = np.full(n_nodes, 0.5, dtype=np.float32)
    return (jnp.asarray(nxt), jnp.asarray(cnt), jnp.asarray(p),
            jnp.zeros((), jnp.int32), jnp.asarray(N_BASE, jnp.int32))


def init_dmc_perblock(n_nodes: int):
    nxt, cnt, p, cur, top = init_machine(n_nodes)
    return {"dmc_nxt": nxt, "dmc_cnt": cnt, "dmc_p": p, "dmc_cur": cur,
            "dmc_top": top}


def _p_of(c0, c1):
    return (c1 + 0.3) / (c0 + c1 + 0.6)


def predict_tree(pb):
    """p(bit=1) for every byte-tree node: f32 (B, 256).

    Walks the machine from each block's current state: the state at tree
    node 2n+b is nxt[b*N + state[n]] -- 7 levels of batched gathers on
    the flat edge array, then one probability-cache gather.
    """
    nxt, p = pb["dmc_nxt"], pb["dmc_p"]
    B, N = nxt.shape[0], p.shape[1]
    frontier = pb["dmc_cur"][:, None]                    # (B, 1): node 1
    all_states = [jnp.zeros((B, 1), jnp.int32), frontier]
    for lev in range(1, min(DMC_LEVELS, 8)):
        # children of frontier nodes: tree ids 2n (bit 0), 2n+1 (bit 1)
        w = frontier.shape[1]
        idx = jnp.concatenate([frontier, N + frontier], axis=1)
        ch = jnp.take_along_axis(nxt, idx, axis=1)       # (B, 2w)
        frontier = jnp.stack([ch[:, :w], ch[:, w:]],
                             axis=2).reshape(B, 2 * w)
        all_states.append(frontier)                      # (B, 2^lev)
    st = jnp.concatenate(all_states, axis=1)             # (B, 2^L)
    probs = jnp.take_along_axis(p, st, axis=1)
    if probs.shape[1] < 256:                             # trimmed walk
        probs = jnp.concatenate(
            [probs, jnp.full((B, 256 - probs.shape[1]), 0.5,
                             probs.dtype)], axis=1)
    return probs


def byte_update(pb, byte):
    """Advance every block's machine along its 8 observed bits, in bulk.

    The reference applies DMC's edge-bump/clone/step rule strictly
    bit-by-bit (paq8.cpp:7665-7749).  The sequential form costs ~130
    tiny gather/scatter ops per byte on TPU (each ~25 us of fixed
    overhead -- profiled).  This bulk form walks the 8-edge path first
    (8 small gathers, the only irreducibly sequential part), then makes
    every clone decision from the pre-byte counts and applies all
    updates as a handful of batched scatters:

    * edge bumps are scatter-ADDS (duplicate path nodes accumulate);
    * clones get slots ``top + prefix_count``; a within-byte re-visit of
      a cloned edge is resolved against the pre-byte machine -- a
      deterministic, format-defining approximation of the reference's
      sequential semantics;
    * count-limit halving runs as one dense pass over the pool;
    * the probability cache is rewritten at all touched nodes from the
      FINAL counts, so duplicate indices write identical values.

    byte: (B,) int32.
    """
    nxt, cnt, p = pb["dmc_nxt"], pb["dmc_cnt"], pb["dmc_p"]
    B = nxt.shape[0]
    N = p.shape[1]
    top = jnp.broadcast_to(pb["dmc_top"], (B,)) \
        if pb["dmc_top"].ndim == 0 else pb["dmc_top"]

    # ---- 1. path walk on the pre-byte machine (8 sequential gathers)
    s = pb["dmc_cur"]
    s_list, t_list, b_list = [], [], []
    for k in range(8):
        b = (byte >> (7 - k)) & 1
        t = jnp.take_along_axis(nxt, (b * N + s)[:, None], axis=1)[:, 0]
        s_list.append(s)
        t_list.append(t)
        b_list.append(b)
        s = t
    S = jnp.stack(s_list, axis=1)                        # (B, 8)
    T = jnp.stack(t_list, axis=1)
    Bv = jnp.stack(b_list, axis=1)
    SB = Bv * N + S                                      # traversed edges

    def pair(ix):                                        # (B, k) -> (B, 2k)
        return jnp.concatenate([ix, N + ix], axis=1)

    # ---- 2. batched gathers of everything the decisions need
    c_sb = jnp.take_along_axis(cnt, SB, axis=1)          # (B, 8)
    cT = jnp.take_along_axis(cnt, pair(T), axis=1)       # (B, 16)
    cT0, cT1 = cT[:, :8], cT[:, 8:]
    tot_t = cT0 + cT1

    # ---- 3. clone decisions from pre-byte counts; slots by prefix count
    want = ((c_sb >= CLONE_TH1) & (tot_t - c_sb >= CLONE_TH2)
            & (T != S))                                  # (B, 8)
    slot = top[:, None] + jnp.cumsum(want.astype(jnp.int32), axis=1) - 1
    do_clone = want & (slot < N)
    U = jnp.where(do_clone, slot, T)                     # (B, 8)
    frac = jnp.clip(c_sb / jnp.maximum(tot_t, 1e-6), 0.0, 1.0)
    moved0, moved1 = cT0 * frac, cT1 * frac              # (B, 8)
    moved = jnp.concatenate([moved0, moved1], axis=1)    # (B, 16)

    # ---- 4. updates: masked indices drop out of bounds (mode="drop")
    bar = jnp.arange(B)[:, None]
    oob = 2 * N
    ucl = jnp.where(do_clone, U, oob)                    # dropped if no clone
    tcl = jnp.where(do_clone, T, oob)
    # fresh clone slots start at INIT_CNT: add (moved - INIT_CNT)
    cnt = cnt.at[bar, pair(ucl)].add(moved - INIT_CNT, mode="drop")
    cnt = cnt.at[bar, pair(tcl)].add(-moved, mode="drop")
    cnt = cnt.at[bar, SB].add(1.0)                       # edge bumps
    nxt_t = jnp.take_along_axis(nxt, pair(T), axis=1)
    nxt = nxt.at[bar, pair(ucl)].set(nxt_t, mode="drop")
    nxt = nxt.at[bar, SB].set(U)                         # redirect edges
    # ---- 5. sparse safety/limit pass + probability cache refresh.
    # Counts only change at the nodes this byte touched ({S, T, clone
    # slots}), so the clamp (floor 0.01) and the past-limit halving can
    # run on the <=24 touched nodes instead of a dense (B, 2N) pass --
    # profiled at ~30% of the whole engine step.  Untouched nodes are
    # always >= INIT_CNT and <= CNT_LIMIT already, so the semantics (and
    # the archive format) are unchanged.  Duplicate touched indices
    # gather identical post-update values and scatter identical results.
    touched = jnp.concatenate(
        [S, T, jnp.where(do_clone, U, T)], axis=1)       # (B, 24)
    tc0 = jnp.maximum(
        jnp.take_along_axis(cnt, touched, axis=1), 0.01)
    tc1 = jnp.maximum(
        jnp.take_along_axis(cnt, N + touched, axis=1), 0.01)
    halve = jnp.maximum(tc0, tc1) > CNT_LIMIT
    tc0 = jnp.where(halve, tc0 * 0.5, tc0)
    tc1 = jnp.where(halve, tc1 * 0.5, tc1)
    cnt = cnt.at[bar, touched].set(tc0)
    cnt = cnt.at[bar, N + touched].set(tc1)
    p = p.at[bar, touched].set(_p_of(tc0, tc1))
    top = top + jnp.sum(do_clone, axis=1).astype(jnp.int32)
    return {"dmc_nxt": nxt, "dmc_cnt": cnt, "dmc_p": p, "dmc_cur": U[:, 7],
            "dmc_top": top}
