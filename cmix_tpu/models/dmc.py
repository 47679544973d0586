"""Dynamic Markov Coding model, vectorized over blocks.

Capability parity with the reference's dmcModel/dmcForest
(src/models/paq8.cpp:7597-7822): a per-stream bit-level finite-state
machine that starts from a small order-1-flavored braid and *grows* by
cloning heavily-used transitions, so state identity converges to
whatever context lengths the data rewards.

TPU-first redesign: the node pool is a fixed-size per-block array
(``(B, N, 2)`` next pointers + counts); prediction evaluates ALL 255
byte-tree nodes at once by walking the pointer graph level-by-level
(7 batched gathers), and the per-byte update advances the 8 traversed
edges with branchless clone decisions (``jnp.where`` instead of the
reference's data-dependent control flow).  When the pool fills, cloning
stops deterministically (the reference resets instead,
paq8.cpp:7654-7660; freezing keeps decode bit-exact without a flush).

Initial machine: 16 copies of the 255-node within-byte tree, one per
high nibble of the previous byte (order-0.5); finishing a byte with
value v enters copy v>>4.
"""

import numpy as np
import jax.numpy as jnp

CLONE_TH1 = 2.0     # edge count needed to clone its target
CLONE_TH2 = 2.0     # target's other evidence needed to make a clone worthwhile
CNT_LIMIT = 255.0   # halve a node's counts past this (keeps ratios)
INIT_CNT = 0.2
N_COPIES = 16
N_BASE = N_COPIES * 255


def init_machine(n_nodes: int):
    """(nxt (N,2) int32, cnt (N,2) f32, cur (), top ()) initial machine."""
    assert n_nodes >= N_BASE + 2, "dmc pool smaller than the base braid"
    nxt = np.zeros((n_nodes, 2), dtype=np.int32)
    for c in range(N_COPIES):
        base = c * 255
        for n in range(1, 256):
            for b in (0, 1):
                if n < 128:
                    nxt[base + n - 1, b] = base + (2 * n + b) - 1
                else:
                    v = ((n << 1) | b) & 0xFF
                    nxt[base + n - 1, b] = (v >> 4) * 255
    cnt = np.full((n_nodes, 2), INIT_CNT, dtype=np.float32)
    return (jnp.asarray(nxt), jnp.asarray(cnt),
            jnp.zeros((), jnp.int32), jnp.asarray(N_BASE, jnp.int32))


def init_dmc_perblock(n_nodes: int):
    nxt, cnt, cur, top = init_machine(n_nodes)
    return {"dmc_nxt": nxt, "dmc_cnt": cnt, "dmc_cur": cur,
            "dmc_top": top}


def predict_tree(pb):
    """p(bit=1) for every byte-tree node: f32 (B, 256).

    Walks the machine from each block's current state: the state at tree
    node n is nxt[state[n>>1], n&1] -- 7 levels of batched gathers.
    """
    nxt, cnt = pb["dmc_nxt"], pb["dmc_cnt"]
    B, N = nxt.shape[0], nxt.shape[1]
    flat_nxt = nxt.reshape(B, N * 2)
    frontier = pb["dmc_cur"][:, None]                    # (B, 1): node 1
    all_states = [jnp.zeros((B, 1), jnp.int32), frontier]
    for lev in range(1, 8):
        # children of frontier nodes: ids 2n, 2n+1 in node order
        idx = (frontier[:, :, None] * 2
               + jnp.arange(2)[None, None, :]).reshape(B, -1)
        frontier = jnp.take_along_axis(flat_nxt, idx, axis=1)
        all_states.append(frontier)                      # (B, 2^lev)
    st = jnp.concatenate(all_states, axis=1)             # (B, 256)
    flat_cnt = cnt.reshape(B, N * 2)
    c0 = jnp.take_along_axis(flat_cnt, st * 2, axis=1)
    c1 = jnp.take_along_axis(flat_cnt, st * 2 + 1, axis=1)
    return (c1 + 0.3) / (c0 + c1 + 0.6)


def byte_update(pb, byte):
    """Advance every block's machine along its 8 observed bits.

    Per bit: bump the traversed edge, clone its target when the edge is
    hot and the target has enough other evidence (classic DMC rule), and
    step. byte: (B,) int32.
    """
    nxt, cnt = pb["dmc_nxt"], pb["dmc_cnt"]
    B, N = nxt.shape[0], nxt.shape[1]
    bar = jnp.arange(B)
    s = pb["dmc_cur"]
    top = jnp.broadcast_to(pb["dmc_top"], (B,)) \
        if pb["dmc_top"].ndim == 0 else pb["dmc_top"]
    for k in range(8):
        b = (byte >> (7 - k)) & 1
        t = nxt[bar, s, b]
        c_sb = cnt[bar, s, b]
        tot_t = cnt[bar, t, 0] + cnt[bar, t, 1]
        do_clone = ((c_sb >= CLONE_TH1)
                    & (tot_t - c_sb >= CLONE_TH2)
                    & (top < N) & (t != s))
        u = jnp.where(do_clone, jnp.minimum(top, N - 1), t)
        frac = jnp.clip(c_sb / jnp.maximum(tot_t, 1e-6), 0.0, 1.0)
        moved = cnt[bar, t] * frac[:, None]              # (B, 2)
        # clone u: takes t's successors and the moved share of its counts
        cnt = cnt.at[bar, u].set(
            jnp.where(do_clone[:, None], moved, cnt[bar, u]))
        cnt = cnt.at[bar, t].add(
            jnp.where(do_clone[:, None], -moved, 0.0))
        nxt = nxt.at[bar, u].set(
            jnp.where(do_clone[:, None], nxt[bar, t], nxt[bar, u]))
        nxt = nxt.at[bar, s, b].set(jnp.where(do_clone, u, t))
        # bump the traversed edge on s; halve past the count limit
        row = cnt[bar, s]
        bump = (jnp.arange(2)[None, :] == b[:, None]).astype(jnp.float32)
        row = row + bump
        row = jnp.where((row.max(axis=1) > CNT_LIMIT)[:, None],
                        row * 0.5, row)
        cnt = cnt.at[bar, s].set(row)
        top = top + do_clone.astype(jnp.int32)
        s = u
    return {"dmc_nxt": nxt, "dmc_cnt": cnt, "dmc_cur": s, "dmc_top": top}
