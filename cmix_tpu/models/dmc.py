"""Dynamic Markov Coding model, vectorized over blocks.

Capability parity with the reference's dmcModel/dmcForest
(src/models/paq8.cpp:7597-7822): a per-stream bit-level finite-state
machine that starts from a small order-1-flavored braid and *grows* by
cloning heavily-used transitions, so state identity converges to
whatever context lengths the data rewards.

TPU-first redesign, shaped by on-device profiles.  Dynamic gathers cost
~12 ns/element on the TPU scalar core regardless of dtype, so the
layout packs BOTH per-node quantities into one 32-bit word and fetches
them with a single gather:

* ``dmc_nxt (B, N) uint32``: lo16 = successor on bit 0, hi16 = on bit 1
  (node ids <= 65535).  One gather per visited node instead of two.
* ``dmc_cnt (B, N) uint32``: lo16/hi16 = the node's two edge counts in
  fixed-point 1/8 units (counts are halved at 255, so 16 bits never
  overflow).  The node's P(bit=1) is derived on the VPU as
  ``(c1+0.3)/(c0+c1+0.6)`` -- there is no separate probability cache to
  gather or maintain.

Prediction evaluates ALL 255 byte-tree nodes at once by walking the
pointer graph level-by-level (7 batched packed gathers + one packed
count gather over the visited set); the per-byte update advances the 8
traversed edges with branchless clone decisions.  Count updates with
colliding path nodes are aggregated with a dense 24x24 equality matrix
(VPU) and scattered once -- duplicate indices write identical words, so
the scatter order never matters.  When the pool fills, cloning stops
deterministically (the reference resets instead, paq8.cpp:7654-7660;
freezing keeps decode bit-exact without a flush).

All count arithmetic is integer (exact on every backend); the only
float op is the probability/fraction division, pinned f32.

Initial machine: 16 copies of the 255-node within-byte tree, one per
high nibble of the previous byte (order-0.5); finishing a byte with
value v enters copy v>>4.
"""

import numpy as np
import jax
import jax.numpy as jnp

import os

# fixed-point count units: 1 count = 8 units
UNIT = 8
INIT_U = 2          # 0.25 counts: fresh-edge prior
CLONE_TH1_U = 16    # 2.0 counts on the edge to clone its target
CLONE_TH2_U = 16    # 2.0 counts of other evidence at the target
LIMIT_U = 255 * UNIT  # halve a node's counts past this (keeps ratios)
N_COPIES = 16
N_BASE = N_COPIES * 255
# Tree levels DMC predicts (1..8).  With the packed layout the full
# 255-node walk costs ~383 gathered elements (127 pointer words + 256
# count words), about what the old two-array layout paid for 6 levels,
# so the default is full depth (engine gate DMC_LEVELS).
DMC_LEVELS = int(os.environ.get("DMC_LEVELS", "8"))

_LO = jnp.uint32(0xFFFF)
_U16 = jnp.uint32(16)


def init_machine(n_nodes: int):
    """(nxt (N,) u32 packed, cnt (N,) u32 packed, cur (), top ())."""
    assert n_nodes >= N_BASE + 2, "dmc pool smaller than the base braid"
    assert n_nodes <= 65536, "packed node ids are 16-bit"
    nxt = np.zeros((n_nodes, 2), dtype=np.uint32)
    for c in range(N_COPIES):
        base = c * 255
        for n in range(1, 256):
            for b in (0, 1):
                if n < 128:
                    nxt[base + n - 1, b] = base + (2 * n + b) - 1
                else:
                    v = ((n << 1) | b) & 0xFF
                    nxt[base + n - 1, b] = (v >> 4) * 255
    packed = nxt[:, 0] | (nxt[:, 1] << 16)
    cnt = np.full(n_nodes, INIT_U | (INIT_U << 16), dtype=np.uint32)
    return (jnp.asarray(packed), jnp.asarray(cnt),
            jnp.zeros((), jnp.int32), jnp.asarray(N_BASE, jnp.int32))


def init_dmc_perblock(n_nodes: int):
    nxt, cnt, cur, top = init_machine(n_nodes)
    return {
        "dmc_nxt": nxt, "dmc_cnt": cnt, "dmc_cur": cur, "dmc_top": top,
        # Pending edge-update descriptors (r5 deferred-update design):
        # ``plan_step`` computes them when the byte is known; the NEXT
        # byte's ``predict_step`` applies them just before walking --
        # on TPU inside the same Pallas kernel that stages the tables
        # in VMEM, which removes the three per-element XLA scatters
        # (~215 us/step at B=256 in the r5 census).  Index -1 = no-op.
        "dmc_uX": jnp.full(24, -1, jnp.int32),    # cnt writes: idx
        "dmc_uXC": jnp.zeros(24, jnp.uint32),     # cnt writes: word
        "dmc_uS": jnp.full(8, -1, jnp.int32),     # nxt writes at S
        "dmc_uSW": jnp.zeros(8, jnp.uint32),
        "dmc_uU": jnp.full(8, -1, jnp.int32),     # nxt writes at clones
        "dmc_uUW": jnp.zeros(8, jnp.uint32),
    }


DMC_KEYS = ("dmc_nxt", "dmc_cnt", "dmc_cur", "dmc_top")
DMC_UPD_KEYS = ("dmc_uX", "dmc_uXC", "dmc_uS", "dmc_uSW",
                "dmc_uU", "dmc_uUW")
DMC_STATE_KEYS = DMC_KEYS + DMC_UPD_KEYS


def _unpack(w):
    """packed u32 -> (lo, hi) int32."""
    return ((w & _LO).astype(jnp.int32),
            (w >> _U16).astype(jnp.int32))


def _p_of_units(c0u, c1u):
    """P(bit=1) from fixed-point edge counts (pinned f32)."""
    c0 = c0u.astype(jnp.float32) * (1.0 / UNIT)
    c1 = c1u.astype(jnp.float32) * (1.0 / UNIT)
    return (c1 + 0.3) / (c0 + c1 + 0.6)


def _p12_of_units(c0u, c1u):
    """Integer twin (portable profile): the same (c1+0.3)/(c0+c1+0.6)
    as an exact p12 integer division.  With c = units/UNIT the ratio is
    (10*c1u + 3*UNIT) / (10*(c0u+c1u) + 6*UNIT); counts cap at
    LIMIT_U=2040 so the scaled numerator stays far below 2^31."""
    num = 10 * c1u + 3 * UNIT
    den = 10 * (c0u + c1u) + 6 * UNIT
    return jnp.clip((num << 12) // den, 1, 4095)


# The walk's count-word gather, as a Pallas kernel (VERDICT r3 #6).
# Profile background: XLA lowers the (B, w)-from-(B, N) dynamic gathers
# to per-element scalar-core loads from HBM (~12 ns/element; DMC was
# ~30% of the byte step).  The kernel instead DMAs each block's whole
# nxt/cnt rows into VMEM once (pipelined across the grid by the
# BlockSpec machinery) and chases pointers with cheap VMEM scalar
# loads.  Output = the gathered PACKED COUNT WORDS, byte-tree-node
# ordered -- pure integer data movement, so the kernel is bit-identical
# to the XLA path and needs no format gate (CPU tests take the XLA
# path; archives agree).
_DMC_PALLAS = os.environ.get("DMC_PALLAS", "1") != "0"
# on-chip microbench (work/pallas_bench.py): walk 1.50 ms (XLA) ->
# 1.13 ms (kernel) at B=256; bit-identical either way.  DEFAULT-ON
# since r5: the r3 instability ("TPU backend error (Internal)" on the
# second transcode of a process) no longer reproduces on the current
# runtime -- work/pallas_repro.py passes repeated calls AND fresh
# recompiles, and work/pallas_engine_check.py runs two full
# pallas-in-scan transcodes in one process cleanly.  Opt-out with
# DMC_PALLAS=0 if a runtime regression reappears.


def _make_fused_kernel(n_tiles, sublane_fetch=True, levels=8):
    """apply-pending-updates + walk to ``levels``, one VMEM staging per
    block.

    Grid over B.  Per block: copy the staged nxt/cnt blocks to the
    (input-aliased) outputs, poke the <=40 pending edge-update words in
    VMEM (one-hot blends -- Mosaic has no dynamic lane addressing),
    then chase the byte tree to 2^levels-1 nodes and emit the gathered
    count words, the visited state ids, and the traversed pointer
    words.  Emitting vis/wn costs nothing extra (the chase already has
    them) and lets plan_step build the next update without re-walking
    (previously 18 diagonal gathers per byte on the XLA path).  At
    levels<8 the serial fetch chain -- the kernel's bottleneck, ~3.8 ns
    per masked-reduce fetch -- shrinks 4x (383 -> 95 fetches at L=6);
    outputs beyond the walked prefix are left unwritten and sliced off
    by _fused_pallas to match _walk_xla's shapes exactly."""

    def kernel(cur_ref, uX_ref, uXC_ref, uS_ref, uSW_ref, uU_ref,
               uUW_ref, nxt_ref, cnt_ref, nxt_o, cnt_o, cw_o, vis_o,
               wn_o):
        import jax.experimental.pallas as pl
        pid = pl.program_id(0)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        nxt_o[...] = nxt_ref[...]
        cnt_o[...] = cnt_ref[...]

        def poke(ref, idx, val):
            valid = idx >= 0
            i = jnp.where(valid, idx, 0)
            t = i >> 10
            tile = ref[0, t]
            oh = valid & (sub8 == ((i >> 7) & 7)) & (lane == (i & 127))
            ref[0, t] = jnp.where(oh, val, tile)

        for j in range(uX_ref.shape[1]):
            poke(cnt_o, uX_ref[pid, j], uXC_ref[pid, j])
        for j in range(uU_ref.shape[1]):
            poke(nxt_o, uU_ref[pid, j], uUW_ref[pid, j])
        for j in range(uS_ref.shape[1]):
            poke(nxt_o, uS_ref[pid, j], uSW_ref[pid, j])

        if sublane_fetch:
            def fetch(ref, i):
                # int32 view for the reduce (Mosaic has no unsigned
                # reductions); single-nonzero sum preserves the bits
                row = ref[0, i >> 10, pl.ds((i >> 7) & 7, 1)
                          ].astype(jnp.int32)             # (1, 128)
                return jnp.sum(jnp.where(lane1 == (i & 127), row, 0)
                               ).astype(jnp.uint32)
        else:
            def fetch(ref, i):
                tile = ref[0, i >> 10].astype(jnp.int32)
                oh = (sub8 == ((i >> 7) & 7)) & (lane == (i & 127))
                return jnp.sum(jnp.where(oh, tile, 0)).astype(jnp.uint32)

        idx = [None] * 256
        idx[0] = jnp.int32(0)
        idx[1] = cur_ref[pid, 0]
        wn_o[0, 0, 0] = jnp.uint32(0)
        for n in range(1, 1 << (levels - 1)):
            w = fetch(nxt_o, idx[n])
            wn_o[0, 0, n] = w
            wi = w.astype(jnp.int32)
            idx[2 * n] = wi & 0xFFFF
            idx[2 * n + 1] = (wi >> 16) & 0xFFFF
        for j in range(1 << levels):
            cw_o[0, j >> 7, j & 127] = fetch(cnt_o, idx[j])
            vis_o[0, j >> 7, j & 127] = idx[j]
    return kernel


def _fused_pallas(nxt, cnt, cur, uX, uXC, uS, uSW, uU, uUW,
                  interpret=False, sublane_fetch=True, levels=8):
    """-> (nxt', cnt', cw (B,2^L) u32, vis (B,2^L) i32, wn (B,2^(L-1))).

    Accepts the tables as (B, N) or tile-native (B, N/1024, 8, 128);
    the 4-D form aliases in/out without the (B, N) <-> tiled layout
    copies (~90 us/step at B=256)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B = nxt.shape[0]
    four_d = nxt.ndim == 4
    N = (nxt.shape[1] * 1024) if four_d else nxt.shape[1]
    assert N % 1024 == 0, "fused DMC path needs a whole-tile pool"
    n3 = (N // 1024, 8, 128)
    smem_in = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
        for a in (cur[:, None], uX, uXC, uS, uSW, uU, uUW)]
    out = pl.pallas_call(
        _make_fused_kernel(N // 1024, sublane_fetch, levels),
        grid=(B,),
        in_specs=smem_in + [
            pl.BlockSpec((1,) + n3, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + n3, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1,) + n3, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + n3, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B,) + n3, jnp.uint32),
            jax.ShapeDtypeStruct((B,) + n3, jnp.uint32),
            jax.ShapeDtypeStruct((B, 2, 128), jnp.uint32),
            jax.ShapeDtypeStruct((B, 2, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 128), jnp.uint32),
        ],
        input_output_aliases={7: 0, 8: 1},
        interpret=interpret,
    )(cur.astype(jnp.int32)[:, None], uX, uXC, uS, uSW, uU, uUW,
      nxt if four_d else nxt.reshape((B,) + n3),
      cnt if four_d else cnt.reshape((B,) + n3))
    nxt2, cnt2, cw, vis, wn = out
    if not four_d:
        nxt2, cnt2 = nxt2.reshape(B, N), cnt2.reshape(B, N)
    # trim to the walked prefix (slots past it were never written);
    # shapes then match _walk_xla at the same DMC_LEVELS exactly
    return (nxt2, cnt2, cw.reshape(B, 256)[:, :1 << levels],
            vis.reshape(B, 256)[:, :1 << levels],
            wn.reshape(B, 128)[:, :1 << (levels - 1)])


def _make_walk_kernel(group):
    def kernel(cur_ref, nxt_ref, cnt_ref, out_ref):
        # Tables are staged as (group, N/1024, 8, 128) VMEM blocks;
        # node i lives in tile i>>10 at (sublane (i>>7)&7, lane i&127).
        # Mosaic has no dynamic lane addressing, so each fetch loads
        # the node's whole aligned tile (a VMEM vector load at a
        # dynamic tile index) and extracts the word with a one-hot
        # reduction -- vector ops only.  `group` blocks walk per grid
        # step so their independent pointer chains interleave.
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        levels = min(DMC_LEVELS, 8)
        top = 1 << levels
        pid = pl_program_id(0)

        def fetch(ref, g, i):
            tile = ref[g, i >> 10].astype(jnp.int32)         # (8, 128)
            oh = ((sub8 == ((i >> 7) & 7)) & (lane == (i & 127)))
            return jnp.sum(jnp.where(oh, tile, 0)).astype(jnp.uint32)

        idxs = []
        for g in range(group):
            idx = [None] * 256
            idx[0] = jnp.int32(0)
            idx[1] = cur_ref[pid * group + g, 0]
            idxs.append(idx)
        for n in range(1, 1 << (levels - 1)):
            for g in range(group):                # interleave chains
                w = fetch(nxt_ref, g, idxs[g][n])
                idxs[g][2 * n] = (w & jnp.uint32(0xFFFF)
                                  ).astype(jnp.int32)
                idxs[g][2 * n + 1] = (w >> jnp.uint32(16)
                                      ).astype(jnp.int32)
        for j in range(256):
            for g in range(group):
                out_ref[g, j >> 7, j & 127] = \
                    fetch(cnt_ref, g, idxs[g][j]) if j < top \
                    else jnp.uint32(0)
    return kernel


def pl_program_id(axis):
    from jax.experimental import pallas as pl
    return pl.program_id(axis)


def _counts_pallas(nxt, cnt, cur, interpret=False, group=1):
    # group>1 measured 100x SLOWER (dynamic tile indexing inside a
    # multi-block VMEM window degenerates); one block per grid step wins
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B, N = nxt.shape
    if N % 1024:                     # pad to a whole (8,128) tile; node
        pad = 1024 - N % 1024        # ids never point into the padding
        nxt = jnp.pad(nxt, ((0, 0), (0, pad)))
        cnt = jnp.pad(cnt, ((0, 0), (0, pad)))
        N += pad
    while B % group:
        group //= 2
    n3 = (N // 1024, 8, 128)
    g = group
    out = pl.pallas_call(
        _make_walk_kernel(g),
        grid=(B // g,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g,) + n3, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g,) + n3, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, 2, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, 128), jnp.uint32),
        interpret=interpret,
    )(cur.astype(jnp.int32)[:, None], nxt.reshape((B,) + n3),
      cnt.reshape((B,) + n3))
    return out.reshape(B, 256)


def _g1(tbl, i):
    """Per-block single-word gather: tbl (B, N) or tile-native
    (B, N/1024, 8, 128); i (B,) int32 -> (B,)."""
    if tbl.ndim == 2:
        return jnp.take_along_axis(tbl, i[:, None], axis=1)[:, 0]
    b = jnp.arange(tbl.shape[0])
    return tbl[b, i >> 10, (i >> 7) & 7, i & 127]


def _walk_xla(nxt, cnt, cur):
    """-> (cw (B, 2^L) u32, vis (B, 2^L) i32, wn (B, 2^(L-1)) u32).

    vis[n] = machine state at byte-tree node n (vis[0] = 0 pad);
    wn[n] = packed nxt word fetched at vis[n] during the chase."""
    B = nxt.shape[0]
    frontier = cur[:, None]                              # (B, 1): node 1
    visited = [jnp.zeros((B, 1), jnp.int32), frontier]
    words = [jnp.zeros((B, 1), jnp.uint32)]
    for _lev in range(1, min(DMC_LEVELS, 8)):
        w = frontier.shape[1]
        word = jnp.take_along_axis(nxt, frontier, axis=1)  # (B, w)
        words.append(word)
        c0, c1 = _unpack(word)
        frontier = jnp.stack([c0, c1], axis=2).reshape(B, 2 * w)
        visited.append(frontier)                         # (B, 2^lev)
    vis = jnp.concatenate(visited, axis=1)               # (B, 2^L)
    wn = jnp.concatenate(words, axis=1)                  # (B, 2^(L-1))
    return jnp.take_along_axis(cnt, vis, axis=1), vis, wn


def _apply_xla(nxt, cnt, pb):
    """Apply the pending edge-update descriptors (XLA scatters)."""
    B, N = nxt.shape
    bar = jnp.arange(B)[:, None]

    def _safe(idx):
        return jnp.where(idx >= 0, idx, N)
    cnt = cnt.at[bar, _safe(pb["dmc_uX"])].set(pb["dmc_uXC"],
                                               mode="drop")
    nxt = nxt.at[bar, _safe(pb["dmc_uU"])].set(pb["dmc_uUW"],
                                               mode="drop")
    nxt = nxt.at[bar, _safe(pb["dmc_uS"])].set(pb["dmc_uSW"],
                                               mode="drop")
    return nxt, cnt


def predict_step(pb):
    """Apply pending updates, then walk: -> (state_updates, walk_aux).

    state_updates: {"dmc_nxt", "dmc_cnt"} post-apply;
    walk_aux: {"cw", "vis", "wn"} for prediction and plan_step.
    On TPU both happen inside one Pallas kernel per block (single VMEM
    staging of the tables); elsewhere XLA scatters + level gathers --
    identical integer results."""
    nxt, cnt, cur = pb["dmc_nxt"], pb["dmc_cnt"], pb["dmc_cur"]
    four_d = nxt.ndim == 4
    whole_tile = four_d or nxt.shape[1] % 1024 == 0
    if _DMC_PALLAS and jax.default_backend() == "tpu" and whole_tile:
        nxt2, cnt2, cw, vis, wn = _fused_pallas(
            nxt, cnt, cur, pb["dmc_uX"], pb["dmc_uXC"], pb["dmc_uS"],
            pb["dmc_uSW"], pb["dmc_uU"], pb["dmc_uUW"],
            levels=min(DMC_LEVELS, 8))
    else:
        B = nxt.shape[0]
        nf = nxt.reshape(B, -1) if four_d else nxt
        cf = cnt.reshape(B, -1) if four_d else cnt
        nf, cf = _apply_xla(nf, cf, pb)
        cw, vis, wn = _walk_xla(nf, cf, cur)
        nxt2 = nf.reshape(nxt.shape) if four_d else nf
        cnt2 = cf.reshape(cnt.shape) if four_d else cf
    return ({"dmc_nxt": nxt2, "dmc_cnt": cnt2},
            {"cw": cw, "vis": vis, "wn": wn})


def probs_from_counts(cw):
    """p(bit=1) per tree node from gathered count words: f32 (B, 256)."""
    B = cw.shape[0]
    probs = _p_of_units(*_unpack(cw))
    if probs.shape[1] < 256:                             # trimmed walk
        probs = jnp.concatenate(
            [probs, jnp.full((B, 256 - probs.shape[1]), 0.5,
                             probs.dtype)], axis=1)
    return probs


def p12_from_counts(cw):
    """Integer twin (portable profile): p12 int32 (B, 256)."""
    B = cw.shape[0]
    p12 = _p12_of_units(*_unpack(cw))
    if p12.shape[1] < 256:
        p12 = jnp.concatenate(
            [p12, jnp.full((B, 256 - p12.shape[1]), 2048, p12.dtype)],
            axis=1)
    return p12


def plan_step(pb, walk, byte):
    """Plan every block's 8-edge advance; byte: (B,) int32.

    The reference applies DMC's edge-bump/clone/step rule strictly
    bit-by-bit (paq8.cpp:7665-7749).  This bulk form reads the path
    states straight out of the prediction walk's outputs (``walk`` =
    predict_step's {cw, vis, wn}; the path nodes are a subset of the
    255 visited nodes, so only 3 residual (B, 1) gathers remain, for
    the final byte-boundary transition), makes every clone decision
    from the pre-byte counts, aggregates colliding count deltas with a
    dense equality matrix, and emits UPDATE DESCRIPTORS (applied by the
    next predict_step, inside the walk kernel on TPU):

    * clones get slots ``top + prefix_count``; a within-byte re-visit
      of a cloned edge is resolved against the pre-byte machine -- a
      deterministic, format-defining approximation of the reference's
      sequential semantics;
    * duplicate touched indices carry identical aggregated words, so
      application order never matters;
    * count-limit halving runs on the touched words only (untouched
      nodes are always within limits already).
    """
    nxt, cnt = pb["dmc_nxt"], pb["dmc_cnt"]
    B = nxt.shape[0]
    N = (nxt.shape[1] * 1024) if nxt.ndim == 4 else nxt.shape[1]
    top = jnp.broadcast_to(pb["dmc_top"], (B,)) \
        if pb["dmc_top"].ndim == 0 else pb["dmc_top"]

    # ---- 1. path states from the walk outputs.  Path node ids at
    # step k: n8_k = 2^k + (byte >> (8-k)); S_k = vis[n8_k].  The
    # chase words wn cover nodes 1..2^(L-1)-1; deeper steps (and the
    # byte-boundary transition out of the leaf) fall back to (B, 1)
    # diagonal gathers.
    L = min(DMC_LEVELS, 8)
    k8 = jnp.arange(8)
    n8 = (1 << k8)[None, :] + (byte[:, None] >> (8 - k8)[None, :])
    Bv = jnp.stack([(byte >> (7 - k)) & 1 for k in range(8)], axis=1)
    nvis = walk["vis"].shape[1]                          # 2^L
    ohv = (n8[:, :L, None] == jnp.arange(nvis)[None, None, :])
    S_pre = jnp.where(ohv, walk["vis"][:, None, :], 0).sum(
        axis=2, dtype=jnp.int32)                         # (B, L)
    CS_pre = jnp.where(ohv, walk["cw"][:, None, :], jnp.uint32(0)).sum(
        axis=2, dtype=jnp.uint32)
    nwn = walk["wn"].shape[1]                            # 2^(L-1)
    ohw = (n8[:, :L - 1, None] == jnp.arange(nwn)[None, None, :])
    # wn[n] is the packed word fetched AT state vis[n] during the
    # chase, so WS_k = wn[n8_k] for k = 0..L-2 (path nodes below the
    # last chased level)
    WS_pre = jnp.where(ohw, walk["wn"][:, None, :], jnp.uint32(0)).sum(
        axis=2, dtype=jnp.uint32)                        # (B, L-1)
    s_list = [S_pre[:, k] for k in range(L)]
    cs_list = [CS_pre[:, k] for k in range(L)]
    ws_list = [WS_pre[:, k] for k in range(L - 1)]
    t_list = []
    for k in range(8):
        if k >= L:
            s_list.append(t_list[k - 1])
            cs_list.append(_g1(cnt, t_list[k - 1]))
        if k >= L - 1:
            ws_list.append(_g1(nxt, s_list[k]))
        n0, n1 = _unpack(ws_list[k])
        t_list.append(jnp.where(Bv[:, k] == 1, n1, n0))
    S = jnp.stack(s_list, axis=1)                        # (B, 8)
    T = jnp.stack(t_list, axis=1)
    WS = jnp.stack(ws_list, axis=1)                      # packed nxt at S
    CS = jnp.stack(cs_list, axis=1)                      # packed cnt at S
    cs0, cs1 = _unpack(CS)
    c_sb = jnp.where(Bv == 1, cs1, cs0)                  # traversed edge

    # ---- 2. target counts + clone decisions from pre-byte state.
    # T_k = S_{k+1} for k < 7, so only T_7 (the next byte's root)
    # needs a fresh gather.
    cT7 = _g1(cnt, T[:, 7])[:, None]
    cT = jnp.concatenate([CS[:, 1:], cT7], axis=1)       # (B, 8) packed
    cT0, cT1 = _unpack(cT)
    tot_t = cT0 + cT1
    want = ((c_sb >= CLONE_TH1_U) & (tot_t - c_sb >= CLONE_TH2_U)
            & (T != S))                                  # (B, 8)
    slot = top[:, None] + jnp.cumsum(want.astype(jnp.int32), axis=1) - 1
    do_clone = want & (slot < N)
    U = jnp.where(do_clone, slot, T)                     # (B, 8)
    # counts moved from T to the clone: exact integer split
    # floor(cT * c_sb / tot) -- products stay well under 2^31
    den = jnp.maximum(tot_t, 1)
    moved0 = jnp.where(do_clone, cT0 * c_sb // den, 0)
    moved1 = jnp.where(do_clone, cT1 * c_sb // den, 0)

    # ---- 3. aggregated count deltas over the <=24 touched nodes.
    # Entries: S_k bumps its traversed field by one count; T_k loses the
    # moved counts when cloned; the clone slot U_k starts from the moved
    # counts (pool slots hold INIT_U, so its delta is moved - INIT_U).
    X = jnp.concatenate([S, T, U], axis=1)               # (B, 24)
    D0 = jnp.concatenate(
        [jnp.where(Bv == 0, UNIT, 0), -moved0,
         jnp.where(do_clone, moved0 - INIT_U, 0)], axis=1)
    D1 = jnp.concatenate(
        [jnp.where(Bv == 1, UNIT, 0), -moved1,
         jnp.where(do_clone, moved1 - INIT_U, 0)], axis=1)
    E = (X[:, :, None] == X[:, None, :]).astype(jnp.int32)
    agg0 = jnp.einsum("bij,bj->bi", E, D0)               # (B, 24)
    agg1 = jnp.einsum("bij,bj->bi", E, D1)
    # pre-byte words at the touched nodes, without a fresh gather:
    # S and T words were fetched on the walk; an actual clone slot is
    # untouched pool (INIT), a non-clone U aliases T.
    init_w = jnp.uint32(INIT_U | (INIT_U << 16))
    cU = jnp.where(do_clone, init_w, cT)
    x0, x1 = _unpack(jnp.concatenate([CS, cT, cU], axis=1))
    n0 = jnp.maximum(x0 + agg0, 0)
    n1 = jnp.maximum(x1 + agg1, 0)
    halve = jnp.maximum(n0, n1) > LIMIT_U
    n0 = jnp.where(halve, n0 >> 1, n0)
    n1 = jnp.where(halve, n1 >> 1, n1)
    new_cw = n0.astype(jnp.uint32) | (n1.astype(jnp.uint32) << _U16)

    # ---- 4. pointer updates.  Clone slots copy T's pre-byte children;
    # each traversed edge (S_k, b_k) is redirected to U_k with explicit
    # last-entry-wins merging per node, so duplicate descriptor entries
    # carry identical words.  wT_k = nxt[T_k] = WS_{k+1} for k < 7.
    wT7 = _g1(nxt, T[:, 7])[:, None]
    wT = jnp.concatenate([WS[:, 1:], wT7], axis=1)       # (B, 8) packed
    ucl = jnp.where(do_clone, U, -1)                     # -1 = no-op
    ordk = jnp.arange(8)[None, :]
    sameS = S[:, :, None] == S[:, None, :]               # (B, 8i, 8j)

    def _field(fbit, orig):
        # for entry i: the U of the LAST entry j with S_j==S_i, b_j==f
        valid = sameS & (Bv[:, None, :] == fbit)         # (B, i, j)
        rank = jnp.where(valid, ordk[None], -1)          # (B, i, j)
        jbest = jnp.argmax(rank, axis=2)                 # (B, i)
        hasf = jnp.max(rank, axis=2) >= 0
        uval = jnp.take_along_axis(U, jbest, axis=1)
        return jnp.where(hasf, uval, orig)

    ws0, ws1 = _unpack(WS)
    f0 = _field(0, ws0)
    f1 = _field(1, ws1)
    new_ws = f0.astype(jnp.uint32) | (f1.astype(jnp.uint32) << _U16)

    top = top + jnp.sum(do_clone, axis=1).astype(jnp.int32)
    return {"dmc_cur": U[:, 7], "dmc_top": top,
            "dmc_uX": X.astype(jnp.int32), "dmc_uXC": new_cw,
            "dmc_uS": S.astype(jnp.int32), "dmc_uSW": new_ws,
            "dmc_uU": ucl.astype(jnp.int32), "dmc_uUW": wT}


def byte_update(pb, byte):
    """Legacy immediate-application form (tests / standalone use): walk,
    plan, and apply in one call.  The engine instead calls predict_step
    (apply pending + walk) and plan_step (defer) -- same math, same
    resulting machine."""
    cw, vis, wn = _walk_xla(pb["dmc_nxt"], pb["dmc_cnt"], pb["dmc_cur"])
    upd = plan_step(pb, {"cw": cw, "vis": vis, "wn": wn}, byte)
    nxt, cnt = _apply_xla(pb["dmc_nxt"], pb["dmc_cnt"], upd)
    return {"dmc_nxt": nxt, "dmc_cnt": cnt,
            "dmc_cur": upd["dmc_cur"], "dmc_top": upd["dmc_top"]}


def _counts_xla(nxt, cnt, cur):
    """Prediction-only walk (back-compat shim): gathered count words."""
    return _walk_xla(nxt, cnt, cur)[0]


def predict_tree(pb):
    """Prediction-only convenience (tests / standalone): f32 (B, 256)."""
    return probs_from_counts(
        _walk_xla(pb["dmc_nxt"], pb["dmc_cnt"], pb["dmc_cur"])[0])
