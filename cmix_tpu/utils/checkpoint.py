"""State checkpointing: save/load engine state pytrees.

The reference has no working checkpointing (its LSTM save/load is
commented out, src/mixer/lstm.cpp:31-36); here it is a first-class
subsystem: pretrained dictionary states are cached on disk so the 400KB+
replay runs once per (dictionary, config) and is broadcast to every
block/chip afterwards (SURVEY.md section 2.8 "broadcast of pretrained
state").
"""

import hashlib
import os

import numpy as np
import jax
import jax.numpy as jnp

CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "cmix_tpu")


def _flatten(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_state(path, state):
    leaves, _ = _flatten(state)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, *[np.asarray(x) for x in leaves])


def load_state(path, like):
    """Load a state saved by save_state, using ``like`` for the treedef."""
    leaves, treedef = _flatten(like)
    with np.load(path) as z:
        arrs = [z[f"arr_{i}"] for i in range(len(leaves))]
    for a, l in zip(arrs, leaves):
        assert a.shape == l.shape and a.dtype == l.dtype, \
            f"checkpoint mismatch: {a.shape}/{a.dtype} vs {l.shape}/{l.dtype}"
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(a) for a in arrs])


def pretrain_cache_key(cfg, dict_bytes):
    import dataclasses
    from cmix_tpu.version import FORMAT_VERSION
    from cmix_tpu.engine import init_shared, gates_blob, PRETRAIN_SEG
    h = hashlib.sha256()
    h.update(str(FORMAT_VERSION).encode())
    # the pretrainer runs at its own fixed segment length, so the
    # caller's seg_size must not split the cache (nor, before round 3's
    # fix, silently produce DIFFERENT states on encode vs decode)
    h.update(repr(dataclasses.replace(cfg, seg_size=PRETRAIN_SEG)
                  ).encode())
    # gates change update rules without necessarily changing shapes
    h.update(gates_blob())
    # bind the key to the actual state structure so any ensemble change
    # invalidates cached pretrained states
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            init_shared(cfg))[0]:
        h.update(str((path, leaf.shape, str(leaf.dtype))).encode())
    h.update(dict_bytes)
    return h.hexdigest()[:24]


def cached_pretrained_state(cfg, dict_bytes):
    """Returns the pretrained SHARED state for (cfg, dictionary),
    computing and caching it on first use.  The cached file is the format
    artifact: encode and decode both load identical bytes."""
    from cmix_tpu.engine import init_shared, make_pretrainer

    key = pretrain_cache_key(cfg, dict_bytes)
    path = os.path.join(CACHE_DIR, f"pretrain_{key}.npz")
    like = init_shared(cfg)
    if os.path.exists(path):
        return load_state(path, like)
    pre = make_pretrainer(cfg)
    data = np.frombuffer(dict_bytes, dtype=np.uint8)
    sh = pre(like, data)
    sh = jax.tree_util.tree_map(np.asarray, sh)
    save_state(path, sh)
    return load_state(path, init_shared(cfg))


def dict_fingerprint(dict_bytes):
    return hashlib.sha256(dict_bytes).digest()[:8]
