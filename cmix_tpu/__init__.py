"""tpu-cmix: a TPU-native context-mixing lossless compression framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the cmix v21
reference (byronknoll/cmix): an ensemble of context models (direct, indirect
bit-history, match, word, run models over hashed contexts), multi-layer
context-gated logistic mixing, SSE/APM refinement, and an LSTM byte mixer
driving a binary arithmetic coder -- redesigned TPU-first:

* All model state lives in fixed-size device arrays (a pytree), updated by a
  single jitted per-byte step (8 unrolled bit steps) inside ``lax.scan``.
* Encode and decode share ONE compiled step function (the "unified
  transcoder"): a mode flag selects whether each bit is taken from the input
  or decoded from the arithmetic-coder state.  This makes encode/decode
  numerics identical by construction -- the TPU answer to the reference's
  float-determinism caveat (/root/reference/README:16).
* Table models carry quantized 12/13-bit probability/stretch fields in
  packed integer slots; the mixer/APM stack is f32 with a pinned op
  order.  Determinism contract: encode and decode run the same compiled
  executable (platform + exec batch recorded in the archive header).
* Throughput comes from batching independent blocks (vmap) and sharding them
  across chips/hosts with ``shard_map`` over a device mesh -- the
  parallelism axis the serial-per-bit format permits (SURVEY.md section 2.8).
"""

__version__ = "0.3.0"          # round 3

from cmix_tpu.version import FORMAT_VERSION  # noqa: F401


def compress(data, cfg=None, **kw):
    """Compress ``data`` (bytes) -> TCMX archive bytes.  See
    cmix_tpu.runner.compress for parameters (dictionary=, max_batch=,
    resume_path=...)."""
    from cmix_tpu.engine import EngineConfig
    from cmix_tpu import runner
    return runner.compress(data, cfg or EngineConfig(), **kw)


def decompress(archive, **kw):
    """Decode a TCMX archive -> original bytes (FormatError on damage)."""
    from cmix_tpu import runner
    return runner.decompress(archive, **kw)
