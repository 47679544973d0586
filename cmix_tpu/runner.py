"""Archive container + compress/decompress drivers + CLI.

Capability parity with the reference CLI runner (src/runner.cpp:270-330):
compress/decompress modes with optional dictionary (`-c [dict]`), archive
header with original length (runner.cpp:34-86), stored-block fallback,
dictionary flag in the header (runner.cpp:44), WRT text transform with
smaller-only fallback (preprocessor.cpp:443-477), dictionary pretraining
(preprocessor.cpp:37-69), and the cross-entropy report (runner.cpp:322-327).
TPU-first difference: the input is split into fixed-size blocks compressed
*in parallel* as a batch (the reference is strictly single-stream), and the
pretrained state is computed once, cached, and broadcast to every block.

Archive format v3:
  magic 'TCMX' | u8 version | u8 flags | u8 log2(block_size) | u8 tbits
  | u8 mbits | u8 ibits | u16 lstm_hidden | u16 exec_batch | u64 orig_len
  | u64 payload_len | u32 n_blocks | 8s dict_fingerprint | 32s vocab
  | u16 gates_len | gates (canonical non-default model-gate record:
  engine.gates_blob; decode re-derives the encoding ensemble from it)
  | n_blocks * u32 comp_len   (high bit set => block stored raw)
  | concatenated block streams
flags: bit0 = segmented preprocessing applied (per-segment WRT/EXE/media
transforms; segment table follows the fixed header — 9-byte `<BII`
(type, enc_len, raw_len) records, media types 3-5 are 13-byte `<BIII`
with a trailing u32 row/frame stride that seeds the engine's record-grid
contexts identically on both sides), bit1 = dictionary-pretrained models.
exec_batch: the device batch size the archive was coded at.  f32 model
math is bit-identical between encode and decode only when both run the
same executable, and the batch size is part of the compiled shape -- so
it is part of the format and both directions always run at exactly this
batch (padding with dummy lanes).
"""

import argparse
import os
import struct
import time

import numpy as np

import jax
import jax.numpy as jnp


def _vocab_bitmap(data: bytes) -> bytes:
    """32-byte presence bitmap (byte 0 always present: block padding)."""
    present = np.zeros(256, dtype=bool)
    present[0] = True
    if data:
        present[np.unique(np.frombuffer(data, dtype=np.uint8))] = True
    bits = np.packbits(present)
    return bits.tobytes()


def _vocab_force(bitmap: bytes):
    """Per-tree-node forcing array from the presence bitmap.

    Node n at level L covers bytes [lo, lo+span); its bit splits the
    interval in half.  If the upper half has no present bytes the bit is
    forced to 0 (and vice versa)."""
    present = np.unpackbits(np.frombuffer(bitmap, dtype=np.uint8)
                            ).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(present)])
    force = np.zeros(256, dtype=np.int32)
    for n in range(1, 256):
        lev = n.bit_length() - 1
        span = 256 >> lev
        lo = (n - (1 << lev)) * span
        mid, hi = lo + span // 2, lo + span
        left = cum[mid] - cum[lo]
        right = cum[hi] - cum[mid]
        if right == 0 and left > 0:
            force[n] = 1
        elif left == 0 and right > 0:
            force[n] = 2
    return force

from cmix_tpu.version import FORMAT_VERSION, MAGIC
from cmix_tpu import engine
from cmix_tpu.engine import (
    EngineConfig, init_shared, init_perblock, make_transcoder,
    MODE_ENCODE, MODE_DECODE, FormatError)

from cmix_tpu.preprocess.wrt import SEG_JPEGC as _SEG_JPEGC

_RAW_FLAG = 0x80000000
_FLAG_WRT = 1
_FLAG_PRETRAIN = 2

_HDR = "<BBBBBBBBBBBHHQQI8s32s"   # u8 log2(dmc_nodes) (0 = off),
#                                   u8 log2(seg_size), u8 lstm layers,
#                                   u8 lstm horizon
# log2(seg_size) is format-relevant for the same reason exec_batch is:
# the segment length is part of the compiled shape, and it sets the
# pretraining stream's padding -- a decode at a different seg_size
# desynchronizes (this was the round-2 scale-run decode failure).
_HDR_LEN = struct.calcsize(_HDR)

_TRANSCODER_CACHE = {}


def get_transcoder(cfg: EngineConfig):
    if cfg not in _TRANSCODER_CACHE:
        _TRANSCODER_CACHE[cfg] = make_transcoder(cfg)
    return _TRANSCODER_CACHE[cfg]


def _group_state(cfg, b, base_sh=None):
    """(sh, pb) for one coding group: fresh or pretrained shared state
    (materialized per group since the transcoder donates it) plus b
    broadcast per-block states."""
    if base_sh is not None:
        sh = jax.tree_util.tree_map(jnp.array, base_sh)
    else:
        sh = init_shared(cfg)
    pb = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim), init_perblock(cfg))
    return sh, pb


def _split_blocks(data: bytes, n: int):
    nb = max(1, -(-len(data) // n))
    arr = np.zeros((nb, n), dtype=np.uint8)
    flat = np.frombuffer(data, dtype=np.uint8)
    for i in range(nb):
        chunk = flat[i * n:(i + 1) * n]
        arr[i, :len(chunk)] = chunk
    return arr


def _load_dictionary(dictionary):
    from cmix_tpu.preprocess.wrt import Dictionary
    if dictionary is None:
        return None, b"", b"\0" * 8
    d = Dictionary(dictionary)
    with open(dictionary, "rb") as f:
        dict_bytes = f.read()
    from cmix_tpu.utils.checkpoint import dict_fingerprint
    fp = dict_fingerprint(dict_bytes)
    _register_wrtw_tables(d, fp)
    return d, dict_bytes, fp


_WRTW_TAB_FP = None


def _register_wrtw_tables(d, fp):
    """Build + register the WRTW=2 codeword->letter-identity tables for
    this dictionary (hashes.build_wrtw_tables; keyed by fingerprint so a
    dictionary switch rebuilds).  The tables enter the engine as shared-
    state ARRAY operands -- registration itself forces no recompile."""
    global _WRTW_TAB_FP
    from cmix_tpu.contexts import hashes as _h
    if _WRTW_TAB_FP == fp and _h.WRTW_TABLES is not None:
        return
    _h.WRTW_TABLES = _h.build_wrtw_tables([w.lower() for w in d.words])
    _WRTW_TAB_FP = fp


def _pretrained_base(cfg, dict_bytes):
    from cmix_tpu.utils.checkpoint import cached_pretrained_state
    # replay with LF->space like the reference (preprocessor.cpp:59)
    return cached_pretrained_state(cfg, dict_bytes.replace(b"\n", b" "))


def _resume_key(payload, cfg, eb, flags):
    import hashlib
    h = hashlib.sha256()
    h.update(repr((FORMAT_VERSION, cfg, eb, flags)).encode())
    h.update(payload)
    return h.digest()[:16]


def _resume_load(path, key):
    """Completed per-block streams from an interrupted run, or []."""
    try:
        with open(path, "rb") as f:
            blob = f.read()
    except OSError:
        return []
    if blob[:4] != b"TCMR" or blob[4:20] != key:
        return []
    streams, off = [], 20
    while off + 5 <= len(blob):
        raw, L = blob[off] != 0, struct.unpack_from("<I", blob, off + 1)[0]
        if off + 5 + L > len(blob):
            break                            # torn tail write: drop it
        streams.append((raw, blob[off + 5:off + 5 + L]))
        off += 5 + L
    return streams


def _resume_save(path, key, streams):
    """Atomic rewrite of the resume journal (tmp + rename)."""
    parts = [b"TCMR", key]
    for raw, s in streams:
        parts.append(struct.pack("<BI", 1 if raw else 0, len(s)))
        parts.append(s)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"".join(parts))
    os.replace(tmp, path)


def compress(data: bytes, cfg: EngineConfig = EngineConfig(),
             max_batch: int = 64, dictionary: str = None,
             meter=None, show_progress=False, resume_path=None) -> bytes:
    """Compress ``data`` into a TCMX archive.

    dictionary: path to a word list; enables the WRT text transform (when
    it shrinks the payload) and model pretraining, like the reference's
    ``cmix -c [dictionary]`` mode.

    resume_path: journal file for failure recovery (greenfield vs the
    reference's all-or-nothing jobs, SURVEY.md §5): each completed coding
    group's streams are appended; a restarted run with the same input and
    config skips finished groups.  The journal is keyed by a hash of
    (format, config, exec batch, payload) so a stale file is ignored, and
    groups are whole-or-absent (atomic rewrite), preserving the
    bit-exactness contract of the group coding order.
    """
    flags = 0
    d, dict_bytes, fp = _load_dictionary(dictionary)
    base = None
    from cmix_tpu.preprocess.wrt import transform
    payload, seg_meta = transform(data, d)
    if len(payload) >= len(data) and all(e[0] == 0 for e in seg_meta):
        payload, seg_meta = data, None       # nothing transformed
    else:
        flags |= _FLAG_WRT
    if d is not None:
        flags |= _FLAG_PRETRAIN

    # Content-routed gates (recorded in the archive's gate record, so
    # decode follows automatically):
    # - JPEGX: the coefficient contexts only carry information inside
    #   recoded-JPEG segments, and measurably dilute the mixers
    #   elsewhere (~0.2% on exe/dict probes) -- on exactly when such
    #   segments exist.
    # - GRID2: the 2D pixel-neighborhood contexts helped every media
    #   probe (photo/terrain 0.3688->0.3681, JPEG 0.9311->0.9291) and
    #   address by a record stride that plain text does not have -- on
    #   when any strided media/JPEG segment exists.
    # - X86X: the instruction-structure contexts earn their keep on
    #   machine code (exe100k 2.0146 -> 1.9925 at X86X=2, r4 W5b) and
    #   are ~neutral-but-not-free elsewhere -- on at depth 2 exactly
    #   when the detector found an EXE segment.
    from cmix_tpu.preprocess.wrt import _STRIDE_SEGS, SEG_EXE
    want_jpegx = 1 if (seg_meta is not None and any(
        e[0] == _SEG_JPEGC for e in seg_meta)) else 0
    want_grid2 = 1 if (seg_meta is not None and any(
        e[0] in _STRIDE_SEGS for e in seg_meta)) else 0
    want_x86 = 2 if (seg_meta is not None and any(
        e[0] == SEG_EXE for e in seg_meta)) else 0
    # - WRTW: codeword-aware word tracking -- meaningful exactly when
    #   the payload is WRT-transformed (codewords replace words there).
    # WRTW_ROUTE env: probe override for the codeword-context tier
    # (1 = byte-hash identities, 2 = in-model letter-identity decode)
    want_wrtw = (int(os.environ.get("WRTW_ROUTE", "1"))
                 if (flags & _FLAG_WRT) and d is not None else 0)
    # - LMS: the strided adaptive linear predictor (the audio-LPC /
    #   pixel-row capability class of paq8's audioModel, paq8.cpp:
    #   5806-5869).  At LMS=2 it is hard-gated to media-kind blocks
    #   (engine lms_med), so routing it on costs nothing outside media
    #   and helped every media probe (photo/terrain 0.3688 -> 0.3679
    #   with GRID2+LMS2, r3) -- on exactly when a media-class segment
    #   (SEG_IMG24/IMG8/AUDIO) exists.  Recoded-JPEG coefficient
    #   planes are excluded: routing LMS on a pure-JPEG archive
    #   measured +0.05% (r5 Cz0 0.9265 vs 0.9260) -- the linear
    #   predictor only misleads on entropy-coded coefficients.
    #   (The portable integer profile excludes the float LMS; engine
    #   rejects PORT+LMS, so the route stays off there.)
    want_lms = 2 if (not engine.PORT and seg_meta is not None and any(
        3 <= e[0] <= 5 and e[1] for e in seg_meta)) else 0
    prev_gates = engine.gates_blob()
    # - JVAL: the coefficient-value distributions measured NEUTRAL-to-
    #   negative on the JPEG probe at both tiers (r5 A5/C6: 0.9266 /
    #   0.9265 routed vs 0.9260 without) -- the 8 hashed JPEGX contexts
    #   already cover the value structure at this scale.  Route stays
    #   off; the model remains available via JVAL_ROUTE for probes.
    want_jval = int(os.environ.get("JVAL_ROUTE", "0")) * want_jpegx
    if engine.update_gates({"JPEGX": want_jpegx, "GRID2": want_grid2,
                            "JVAL": want_jval,
                            "X86X": want_x86, "WRTW": want_wrtw,
                            "LMS": want_lms}):
        _TRANSCODER_CACHE.clear()
    try:
        if d is not None:
            # AFTER the gate routing: the pretrained state's shapes
            # must match the routed ensemble
            base = _pretrained_base(cfg, dict_bytes)
        return _compress_body(data, payload, seg_meta, cfg, max_batch,
                              d, fp, base, flags, meter, show_progress,
                              resume_path)
    finally:
        if engine.apply_gates(prev_gates):
            _TRANSCODER_CACHE.clear()


def _compress_body(data, payload, seg_meta, cfg, max_batch, d, fp, base,
                   flags, meter, show_progress, resume_path):
    n = cfg.block_size
    blocks = _split_blocks(payload, n)
    nb = blocks.shape[0]
    eb = min(max_batch, nb)                  # exec batch: format-relevant
    trans = get_transcoder(cfg)
    vocab = _vocab_bitmap(payload)
    vforce = jnp.asarray(_vocab_force(vocab))

    forced_rl = blk_kind = jpeg_coords = None
    if seg_meta is not None:
        from cmix_tpu.preprocess.wrt import (
            block_strides, block_kinds, block_jpeg_coords)
        forced_rl = block_strides(seg_meta, nb, n)
        blk_kind = block_kinds(seg_meta, nb, n)
        jpeg_coords = block_jpeg_coords(seg_meta, nb, n)

    prog = None
    if show_progress:
        from cmix_tpu.utils.profiling import Progress
        ticker = Progress(nb * n, "progress")
        done_base = [0]
        group_frac = [1.0]                   # real lanes / exec batch
        prog = lambda d: ticker.update(done_base[0]
                                       + int(d * group_frac[0]))
    streams = []
    rkey = None
    if resume_path is not None:
        rkey = _resume_key(payload, cfg, eb, flags)
        streams = _resume_load(resume_path, rkey)
        streams = streams[:nb]
        if len(streams) < nb:                # keep whole groups only
            streams = streams[:(len(streams) // eb) * eb]
    for lo in range(0, nb, eb):
        batch = blocks[lo:lo + eb]
        b = batch.shape[0]
        if lo + b <= len(streams):           # group finished in a prior run
            if show_progress:
                done_base[0] += b * n
            continue
        if b < eb:                           # pad group to the exec batch
            batch = np.concatenate(
                [batch, np.zeros((eb - b, n), dtype=np.uint8)], axis=0)
        if prog is not None:
            group_frac[0] = b / eb
        sh, pb = _group_state(cfg, eb, base)
        sh["vocab_force"] = jnp.array(vforce)    # fresh: transcoder donates
        if forced_rl is not None:
            fr = np.zeros(eb, dtype=np.int32)
            fr[:b] = forced_rl[lo:lo + b]
            pb["rec_forced"] = jnp.asarray(fr)
        if blk_kind is not None:
            bk = np.zeros(eb, dtype=np.int32)
            bk[:b] = blk_kind[lo:lo + b]
            pb["blk_kind"] = jnp.asarray(bk)
        if jpeg_coords is not None:
            jr = np.full(eb, -(1 << 31) + 1, dtype=np.int32)
            jc = np.zeros((eb, 4), dtype=np.int32)
            jr[:b] = jpeg_coords[0][lo:lo + b]
            jc[:b] = jpeg_coords[1][lo:lo + b]
            pb["jpeg_rel0"] = jnp.asarray(jr)
            pb["jpeg_clen"] = jnp.asarray(jc)
        comp0 = jnp.zeros((eb, cfg.comp_size), dtype=jnp.uint8)
        _, out, out_len = trans(sh, pb, jnp.asarray(batch), comp0,
                                jnp.int32(MODE_ENCODE), meter=meter,
                                progress=prog)
        if show_progress:
            done_base[0] += b * n
        out = np.asarray(out)
        out_len = np.asarray(out_len)
        for i in range(b):
            L = int(out_len[i])
            if L >= n:                       # incompressible: store raw
                real = bytes(batch[i].tobytes())[
                    :min(n, len(payload) - (lo + i) * n)]
                streams.append((True, real))
            else:
                streams.append((False, bytes(out[i, :L].tobytes())))
        if resume_path is not None:
            _resume_save(resume_path, rkey, streams)

    gates = engine.gates_blob()
    header = MAGIC + struct.pack(
        _HDR, FORMAT_VERSION, flags, cfg.block_size.bit_length() - 1,
        cfg.tbits, cfg.mbits, cfg.ibits, cfg.pbits,
        cfg.dmc_nodes.bit_length() - 1 if cfg.dmc_nodes else 0,
        cfg.seg_size.bit_length() - 1,
        cfg.lstm_layers, cfg.lstm_horizon,
        cfg.lstm_hidden, eb, len(data), len(payload), nb, fp, vocab) \
        + struct.pack("<H", len(gates)) + gates
    segtbl = b""
    if flags & _FLAG_WRT:
        parts = [struct.pack("<I", len(seg_meta))]
        for e in seg_meta:                   # media entries carry stride
            if e[0] == _SEG_JPEGC:           # + plane geometry (JPEGX)
                clens = e[5] if len(e) > 5 else ()
                parts.append(struct.pack(
                    "<BIIIIB", e[0], e[1], e[2], e[3],
                    e[4] if len(e) > 4 else 0, len(clens)))
                parts.extend(struct.pack("<I", c) for c in clens)
            elif len(e) > 3:
                parts.append(struct.pack("<BIII", e[0], e[1], e[2], e[3]))
            else:
                parts.append(struct.pack("<BII", e[0], e[1], e[2]))
        segtbl = b"".join(parts)
    lens = b"".join(
        struct.pack("<I", (len(s) | (_RAW_FLAG if raw else 0)))
        for raw, s in streams)
    if resume_path is not None:              # archive complete: journal done
        try:
            os.remove(resume_path)
        except OSError:
            pass
    return header + segtbl + lens + b"".join(s for _, s in streams)


def decompress(archive: bytes, max_batch: int = 64,
               dictionary: str = None, meter=None,
               show_progress=False) -> bytes:
    """Decode a TCMX archive.

    The archive's model-gate record is applied for the duration of the
    decode (the ensemble that coded the stream is part of the format);
    the process's own gates are restored afterwards.  Malformed input
    raises FormatError instead of failing late in the model."""
    if len(archive) < 4 + _HDR_LEN + 2:
        raise FormatError("truncated archive (shorter than the header)")
    if archive[:4] != MAGIC:
        raise FormatError("bad magic: not a TCMX archive")
    hdr = struct.unpack(_HDR, archive[4:4 + _HDR_LEN])
    if hdr[0] != FORMAT_VERSION:
        raise FormatError(
            f"archive format version {hdr[0]}; this build reads only "
            f"{FORMAT_VERSION} (the predictor is the format)")
    off = 4 + _HDR_LEN
    (glen,) = struct.unpack("<H", archive[off:off + 2])
    gates = archive[off + 2:off + 2 + glen]
    if len(gates) != glen:
        raise FormatError("truncated archive (gate record)")
    prev_gates = engine.gates_blob()
    if engine.apply_gates(gates):
        _TRANSCODER_CACHE.clear()
    try:
        return _decompress_body(archive, hdr, off + 2 + glen, max_batch,
                                dictionary, meter, show_progress)
    finally:
        if engine.apply_gates(prev_gates):
            _TRANSCODER_CACHE.clear()


def _decompress_body(archive, hdr, off, max_batch, dictionary, meter,
                     show_progress):
    (ver, flags, log_bs, tbits, mbits, ibits, pbits, dmc_log, log_seg,
     lstm_layers, lstm_horizon, lstm_hidden, eb, orig_len, payload_len,
     nb, fp, vocab) = hdr
    cfg = EngineConfig(block_size=1 << log_bs, tbits=tbits, mbits=mbits,
                       ibits=ibits, pbits=pbits, lstm_hidden=lstm_hidden,
                       lstm_layers=lstm_layers, lstm_horizon=lstm_horizon,
                       dmc_nodes=(1 << dmc_log) if dmc_log else 0,
                       seg_size=1 << log_seg)
    d, dict_bytes, fp2 = _load_dictionary(dictionary)
    base = None
    if flags & _FLAG_PRETRAIN:
        if d is None:
            raise FormatError(
                "archive requires the dictionary it was compressed with "
                "(pass dictionary=...)")
        if fp != fp2:
            raise FormatError("dictionary fingerprint mismatch: not the "
                              "dictionary this archive was coded with")
        base = _pretrained_base(cfg, dict_bytes)

    seg_meta = None
    if flags & _FLAG_WRT:
        (nseg,) = struct.unpack("<I", archive[off:off + 4])
        off += 4
        seg_meta = []
        from cmix_tpu.preprocess.wrt import _STRIDE_SEGS
        for _ in range(nseg):
            t = archive[off]
            if t == _SEG_JPEGC:
                t, el, rl, stride, body_off, nc = struct.unpack(
                    "<BIIIIB", archive[off:off + 18])
                off += 18
                clens = struct.unpack("<" + "I" * nc,
                                      archive[off:off + 4 * nc])
                off += 4 * nc
                seg_meta.append((t, el, rl, stride, body_off, clens))
            elif t in _STRIDE_SEGS:
                t, el, rl, stride = struct.unpack(
                    "<BIII", archive[off:off + 13])
                seg_meta.append((t, el, rl, stride))
                off += 13
            else:
                t, el, rl = struct.unpack("<BII", archive[off:off + 9])
                seg_meta.append((t, el, rl))
                off += 9
    lens = struct.unpack("<" + "I" * nb, archive[off:off + 4 * nb])
    off += 4 * nb
    streams = []
    for L in lens:
        raw = bool(L & _RAW_FLAG)
        L &= ~_RAW_FLAG
        streams.append((raw, archive[off:off + L]))
        off += L
    if off > len(archive):
        raise FormatError("truncated archive (block streams end at "
                          f"{off}, archive is {len(archive)} bytes)")

    trans = get_transcoder(cfg)
    n = cfg.block_size
    forced_rl = blk_kind = jpeg_coords = None
    if seg_meta is not None:
        from cmix_tpu.preprocess.wrt import (
            block_strides, block_kinds, block_jpeg_coords)
        forced_rl = block_strides(seg_meta, nb, n)
        blk_kind = block_kinds(seg_meta, nb, n)
        jpeg_coords = block_jpeg_coords(seg_meta, nb, n)
    out_parts = [None] * nb
    prog = None
    if show_progress:
        from cmix_tpu.utils.profiling import Progress
        ticker = Progress(nb * n, "progress")
        done_base = [0]
        prog = lambda d: ticker.update(done_base[0] + d)
    # decode groups mirror encode groups exactly: raw-stored blocks are
    # re-fed through encode-mode lanes so shared model state matches.
    for lo in range(0, nb, eb):
        group = streams[lo:lo + eb]
        comp = np.zeros((eb, cfg.comp_size), dtype=np.uint8)
        inp = np.zeros((eb, n), dtype=np.uint8)
        modes = np.full(eb, MODE_ENCODE, dtype=np.int32)
        for j, (raw, s) in enumerate(group):
            if raw:
                inp[j, :len(s)] = np.frombuffer(s, dtype=np.uint8)
            else:
                comp[j, :len(s)] = np.frombuffer(s, dtype=np.uint8)
                modes[j] = MODE_DECODE
        sh, pb = _group_state(cfg, eb, base)
        sh["vocab_force"] = jnp.asarray(_vocab_force(vocab))
        if forced_rl is not None:
            fr = np.zeros(eb, dtype=np.int32)
            fr[:len(group)] = forced_rl[lo:lo + len(group)]
            pb["rec_forced"] = jnp.asarray(fr)
        if blk_kind is not None:
            bk = np.zeros(eb, dtype=np.int32)
            bk[:len(group)] = blk_kind[lo:lo + len(group)]
            pb["blk_kind"] = jnp.asarray(bk)
        if jpeg_coords is not None:
            jr = np.full(eb, -(1 << 31) + 1, dtype=np.int32)
            jc = np.zeros((eb, 4), dtype=np.int32)
            jr[:len(group)] = jpeg_coords[0][lo:lo + len(group)]
            jc[:len(group)] = jpeg_coords[1][lo:lo + len(group)]
            pb["jpeg_rel0"] = jnp.asarray(jr)
            pb["jpeg_clen"] = jnp.asarray(jc)
        hist, _, _ = trans(sh, pb, jnp.asarray(inp), jnp.asarray(comp),
                           jnp.asarray(modes), meter=meter, progress=prog)
        if show_progress:
            done_base[0] += len(group) * n
        hist = np.asarray(hist)
        for j, (raw, s) in enumerate(group):
            out_parts[lo + j] = s if raw else bytes(hist[j].tobytes())
    payload = b"".join(out_parts)[:payload_len]
    if flags & _FLAG_WRT:
        from cmix_tpu.preprocess.wrt import untransform
        payload = untransform(payload, seg_meta, d)
    if len(payload) != orig_len:
        raise FormatError(
            f"decoded length {len(payload)} != {orig_len} (corrupt "
            "archive, or it was coded by a different executable)")
    return payload


# ----------------------------------------------------------------------- CLI


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="tpu-cmix",
        description="TPU-native context-mixing compressor (cmix-class)")
    ap.add_argument("mode", choices=["c", "d", "t"],
                    help="c=compress d=decompress t=roundtrip-test")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--dict", dest="dictionary", default=None,
                    help="word dictionary (enables WRT + pretraining); "
                    "'auto' uses the shipped English list "
                    "(cmix_tpu/data/english.dic, the role of the "
                    "reference's dictionary/english.dic asset)")
    ap.add_argument("--block-size", type=int, default=1 << 16)
    ap.add_argument("--tbits", type=int, default=18)
    ap.add_argument("--lstm", type=int, default=256)
    ap.add_argument("--horizon", default="auto",
                    help="LSTM truncated-BPTT window; 'auto' routes by "
                    "payload size (4 under 256 KiB, 8 at scale -- r5 "
                    "C1/Cw vs D1/Db2: the short window wins ~0.3-0.8%% "
                    "on 100 KB files but costs +1.2%% at 1 MiB).  "
                    "Header-carried, so decode needs no flag.")
    ap.add_argument("--dmc", type=int, default=16384,
                    help="DMC node pool per block (0 disables)")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler device trace to DIR")
    ap.add_argument("--stats", action="store_true",
                    help="print a JSON phase/throughput report to stderr")
    ap.add_argument("--resume", default=None, metavar="JOURNAL",
                    help="failure-recovery journal: completed coding "
                    "groups are saved there and skipped on restart")
    ap.add_argument("--portable", action="store_true",
                    help="portable profile: integer model math, archives "
                    "decode bit-exactly on any platform/executable "
                    "(proven TPU-encode -> CPU-decode) -- the "
                    "reference's -O3 vs -Ofast tradeoff (README:16).  "
                    "Since round 4 this keeps a recurrent byte model: "
                    "the integer LSTM re-spec (mixer/ilstm.py)")
    args = ap.parse_args(argv)
    if args.dictionary == "auto":
        args.dictionary = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "data", "english.dic")
    if args.portable and engine.update_gates({"PORT": 1}):
        _TRANSCODER_CACHE.clear()

    from cmix_tpu.utils.profiling import Meter, trace
    meter = Meter() if (args.stats or args.profile) else None
    with open(args.input, "rb") as f:
        data = f.read()
    t0 = time.time()
    if args.mode in ("c", "t"):
        horizon = (int(args.horizon) if args.horizon != "auto"
                   else (4 if len(data) <= (256 << 10) else 8))
        cfg = EngineConfig(block_size=args.block_size, tbits=args.tbits,
                           lstm_hidden=args.lstm, dmc_nodes=args.dmc,
                           lstm_horizon=horizon)
        with trace(args.profile):
            out = compress(data, cfg, max_batch=args.max_batch,
                           dictionary=args.dictionary, meter=meter,
                           show_progress=True, resume_path=args.resume)
        if meter:
            meter.out_bytes = len(out)
            meter.bytes = len(data)
            meter.print_report(mode="compress")
        if args.mode == "t":
            back = decompress(out, max_batch=args.max_batch,
                              dictionary=args.dictionary)
            assert back == data, "ROUNDTRIP FAILED"
        with open(args.output, "wb") as f:
            f.write(out)
        dt = time.time() - t0
        bpb = 8.0 * len(out) / max(1, len(data))
        print(f"{len(data)} bytes -> {len(out)} bytes in {dt:.2f} s")
        print(f"cross entropy: {bpb:.4f}")
    else:
        with trace(args.profile):
            out = decompress(data, max_batch=args.max_batch,
                             dictionary=args.dictionary, meter=meter,
                             show_progress=True)
        if meter:
            meter.out_bytes = len(data)
            meter.bytes = len(out)
            meter.print_report(mode="decompress")
        with open(args.output, "wb") as f:
            f.write(out)
        print(f"{len(data)} bytes -> {len(out)} bytes in "
              f"{time.time() - t0:.2f} s")


if __name__ == "__main__":
    main()
