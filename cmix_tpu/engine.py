"""The unified transcoder engine v3: shared-model batch over byte trees.

TPU re-architecture of the reference's hot loop (src/runner.cpp:101-138 +
src/predictor.cpp:361-469), third iteration, shaped by on-device
microbenchmarks:

* **Shared model, per-block positions** (v3): every learned table --
  context bank, direct models, mixers, APMs, match table, LSTM weights --
  is ONE set shared by all B blocks of a coding group; only positional
  state (context hashes, history, match cursors, coder) is per-block.
  This removes the B factor from all table traffic (v2's per-block tables
  made every scatter copy GBs), pools statistics exactly like the
  reference's single-stream model does, enables cross-block match
  references (long-range matching like the reference's 100 MB history
  ring, src/context-manager.cpp:3), and lets ``tp`` sharding scale table
  capacity to reference-parity sizes.
* **Byte-tree vectorization** (v2): all 255 bit-context tree nodes are
  predicted at once as dense node-aligned vector math (the vector
  analogue of src/models/byte-model.cpp:8-37); only the arithmetic coder
  walks bits sequentially.
* **Element-granular updates**: per byte, each table receives one
  explicit-index scatter touching only the 8 path slots per block --
  measured to update in place, unlike row scatters which copy.
* **Float32 probability math** with integer coder/counters.  Determinism
  contract: encode and decode run the SAME executable (mode is a traced
  scalar); the execution batch is recorded in the archive header.
* **Segmented scan**: host-chunked segments bound device execution time;
  emissions leave as packed uint32 ys, compacted by a separate stage.

Model ensemble v3 (format-defining; see FORMAT_VERSION):
  * 21-model bank of per-slot adaptive counter models over hashed contexts
    (orders 1-8, 12, 16, word, word+byte, sparse/skip x4, byte-class x2,
    indirect history-of-hashes, order-1/2) -- capability class of
    src/models/direct-hash.cpp + src/models/indirect.cpp over
    src/contexts/*.
  * exact order-0 / order-1 direct models (src/models/direct.cpp).
  * four match models, orders 5/8/12/20, with cross-block references
    (src/models/match.cpp).
  * shared-weight LSTM byte mixer trained online on all B streams
    (src/mixer/lstm.cpp).
  * 8 context-gated mixers with per-node bias, a level-gated output
    mixer, and a 2-APM SSE stage (src/mixer/mixer.cpp, src/mixer/sse.cpp).
Shared-table updates aggregate all blocks' gradients within a step (sum
semantics); colliding slot writes resolve deterministically per
executable.
"""

import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from cmix_tpu.contexts.hashes import (
    init_ctx_state, update_ctx_state_batched, mix32, PRIME2, bracket_ctx,
    line_expected)
from cmix_tpu.contexts.x86 import (
    init_x86_state, x86_update, x86_ctx_vals)
from cmix_tpu.states.tables import (
    NS_NEXT, NS_INIT_P12, RUN_NEXT, RUN_INIT_P12)
from cmix_tpu.mixer.lstm import (
    LstmConfig, init_lstm_shared, init_lstm_perblock,
    lstm_shared_byte_update)
from cmix_tpu.mixer.ilstm import (
    ILstmConfig, init_ilstm_shared, init_ilstm_perblock,
    ilstm_shared_byte_update)
from cmix_tpu.models import dmc
from cmix_tpu.utils.intmath import (
    stretch13_from_p12, squash12, squash16)

MODE_ENCODE = 0
MODE_DECODE = 1

M32 = jnp.uint32(0xFFFFFFFF)
U8 = jnp.uint32(8)

# ---- format gates --------------------------------------------------------
# Every knob below changes the ensemble wiring or its update rules and is
# therefore FORMAT-DEFINING (the predictor is the format, like the
# reference: src/predictor.cpp).  Each is env-overridable for
# experiments; the runner records every non-default value in the archive
# header (gates_blob) and a decode in a clean environment re-derives the
# encoding ensemble via apply_gates -- so env drift can no longer desync
# an archive.  (name, type, default); values are normalized strings.
_GATE_SPEC = (
    ("CMIX_N_IND", int, "8"),   # r4 W3: wins all three content types
    ("WIKI", int, "1"),
    ("X86X", int, "0"),
    # orders 100/101 are word-keyed matches (r3 probe: text -0.2%)
    ("CMIX_MATCH_ORDERS", str, "1,2,3,5,8,12,16,24,100,101"),
    ("MATCH2", int, "1"),  # r3 probe: best exe/dict; capacity at scale
    ("CMIX_PPM_ORDERS", str, "1,2,3,4,5,6,8,10,12,16,20,24"),
    ("PPM_EXCL", int, "1"),
    ("PPM_UPD", int, "1"),
    ("PPM_CK", int, "1"),   # checksummed PPM rows: a mismatched row is
    #                         read as empty and replaced at update --
    #                         kills hash aliasing, the hashed-table
    #                         answer to mod_ppmd's exact suffix tree
    #                         (src/models/ppmd.cpp:119-348)
    ("PPM_DEEP", int, "1"),  # orders 32/48 from rolling window hashes
    #                          (past ohash's 24) -- deep-context reach
    #                          toward mod_ppmd's order 25 + long arena
    ("BANK_CK", int, "2"),
    ("MIX_DYN3", int, "1"),
    ("MIX_DYN4", int, "0"),
    ("CMIX_SBANK_COLS", str, "0,1,2,3,5,7,10,14,24,36"),
    ("SBANK_ADAPT", int, "0"),
    ("VMATCH", int, "0"),
    ("LMS", int, "0"),
    ("GRID2", int, "0"),
    ("JVAL", int, "0"),    # JPEG coefficient-VALUE model: learned
    #                        per-(component, band, mag(N), mag(W)) byte
    #                        distributions over the recoded plane
    #                        alphabet, mixed as a ByteModel interval
    #                        channel (the Adv-prediction stage of the
    #                        reference jpegModel, paq8.cpp:5871-6589);
    #                        content-routed with JPEGX
    ("JPEGX", int, "0"),   # content-routed: runner.compress enables it
    #                        per archive when recoded-JPEG segments
    #                        exist (measured strictly better there,
    #                        r3 grace_hopper 0.9291x; ~0.2% dilution
    #                        elsewhere) and records it in the gate blob
    ("STEMX", int, "1"),   # r3 probe: small text win, principled for
    #                        English (fxcm stemmer class)
    ("WRTW", int, "0"),    # codeword-aware words; content-routed: the
    #                        runner turns it on when the archive applied
    #                        the WRT transform (fxcm's in-model codeword
    #                        decode, fxcmv1.cpp:353-438).  1 = hash the
    #                        codeword bytes as the word identity; 2 =
    #                        decode the codeword id and latch the
    #                        dictionary word's LETTER identities from
    #                        registered tables (hashes.build_wrtw_tables)
    #                        so transformed and raw text share word/stem
    #                        contexts
    ("CTX2", int, "1"),    # r3 probe: text -0.15%
    ("CTX3", int, "1"),    # 8 more width contexts; r4 W1/W8: small win
    ("CTX4", int, "1"),    # r5 width tier: stem cross, class-mask o8,
    #                        DISTANCE model (paq8.cpp:4598), word-bigram
    #                        x byte, folded o4, vowel shape, tag x word,
    #                        bracket x word
    ("BANK_CH", int, "3"),
    ("RUNX", int, "1"),
    ("RUNX_N", int, "64"),   # run channels across the whole bank (r4 W2)
    ("MIX_DYN2", int, "1"),
    ("MIX2X", int, "1"),   # 5 extra context-gated layer-2 mixers (r4 W6)
    ("MIX_KIND", int, "0"),
    ("MIX_AUX", int, "0"),
    ("MIX_LR", float, "4e-3"),
    ("MIX_TAU", float, "0"),
    ("MIX_BOOST", float, "0"),
    ("MIX_BOOST_N", float, "256"),
    ("W_APM_LEARN", int, "1"),
    ("MIX_NORM", int, "1"),
    ("STAT_NORM", int, "1"),
    ("APM2X", int, "1"),
    ("APM_FIXED", int, "0"),
    ("APM3X", int, "0"),
    ("SSE2", int, "0"),
    ("CNT_CAP", int, "60"),
    ("DMC_LEVELS", int, "8"),
    ("PORT", int, "0"),
    ("ILSTM_LRX", int, "4"),   # integer-LSTM LR scale, /4 (PORT only)
    ("ILSTM_ADAM", int, "0"),  # integer Adam-class optimizer for the
    #                            PORT LSTM (power-of-2 denominator,
    #                            mixer/ilstm.py); ILSTM_LRX scales its
    #                            step sizes too

)
GATES = {}          # live normalized gate values (str -> str)


class FormatError(ValueError):
    """Archive cannot be decoded by this build/configuration."""


def _norm_gate(name, typ, raw):
    if typ is int:
        v = int(raw)
        if name == "CNT_CAP":
            v = max(1, min(v, 63))  # 6-bit slot field; rate >= 1/65.6
        return str(v)
    if typ is float:
        return repr(float(raw))
    return str(raw)


def gates_blob() -> bytes:
    """Canonical non-default gate settings, for the archive header."""
    parts = []
    for name, typ, dflt in _GATE_SPEC:
        if GATES[name] != _norm_gate(name, typ, dflt):
            parts.append(f"{name}={GATES[name]}")
    return ";".join(parts).encode("ascii")


def apply_gates(blob: bytes) -> bool:
    """Re-derive the ensemble from an archive's gate record.

    Returns True when the live ensemble changed (caller must drop any
    cached compiled transcoders).  Unknown gate names mean the archive
    came from a newer format: refuse with a clear error.
    """
    known = {name: (typ, dflt) for name, typ, dflt in _GATE_SPEC}
    env = {}
    for item in blob.decode("ascii").split(";") if blob else []:
        if not item:
            continue
        name, _, val = item.partition("=")
        if name not in known:
            raise FormatError(
                f"archive uses unknown model gate {name!r}; "
                "it was written by a newer tpu-cmix build")
        env[name] = val
    if all(GATES.get(n) == _norm_gate(n, t, env.get(n, d))
           for n, t, d in _GATE_SPEC):
        return False
    _derive(env)
    return True


def update_gates(overrides) -> bool:
    """Override selected gates in-process (e.g. the CLI's --portable).
    Returns True when the live ensemble changed (drop compiled caches)."""
    env = dict(GATES)
    env.update({k: str(v) for k, v in overrides.items()})
    if all(GATES.get(n) == _norm_gate(n, t, env.get(n, d))
           for n, t, d in _GATE_SPEC):
        return False
    _derive(env)
    return True


# Double-indirect contexts (the reference instantiates 11 Indirect models
# over IndirectHash history-of-hash contexts, src/predictor.cpp:166-178 +
# src/contexts/indirect-hash.cpp): "what followed this context last time"
# becomes itself a context.  Keys: order-2 bytes, order-1 byte, order-3
# hash, current word hash.  N_IND selects the first N.
# WIKI: wiki/table stream contexts (fxcm's wiki table/column streams,
# src/models/fxcmv1.cpp:2007-2147).  X86X: 2 opcode-stream contexts
# (prev-op bigram, opcode n-gram hash; contexts/x86.py).
# PPM: byte-distribution model -- symbol-count tables per order, blended
# highest-order-first with learned SEE escape estimation (capability
# class of the reference's mod_ppmd, src/models/ppmd.cpp:956-1155 --
# redesigned as dense row gathers instead of a pointer suffix tree);
# PPM_EXCL enables symbol exclusion.
PPM_INC = 3               # count increment per observation


def _derive(env):
    """Set every gate-derived module global from `env` (a mapping of
    gate name -> raw string; missing names take their defaults).  Called
    once at import with os.environ, and again by apply_gates when a
    decoded archive pins different gates."""
    global N_IND, WIKI, X86X, GRID2, JPEGX, STEMX, CTX2, CTX3, CTX4
    global N_BANK
    global MATCH_ORDERS, N_MATCH, MATCH2
    global PPM_CK, PPM_DEEP
    global PPM_ORDERS, N_PPM, PPM_EXCL, PPM_UPD, BANK_CK, MIX_DYN3
    global MIX_DYN4
    global SBANK_COLS, N_SBANK, SBANK_KIND, SBANK_ADAPT
    global VMATCH, LMS, BANK_CH, RUNX, DMC_IDX, N_INPUTS
    global MIX_DYN2, MIX_KIND, _MIX1_ROWS, N_MIX1, _MIX1_OFF, _MIX1_TOTAL
    global MIX2X, _MIX2_ROWS, _MIX2_OFF, _MIX2_TOTAL, N_L2
    global MIX_AUX, M2IN, MIX_LR, MIX_TAU, MIX_BOOST, MIX_BOOST_N
    global W_APM_LEARN, MIX_NORM, STAT_NORM, APM2X, APM3X, SSE2, N_APM
    global APM_ROWS
    global APM_FIXED, CNT_CAP, _SBANK_NEXT, _SBANK_P0, GATES, PORT
    global WRTW

    GATES = {name: _norm_gate(name, typ, env.get(name, dflt))
             for name, typ, dflt in _GATE_SPEC}

    def gi(name):
        return int(GATES[name])

    def gf(name):
        return float(GATES[name])

    N_IND = gi("CMIX_N_IND")
    WIKI = gi("WIKI")
    X86X = gi("X86X")
    if X86X not in (0, 1, 2):
        raise FormatError(f"X86X={X86X} unsupported (expected 0, 1, 2)")
    GRID2 = gi("GRID2")
    JPEGX = gi("JPEGX")
    # STEMX: 2 suffix-strip stem contexts (stem unigram, stem crossed
    # with the current word prefix) -- the Porter2-stemmer capability
    # of fxcm/paq8 text models (fxcmv1.cpp:2662-3209, paq8.cpp:1530-2998)
    STEMX = gi("STEMX")
    import cmix_tpu.contexts.hashes as _hashes_mod
    WRTW = gi("WRTW")
    _hashes_mod.WRTW = WRTW
    # CTX2: 8 further text/structure contexts toward the reference's
    # layer-0 width (paq8 TextModel's 33 contexts, paq8.cpp:3070-3185;
    # fxcm sentence/word streams, fxcmv1.cpp:2157-2453): word trigram,
    # word x last byte, word x sentence position, word-tail suffix x
    # length, xml tag x byte, every-other-byte sparse, stem x byte,
    # class-register x column
    CTX2 = gi("CTX2")
    # CTX3: 8 further pure-width contexts over already-tracked state
    # (sparse skip pairs, case-folded trigram, high-nibble order-4,
    # word x coarse class, prev-word x sentence position, order-14,
    # stem-prefix x byte) -- viable past N_BANK=64 only since the
    # bank-table chunking (BANK_SPLIT) removed the backend cliff
    CTX3 = gi("CTX3")
    CTX4 = gi("CTX4")
    N_BANK = (47 + N_IND + 4 * WIKI + 2 * X86X + 2 * GRID2 + 8 * JPEGX
              + 2 * STEMX + 8 * CTX2 + 8 * CTX3 + 8 * CTX4)
    #          25 ctx-hash + 4 record + 7 text + 4 x86 + 6 analog/xml
    #          + 2 line-grid + N_IND double-indirect
    MATCH_ORDERS = tuple(
        int(o) for o in GATES["CMIX_MATCH_ORDERS"].split(","))
    N_MATCH = len(MATCH_ORDERS)
    # MATCH2: multi-candidate matching (the capability class of fxcm's
    # MatchModel2, src/models/fxcmv1.cpp:3420-3676): each match-table
    # key stores the TWO most recent positions; a secondary cursor per
    # order follows the older candidate and votes through its own
    # learned length-confidence, so one stale hot position no longer
    # hides a better older match.
    MATCH2 = gi("MATCH2")
    PPM_ORDERS = tuple(
        int(o) for o in GATES["CMIX_PPM_ORDERS"].split(","))
    PPM_CK = gi("PPM_CK")
    PPM_DEEP = gi("PPM_DEEP")
    if PPM_DEEP:
        # deep virtual orders keyed by rolling 32/48-byte window hashes
        # maintained in per-block state (ohash stops at 24); appended
        # ascending so the escape chain still runs high-order-first
        PPM_ORDERS = PPM_ORDERS + (32, 48)
    N_PPM = len(PPM_ORDERS)
    PPM_EXCL = gi("PPM_EXCL")
    # update exclusion (the rule that makes PPMD strong, ppmd.cpp
    # update-walk): the coded byte's count is bumped only at orders >=
    # the highest order that already contained it (all orders when the
    # byte is novel everywhere) -- low orders stop double-counting
    # symbols their suffix contexts already explain.
    PPM_UPD = gi("PPM_UPD")
    # BANK_CK: per-row 8-bit checksums on the hashed bank (capability
    # of direct-hash.cpp:31-48 checksum probing, branchless): a row
    # whose stored check byte mismatches the context's is treated as
    # fresh at predict and REPLACED at update -- collisions stop
    # aliasing unrelated contexts into one row.
    BANK_CK = gi("BANK_CK")
    # State-machine bank (the reference's Indirect models over
    # bit-history automata, src/models/indirect.cpp:16-31 +
    # src/states/*): slots pack an 8-bit automaton state WITH the st13
    # stretch of that state's learned probability at write time
    # ([0..7] state | [8..20] st13).  Packing the stretch into the slot
    # makes prediction a single row gather -- the profiled alternative
    # (a second per-element lookup of the shared per-(model, state)
    # table at all 256 tree nodes) was the single most expensive op on
    # the chip (~6 ms/step: tiny-table gathers lower to scalar loops on
    # TPU).  The cached stretch is at most one visit stale;
    # encode/decode share the executable so bit-exactness is unaffected.
    # Bank-base columns used as contexts, re-salted; col 14 runs the
    # run-length automaton (src/states/run-map.cpp), the rest the
    # nonstationary one (src/states/nonstationary.cpp).
    SBANK_COLS = tuple(
        int(c) for c in GATES["CMIX_SBANK_COLS"].split(","))
    N_SBANK = len(SBANK_COLS)  # default: ord 1-4,6,8, word, sparse,
    #                            bracket, x86
    _kind_def = {14: 1}  # sparse col runs the run-length automaton
    SBANK_KIND = tuple(_kind_def.get(c, 0) for c in SBANK_COLS)
    # 0=nonstationary, 1=runmap
    # SBANK_ADAPT=1: count-adaptive shared-state rate max(SBANK_RATE,
    # 1/(visits+2)) per (model, state) -- a paq-style count-adaptive
    # StateMap rate layered on top of the reference's fixed-divisor
    # indirect model (src/models/indirect.cpp:24), so fresh states
    # converge fast on short inputs.  NB under STAT_NORM=0 (diagnostic
    # path) visits increment per batch occurrence, not per step.
    SBANK_ADAPT = gi("SBANK_ADAPT")
    # vertical match: predict the previous line's byte at this column
    # with learned per-prefix-length confidence (a match model whose
    # cursor is the line above -- record/table analog of
    # src/models/match.cpp)
    VMATCH = gi("VMATCH")
    # strided LMS predictor: adaptive linear prediction of the next byte
    # from the bytes one..four records back (capability class of paq8's
    # linearPredictionModel / audioModel LPC, src/models/paq8.cpp:4476,
    # 5806-5869, generalized to the detected/forced record stride).
    # LMS=1: always active.  LMS=2: active only for blocks whose
    # dominant segment kind is media (img24/img8/audio/jpeg-coeff, from
    # the archive's segment table) -- the filetype routing of paq8's
    # audioModel/imgModel without its in-model re-detection.
    LMS = gi("LMS")
    # (GRID2, parsed above with N_BANK, adds 2 record-grid contexts:
    # NW+N pair and N+NE+W triple -- the 2D pixel-neighborhood class of
    # paq8's im8/im24bitModel, src/models/paq8.cpp:4743-5385, addressed
    # by the known/detected row stride.)
    # Multi-channel bank outputs: the reference's ContextMap-class
    # models emit SEVERAL mixer inputs per context (stretch,
    # confidence-weighted stretch, maturity), not one
    # (src/models/paq8.cpp ContextMap::mix emits ~5 per context;
    # src/mixer/mixer-input.h).  BANK_CH widens each of the N_BANK
    # hashed-context models from 1 to up to 3 channels:
    #   ch1 st (existing), ch2 st*conf with conf=cnt/(cnt+2) (mature
    #   rows speak louder), ch3 2*conf-1 (maturity itself,
    #   direction-free -- lets the mixer gate models by how much data
    #   their row has seen).
    # Channels 2+ are APPENDED after all existing inputs so input
    # indices stay stable across gate settings.
    BANK_CH = gi("BANK_CH")
    # RUNX: run channels for the first RUNX_N bank contexts -- each
    # remembers the byte last seen in that context and a run counter,
    # and votes that byte's tree path with a confidence learned per
    # (model, run-length bucket).  The capability class of the
    # reference's RunContextMap (src/models/fxcmv1.cpp:756-819,
    # src/models/paq8.cpp:857-880): a second, direction-free channel
    # per context map beyond the bit-history stats.  RUNX_N widens the
    # coverage (reference ContextMaps ALL carry a run channel); capped
    # at BANK_SPLIT=64 so the runx table's leading-axis gathers stay
    # under the >=65-way backend cliff without needing chunking.
    RUNX = gi("RUNX")
    global RUNX_N
    RUNX_N = min(gi("RUNX_N"), N_BANK, 64)
    DMC_IDX = N_BANK + 4 + N_MATCH + 2 + N_SBANK  # dmc channel pos in x
    global JVAL
    JVAL = gi("JVAL")
    N_INPUTS = (N_BANK + 4 + N_MATCH + 1 + 1 + N_SBANK + 1 + VMATCH
                + (1 if LMS else 0) + MATCH2 * N_MATCH
                + RUNX_N * (1 if RUNX else 0) + JVAL
                + (BANK_CH - 1) * N_BANK)
    # bank + (d0+d1+d2+brk) + match + lstm + ppm + state bank + dmc

    # layer-1 mixer gate rows: const, level, last byte, order-2 bits,
    # longest-match, word byte, class register, line position, bracket,
    # record, x86; MIX_DYN2 appends 4 more gates (line-grid above byte,
    # 2nd-last byte, wordlen+coarse class, xml tag) toward the
    # reference's 26-mixer layer 0 (src/predictor.cpp:184-328)
    MIX_DYN2 = gi("MIX_DYN2")
    # MIX_KIND appends a content-kind gate: the block's detected segment
    # type (raw/text/exe/img24/img8/audio/jpeg, from the archive's
    # segment table) crossed with the top class-register bits selects
    # one of 8x8 weight rows -- filetype-routed mixing, the capability
    # class of paq8's contextModel2 filetype-gated mixer selectors
    # (src/models/paq8.cpp:8101-8206), driven by the host-side detector
    # instead of in-model re-detection.
    MIX_KIND = gi("MIX_KIND")
    # MIX_DYN3 appends 5 further gates (order-3 hash, strongest-match
    # expected byte, PPM top-order confidence bucket, previous-word
    # hash, analog delta pair), continuing toward the reference's
    # 26-mixer layer 0 (src/predictor.cpp:184-328)
    MIX_DYN3 = gi("MIX_DYN3")
    # MIX_DYN4 appends the last 5 gates to reach the reference's
    # 26-gate layer 0: auxiliary-average bucket (the reference's
    # auxiliary_context_, src/predictor.cpp:388-393), full coarse class
    # register, sentence-position x word-length, first indirect value
    # byte, grid nibble pair (above/left)
    MIX_DYN4 = gi("MIX_DYN4")
    _MIX1_ROWS = np.array(
        [1, 8, 256, 1024, 64, 256, 256, 64, 512, 128, 64]
        + ([257, 256, 64, 256] if MIX_DYN2 else [])
        + ([2048, 257, 32, 256, 256] if MIX_DYN3 else [])
        + ([32, 256, 64, 256, 272] if MIX_DYN4 else [])
        + ([64] if MIX_KIND else []), dtype=np.int64)
    N_MIX1 = len(_MIX1_ROWS)
    _MIX1_OFF = np.concatenate(
        [[0], np.cumsum(_MIX1_ROWS)[:-1]]).astype(np.int32)
    _MIX1_TOTAL = int(_MIX1_ROWS.sum())
    # MIX2X: a SECOND population of context-gated mixers at layer 2 --
    # the reference routes its layer-0 mixer outputs through TWENTY
    # gated layer-1 mixers (src/predictor.cpp:330-352) where this
    # engine had only 3 (level / last byte / byte class).  Five more
    # gates: word hash, longest-match state, order-2 hash, order-2
    # bit-history state (the sse.cpp-style bit-history gate), line
    # position x coarse class.  One stacked weight table, offset rows.
    MIX2X = gi("MIX2X")
    _MIX2_ROWS = np.array([64, 64, 256, 256, 256] if MIX2X else [],
                          dtype=np.int64)
    _MIX2_OFF = np.concatenate(
        [[0], np.cumsum(_MIX2_ROWS)[:-1]]).astype(np.int32) \
        if len(_MIX2_ROWS) else np.zeros(0, np.int32)
    _MIX2_TOTAL = int(_MIX2_ROWS.sum())
    N_L2 = 3 + len(_MIX2_ROWS)               # layer-2 mixer count
    # layer-2 mixer input width: layer-1 outputs + optional raw aux taps
    # (LSTM, PPM, DMC stretches -- the reference's auxiliary inputs,
    # src/predictor.cpp:72-75,388-406)
    MIX_AUX = gi("MIX_AUX")
    M2IN = N_MIX1 + (3 if MIX_AUX else 0)

    MIX_LR = gf("MIX_LR")   # mixer LR at t=0
    MIX_TAU = gf("MIX_TAU")
    #                        LR decay: lr(t) = MIX_LR*rsqrt(1+t/TAU);
    #                        0 disables (cf. the reference's decayed
    #                        mixer rate, src/mixer/mixer.cpp:56-63)
    # Per-row adaptive LR warmup for the context-gated layer-1 mixers: a
    # row seen cnt times learns at lr*(1 + MIX_BOOST*N/(cnt+N)) -- fresh
    # contexts adapt fast, mature ones settle (capability class of the
    # reference's count-decayed mixer rate, src/mixer/mixer.cpp:56-63,
    # re-keyed per weight row instead of per stream).  MIX_BOOST=0
    # disables.
    MIX_BOOST = gf("MIX_BOOST")
    MIX_BOOST_N = gf("MIX_BOOST_N")
    # 0 freezes the final (mixer, apm1..3) blend at its init constants
    # (diagnostic/sweep knob for the learned match-gated blend)
    W_APM_LEARN = gi("W_APM_LEARN")
    # 1 makes ALL mixer updates batch-invariant (per-row mean instead of
    # sum over the B blocks hitting a weight row each step) -- the same
    # semantics the final blend uses after its instability fix.  The
    # summed form couples the effective learning rate to the batch size;
    # sweep MIX_LR upward when enabling this.
    MIX_NORM = gi("MIX_NORM")
    # 1 likewise normalizes the shared model-statistic updates (d0,
    # state bank probabilities, PPM SEE, match/vmatch/lms confidences):
    # their rates were chosen for per-stream sequential updates, but the
    # batched sum delivers up to B x 8 aggregated deltas to one shared
    # row per step (at B=256 they pin against their clip bounds and
    # oscillate).
    STAT_NORM = gi("STAT_NORM")
    # APM2X adds two more SSE tables -- word-gated and line/class-gated
    # -- extending the APM chain toward the reference's deeper SSE
    # stacks (fxcm's 6-APM chain, src/models/fxcmv1.cpp:4630-4833;
    # paq8's filetype APM chains, src/models/paq8.cpp:8208-8362)
    APM2X = gi("APM2X")
    # APM3X: one further SSE stage gated by the order-2 state-bank
    # BIT-HISTORY state at the root node -- the capability class of
    # Shelwien's bit-history SSE contexts (src/mixer/sse.cpp:210-305)
    APM3X = gi("APM3X")
    # SSE2: a SERIAL second SSE stage (the 2-stage structure of
    # Shelwien's sse.cpp:210-305): the blended prediction runs through
    # one more interpolated table gated by the root bit-history state,
    # and a learned per-gate 2-weight internal mixer combines the
    # stage's output with its input -- refinement on top of the
    # parallel APM chain instead of beside it.
    SSE2 = gi("SSE2")
    N_APM = 3 + 2 * APM2X + APM3X
    APM_ROWS = 576 + 512 * APM2X + 256 * APM3X + 256 * SSE2
    # 1 replaces the learned blend with the fixed probability-domain
    # combiner st_fin = 0.4*st(p_mix) + 0.6*st(mean(pa1..3)) (diagnostic)
    APM_FIXED = gi("APM_FIXED")
    CNT_CAP = gi("CNT_CAP")  # counter cap (6-bit slot field)
    dmc.DMC_LEVELS = gi("DMC_LEVELS")
    # PORT=1: the PORTABLE profile.  All probability math that feeds the
    # coder runs in integer domains (utils/intmath.py: gather-free
    # fixed-point stretch/squash, hi/lo-split integer mixer dots) and
    # every shared-table scatter resolves collisions by an explicit
    # winner rule -- so archives decode bit-exactly on a DIFFERENT
    # executable (other platform/sharding/XLA version), the TPU answer
    # to the reference's -O3-portable contract (README:16).  The fast
    # default profile keeps f32 mixing and is portable only across runs
    # of the same executable (like the reference's -Ofast).  Portable
    # mode requires VMATCH=LMS=0; DMC is integer end-to-end
    # (models/dmc.py predict_tree_p12) and stays on, and since round 4
    # the LSTM stays on too, as the integer re-spec (mixer/ilstm.py).
    PORT = gi("PORT")
    if PORT and (VMATCH or LMS or MIX_TAU or MIX_BOOST):
        raise FormatError("PORT=1 requires VMATCH=0, LMS=0, MIX_TAU=0 "
                          "and MIX_BOOST=0 (float-internal paths)")

    # per-model automaton transitions + initial per-state probabilities
    _SBANK_NEXT = np.stack(
        [RUN_NEXT if k else NS_NEXT for k in SBANK_KIND])  # (NS,256,2) u8
    _SBANK_P0 = np.stack(
        [(RUN_INIT_P12 if k else NS_INIT_P12).astype(np.float32) / 4096.0
         for k in SBANK_KIND])                             # (NS, 256)


# d12 arena layout: [0,256) order-1 | [256,256+65536) order-2 |
# [+512) bracket byte model over (bracket id, capped distance)
# (the reference's Bracket ByteModel, src/models/bracket.cpp:13-60,
# as learned next-byte stats per bracket state)
D12_BRK = 256 + 65536
D12_ROWS = D12_BRK + 512
LMS_K = 4
LMS_MU = 0.002
SBANK_RATE = 0.02
# PPM SEE buckets: escape probability learned per
# (order, distinct-symbols bucket, log2-total bucket) -- the capability
# class of mod_ppmd's SEE2 contexts (src/models/ppmd.cpp:956-1109)
SEE_DIST_B = 16
SEE_TOT_B = 8
SEE_RATE = 0.02
ST_CLAMP = 12.0            # stretch clamp: p in [6e-6, 1-6e-6]
_SLOT_INIT = (4096 << 18) | (2048 << 6)   # p=0.5, st=0, cnt=0
_HDR_INIT = 256 << 16                     # row header: ck=virgin, run=0
# zigzag position -> band bucket for the JVAL value model (low bands
# get their own row family; the long high-frequency tail shares)
_JBAND = np.concatenate([
    np.arange(6), np.full(4, 6), np.full(6, 7), np.full(12, 8),
    np.full(36, 9)]).astype(np.int32)     # (64,)
JVAL_ROWS = 4 * 10 * 8 * 8                # comp x band x magN x magW
# JVAL=2 backoff tier: per (component, exact zigzag position) byte
# distribution.  The fine (comp,band,magN,magW) tier sees ~24 samples
# per row on a 61 KB image (the r5 neutrality diagnosis); this coarse
# family sees ~240 -- the stationary "typical value at this position"
# signal the hashed contexts must otherwise learn online bit-by-bit.
JVAL2_ROWS = 4 * 64
APM_RATE = 0.02            # SSE node update rate
POS_BITS = 24              # match table: low bits position, high bits block
PRETRAIN_SEG = 4096        # fixed pretrain segment length (format-defining:
#                            sets the dictionary stream's padding)

_derive(os.environ)


def _st13_np(p):
    st = np.clip(np.log(p / (1.0 - p)), -ST_CLAMP, ST_CLAMP)
    return np.clip(st * 256.0 + 4096.0, 0, 8191).astype(np.uint32)

# static per-node constants (node ids 1..255; 0 unused)
_NODE = np.arange(256)
_LEVEL = np.zeros(256, dtype=np.int32)
for _n in range(1, 256):
    _LEVEL[_n] = _n.bit_length() - 1
_SPAN = (256 >> _LEVEL.clip(0, 8)).astype(np.int32)
_LO = ((_NODE - (1 << _LEVEL)) * _SPAN).astype(np.int32)
_LO[0] = 0
_MID = _LO + (_SPAN >> 1)
_HI = _LO + _SPAN
_LVL_ONEHOT = (np.arange(8)[:, None] == _LEVEL[None, :]).astype(np.float32)


@dataclass(frozen=True)
class EngineConfig:
    block_size: int = 1 << 16   # bytes per block (static shape)
    tbits: int = 20             # log2 slots per bank model (shared)
    mbits: int = 20             # log2 slots per match table (shared)
    ibits: int = 16             # log2 slots of indirect-hash table (shared)
    pbits: int = 20             # log2 byte slots per PPM order table
    lstm_hidden: int = 256      # 0 disables the LSTM byte mixer
    lstm_layers: int = 2        # stacked LSTM layers
    lstm_horizon: int = 8       # truncated-BPTT window (1 = one-step).
    #   WIN=4 wins ~0.3% at 100 KB but costs +1.2% at 1 MiB B=1
    #   (r5 D1/Db2: the short window starves long-context BPTT at
    #   scale) -- the quality default stays 8; bench.py pins 4 in
    #   its recorded speed profile where the cost is +0.16% bpb.
    dmc_nodes: int = 16384      # DMC pool per block; 0 disables
    seg_size: int = 4096        # bytes per device execution segment

    def __post_init__(self):
        object.__setattr__(self, "seg_size",
                           min(self.seg_size, self.block_size))
        for name in ("block_size", "seg_size"):
            v = getattr(self, name)
            if v <= 0 or v & (v - 1):
                raise FormatError(f"{name}={v} must be a power of two "
                                  "(the archive header stores its log2)")
        if self.block_size % self.seg_size:
            raise FormatError("block_size must be a multiple of seg_size")
        if self.block_size > (1 << POS_BITS):
            raise FormatError(
                f"block_size {self.block_size} exceeds the match-table "
                f"position width (2^{POS_BITS})")
        if self.dmc_nodes > 65536:
            raise FormatError(
                f"dmc_nodes={self.dmc_nodes} exceeds 65536 (DMC node ids "
                "are packed in 16 bits; see models/dmc.py)")
        if self.dmc_nodes and self.dmc_nodes < dmc.N_BASE + 2:
            raise FormatError(
                f"dmc_nodes={self.dmc_nodes} is below the base braid "
                f"({dmc.N_BASE + 2}); use 0 to disable DMC")

    @property
    def rows(self):
        return 1 << max(0, self.tbits - 8)

    @property
    def prows(self):
        return 1 << max(0, self.pbits - 8)

    @property
    def comp_size(self):
        return self.block_size + self.block_size // 2 + 64

    @property
    def seg_cap(self):
        return 2 * self.seg_size + 64


# ------------------------------------------------------------------- state


def _lstm_cfg(cfg: EngineConfig):
    """LSTM config for the active profile.  PORT uses the integer
    re-spec (mixer/ilstm.py: one layer, coupled-gate bounded cell,
    integer BPTT) so portable archives keep a recurrent byte model --
    round 3 amputated it (lstm_hidden=0, ~+2.8% bpb on text)."""
    if PORT:
        x = int(GATES["ILSTM_LRX"])
        return ILstmConfig(hidden=cfg.lstm_hidden,
                           horizon=cfg.lstm_horizon,
                           lr_wx=192 * x // 4, lr_wh=96 * x // 4,
                           lr_wo=96 * x // 4, lr_b=48 * x // 4,
                           adam=bool(int(GATES["ILSTM_ADAM"])),
                           alr_wx=40 * x // 4, alr_wh=20 * x // 4,
                           alr_wo=20 * x // 4, alr_b=10 * x // 4)
    return LstmConfig(hidden=cfg.lstm_hidden, layers=cfg.lstm_layers,
                      horizon=cfg.lstm_horizon)


# Max banks per stored chunk: the axon/TPU runtime faults with an opaque
# FAILED_PRECONDITION on >=65-way leading-axis row gathers/scatters once
# rows >= 2^14 (r3 'Backend flake'; r4 bisection: identical shapes pass
# at 64 banks).  Chunking the table keeps every device op <= 64-way.
BANK_SPLIT = 64


def _bank_chunks():
    """Chunking of the bank axis: [(key, lo, hi), ...], hi - lo <= 64."""
    return [("bank" if lo == 0 else f"bank{lo // BANK_SPLIT + 1}",
             lo, min(lo + BANK_SPLIT, N_BANK))
            for lo in range(0, N_BANK, BANK_SPLIT)]


def _take_cols(tbl, col):
    """``tbl[m, col[:, m]]`` (or ``tbl[col]`` for 1-D tables) via a
    one-hot select-and-reduce.

    XLA lowers small dynamic gathers to a scalar-core loop (~12 ns per
    element; the r5 census measured the (NM, 32) confidence-table
    gathers at ~1.5 GB/s).  A single-nonzero masked reduction is exact
    in every dtype (all other summands are literal zeros) and runs
    dense on the VPU.  Only sensible for small minor dims (<= ~64)."""
    c = tbl.shape[-1]
    if tbl.ndim == 1:
        oh = col[..., None] == jnp.arange(c)                 # (B, C)
        return jnp.where(oh, tbl[None], 0).sum(axis=-1, dtype=tbl.dtype)
    oh = col[:, :, None] == jnp.arange(c)[None, None, :]     # (B, M, C)
    return jnp.where(oh, tbl[None], 0).sum(axis=-1, dtype=tbl.dtype)


def _bank_gather(sh, rowi):
    """bank[m, rowi[:, m]] across chunks -> (B, N_BANK, 256) uint32.

    Slot 0 of every row is the ROW HEADER, not a tree node (node ids
    are 1..255 and the update path masks node 0 out): bits [16..24]
    hold the row checksum (256 = virgin), bits [0..15] the run channel
    ``(last_byte << 8) | run_count``.  Packing the checksum and run
    data into the row lets them ride the wide row gather/scatter
    (~350 GB/s) instead of dedicated (NM, R) scalar-table gathers,
    which the r5 census measured at ~1.5 GB/s (scalar-core loops,
    ~0.7 ms/step combined)."""
    outs = []
    for k, lo, hi in _bank_chunks():
        m = jnp.arange(hi - lo)
        outs.append(sh[k][m[None, :], rowi[:, lo:hi]])
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _bank_scatter(sh, rowi, newrows):
    """Per-chunk row scatter (mode='drop' also swallows the PORT
    claim-window's out-of-range sentinel rows)."""
    for k, lo, hi in _bank_chunks():
        m = jnp.arange(hi - lo)
        sh[k] = sh[k].at[m[None, :], rowi[:, lo:hi]].set(
            newrows[:, lo:hi], mode="drop")


def init_shared(cfg: EngineConfig):
    """Shared (per coding group) learned state -- no batch dimension.

    Under PORT=1 the float-valued tables switch to integer domains
    (same keys): d0_p/sbank_p/match_conf/ppm_see/apm hold p12 int32,
    mixer weights hold 16-bit-fraction fixed point int32, biases hold
    st256 int32.  All other tables are integer in both profiles."""
    sh = {
        # bank slot bits: [0..5] cnt | [6..17] p12 | [18..30] st13 where
        # st13 = round(stretch*256)+4096 -- the stretch is precomputed at
        # update time so prediction needs no transcendentals on the tree.
        # Stored in <=BANK_SPLIT-bank chunks ("bank", "bank2", ...): the
        # axon/TPU runtime faults (opaque FAILED_PRECONDITION) on >=65-way
        # leading-axis gathers/scatters once rows >= 2^14 (work/RESULTS.md
        # r3 'Backend flake' -> r4 bisection: N_IND=3 at the same shapes
        # passes), so no single device op may span more than 64 banks.
        "d0_p": jnp.full(256, 0.5, dtype=jnp.float32),
        "d0_c": jnp.zeros(256, dtype=jnp.float32),
        # exact order-1 + order-2 + bracket byte models in one row arena
        "d12": jnp.full((D12_ROWS, 256), _SLOT_INIT, dtype=jnp.uint32),
        # match tables (N_MATCH x 2^mbits slots, MATCH2 doubles each
        # slot to a 2-deep recency stack) and the indirect-hash table
        # share one flat uint32 arena so their updates are one scatter
        "aux_tbl": jnp.zeros(
            (1 + MATCH2) * N_MATCH * (1 << cfg.mbits)
            + N_IND * (1 << cfg.ibits),
            dtype=jnp.uint32),
        "match_conf": jnp.full((N_MATCH, 32), 0.55, dtype=jnp.float32),
        "vmatch_conf": jnp.full(32, 0.55, dtype=jnp.float32),
        "lms_conf": jnp.full(16, 0.55, dtype=jnp.float32),
        # PPM symbol counts: one uint8 count per (order, context row, byte)
        # symbol counts packed 4-per-word (byte j of a row lives in
        # word j>>2, lane j&3): u8 scatters run a per-ELEMENT scalar
        # loop on TPU (~250 us/step in the r5 census); the u32 layout
        # moves the same bytes with 4x fewer elements.  Pure repack --
        # unpacked values are bit-identical.
        "ppm": jnp.zeros((N_PPM, cfg.prows, 64), dtype=jnp.uint32),
        # per-row 8-bit checksum (256 = virgin): aliased rows read as
        # empty and are replaced at update (mod_ppmd exactness class)
        **({"ppm_ck": jnp.full((N_PPM, cfg.prows), 256, jnp.int32)}
           if PPM_CK else {}),
        # JPEG coefficient-value distributions (JVAL): direct-indexed
        # byte counts per (component, band, magN, magW) context
        **({"jval": jnp.zeros((JVAL_ROWS, 256), jnp.uint8)}
           if JVAL else {}),
        **({"jval2": jnp.zeros((JVAL2_ROWS, 256), jnp.uint8)}
           if JVAL >= 2 else {}),
        "ppm_see": jnp.asarray(_see_init()),

        # state bank: packed (state | st13) per (model, context row, node)
        "sbank": jnp.broadcast_to(
            jnp.asarray(_st13_np(_SBANK_P0[:, 0]) << np.uint32(8)
                        )[:, None, None],
            (N_SBANK, cfg.rows, 256)),
        "sbank_p": jnp.asarray(_SBANK_P0),
        # Mixer init: primary inputs (model stretches, true votes) start
        # at 1/n_primary so the initial mix is their average, like the
        # reference's averaging start; AUXILIARY channels (BANK_CH
        # maturity/confidence channels, MIX_AUX raw taps) start at 0 --
        # they are not votes, and a 1/N init both shifts the initial
        # prediction (maturity is ~-1 early) and dilutes the real
        # votes.  Round 1 measured BANK_CH/MIX_AUX as losses under the
        # uniform init (VERDICT.md Weak #4); this is the conditioning
        # fix.
        "w1": jnp.tile(_w1_init_row()[None], (_MIX1_TOTAL, 1)),
        "w1_cnt": jnp.zeros(_MIX1_TOTAL, dtype=jnp.float32),
        "bias1": jnp.zeros((N_MIX1, 256), dtype=jnp.float32),
        # layer-2: three context-gated mixers over the layer-1 outputs
        # (level / last byte / byte-class gates), then a level-gated
        # layer-3 combiner -- the reference's 26->20->1 mixer tree
        # (src/predictor.cpp:330-356) collapsed to 10->3->1
        "w2": jnp.tile(_w2_init_row()[None], (8, 1)),
        "w2b": jnp.tile(_w2_init_row()[None], (256, 1)),
        "w2c": jnp.tile(_w2_init_row()[None], (64, 1)),
        **({"w2x": jnp.tile(_w2_init_row()[None], (_MIX2_TOTAL, 1))}
           if MIX2X else {}),
        "bias2": jnp.zeros((N_L2, 256), dtype=jnp.float32),
        "w3": jnp.full((8, N_L2), 1.0 / N_L2, dtype=jnp.float32),
        "bias3": jnp.zeros(256, dtype=jnp.float32),
        # APM rows: [0,256) last byte | [256,320) match state |
        # [320,576) order-2 hash
        "apm": jnp.tile(_apm_row(), (APM_ROWS, 1)),
        # learned final blend over (mixer, apm1..3) stretches, gated by
        # the match state (the fxcm fail-counter APM blending idea,
        # src/models/fxcmv1.cpp:4630-4833, as a trained micro-mixer)
        "w_apm": jnp.tile(jnp.concatenate([
            jnp.asarray([0.4], jnp.float32),
            jnp.full(N_APM, 0.6 / N_APM, jnp.float32)])[None], (64, 1)),
        # SSE2 serial stage: per-gate 2-weight internal mixer
        # (input stretch, stage-output stretch); starts as identity
        **({"w_sse": jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32),
                              (256, 1))} if SSE2 else {}),
        # vocabulary forcing per tree node: 0 none, 1 force-0, 2 force-1
        # (cf. the reference's vocab bitmap, src/runner.cpp:44-51)
        "vocab_force": jnp.zeros(256, dtype=jnp.int32),
    }
    if PORT:
        w1i = jnp.round(_w1_init_row() * 65536.0).astype(jnp.int32)
        w2i = jnp.round(_w2_init_row() * 65536.0).astype(jnp.int32)
        sh.update({
            "d0_p": jnp.full(256, 2048, dtype=jnp.int32),
            "d0_c": jnp.zeros(256, dtype=jnp.int32),
            "match_conf": jnp.full((N_MATCH, 32), 2253, dtype=jnp.int32),
            "ppm_see": jnp.clip(jnp.round(
                jnp.asarray(_see_init()) * 4096.0), 4, 3891
            ).astype(jnp.int32),
            "sbank_p": jnp.clip(jnp.round(
                jnp.asarray(_SBANK_P0) * 4096.0), 1, 4095
            ).astype(jnp.int32),
            "w1": jnp.tile(w1i[None], (_MIX1_TOTAL, 1)),
            "bias1": jnp.zeros((N_MIX1, 256), dtype=jnp.int32),
            "w2": jnp.tile(w2i[None], (8, 1)),
            "w2b": jnp.tile(w2i[None], (256, 1)),
            "w2c": jnp.tile(w2i[None], (64, 1)),
            **({"w2x": jnp.tile(w2i[None], (_MIX2_TOTAL, 1))}
               if MIX2X else {}),
            "bias2": jnp.zeros((N_L2, 256), dtype=jnp.int32),
            "w3": jnp.full((8, N_L2), 65536 // N_L2, dtype=jnp.int32),
            "bias3": jnp.zeros(256, dtype=jnp.int32),
            "apm": jnp.tile(jnp.clip(jnp.round(_apm_row() * 4096.0),
                                     1, 4095).astype(jnp.int32)[None],
                            (APM_ROWS, 1)),
            "w_apm": jnp.tile(jnp.concatenate([
                jnp.asarray([26214], jnp.int32),          # 0.4 * 65536
                jnp.full(N_APM, (65536 * 6 // 10) // N_APM,
                         jnp.int32)])[None], (64, 1)),
        })
        if SSE2:
            sh["w_sse"] = jnp.tile(
                jnp.asarray([[65536, 0]], jnp.int32), (256, 1))
        del sh["vmatch_conf"], sh["lms_conf"], sh["w1_cnt"]
    if MATCH2:
        sh["match2_conf"] = (
            jnp.full((N_MATCH, 32), 2253, dtype=jnp.int32) if PORT
            else jnp.full((N_MATCH, 32), 0.55, dtype=jnp.float32))
    if RUNX:
        sh["runx_conf"] = (
            jnp.full((RUNX_N, 32), 2253, dtype=jnp.int32) if PORT
            else jnp.full((RUNX_N, 32), 0.55, dtype=jnp.float32))
        # 32 buckets to share the match-confidence update helpers
        # (run buckets use only 0..7).  The run DATA itself lives in
        # row-header slot 0 of the bank rows (see _bank_gather).
    # bank rows: slot 0 = header (ck 256 = virgin, run channel 0),
    # slots 1..255 = tree-node slots at _SLOT_INIT
    row0 = np.full(256, _SLOT_INIT, dtype=np.uint32)
    row0[0] = _HDR_INIT
    for k, lo, hi in _bank_chunks():
        sh[k] = jnp.tile(jnp.asarray(row0)[None, None],
                         (hi - lo, cfg.rows, 1))
    if SBANK_ADAPT:
        sh["sbank_c"] = jnp.zeros((N_SBANK, 256), dtype=jnp.float32)
    if cfg.lstm_hidden:
        sh["lstm"] = (init_ilstm_shared if PORT else
                      init_lstm_shared)(_lstm_cfg(cfg))
    if WRTW >= 2:
        # codeword -> letter-identity tables (WRTW=2); registered by the
        # runner from the archive's dictionary.  Array operands, so a
        # dictionary change needs no recompile (replicated on the mesh).
        import cmix_tpu.contexts.hashes as _hashes_mod
        tabs = _hashes_mod.WRTW_TABLES
        if tabs is None:
            z = np.zeros(_hashes_mod.WRTW_TAB_N, np.uint32)
            tabs = (z, z)
        sh["wrtw_word"] = jnp.asarray(tabs[0])
        sh["wrtw_stem"] = jnp.asarray(tabs[1])
    return sh


def init_perblock(cfg: EngineConfig):
    """Per-block positional state (unbatched; runner broadcasts to B)."""
    pb = {
        "ctx": init_ctx_state(),
        "ind_val": jnp.zeros(N_IND, dtype=jnp.uint32),
        "hist": jnp.zeros(cfg.block_size, dtype=jnp.uint8),
        # rolling 32/48-byte window hashes for the deep PPM orders
        **({"h32": jnp.zeros((), dtype=jnp.uint32),
            "h48": jnp.zeros((), dtype=jnp.uint32)} if PPM_DEEP else {}),
        "mp_blk": jnp.zeros(N_MATCH, dtype=jnp.int32),
        "mp_pos": jnp.zeros(N_MATCH, dtype=jnp.int32),
        "match_len": jnp.zeros(N_MATCH, dtype=jnp.int32),
        **({"mp2_blk": jnp.zeros(N_MATCH, dtype=jnp.int32),
            "mp2_pos": jnp.zeros(N_MATCH, dtype=jnp.int32),
            "match2_len": jnp.zeros(N_MATCH, dtype=jnp.int32)}
           if MATCH2 else {}),
        # record model (capability of paq8 recordModel, paq8.cpp:4204):
        # per-byte-value last position + last gap vote a record length
        "rec_lastpos": jnp.full(256, -1, dtype=jnp.int32),
        "rec_stride": jnp.zeros(256, dtype=jnp.int32),
        "rec_len": jnp.ones((), dtype=jnp.int32),
        "rec_cnt": jnp.zeros((), dtype=jnp.int32),
        # known row/frame stride from media preprocessing (0 = none);
        # overrides the voted record length (paq8's imgModel routing,
        # paq8.cpp:5386-5804, done host-side here and threaded in)
        "rec_forced": jnp.zeros((), dtype=jnp.int32),
        # dominant detected content kind of the block (SEG_* of
        # preprocess/wrt.py, from the archive's segment table; 0 when
        # no segmentation ran) -- gates MIX_KIND mixer rows
        "blk_kind": jnp.zeros((), dtype=jnp.int32),
        # JPEGX addressing (wrt.block_jpeg_coords): offset of this
        # block's byte 0 into the covering recoded-JPEG segment's
        # coefficient planes (INT32_MIN = none) + per-component plane
        # lengths
        "jpeg_rel0": jnp.full((), -(1 << 31) + 1, dtype=jnp.int32),
        "jpeg_clen": jnp.zeros(4, dtype=jnp.int32),
        # strided LMS: taps + error EMA (active when LMS=1)
        "lms_w": jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
        "lms_err": jnp.zeros((), dtype=jnp.float32),
        "x86": init_x86_state(),
    }
    if cfg.lstm_hidden:
        pb["lstm"] = (init_ilstm_perblock if PORT else
                      init_lstm_perblock)(_lstm_cfg(cfg))
    if cfg.dmc_nodes:
        pb.update(dmc.init_dmc_perblock(cfg.dmc_nodes))
        if cfg.dmc_nodes % 1024 == 0:
            # tile-native (N/1024, 8, 128) layout: the fused kernel
            # aliases the tables in/out without (B, N) <-> tiled-layout
            # copies (same words, pure reshape at init)
            for k in ("dmc_nxt", "dmc_cnt"):
                pb[k] = pb[k].reshape(-1, 8, 128)
    return pb


def _w1_init_row():
    n_primary = N_INPUTS - (BANK_CH - 1) * N_BANK
    return jnp.concatenate([
        jnp.full(n_primary, 1.0 / n_primary, jnp.float32),
        jnp.zeros(N_INPUTS - n_primary, jnp.float32)])


def _w2_init_row():
    return jnp.concatenate([
        jnp.full(N_MIX1, 1.0 / N_MIX1, jnp.float32),
        jnp.zeros(M2IN - N_MIX1, jnp.float32)])


def _apm_row():
    stv = (np.arange(33) - 16) * 0.5
    return jnp.asarray(1.0 / (1.0 + np.exp(-stv)), dtype=jnp.float32)


def _see_init():
    """PPM-C escape estimate at bucket centers (learned from there)."""
    d = np.arange(SEE_DIST_B, dtype=np.float32)[:, None]
    tot = 1.5 * np.exp2(np.arange(SEE_TOT_B, dtype=np.float32))[None, :]
    est = np.clip(np.maximum(d, 0.5) / (np.maximum(d, 0.5) + tot),
                  0.02, 0.95).astype(np.float32)
    return np.tile(est[None], (N_PPM, 1, 1))


def init_coder(cfg: EngineConfig):
    return {
        "x1": jnp.zeros((), dtype=jnp.uint32),
        "x2": M32,
        "xc": jnp.zeros((), dtype=jnp.uint32),
        "total": jnp.zeros((), dtype=jnp.int32),
        "rptr": jnp.zeros((), dtype=jnp.int32),
    }


# ------------------------------------------------------------ per-byte ctxs


def _qdelta(a, b):
    """4-bit sign+log-magnitude quantization of a byte difference --
    the analog-delta bucketing used by the reference's audio/linear-
    prediction contexts (src/models/paq8.cpp:4476-4502,5806-5869).
    Integer floor-log2 (binary search), exact on every backend."""
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    mag = jnp.abs(d)
    e = jnp.zeros_like(mag)
    for k in (4, 2, 1):                      # mag < 256
        big = mag >= (1 << k)
        e = e + jnp.where(big, k, 0)
        mag = jnp.where(big, mag >> k, mag)
    lg = jnp.where(jnp.abs(d) > 0, e + 1, 0)
    return (jnp.minimum(lg, 7) * 2
            + (d < 0).astype(jnp.int32)).astype(jnp.uint32)


_IS_VOWEL = np.zeros(256, np.int32)
for _c in b"aeiouAEIOU":
    _IS_VOWEL[_c] = 1


def _bank_bases_b(cs, ind_val, rec_vals, x86_vals, x86_state=None,
                  dist_b1=None):
    """uint32[B, N_BANK] per-byte context values for the model bank.

    rec_vals: uint32 (B, 4) record-grid context values (see
    _record_ctx_vals); x86_vals: uint32 (B, 4) instruction-structure
    contexts (contexts/x86.py)."""
    oh = cs["ohash"]                                         # (B, 25)
    l4 = cs["last4"]                                         # (B,)
    b1 = l4 & jnp.uint32(0xFF)
    b2 = (l4 >> U8) & jnp.uint32(0xFF)
    b3 = (l4 >> jnp.uint32(16)) & jnp.uint32(0xFF)
    b6 = (cs["last8"] >> U8) & jnp.uint32(0xFF)
    vals = [
        oh[:, 1], oh[:, 2], oh[:, 3], oh[:, 4], oh[:, 5], oh[:, 6],
        oh[:, 7], oh[:, 8],                                       # 0-7
        oh[:, 12], oh[:, 16],                                     # 8-9
        cs["word"],                                               # 10
        mix32(cs["last_word"], b1),                               # 11
        (l4 >> U8) & jnp.uint32(0xFF),                            # 12
        (l4 >> U8) & jnp.uint32(0xFFFF),                          # 13
        (((l4 >> jnp.uint32(24)) & jnp.uint32(0xFF)) << U8)
        | ((l4 >> U8) & jnp.uint32(0xFF)),                        # 14
        (l4 >> U8) & jnp.uint32(0xFFFFFF),                        # 15
        cs["clsreg"] & jnp.uint32(0xFFFFFF),                      # 16
        mix32(cs["clsreg"] & jnp.uint32(0xFFFF), cs["word"]),     # 17
        ind_val[:, 0],                                            # 18
        b1,                                                       # 19
        l4 & jnp.uint32(0xFFFF),                                  # 20
        oh[:, 10],                                                # 21
        oh[:, 20],                                                # 22
        mix32(cs["last_word"], cs["word"]),                       # 23 bigram
        bracket_ctx(cs),                                          # 24 bracket
        rec_vals[:, 0], rec_vals[:, 1],                           # 25-28
        rec_vals[:, 2], rec_vals[:, 3],                           # record
        # fxcm-class text/structure contexts (src/models/fxcmv1.cpp:
        # 1831-1850 class streams, :2157-2453 sentence/word streams,
        # :2662-3209 stemmer; redesigned as hashed bank contexts)
        cs["word_pfx"],                                           # 29 stem
        mix32(cs["last_word2"], cs["last_word"]),                 # 30 2-word
        cs["cls2reg"],                                            # 31 coarse
        mix32(jnp.minimum(cs["sentpos"], jnp.uint32(1023)), b1),  # 32 sent
        mix32(cs["word"], jnp.minimum(cs["wordlen"],
                                      jnp.uint32(15))),           # 33 w+len
        oh[:, 24],                                                # 34 ord24
        mix32(cs["clsreg"], jnp.uint32(0xC2B2AE35)),              # 35 fine
        # x86 instruction-structure contexts (contexts/x86.py; parity:
        # the reference exeModel's quantized-instruction contexts,
        # src/models/paq8.cpp:6590-7546)
        x86_vals[:, 0], x86_vals[:, 1],                           # 36-39
        x86_vals[:, 2], x86_vals[:, 3],
        # analog/structure contexts (capability: paq8 sparseModel /
        # linearPredictionModel / audioModel delta contexts
        # (paq8.cpp:4504,4476,5806) and XMLModel (:7824))
        mix32(b3 | (b6 << U8), jnp.uint32(0x3C6EF372)),           # 40 stride3
        mix32(((b1 + b2) >> jnp.uint32(1)) | (_qdelta(b1, b2) << U8),
              jnp.uint32(0xA54FF53A)),                            # 41 analog
        mix32(_qdelta(b1, b2) | (_qdelta(b2, b3) << jnp.uint32(4)),
              jnp.uint32(0x510E527F)),                            # 42 deltas
        mix32(cs["tag"], cs["tagdepth"] + jnp.uint32(0x9B)),      # 43 xmltag
        (b1 >> jnp.uint32(4)) | ((b2 >> jnp.uint32(4)) << jnp.uint32(4))
        | ((b3 >> jnp.uint32(4)) << U8),                          # 44 nibbles
        mix32(jnp.minimum(cs["linepos"], jnp.uint32(511)), b1),   # 45 column
    ]
    # line-grid vertical contexts: the byte at this column in the
    # PREVIOUS line (0xFFFF when past its end / width) -- the capability
    # class of fxcm's wiki column streams (src/models/fxcmv1.cpp:
    # 2007-2147) for any line-structured data
    above_l, v_alive = line_expected(cs)
    vals.append(mix32(above_l, jnp.minimum(cs["linepos"],
                                           jnp.uint32(255))))  # 46 above+col
    vals.append(mix32(above_l | (b1 << jnp.uint32(16)),
                      jnp.uint32(0x165667B1)))                 # 47 above+left
    vals.extend(ind_val[:, j] for j in range(1, N_IND))      # 48+ indirect
    if WIKI:
        # wiki/table streams: column stream (first byte of this cell in
        # the previous row), cell-relative position, list/indent
        # structure, column-crossed word (fxcmv1.cpp:2007-2147 class)
        barw = jnp.arange(cs["cellidx"].shape[0])
        pcell = cs["pcellbuf"][barw, cs["cellidx"].astype(jnp.int32)]
        vals.append(mix32(pcell | (cs["cellidx"] << jnp.uint32(16)),
                          jnp.uint32(0x94D049BB)))
        vals.append(mix32(cs["cellidx"] | (cs["cellpos"] << jnp.uint32(5))
                          | (b1 << jnp.uint32(16)),
                          jnp.uint32(0xBF58476D)))
        vals.append(mix32(cs["listdepth"] | (cs["listchar"] << jnp.uint32(4))
                          | (jnp.minimum(cs["linepos"], jnp.uint32(63))
                             << jnp.uint32(12)),
                          jnp.uint32(0xD6E8FEB8)))
        vals.append(mix32(cs["word"], cs["cellidx"] + jnp.uint32(0x2F)))
    if X86X:
        from cmix_tpu.contexts.x86 import x86_ext_vals, x86_ext_vals2
        xe = x86_ext_vals(x86_state)
        vals.append(xe[:, 0])
        vals.append(xe[:, 1])
        if X86X >= 2:
            xe2 = x86_ext_vals2(x86_state)
            vals.append(xe2[:, 0])
            vals.append(xe2[:, 1])
    if GRID2:   # appended last so existing context indices stay stable
        vals.append(rec_vals[:, 4])
        vals.append(rec_vals[:, 5])
    if JPEGX:
        j0 = 4 + 2 * GRID2
        for jj in range(8):
            vals.append(rec_vals[:, j0 + jj])
    if STEMX:
        vals.append(mix32(cs["last_stem"], jnp.uint32(0x85EBCA77)))
        vals.append(mix32(cs["last_stem"], cs["word"] + jnp.uint32(0x1D)))
    if CTX2:
        b5 = (l4 >> jnp.uint32(24)) & jnp.uint32(0xFF)
        vals.append(mix32(mix32(cs["last_word2"], cs["last_word"]),
                          cs["word"] + jnp.uint32(0x6A09)))  # word trigram
        vals.append(mix32(cs["word"], b1 + jnp.uint32(0xBB67)))
        vals.append(mix32(cs["word"],
                          jnp.minimum(cs["sentpos"] >> jnp.uint32(3),
                                      jnp.uint32(31)) + jnp.uint32(0x3C6E)))
        vals.append(mix32(cs["wtail"], jnp.minimum(
            cs["wordlen"], jnp.uint32(15)) + jnp.uint32(0xA54F)))  # suffix
        vals.append(mix32(cs["tag"], b1 + jnp.uint32(0x510E)))
        vals.append(mix32(b1 | (b3 << U8) | (b5 << jnp.uint32(16)),
                          jnp.uint32(0x9B05688C)))           # skip-1 sparse
        vals.append(mix32(cs["last_stem"], b1 + jnp.uint32(0x1F83)))
        vals.append(mix32(cs["clsreg"] & jnp.uint32(0xFFF),
                          jnp.minimum(cs["linepos"], jnp.uint32(63))
                          + jnp.uint32(0x5BE0)))
    if CTX3:
        # pure-width contexts toward the reference's layer-0 count
        # (paq8 TextModel-33 + sparseModel mask family,
        # src/models/paq8.cpp:3070-3185,4504) over existing state
        l8 = cs["last8"]
        b4 = (l4 >> jnp.uint32(24)) & jnp.uint32(0xFF)
        b5l = l8 & jnp.uint32(0xFF)
        b7 = (l8 >> jnp.uint32(16)) & jnp.uint32(0xFF)
        vals.append(mix32(b2 | (b4 << U8),
                          jnp.uint32(0x71374491)))           # even skip pair
        vals.append(mix32(b5l | (b7 << U8),
                          jnp.uint32(0xB5C0FBCF)))           # far skip pair
        vals.append(mix32((l4 | jnp.uint32(0x20202020))
                          & jnp.uint32(0xFFFFFF),
                          jnp.uint32(0xE9B5DBA5)))           # folded trigram
        vals.append(mix32(l4 & jnp.uint32(0xF0F0F0F0),
                          jnp.uint32(0x3956C25B)))           # hi-nib order-4
        vals.append(mix32(cs["word"],
                          cs["cls2reg"] + jnp.uint32(0x59F1)))
        vals.append(mix32(cs["last_word"],
                          jnp.minimum(cs["sentpos"], jnp.uint32(255))
                          + jnp.uint32(0x923F)))
        vals.append(oh[:, 14])                               # order-14
        vals.append(mix32(cs["word_pfx"], b1 + jnp.uint32(0xAB1C)))
    if CTX4:
        # r5 width tier (paq8 TextModel/sparse-mask/distance families,
        # src/models/paq8.cpp:3070-3185,4504,4598): stem crossing, full
        # class-mask order-8, the DISTANCE model (gap between the last
        # two occurrences of the previous byte), completed-word bigram
        # x byte, case-folded order-4, vowel-shape of the word tail,
        # xml-tag x word, bracket-scope x word
        vals.append(mix32(cs["last_stem"],
                          cs["word"] + jnp.uint32(0xC67178F2)))
        vals.append(mix32(cs["clsreg"], jnp.uint32(0xD5A79147)))
        d = jnp.maximum(dist_b1, 1).astype(jnp.uint32) \
            if dist_b1 is not None else jnp.ones_like(b1)
        dkey = jnp.where(d < 32, d,
                         jnp.uint32(32)
                         + _floor_log2_i(d.astype(jnp.int32)
                                         ).astype(jnp.uint32))
        vals.append(mix32(b1 | (dkey << U8), jnp.uint32(0x06CA6351)))
        vals.append(mix32(mix32(cs["last_word2"], cs["last_word"]),
                          b1 + jnp.uint32(0x14292967)))
        vals.append(mix32(l4 | jnp.uint32(0x20202020),
                          jnp.uint32(0x27B70A85)))
        vw = jnp.zeros_like(b1)
        for j in range(4):
            lj = (cs["wtail"] >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)
            vw = vw | (_take_cols(jnp.asarray(_IS_VOWEL),
                                  lj.astype(jnp.int32)).astype(jnp.uint32)
                       << jnp.uint32(j))
        vals.append(mix32(vw | (jnp.minimum(cs["wordlen"], jnp.uint32(15))
                                << jnp.uint32(4)),
                          b1 + jnp.uint32(0x2E1B2138)))
        vals.append(mix32(cs["tag"], cs["word"] + jnp.uint32(0x4D2C6DFC)))
        vals.append(mix32(bracket_ctx(cs),
                          cs["word"] + jnp.uint32(0x53380D13)))
    v = jnp.stack(vals, axis=1)                              # (B, NM)
    salt = jnp.arange(N_BANK, dtype=jnp.uint32) * PRIME2
    return mix32(v, salt[None, :]), vals[24], above_l, v_alive


def _record_ctx_vals(cfg, pb, t):
    """Record-grid context values: byte above, two-above, column position
    (active only once two consecutive equal gaps confirmed a length)."""
    rl = jnp.where(pb["rec_cnt"] >= 2, pb["rec_len"], 1)     # (B,)
    rl = jnp.where(pb["rec_forced"] > 0, pb["rec_forced"], rl)
    bar = jnp.arange(rl.shape[0])
    n = cfg.block_size
    above = pb["hist"][bar, jnp.mod(t - rl, n)].astype(jnp.uint32)
    above2 = pb["hist"][bar, jnp.mod(t - 2 * rl, n)].astype(jnp.uint32)
    posr = jnp.mod(t, jnp.maximum(rl, 1)).astype(jnp.uint32)
    rlu = rl.astype(jnp.uint32)
    vals = [
        mix32(above, rlu),
        mix32(above | (above2 << U8), jnp.uint32(0x51ED2701)),
        mix32(posr, rlu << U8),
        mix32(above << U8, posr),
    ]
    if GRID2:
        # 2D pixel neighborhood at the known stride: NW+N pair and
        # N+NE+W triple (paq8 im8/24bitModel class, paq8.cpp:4743-5385)
        nw = pb["hist"][bar, jnp.mod(t - rl - 1, n)].astype(jnp.uint32)
        ne = pb["hist"][bar, jnp.mod(t - rl + 1, n)].astype(jnp.uint32)
        lf = pb["hist"][bar, jnp.mod(t - 1, n)].astype(jnp.uint32)
        vals.append(mix32(nw | (above << U8), jnp.uint32(0x632BE5AB)))
        vals.append(mix32(above | (ne << U8) | (lf << jnp.uint32(16)),
                          jnp.uint32(0x9E3779B1)))
    if JPEGX:
        # (component, zigzag) coordinates inside a recoded-JPEG
        # segment's fixed-width coefficient planes (preprocess/jpeg.py;
        # the addressing of the reference jpegModel's coefficient
        # contexts, src/models/paq8.cpp:5871-6589).  N at the forced
        # stride is the same-zigzag block above; t-1 is the block to
        # the left within the plane.
        body = pb["jpeg_rel0"] + t                           # (B,)
        cl = pb["jpeg_clen"].astype(jnp.int32)               # (B, 4)
        if cl.ndim == 1:                                     # unbatched
            cl = cl[None, :]
        csz = 64 * cl
        c1 = csz[:, 0]
        c2 = c1 + csz[:, 1]
        c3 = c2 + csz[:, 2]
        comp = ((body >= c1).astype(jnp.int32)
                + (body >= c2).astype(jnp.int32)
                + (body >= c3).astype(jnp.int32))            # (B,)
        base = jnp.where(comp == 0, 0,
                         jnp.where(comp == 1, c1,
                                   jnp.where(comp == 2, c2, c3)))
        # one-hot component-plane length (dense, no gather)
        clc = sum((comp == i).astype(jnp.int32) * cl[:, i]
                  for i in range(4))
        k = (body - base) // jnp.maximum(clc, 1)
        valid = ((body >= 0) & (clc > 0) & (k < 64)
                 & (pb["jpeg_rel0"] > -(1 << 29)))
        ck = jnp.where(valid, (comp << 6) | k, 4095).astype(jnp.uint32)
        lfj = pb["hist"][bar, jnp.mod(t - 1, n)].astype(jnp.uint32)

        def _magq(v):   # log2 bucket of coefficient magnitude (v-128)
            d = jnp.abs(v.astype(jnp.int32) - 128)
            return ((d > 0).astype(jnp.uint32) + (d > 1) + (d > 3)
                    + (d > 7) + (d > 15) + (d > 31) + (d > 63))

        lfj2 = pb["hist"][bar, jnp.mod(t - 2, n)].astype(jnp.uint32)
        vals.append(mix32(above | (lfj << U8),
                          ck + jnp.uint32(0x7F4A7C15)))      # N,W per (c,k)
        vals.append(mix32(ck | (_magq(above) << jnp.uint32(12))
                          | (_magq(lfj) << jnp.uint32(16)),
                          jnp.uint32(0xE6546B64)))           # band stats
        # round-3 value-modeling contexts (VERDICT #4): the plane id
        # alone (each (component, zigzag) plane is a stationary
        # coefficient distribution -- the per-coefficient-position
        # stats of the reference jpegModel, paq8.cpp:5871-6589), and
        # the two in-plane left neighbors (horizontal block
        # correlation of coefficient values)
        vals.append(mix32(ck, jnp.uint32(0x2545F491)))       # plane
        vals.append(mix32(lfj | (lfj2 << U8),
                          ck + jnp.uint32(0x9E3779B9)))      # W,WW
        # SAME-BLOCK previous zigzag coefficients: in the plane-major
        # layout the byte one plane back (t - plane_len) is this very
        # block's k-1 coefficient -- the reference jpegModel's primary
        # context family (prior coefficients of the current block,
        # paq8.cpp:5871-6589)
        pk1 = pb["hist"][bar, jnp.mod(t - clc, n)].astype(jnp.uint32)
        pk2 = pb["hist"][bar, jnp.mod(t - 2 * clc, n)].astype(jnp.uint32)
        kq = ck & jnp.uint32(63)
        v_k1 = (kq >= 1) & valid
        v_k2 = (kq >= 2) & valid
        pk1 = jnp.where(v_k1, pk1, jnp.uint32(0x1FF))
        pk2 = jnp.where(v_k2, pk2, jnp.uint32(0x1FF))
        vals.append(mix32(pk1 | (pk2 << jnp.uint32(9)),
                          ck + jnp.uint32(0xC2B2AE3D)))      # k-1,k-2 val
        vals.append(mix32(_magq(pk1 & jnp.uint32(0xFF))
                          | (_magq(pk2 & jnp.uint32(0xFF)) << jnp.uint32(4))
                          | (_magq(above) << U8),
                          ck + jnp.uint32(0x27D4EB2F)))      # mag field
        # round-4 value contexts (VERDICT #5, toward the 0.88x bar):
        # (a) the EOB/zero-run structure: JPEG blocks end in a zero
        # tail, so the ZERO FLAGS of this block's last four zigzag
        # positions sharply predict another zero (the run/EOB coding
        # structure the reference models explicitly in its huffman-
        # state contexts, paq8.cpp:5871-6589); (b) the north block's
        # k-1 coefficient + north-east same-k -- 2D magnitude texture.
        # pk3/pk4/nk1/ne follow the same sentinel discipline as pk1/pk2:
        # invalid positions collapse to one 0x1FF row instead of hashing
        # whatever bytes sit at the wrapped history offsets
        v_k3 = (kq >= 3) & valid
        v_k4 = (kq >= 4) & valid
        pk3 = jnp.where(
            v_k3, pb["hist"][bar, jnp.mod(t - 3 * clc, n)
                             ].astype(jnp.uint32), jnp.uint32(0x1FF))
        pk4 = jnp.where(
            v_k4, pb["hist"][bar, jnp.mod(t - 4 * clc, n)
                             ].astype(jnp.uint32), jnp.uint32(0x1FF))
        z4 = ((pk1 == 128).astype(jnp.uint32)
              | ((pk2 == 128).astype(jnp.uint32) << jnp.uint32(1))
              | (jnp.where(v_k3, (pk3 == 128).astype(jnp.uint32), 2)
                 << jnp.uint32(2))
              | (jnp.where(v_k4, (pk4 == 128).astype(jnp.uint32), 2)
                 << jnp.uint32(4)))
        vals.append(mix32(z4 | (_magq(pk1 & jnp.uint32(0xFF))
                                << jnp.uint32(6)),
                          ck + jnp.uint32(0x165667B1)))      # zero-tail
        stride_j = jnp.maximum(rl, 1)
        nk1 = jnp.where(
            v_k1, pb["hist"][bar, jnp.mod(t - clc - stride_j, n)
                             ].astype(jnp.uint32), jnp.uint32(0x1FF))
        ne = jnp.where(
            valid, pb["hist"][bar, jnp.mod(t - stride_j + 1, n)
                              ].astype(jnp.uint32), jnp.uint32(0x1FF))
        vals.append(mix32(_magq(nk1) | (_magq(ne) << jnp.uint32(4))
                          | (_magq(above) << U8)
                          | (_magq(lfj) << jnp.uint32(12)),
                          ck + jnp.uint32(0x85EBCA6B)))      # 2D mag grid
        if JVAL:
            # direct-indexed value-model context (no hashing -- exact
            # rows like the reference's per-position stats): component
            # x zigzag band bucket x magnitude(N) x magnitude(W)
            bk = _take_cols(jnp.asarray(_JBAND),
                            (ck & jnp.uint32(63)).astype(jnp.int32))
            jctx = (((comp * 10 + bk) * 8
                     + _magq(above).astype(jnp.int32)) * 8
                    + _magq(lfj).astype(jnp.int32))
            jx = {"jctx": jnp.where(valid, jctx, 0).astype(jnp.int32),
                  "jvalid": valid}
            if JVAL >= 2:
                jctx2 = comp * 64 + (ck & jnp.uint32(63)).astype(
                    jnp.int32)
                jx["jctx2"] = jnp.where(valid, jctx2, 0).astype(
                    jnp.int32)
        else:
            jx = None
    else:
        jx = None
    return jnp.stack(vals, axis=1), rl, posr, jx


def _slot_update(slots, target):
    """Adaptive counter update of packed slots toward target bits (f32)."""
    cnt = (slots & jnp.uint32(0x3F)).astype(jnp.float32)
    p12 = ((slots >> jnp.uint32(6)) & jnp.uint32(0xFFF)).astype(jnp.float32)
    p = p12 * (1.0 / 4096.0)
    rate = 1.0 / (cnt + 1.6)
    newp = p + (target - p) * rate
    newc = jnp.minimum(cnt + 1.0, float(CNT_CAP))
    st13 = jnp.clip(_stretch_f(newp) * 256.0 + 4096.0, 0, 8191)
    return ((st13.astype(jnp.uint32) << jnp.uint32(18))
            | (jnp.clip(newp * 4096.0, 1, 4095).astype(jnp.uint32)
               << jnp.uint32(6))
            | newc.astype(jnp.uint32))


def _stretch_f(p):
    p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    return jnp.clip(jnp.log(p / (1.0 - p)), -ST_CLAMP, ST_CLAMP)


def _idot(eq, w, x):
    """Integer mixer dot in st256 units: (sum w*x) >> 16 with w int32
    (16-bit fraction, |w| <= 8*65536) and x int32 st256 (+-3072).

    The 32-bit sum of full products would overflow, so w splits into
    hi(signed)*256 + lo(unsigned<256) and the two partial dots shift
    separately -- every step exact, associative, backend-independent.
    Worst case |hi dot| < 2^23 * n_inputs, safe to ~512 inputs."""
    w_hi = w >> 8
    w_lo = w - (w_hi << 8)
    return ((jnp.einsum(eq, w_hi, x) >> 8)
            + (jnp.einsum(eq, w_lo, x) >> 16))


def _squash_f(st):
    return jax.nn.sigmoid(st)


# --------------------------------------------------------------- range coder


def _coder_bit_b(cd, comp, enc_bit, p16, mode):
    """One shared coder step, batched (B,) (cf. src/coder/encoder.cpp:14-29
    / decoder.cpp:20-33). Returns (cd, bit, e32 packed emissions, k)."""
    x1, x2, xc = cd["x1"], cd["x2"], cd["xc"]
    r = x2 - x1
    xmid = x1 + (r >> jnp.uint32(16)) * p16 + \
        (((r & jnp.uint32(0xFFFF)) * p16) >> jnp.uint32(16))
    dec_bit = (xc <= xmid).astype(jnp.int32)
    bit = jnp.where(mode == MODE_ENCODE, enc_bit, dec_bit)
    x1 = jnp.where(bit == 1, x1, xmid + jnp.uint32(1))
    x2 = jnp.where(bit == 1, xmid, x2)

    rptr = cd["rptr"]
    nlen = comp.shape[1]
    bar = jnp.arange(comp.shape[0])
    e32 = jnp.zeros_like(x1)
    k = jnp.zeros_like(rptr)
    for i in range(4):
        cond = ((x1 ^ x2) & jnp.uint32(0xFF000000)) == 0
        e32 = e32 | jnp.where(cond, (x2 >> jnp.uint32(24))
                              << jnp.uint32(24 - 8 * i), jnp.uint32(0))
        nb = comp[bar, jnp.clip(rptr, 0, nlen - 1)].astype(jnp.uint32)
        x1 = jnp.where(cond, x1 << U8, x1)
        x2 = jnp.where(cond, (x2 << U8) | jnp.uint32(0xFF), x2)
        xc = jnp.where(cond, (xc << U8) | nb, xc)
        rptr = rptr + cond.astype(jnp.int32)
        k = k + cond.astype(jnp.int32)
    cd = dict(cd, x1=x1, x2=x2, xc=xc, total=cd["total"] + k, rptr=rptr)
    return cd, bit, e32, k


# ----------------------------------------------------------- tree predictor


def _ppm_blend_f32(sh, ppm_rows, B, p_ar):
    """f32 PPM escape-blend (fast profile).  Returns (st_ppm, pcnt_eff,
    ptot, pdst, see_d, see_t, see_p)."""
    pcnt = ppm_rows.astype(jnp.float32)
    if PPM_EXCL:
        # symbol exclusion (the property that makes PPMD strong,
        # src/models/ppmd.cpp update-exclusion walk): a symbol counted
        # at a higher order is removed from every lower order's
        # distribution, and the final fallback is uniform over the
        # never-seen set only.  One reversed cumsum, fully dense.
        rev = pcnt[:, ::-1, :]                               # high order 1st
        seen = jnp.cumsum((rev > 0).astype(jnp.float32), axis=1)
        seen_above = jnp.concatenate(
            [jnp.zeros((B, 1, 256), jnp.float32), seen[:, :-1]], axis=1)
        pcnt = jnp.where(seen_above > 0, 0.0, rev)[:, ::-1, :]
        unseen = (seen[:, -1, :] == 0).astype(jnp.float32)   # (B, 256)
        n_uns = jnp.sum(unseen, axis=1, keepdims=True)
        fb = jnp.where(n_uns > 0, unseen / jnp.maximum(n_uns, 1.0),
                       1.0 / 256.0)                          # (B, 256)
    else:
        fb = 1.0 / 256.0
    ptot = jnp.sum(pcnt, axis=2)                             # (B, NP)
    pdst = jnp.sum((pcnt > 0).astype(jnp.float32), axis=2)   # distinct
    # SEE: escape probability from the learned (order, distinct, total)
    # table instead of the raw PPM-C ratio
    see_d = jnp.minimum(pdst, SEE_DIST_B - 1).astype(jnp.int32)
    see_t = jnp.clip(jnp.log2(ptot + 1.0), 0, SEE_TOT_B - 1
                     ).astype(jnp.int32)
    see_p = sh["ppm_see"][p_ar[None, :], see_d, see_t]       # (B, NP)
    pesc = jnp.where(ptot > 0, see_p, 1.0)                   # (B, NP)
    # weight of order o (descending) = prod of escapes of higher orders
    esc_rev = pesc[:, ::-1]                                  # high order first
    wcum = jnp.concatenate(
        [jnp.ones((B, 1), jnp.float32),
         jnp.cumprod(esc_rev[:, :-1], axis=1)], axis=1)      # (B, NP)
    w_ord = (wcum * (1.0 - esc_rev))[:, ::-1]                # back ascending
    pnorm = pcnt / jnp.maximum(ptot, 1.0)[:, :, None]
    q = jnp.einsum("bn,bnk->bk", w_ord, pnorm) \
        + (wcum[:, -1] * esc_rev[:, -1])[:, None] * fb
    pqcum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), jnp.cumsum(q, axis=1)], axis=1)
    q_lo = pqcum[:, jnp.asarray(_LO)]
    q_hi = pqcum[:, jnp.asarray(_HI)]
    q_mid = pqcum[:, jnp.asarray(_MID)]
    p_ppm = jnp.clip((q_hi - q_mid) / jnp.maximum(q_hi - q_lo, 1e-9),
                     1e-5, 1 - 1e-5)
    st_ppm = _stretch_f(p_ppm)[:, None, :]                   # (B, 1, 256)
    return st_ppm, pcnt, ptot, pdst, see_d, see_t, see_p


def _ppm_blend_int(sh, ppm_rows, B, p_ar):
    """Integer twin of _ppm_blend_f32 (portable profile): distribution
    in 16-bit fixed point, escapes in p12, node probabilities via exact
    integer division, stretch via intmath.  Same return signature (all
    integer tensors)."""
    pcnt = ppm_rows.astype(jnp.int32)                        # (B, NP, 256)
    if PPM_EXCL:
        rev = pcnt[:, ::-1, :]
        seen = jnp.cumsum((rev > 0).astype(jnp.int32), axis=1)
        seen_above = jnp.concatenate(
            [jnp.zeros((B, 1, 256), jnp.int32), seen[:, :-1]], axis=1)
        pcnt = jnp.where(seen_above > 0, 0, rev)[:, ::-1, :]
        unseen = (seen[:, -1, :] == 0).astype(jnp.int32)     # (B, 256)
        n_uns = jnp.sum(unseen, axis=1, keepdims=True)
        fb16 = jnp.where(n_uns > 0,
                         unseen * (65536 // jnp.maximum(n_uns, 1)),
                         256)                                # (B, 256)
    else:
        fb16 = jnp.full((B, 256), 256, jnp.int32)            # 65536/256
    ptot = jnp.sum(pcnt, axis=2)                             # (B, NP)
    pdst = jnp.sum((pcnt > 0).astype(jnp.int32), axis=2)
    see_d = jnp.minimum(pdst, SEE_DIST_B - 1)
    see_t = jnp.minimum(_floor_log2_i(ptot + 1), SEE_TOT_B - 1)
    see_p = sh["ppm_see"][p_ar[None, :], see_d, see_t]       # (B,NP) p12
    pesc = jnp.where(ptot > 0, see_p, 4096)                  # (B, NP) p12
    # wcum16: cumulative escape products, high order first
    esc_rev = pesc[:, ::-1]
    wcum = [jnp.full((B,), 65536, jnp.int32)]
    for j in range(N_PPM - 1):
        wcum.append((wcum[-1] * esc_rev[:, j]) >> 12)
    wcum = jnp.stack(wcum, axis=1)                           # (B, NP)
    w_ord = ((wcum >> 4) * ((4096 - esc_rev) >> 2) >> 6)[:, ::-1]
    pnorm16 = (pcnt << 16) // jnp.maximum(ptot, 1)[:, :, None]
    q16 = jnp.sum(((w_ord[:, :, None] >> 4)
                   * (pnorm16 >> 4)) >> 8, axis=1)           # (B, 256)
    w_fb = (wcum[:, -1] * esc_rev[:, -1]) >> 12              # (B,)
    q16 = q16 + (((w_fb[:, None] >> 4) * (fb16 >> 4)) >> 8)
    pqcum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(q16, axis=1)], axis=1)
    q_lo = pqcum[:, jnp.asarray(_LO)]
    q_hi = pqcum[:, jnp.asarray(_HI)]
    q_mid = pqcum[:, jnp.asarray(_MID)]
    p12 = jnp.clip(((q_hi - q_mid) << 12)
                   // jnp.maximum(q_hi - q_lo, 1), 1, 4095)
    st_ppm = (stretch13_from_p12(p12) - 4096)[:, None, :]    # (B, 1, 256)
    return st_ppm, pcnt, ptot, pdst, see_d, see_t, see_p


def _floor_log2_i(x):
    e = jnp.zeros_like(x)
    for k in (16, 8, 4, 2, 1):
        big = x >= (1 << k)
        e = e + jnp.where(big, k, 0)
        x = jnp.where(big, x >> k, x)
    return e


def _dyn3_gates(cs, pb, exp_byte, pdst, ptot):
    """The MIX_DYN3 layer-1 gate values (see _derive): order-3 hash,
    strongest-match expected byte, PPM top-order confidence bucket,
    previous-word hash, analog delta pair."""
    l4 = cs["last4"]
    b1u = l4 & jnp.uint32(0xFF)
    b2u = (l4 >> U8) & jnp.uint32(0xFF)
    b3u = (l4 >> jnp.uint32(16)) & jnp.uint32(0xFF)
    sm = jnp.argmax(pb["match_len"], axis=1)                 # (B,)
    smb = jnp.take_along_axis(exp_byte, sm[:, None], axis=1)[:, 0]
    has = jnp.max(pb["match_len"], axis=1) > 0
    return [
        ((cs["ohash"][:, 3] >> jnp.uint32(20))
         & jnp.uint32(2047)).astype(jnp.int32),
        jnp.where(has, smb + 1, 0).astype(jnp.int32),
        (jnp.minimum(pdst[:, -1], 15.0)
         + 16.0 * (ptot[:, -1] > 0)).astype(jnp.int32),
        (cs["last_word"] & jnp.uint32(0xFF)).astype(jnp.int32),
        (_qdelta(b1u, b2u)
         | (_qdelta(b2u, b3u) << jnp.uint32(4))).astype(jnp.int32),
    ]


def _dyn4_gates(cs, pb, x, above_l, b1):
    """The MIX_DYN4 layer-1 gate values (see _derive).  The auxiliary
    average reads the LSTM/PPM/DMC stretches at the root node -- the
    per-byte analog of the reference's averaged auxiliary context
    (src/predictor.cpp:388-393)."""
    aux_ch = jnp.asarray(
        [N_BANK + 4 + N_MATCH, N_BANK + 4 + N_MATCH + 1, DMC_IDX])
    a = x[:, aux_ch, 1]                                      # (B, 3)
    if PORT:                                                 # st256 ints
        avg = (a[:, 0] + a[:, 1] + a[:, 2]) // 3
        aux_b = jnp.clip((avg >> 7) + 15, 0, 31)
    else:
        avg = (a[:, 0] + a[:, 1] + a[:, 2]) * (1.0 / 3.0)
        aux_b = jnp.clip(jnp.floor(avg * 2.0) + 15, 0, 31).astype(jnp.int32)
    return [
        aux_b.astype(jnp.int32),
        (cs["cls2reg"] & jnp.uint32(0xFF)).astype(jnp.int32),
        (jnp.minimum(cs["sentpos"] >> jnp.uint32(2), jnp.uint32(7)) * 8
         + jnp.minimum(cs["wordlen"], jnp.uint32(7))).astype(jnp.int32),
        (pb["ind_val"][:, 0] & jnp.uint32(0xFF)).astype(jnp.int32),
        ((jnp.minimum(above_l, jnp.uint32(256)) >> jnp.uint32(4)) * 16
         + (b1.astype(jnp.uint32) >> jnp.uint32(4))).astype(jnp.int32),
    ]


def _predict_tree_b(cfg, sh, pb, t):
    """Predictions for all 256 tree nodes of the current byte, batched.

    Returns (p_tree f32[B,256], aux dict threaded to _update_tree_b).
    """
    cs = pb["ctx"]
    node = jnp.asarray(_NODE)
    level = jnp.asarray(_LEVEL)
    rec_vals, rec_rl, rec_posr, jx = _record_ctx_vals(cfg, pb, t)
    x86_vals, x86_gate = x86_ctx_vals(pb["x86"])
    dist_b1 = None
    if CTX4:
        # distance-model operand: gap between the last two occurrences
        # of the previous byte (rec_stride is keyed by byte value)
        b1i = (cs["last4"] & jnp.uint32(0xFF)).astype(jnp.int32)
        dist_b1 = pb["rec_stride"][jnp.arange(b1i.shape[0]), b1i]
    bases, brctx, above_l, v_alive = _bank_bases_b(
        cs, pb["ind_val"], rec_vals, x86_vals, pb["x86"],
        dist_b1=dist_b1)
    brctx = brctx.astype(jnp.int32)
    B = bases.shape[0]

    rmask = jnp.uint32(cfg.rows - 1)
    rowi = ((bases >> U8) & rmask).astype(jnp.int32)         # (B, NM)
    m_ar = jnp.arange(N_BANK)
    ck_exp = None
    if BANK_CK == 2:
        # 2-way set-associative rows: ways {rowi, rowi^1} probed by
        # checksum; on a double miss the way whose resident is less
        # mature (smaller root-slot count) is replaced -- the bucket
        # search/priority-replacement capability of the reference's
        # DirectHash/BH tables (src/models/direct-hash.cpp:31-48,
        # src/models/paq8.cpp:788-813) at the same memory, ending the
        # mutual eviction of two hot contexts sharing a hashed row
        ck_exp = (bases & jnp.uint32(0xFF)).astype(jnp.int32)
        alt = rowi ^ 1
        rows_a = _bank_gather(sh, rowi)                      # (B, NM, 256)
        rows_b = _bank_gather(sh, alt)
        ok_a = (rows_a[:, :, 0] >> jnp.uint32(16)
                ).astype(jnp.int32) == ck_exp
        ok_b = (rows_b[:, :, 0] >> jnp.uint32(16)
                ).astype(jnp.int32) == ck_exp
        mat_a = rows_a[:, :, 1] & jnp.uint32(0x3F)
        mat_b = rows_b[:, :, 1] & jnp.uint32(0x3F)
        pick_b = (~ok_a) & (ok_b | (mat_b <= mat_a))
        rowi = jnp.where(pick_b, alt, rowi)
        rows = jnp.where(pick_b[:, :, None], rows_b, rows_a)
        hdr = rows[:, :, 0]          # chosen way's header, pre-reset
        rows = jnp.where((ok_a | ok_b)[:, :, None], rows,
                         jnp.uint32(_SLOT_INIT))
    else:
        rows = _bank_gather(sh, rowi)                        # (B, NM, 256)
        hdr = rows[:, :, 0]
        if BANK_CK:
            # row checksum from the hash bits below the row index: a
            # mismatched row belongs to a different context -- read it
            # as fresh and let the update replace it (branchless
            # equivalent of direct-hash.cpp:31-48 probing/reset)
            ck_exp = (bases & jnp.uint32(0xFF)).astype(jnp.int32)
            ck_ok = (hdr >> jnp.uint32(16)).astype(jnp.int32) == ck_exp
            rows = jnp.where(ck_ok[:, :, None], rows,
                             jnp.uint32(_SLOT_INIT))
    if PORT:                                                 # st256 int32
        st_bank = (rows >> jnp.uint32(18)).astype(jnp.int32) - 4096
    else:
        st_bank = ((rows >> jnp.uint32(18)).astype(jnp.float32)
                   - 4096.0) * (1.0 / 256.0)                 # (B, NM, 256)

    b1 = (cs["last4"] & jnp.uint32(0xFF)).astype(jnp.int32)  # (B,)
    if PORT:
        st_d0 = jnp.broadcast_to(
            (stretch13_from_p12(sh["d0_p"]) - 4096)[None], (B, 256))
    else:
        st_d0 = jnp.broadcast_to(_stretch_f(sh["d0_p"])[None], (B, 256))
    b2 = (cs["last4"] & jnp.uint32(0xFFFF)).astype(jnp.int32)
    d12_idx = jnp.stack([b1, 256 + b2, D12_BRK + brctx],
                        axis=1)                              # (B, 3)
    d12rows = sh["d12"][d12_idx]                             # (B, 3, 256)
    if PORT:
        st_d12 = (d12rows >> jnp.uint32(18)).astype(jnp.int32) - 4096
    else:
        st_d12 = ((d12rows >> jnp.uint32(18)).astype(jnp.float32)
                  - 4096.0) * (1.0 / 256.0)

    # match: cursors may point into ANY block's history (cross-block refs)
    exp_byte = pb["hist"][
        pb["mp_blk"], jnp.clip(pb["mp_pos"], 0, cfg.block_size - 1)
    ].astype(jnp.int32)                                      # (B, NM_M)
    lenb = jnp.minimum(pb["match_len"], 31)                  # (B, NM_M)
    conf = _take_cols(sh["match_conf"], lenb)
    exp_pref = (1 << level)[None, None, :] + (
        exp_byte[:, :, None] >> (8 - level)[None, None, :])  # (B, 2, 256)
    alive = (node[None, None, :] == exp_pref) & \
        (pb["match_len"] > 0)[:, :, None]
    exp_bit = (exp_byte[:, :, None] >> (7 - level)[None, None, :]) & 1
    if PORT:
        sign = jnp.where(exp_bit == 1, 1, -1)
        st_match = jnp.where(
            alive,
            sign * (stretch13_from_p12(conf) - 4096)[:, :, None], 0)
    else:
        sign = jnp.where(exp_bit == 1, 1.0, -1.0)
        st_match = jnp.where(alive, sign * _stretch_f(conf)[:, :, None],
                             0.0)
    if MATCH2:
        # secondary candidates (fxcm MatchModel2 class, see _derive)
        exp_byte2 = pb["hist"][
            pb["mp2_blk"], jnp.clip(pb["mp2_pos"], 0, cfg.block_size - 1)
        ].astype(jnp.int32)
        lenb2 = jnp.minimum(pb["match2_len"], 31)
        conf2 = _take_cols(sh["match2_conf"], lenb2)
        exp_pref2 = (1 << level)[None, None, :] + (
            exp_byte2[:, :, None] >> (8 - level)[None, None, :])
        alive2 = (node[None, None, :] == exp_pref2) & \
            (pb["match2_len"] > 0)[:, :, None]
        exp_bit2 = (exp_byte2[:, :, None]
                    >> (7 - level)[None, None, :]) & 1
        if PORT:
            sign2 = jnp.where(exp_bit2 == 1, 1, -1)
            st_match2 = jnp.where(
                alive2,
                sign2 * (stretch13_from_p12(conf2) - 4096)[:, :, None], 0)
        else:
            sign2 = jnp.where(exp_bit2 == 1, 1.0, -1.0)
            st_match2 = jnp.where(
                alive2, sign2 * _stretch_f(conf2)[:, :, None], 0.0)
        m2 = [st_match2]
    else:
        alive2 = exp_bit2 = lenb2 = conf2 = None
        m2 = []

    if cfg.lstm_hidden and PORT:
        qcum = pb["lstm"]["qcum"]                            # (B,257) i32
        tot_lo = qcum[:, jnp.asarray(_LO)]
        tot_hi = qcum[:, jnp.asarray(_HI)]
        mid = qcum[:, jnp.asarray(_MID)]
        p12l = jnp.clip(((tot_hi - mid) << 12)
                        // jnp.maximum(tot_hi - tot_lo, 1), 1, 4095)
        st_lstm = (stretch13_from_p12(p12l) - 4096)[:, None, :]
    elif cfg.lstm_hidden:
        qcum = pb["lstm"]["qcum"]                            # (B, 257)
        tot_lo = qcum[:, jnp.asarray(_LO)]
        tot_hi = qcum[:, jnp.asarray(_HI)]
        mid = qcum[:, jnp.asarray(_MID)]
        denom = jnp.maximum(tot_hi - tot_lo, 1e-3)
        p_lstm = jnp.clip((tot_hi - mid) / denom, 1e-5, 1 - 1e-5)
        st_lstm = _stretch_f(p_lstm)[:, None, :]             # (B, 1, 256)
    else:
        st_lstm = jnp.zeros((B, 1, 256),
                            jnp.int32 if PORT else jnp.float32)

    # ---- PPM: escape-blended multi-order byte distribution
    # (capability class of mod_ppmd's SQ[] enumeration + ConvertSQ,
    # src/models/ppmd.cpp:1130-1155; escapes estimated PPM-C style from
    # the distinct-symbol count instead of SEE contexts)
    pmask = jnp.uint32(cfg.prows - 1)
    psalt = (jnp.asarray(np.array(PPM_ORDERS, dtype=np.uint32))
             * jnp.uint32(0xB5297A4D))
    pcols = [cs["ohash"][:, o] if o <= 24
             else pb["h32" if o == 32 else "h48"] for o in PPM_ORDERS]
    pbase = mix32(jnp.stack(pcols, axis=1), psalt[None, :])  # (B, NP)
    prowi = ((pbase >> U8) & pmask).astype(jnp.int32)
    p_ar = jnp.arange(N_PPM)
    ppm_w = sh["ppm"][p_ar[None, :], prowi]                  # (B,NP,64) u32
    ppm_rows = jnp.stack(
        [(ppm_w >> jnp.uint32(8 * j)) & jnp.uint32(0xFF) for j in range(4)],
        axis=-1).reshape(ppm_w.shape[:2] + (256,)
                         ).astype(jnp.uint8)                 # (B,NP,256)
    if PPM_CK:
        pck_exp = (pbase & jnp.uint32(0xFF)).astype(jnp.int32)
        pck_ok = sh["ppm_ck"][p_ar[None, :], prowi] == pck_exp
        ppm_rows = jnp.where(pck_ok[:, :, None], ppm_rows, jnp.uint8(0))
    else:
        pck_exp = None
    if PORT:
        (st_ppm, pcnt, ptot, pdst, see_d, see_t,
         see_p) = _ppm_blend_int(sh, ppm_rows, B, p_ar)
    else:
        (st_ppm, pcnt, ptot, pdst, see_d, see_t,
         see_p) = _ppm_blend_f32(sh, ppm_rows, B, p_ar)

    # ---- state bank: packed slots carry their own stretch (see the
    # layout note at SBANK_COLS) -- one row gather, no per-state lookup
    scols = jnp.asarray(np.array(SBANK_COLS, dtype=np.int64))
    ssalt = (jnp.arange(N_SBANK, dtype=jnp.uint32) + jnp.uint32(7)) \
        * jnp.uint32(0x27D4EB2F)
    srowi = ((mix32(bases[:, scols], ssalt[None, :]) >> U8)
             & rmask).astype(jnp.int32)                      # (B, NS)
    s_ar = jnp.arange(N_SBANK)
    srows = sh["sbank"][s_ar[None, :], srowi]                # (B,NS,256) u32
    if PORT:
        st_sbank = (srows >> U8).astype(jnp.int32) - 4096
    else:
        st_sbank = ((srows >> U8).astype(jnp.float32)
                    - 4096.0) * (1.0 / 256.0)                # (B, NS, 256)

    # ---- DMC: grown bit-automaton prediction per tree node.  This
    # also APPLIES the previous byte's pending edge updates (deferred-
    # update design -- on TPU one fused Pallas kernel stages each
    # block's tables in VMEM once for both) and exposes the walk
    # outputs for plan_step at update time.
    if cfg.dmc_nodes:
        dmc_new, dmc_walk = dmc.predict_step(
            {k: pb[k] for k in dmc.DMC_STATE_KEYS})
        pb.update(dmc_new)
        if PORT:
            st_dmc = (stretch13_from_p12(
                dmc.p12_from_counts(dmc_walk["cw"])) - 4096)[:, None, :]
        else:
            st_dmc = _stretch_f(
                dmc.probs_from_counts(dmc_walk["cw"]))[:, None, :]
    else:
        dmc_walk = None
        st_dmc = jnp.zeros((B, 1, 256),
                           jnp.int32 if PORT else jnp.float32)
    if LMS:
        # strided LMS: taps over the bytes 1..4 records back
        rlL = jnp.where(pb["rec_forced"] > 0, pb["rec_forced"],
                        jnp.where(pb["rec_cnt"] >= 2, pb["rec_len"], 1))
        n = cfg.block_size
        ks = jnp.arange(1, LMS_K + 1)
        xs = pb["hist"][jnp.arange(B)[:, None],
                        jnp.mod(t - ks[None, :] * rlL[:, None], n)
                        ].astype(jnp.float32)                # (B, K)
        xs_f = (xs - 128.0) * (1.0 / 128.0)
        predf = jnp.clip(jnp.sum(pb["lms_w"] * xs_f, axis=1), -1.0, 1.0)
        pbyte = jnp.clip(jnp.round(predf * 128.0 + 128.0),
                         0, 255).astype(jnp.int32)           # (B,)
        errb = jnp.clip((pb["lms_err"] * 32.0), 0, 15).astype(jnp.int32)
        lconf = _take_cols(sh["lms_conf"], errb)             # (B,)
        lpref = (1 << level)[None, :] + (pbyte[:, None] >> (8 - level))
        l_on = node[None, :] == lpref
        l_bit = (pbyte[:, None] >> (7 - level)[None, :]) & 1
        lsign = jnp.where(l_bit == 1, 1.0, -1.0)
        st_lms = jnp.where(l_on, lsign * _stretch_f(lconf)[:, None],
                           0.0)[:, None, :]                  # (B, 1, 256)
        if LMS == 2:   # media-kind routed: silent on non-media blocks
            lms_med = (pb["blk_kind"] >= 3) & (pb["blk_kind"] <= 7)
            st_lms = jnp.where(lms_med[:, None, None], st_lms, 0.0)
        else:
            lms_med = None
        lm = [st_lms]
    else:
        xs_f = predf = pbyte = errb = lconf = None
        lm = []
    if VMATCH:
        # vertical match channel: expected byte from the line above,
        # confidence learned per matched-prefix length
        vlml = jnp.minimum(cs["lml"], jnp.uint32(31)).astype(jnp.int32)
        vconf = _take_cols(sh["vmatch_conf"], vlml)          # (B,)
        vexp_i = jnp.where(v_alive, above_l,
                           jnp.uint32(0)).astype(jnp.int32)  # (B,)
        vpref = (1 << level)[None, :] + (vexp_i[:, None] >> (8 - level))
        v_on = v_alive[:, None] & (node[None, :] == vpref)
        v_bit = (vexp_i[:, None] >> (7 - level)[None, :]) & 1
        vsign = jnp.where(v_bit == 1, 1.0, -1.0)
        st_vmatch = jnp.where(v_on, vsign * _stretch_f(vconf)[:, None],
                              0.0)[:, None, :]               # (B, 1, 256)
        vm = [st_vmatch]
    else:
        vlml = vconf = vexp_i = None
        vm = []
    if RUNX:
        # run channels (RunContextMap class, see _derive): the byte
        # last seen under each of the first RUNX_N bank contexts votes
        # its tree path with run-length-bucketed learned confidence
        rx_rows = hdr[:, :RUNX_N] & jnp.uint32(0xFFFF)        # (B, RN)
        rx_byte = ((rx_rows >> U8) & jnp.uint32(0xFF)).astype(jnp.int32)
        rx_cnt = (rx_rows & jnp.uint32(0xFF)).astype(jnp.int32)
        rx_b = jnp.minimum(_floor_log2_i(rx_cnt + 1), 7)
        rx_conf = _take_cols(sh["runx_conf"], rx_b)           # (B, RN)
        rx_pref = (1 << level)[None, None, :] + (
            rx_byte[:, :, None] >> (8 - level)[None, None, :])
        rx_alive = (node[None, None, :] == rx_pref) & \
            (rx_cnt > 0)[:, :, None]
        rx_bit = (rx_byte[:, :, None] >> (7 - level)[None, None, :]) & 1
        if PORT:
            rx_sign = jnp.where(rx_bit == 1, 1, -1)
            st_runx = jnp.where(
                rx_alive,
                rx_sign * (stretch13_from_p12(rx_conf) - 4096)[:, :, None],
                0)
        else:
            rx_sign = jnp.where(rx_bit == 1, 1.0, -1.0)
            st_runx = jnp.where(
                rx_alive, rx_sign * _stretch_f(rx_conf)[:, :, None], 0.0)
        rx = [st_runx]
    else:
        rx_rows = rx_byte = rx_cnt = rx_b = rx_conf = None
        rx_alive = rx_bit = None
        rx = []
    if JVAL:
        # JPEG coefficient-value channel: learned byte distribution of
        # the direct (comp, band, magN, magW) context, folded onto the
        # byte tree through its cumulative distribution (the same
        # interval decomposition the LSTM head and PPM use)
        def _jval_channel(jrows):
            if PORT:
                jq = jrows.astype(jnp.int32) * 16 + 1        # 16ths
                jqc = jnp.concatenate(
                    [jnp.zeros((B, 1), jnp.int32),
                     jnp.cumsum(jq, axis=1)], axis=1)
                j_lo = jqc[:, jnp.asarray(_LO)]
                j_hi = jqc[:, jnp.asarray(_HI)]
                j_mid = jqc[:, jnp.asarray(_MID)]
                jp12 = jnp.clip(((j_hi - j_mid) << 12)
                                // jnp.maximum(j_hi - j_lo, 1), 1, 4095)
                return jnp.where(jx["jvalid"][:, None],
                                 stretch13_from_p12(jp12) - 4096,
                                 0)[:, None, :]
            jq = jrows.astype(jnp.float32) + 0.0625
            jqc = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.float32),
                 jnp.cumsum(jq, axis=1)], axis=1)
            j_lo = jqc[:, jnp.asarray(_LO)]
            j_hi = jqc[:, jnp.asarray(_HI)]
            j_mid = jqc[:, jnp.asarray(_MID)]
            jp = jnp.clip((j_hi - j_mid)
                          / jnp.maximum(j_hi - j_lo, 1e-9),
                          1e-5, 1 - 1e-5)
            return jnp.where(jx["jvalid"][:, None], _stretch_f(jp),
                             0.0)[:, None, :]

        jrows = sh["jval"][jx["jctx"]]                       # (B, 256) u8
        jvx = [_jval_channel(jrows)]
        if JVAL >= 2:
            jrows2 = sh["jval2"][jx["jctx2"]]
            jvx.append(_jval_channel(jrows2))
        else:
            jrows2 = None
    else:
        jrows = None
        jrows2 = None
        jvx = []
    x = jnp.concatenate(
        [st_bank, st_d0[:, None, :], st_d12, st_match, st_lstm, st_ppm,
         st_sbank, st_dmc] + lm + vm + m2 + rx + jvx,
        axis=1)                                              # (B, NIN, 256)
    if BANK_CH > 1:
        # extra per-bank-model channels (see the BANK_CH note above);
        # the slot count is already in the gathered rows -- the widened
        # input only costs elementwise math plus a wider mixer matmul
        if PORT:
            cnti = (rows & jnp.uint32(0x3F)).astype(jnp.int32)
            conf12 = (cnti << 12) // (cnti + 2)              # p12
            extra = [(st_bank * conf12) >> 12]
            if BANK_CH > 2:
                extra.append((conf12 - 2048))                # +-2048 st256
        else:
            cntf = (rows & jnp.uint32(0x3F)).astype(jnp.float32)
            bconf = cntf / (cntf + 2.0)                      # (B, NM, 256)
            extra = [st_bank * bconf]
            if BANK_CH > 2:
                extra.append(2.0 * bconf - 1.0)
        x = jnp.concatenate([x] + extra, axis=1)

    longest = (jnp.max(jnp.where(pb["match_len"] > 0, lenb, 0), axis=1) * 2
               + jnp.max(jnp.where(pb["match_len"] > 0,
                                   (exp_byte >> 7) & 1, 0), axis=1)
               ).astype(jnp.int32)                           # (B,)
    dyn_idx = jnp.stack([
        b1,
        ((cs["ohash"][:, 2] >> jnp.uint32(22))
         & jnp.uint32(1023)).astype(jnp.int32),
        longest,
        ((cs["word"] >> jnp.uint32(24)) & jnp.uint32(0xFF)).astype(jnp.int32),
        (cs["clsreg"] & jnp.uint32(0xFF)).astype(jnp.int32),
        jnp.minimum(cs["linepos"], jnp.uint32(63)).astype(jnp.int32),
        brctx,
        (jnp.minimum(rec_posr, jnp.uint32(63)) * 2).astype(jnp.int32)
        + (pb["rec_cnt"] >= 2).astype(jnp.int32),
        x86_gate.astype(jnp.int32),
    ] + ([
        jnp.minimum(above_l, jnp.uint32(256)).astype(jnp.int32),
        ((cs["last4"] >> jnp.uint32(8))
         & jnp.uint32(0xFF)).astype(jnp.int32),
        (jnp.minimum(cs["wordlen"], jnp.uint32(15)) * 4
         + (cs["cls2reg"] & jnp.uint32(3))).astype(jnp.int32),
        (cs["tag"] & jnp.uint32(0xFF)).astype(jnp.int32),
    ] if MIX_DYN2 else []) + (_dyn3_gates(cs, pb, exp_byte, pdst, ptot)
                              if MIX_DYN3 else []) \
        + (_dyn4_gates(cs, pb, x, above_l, b1) if MIX_DYN4 else []) + ([
        jnp.clip(pb["blk_kind"], 0, 7) * 8
        + (cs["cls2reg"] & jnp.uint32(7)).astype(jnp.int32),
    ] if MIX_KIND else []), axis=1) \
        + jnp.asarray(_MIX1_OFF[2:])[None, :]                # (B, ND)
    w_dyn = sh["w1"][dyn_idx]                                # (B, 6, NIN)
    w_const = sh["w1"][0]                                    # (NIN,)
    w_level = jax.lax.dynamic_slice_in_dim(sh["w1"], 1, 8)   # (8, NIN)
    w_lvl_nodes = w_level[level]                             # (256, NIN)

    if PORT:
        # integer dots (hi/lo split, see _idot): exact on every backend
        dots = jnp.concatenate(
            [_idot("n,bnk->bk", w_const, x)[:, None],
             _idot("kn,bnk->bk", w_lvl_nodes, x)[:, None],
             _idot("bin,bnk->bik", w_dyn, x)], axis=1)
        # biases are stored at 16-bit fraction (fine-grained updates);
        # >> 8 brings them to the st256 dot domain
        dots = jnp.clip(dots + (sh["bias1"][None] >> 8), -3071, 3071)
        p1 = squash12(dots + 4096)                           # p12
        st1 = dots                                           # st256
    else:
        dot_const = jnp.einsum("n,bnk->bk", w_const, x)
        dot_dyn = jnp.einsum("bin,bnk->bik", w_dyn, x)       # (B, 6, 256)
        dot_level = jnp.einsum("kn,bnk->bk", w_lvl_nodes, x)
        dots = jnp.concatenate(
            [dot_const[:, None], dot_level[:, None], dot_dyn], axis=1)
        dots = dots + sh["bias1"][None]                      # (B, M1, 256)
        p1 = _squash_f(dots)
        st1 = jnp.clip(dots, -ST_CLAMP, ST_CLAMP)

    if MIX_AUX:
        # auxiliary taps: the LSTM/PPM/DMC stretches re-fed RAW into the
        # layer-2 mixers alongside the layer-1 outputs (the reference's
        # auxiliary channel, src/predictor.cpp:72-75,388-406)
        aux_ch = jnp.asarray(
            [N_BANK + 4 + N_MATCH, N_BANK + 4 + N_MATCH + 1, DMC_IDX])
        st1c = jnp.concatenate([st1, x[:, aux_ch, :]], axis=1)
    else:
        st1c = st1
    clsg = (cs["clsreg"] & jnp.uint32(63)).astype(jnp.int32)  # (B,)
    if MIX2X:
        sbg = SBANK_COLS.index(1) if 1 in SBANK_COLS else 0
        dyn2_idx = jnp.stack([
            (cs["word"] & jnp.uint32(63)).astype(jnp.int32),
            longest,
            ((cs["ohash"][:, 2] >> jnp.uint32(17))
             & jnp.uint32(0xFF)).astype(jnp.int32),
            (srows[:, sbg, 1] & jnp.uint32(0xFF)).astype(jnp.int32),
            (jnp.minimum(cs["linepos"], jnp.uint32(63)) * 4
             + (cs["cls2reg"] & jnp.uint32(3))).astype(jnp.int32),
        ], axis=1) + jnp.asarray(_MIX2_OFF)[None, :]         # (B, K2)
        w2x_rows = sh["w2x"][dyn2_idx]                       # (B, K2, M2IN)
    else:
        dyn2_idx = w2x_rows = None
    w2n = sh["w2"][level]                                    # (256, M2IN)
    if PORT:
        dot2l = [_idot("km,bmk->bk", w2n, st1c)[:, None],
                 _idot("bm,bmk->bk", sh["w2b"][b1], st1c)[:, None],
                 _idot("bm,bmk->bk", sh["w2c"][clsg], st1c)[:, None]]
        if MIX2X:
            dot2l.append(_idot("bjm,bmk->bjk", w2x_rows, st1c))
        dot2 = jnp.concatenate(dot2l, axis=1)
        dot2 = jnp.clip(dot2 + (sh["bias2"][None] >> 8), -3071, 3071)
        p2 = squash12(dot2 + 4096)
        st2 = dot2
        dot3 = _idot("kj,bjk->bk", sh["w3"][level], st2) \
            + (sh["bias3"][None] >> 8)
        st3 = jnp.clip(dot3, -3071, 3071)
        p_mix = squash12(st3 + 4096)                         # p12
    else:
        dot2l = [jnp.einsum("km,bmk->bk", w2n, st1c)[:, None],
                 jnp.einsum("bm,bmk->bk", sh["w2b"][b1], st1c)[:, None],
                 jnp.einsum("bm,bmk->bk", sh["w2c"][clsg], st1c)[:, None]]
        if MIX2X:
            dot2l.append(jnp.einsum("bjm,bmk->bjk", w2x_rows, st1c))
        dot2 = jnp.concatenate(dot2l, axis=1) \
            + sh["bias2"][None]                              # (B, NL2, 256)
        p2 = _squash_f(dot2)
        st2 = jnp.clip(dot2, -ST_CLAMP, ST_CLAMP)
        w3n = sh["w3"][level]                                # (256, NL2)
        dot3 = jnp.einsum("kj,bjk->bk", w3n, st2) + sh["bias3"][None]
        st3 = None
        p_mix = _squash_f(dot3)                              # (B, 256)

    def apm(tbl_rows, p):
        # interpolated SSE read as one (B,256,33)x(B,33) contraction on
        # the MXU -- take_along_axis from 33-entry rows lowers to a
        # per-element gather loop on TPU (profiled at ~0.5 ms each)
        tf = jnp.clip((_stretch_f(p) + 8.0) * 2.0, 0.0, 31.999)
        tl = tf.astype(jnp.int32)
        frac = tf - tl.astype(jnp.float32)
        j = jnp.arange(33)[None, None, :]
        w = ((j == tl[:, :, None]) * (1 - frac)[:, :, None]
             + (j == (tl + 1)[:, :, None]) * frac[:, :, None])
        return jnp.einsum("bkt,bt->bk", w, tbl_rows), tl, frac

    def apm_int(tbl_rows, st):
        # integer twin: 7-bit interpolation weights, rows are p12
        tq = jnp.clip(st + 2048, 0, 4095)
        tl = jnp.minimum(tq >> 7, 31)
        fr = tq - (tl << 7)                                  # 0..127
        j = jnp.arange(33)[None, None, :]
        w = ((j == tl[:, :, None]) * (128 - fr)[:, :, None]
             + (j == (tl + 1)[:, :, None]) * fr[:, :, None])
        pa = jnp.einsum("bkt,bt->bk", w, tbl_rows) >> 7      # p12
        return jnp.clip(pa, 1, 4095), tl, fr

    o2g = ((cs["ohash"][:, 2] >> jnp.uint32(17))
           & jnp.uint32(0xFF)).astype(jnp.int32)
    apm_gates = [b1, 256 + longest, 320 + o2g]
    if APM2X:
        apm_gates.append(
            576 + (cs["word"] & jnp.uint32(0xFF)).astype(jnp.int32))
        apm_gates.append(
            832 + (jnp.minimum(cs["linepos"], jnp.uint32(63)) * 4
                   + (cs["cls2reg"] & jnp.uint32(3))).astype(jnp.int32))
    if APM3X:
        sb2 = SBANK_COLS.index(1) if 1 in SBANK_COLS else 0
        st_o2 = (srows[:, sb2, 1] & jnp.uint32(0xFF)).astype(jnp.int32)
        apm_gates.append(576 + 512 * APM2X + st_o2)
    apm_idx = jnp.stack(apm_gates, axis=1)                   # (B, NA)
    apm_rows = sh["apm"][apm_idx]                            # (B, NA, 33)
    pas, tls, frs = [], [], []
    for j in range(N_APM):
        if PORT:
            pa_j, t_j, f_j = apm_int(apm_rows[:, j], st3)
        else:
            pa_j, t_j, f_j = apm(apm_rows[:, j], p_mix)
        pas.append(pa_j)
        tls.append(t_j)
        frs.append(f_j)
    if PORT:
        st_in = jnp.stack(
            [st3] + [stretch13_from_p12(p) - 4096 for p in pas],
            axis=1)                                          # (B, 1+NA, 256)
        if APM_FIXED:
            pa = jnp.clip(sum(pas) // N_APM, 1, 4095)
            st_fin = ((26214 * st3) >> 16) \
                + ((39322 * (stretch13_from_p12(pa) - 4096)) >> 16)
        else:
            wa = sh["w_apm"][longest]                        # (B, 1+NA)
            wa_hi = wa >> 8
            wa_lo = wa - (wa_hi << 8)
            st_fin = (jnp.einsum("bj,bjk->bk", wa_hi, st_in) >> 8) \
                + (jnp.einsum("bj,bjk->bk", wa_lo, st_in) >> 16)
        st_fin = jnp.clip(st_fin, -3071, 3071)
        sse2_g = sse2_stf = sse2_stp = None
        if SSE2:
            base2 = 576 + 512 * APM2X + 256 * APM3X
            sbix = SBANK_COLS.index(1) if 1 in SBANK_COLS else 0
            sse2_g = (srows[:, sbix, 1] & jnp.uint32(0xFF)
                      ).astype(jnp.int32)                    # (B,)
            rows2 = sh["apm"][base2 + sse2_g]                # (B, 33)
            pa_f, tl_f, fr_f = apm_int(rows2, st_fin)
            sse2_stp = stretch13_from_p12(pa_f) - 4096
            ws = sh["w_sse"][sse2_g]                         # (B, 2) i32
            ws_hi, ws_lo = ws >> 8, ws & 255

            def _wmul(j, st):
                return ((ws_hi[:, j:j + 1] * st) >> 8) \
                    + ((ws_lo[:, j:j + 1] * st) >> 16)
            sse2_stf = st_fin
            st_fin = jnp.clip(_wmul(0, st_fin) + _wmul(1, sse2_stp),
                              -3071, 3071)
            apm_idx = jnp.concatenate(
                [apm_idx, (base2 + sse2_g)[:, None]], axis=1)
            apm_rows = jnp.concatenate([apm_rows, rows2[:, None]], axis=1)
            tls.append(tl_f)
            frs.append(fr_f)
        p_tree = squash16(st_fin + 4096)                     # p16 int32
        p_tree12 = squash12(st_fin + 4096)
    else:
        st_in = jnp.stack(
            [_stretch_f(p_mix)] + [_stretch_f(p) for p in pas],
            axis=1)                                          # (B, 1+NA, 256)
        if APM_FIXED:
            pa = jnp.clip(sum(pas) * (1.0 / N_APM), 1e-6, 1 - 1e-6)
            st_fin = 0.4 * _stretch_f(p_mix) + 0.6 * _stretch_f(pa)
        else:
            wa = sh["w_apm"][longest]                        # (B, 4)
            st_fin = jnp.einsum("bj,bjk->bk", wa, st_in)
        sse2_g = sse2_stf = sse2_stp = None
        if SSE2:
            base2 = 576 + 512 * APM2X + 256 * APM3X
            sbix = SBANK_COLS.index(1) if 1 in SBANK_COLS else 0
            sse2_g = (srows[:, sbix, 1] & jnp.uint32(0xFF)
                      ).astype(jnp.int32)                    # (B,)
            rows2 = sh["apm"][base2 + sse2_g]                # (B, 33)
            pa_f, tl_f, fr_f = apm(rows2, _squash_f(st_fin))
            sse2_stf = jnp.clip(st_fin, -ST_CLAMP, ST_CLAMP)
            sse2_stp = _stretch_f(jnp.clip(pa_f, 1e-6, 1 - 1e-6))
            ws = sh["w_sse"][sse2_g]                         # (B, 2)
            st_fin = ws[:, 0:1] * sse2_stf + ws[:, 1:2] * sse2_stp
            apm_idx = jnp.concatenate(
                [apm_idx, (base2 + sse2_g)[:, None]], axis=1)
            apm_rows = jnp.concatenate([apm_rows, rows2[:, None]], axis=1)
            tls.append(tl_f)
            frs.append(fr_f)
        p_tree = _squash_f(st_fin)                           # (B, 256)
        p_tree12 = None

    aux = dict(rowi=rowi, rows=rows, ck_exp=ck_exp, hdr=hdr, b1=b1,
               d12_idx=d12_idx,
               prowi=prowi, ppm_rows=ppm_rows, pcnt_eff=pcnt,
               pck_exp=pck_exp,
               srowi=srowi, srows=srows,
               see_d=see_d, see_t=see_t, see_p=see_p, ptot=ptot,
               d12rows=d12rows, apm_idx=apm_idx, apm_rows=apm_rows,
               alive=alive, exp_bit=exp_bit, lenb=lenb,
               alive2=alive2, exp_bit2=exp_bit2, lenb2=lenb2, conf2=conf2,
               conf=conf, x=x, dyn_idx=dyn_idx, w_const=w_const,
               w_level=w_level, p1=p1, st1=st1c, p_mix=p_mix,
               p2=p2, st2=st2, clsg=clsg, dyn2_idx=dyn2_idx,
               longest=longest, tls=tuple(tls), frs=tuple(frs),
               st_in=st_in, p_tree=p_tree, p_tree12=p_tree12,
               vlml=vlml, vconf=vconf, vexp=vexp_i, valive=v_alive,
               lms_xs=xs_f, lms_pred=predf, lms_pbyte=pbyte,
               lms_errb=errb, lms_conf=lconf,
               sse2_g=sse2_g, sse2_stf=sse2_stf, sse2_stp=sse2_stp,
               rx_rows=rx_rows, rx_byte=rx_byte, rx_b=rx_b,
               rx_conf=rx_conf, rx_alive=rx_alive, rx_bit=rx_bit,
               lms_med=(lms_med if LMS == 2 else None),
               dmc_walk=dmc_walk, jx=jx, jval_rows=jrows if JVAL else None,
               jval_rows2=jrows2 if JVAL >= 2 else None)
    return p_tree, aux


# ------------------------------------------------------------- tree update


def _claim_win(n_flat, fidx, B):
    """Deterministic scatter-collision winner (portable profile).

    fidx: (B, ...) flat indices into a table of n_flat slots.  Returns a
    bool mask, True where this block is the winner for its slot.  The
    fast profile lets XLA pick the duplicate-scatter winner (stable per
    executable); cross-executable portability needs an explicit rule:
    highest block index wins, decided by an associative scatter-max."""
    bar = jnp.arange(B, dtype=jnp.int32).reshape(
        (B,) + (1,) * (fidx.ndim - 1))
    claim = jnp.zeros((n_flat,), jnp.int32).at[fidx].max(
        bar + 1, mode="drop")
    return claim[fidx] == bar + 1


def _slot_update_int(slots, target_i):
    """Integer twin of _slot_update: packed slots toward target bits.

    rate = 65536/(10*cnt+16) ~ 1/(cnt+1.6); st13 via intmath."""
    cnt = (slots & jnp.uint32(0x3F)).astype(jnp.int32)
    p12 = ((slots >> jnp.uint32(6)) & jnp.uint32(0xFFF)).astype(jnp.int32)
    r16 = 655360 // (10 * cnt + 16)
    newp = jnp.clip(
        p12 + (((target_i * 4096 - p12) * r16) >> 16), 1, 4095)
    newc = jnp.minimum(cnt + 1, CNT_CAP)
    st13 = stretch13_from_p12(newp)
    return ((st13.astype(jnp.uint32) << jnp.uint32(18))
            | (newp.astype(jnp.uint32) << jnp.uint32(6))
            | newc.astype(jnp.uint32))


def _update_tree_b(cfg, sh, pb, aux, byte, t):
    """Adapt every model along each block's 8-node tree path.

    Shared dense tables aggregate all blocks' deltas (sum semantics);
    slot updates are explicit-index scatters touching 8 path slots per
    block per table.  byte: (B,) int32.
    """
    lr = MIX_LR if not MIX_TAU else \
        MIX_LR * jax.lax.rsqrt(1.0 + t.astype(jnp.float32) / MIX_TAU)
    level = jnp.asarray(_LEVEL)
    node = jnp.asarray(_NODE)
    B = byte.shape[0]
    bar = jnp.arange(B)
    pref = (1 << level)[None, :] + (byte[:, None] >> (8 - level)[None, :])
    on_path = (node[None, :] == pref).astype(jnp.float32)    # (B, 256)
    on_path = on_path.at[:, 0].set(0.0)
    target = ((byte[:, None] >> (7 - level)[None, :]) & 1).astype(jnp.float32)
    # the 8 path nodes of each block, level-ordered
    n8 = (1 << jnp.arange(8))[None, :] + (
        byte[:, None] >> (8 - jnp.arange(8))[None, :])       # (B, 8)
    t8 = ((byte[:, None] >> (7 - jnp.arange(8))[None, :]) & 1
          ).astype(jnp.float32)                              # (B, 8)

    target_i = ((byte[:, None] >> (7 - level)[None, :]) & 1)  # int (B,256)

    # ---- bank: masked in-row slot updates, one row-window scatter.
    # Dense full-row compute + mask is the fast form on TPU: the fused
    # elementwise update of all 2.4M slots costs ~50 us, while gathering
    # the 8 path slots per row costs ~1.3 ms (dynamic gathers run at
    # ~12 ns/element on the scalar core) -- measured both ways.
    onp_b = on_path.astype(jnp.bool_)
    if PORT:
        newrows = jnp.where(onp_b[:, None, :],
                            _slot_update_int(aux["rows"],
                                             target_i[:, None, :]),
                            aux["rows"])
    else:
        newrows = jnp.where(onp_b[:, None, :],
                            _slot_update(aux["rows"], target[:, None, :]),
                            aux["rows"])
    # ---- row header (slot 0): claim the checksum and refresh the run
    # channel in the same row write (see _bank_gather's layout note).
    # The run refresh replicates the former dedicated runx table:
    # same byte extends the run, a new byte restarts it
    # (RunContextMap semantics, fxcm/paq8 class).
    hdr_old = aux["hdr"]                                     # (B, NM) u32
    if not (RUNX or BANK_CK):
        hdr_old = None                                       # passthrough
    elif RUNX:
        rx_old_cnt = (hdr_old & jnp.uint32(0xFF)).astype(jnp.int32)
        rx_old_byte = ((hdr_old >> U8) & jnp.uint32(0xFF)).astype(jnp.int32)
        same_rx = rx_old_byte == byte[:, None]
        ncnt = jnp.where(same_rx, jnp.minimum(rx_old_cnt + 1, 255), 1)
        run16 = (byte[:, None].astype(jnp.uint32) << U8) \
            | ncnt.astype(jnp.uint32)
    else:
        run16 = hdr_old & jnp.uint32(0xFFFF)
    if hdr_old is not None:
        ck16 = (aux["ck_exp"].astype(jnp.uint32) if BANK_CK
                else hdr_old >> jnp.uint32(16))
        hdr_new = (ck16 << jnp.uint32(16)) | run16
        newrows = newrows.at[:, :, 0].set(hdr_new)
    m_ar = jnp.arange(N_BANK)
    if PORT:
        win = _claim_win(N_BANK * cfg.rows,
                         m_ar[None, :] * cfg.rows + aux["rowi"], B)
        rowi_w = jnp.where(win, aux["rowi"], cfg.rows)
        _bank_scatter(sh, rowi_w, newrows)
    else:
        _bank_scatter(sh, aux["rowi"], newrows)

    # ---- d0: aggregated dense update (shared order-0 stats)
    if PORT:
        onp_i = on_path.astype(jnp.int32)
        delta0 = jnp.clip(jnp.sum(
            (target_i * 4096 - sh["d0_p"][None]) * onp_i, axis=0),
            -(1 << 20), 1 << 20)
        hits0 = jnp.sum(onp_i, axis=0)
        if STAT_NORM:
            delta0 = delta0 // jnp.maximum(hits0, 1)
            hits0 = jnp.minimum(hits0, 1)
        r16_0 = 655360 // (10 * sh["d0_c"] + 16)
        sh["d0_p"] = jnp.clip(
            sh["d0_p"] + ((jnp.clip(delta0, -32768, 32767) * r16_0)
                          >> 16), 1, 4095)
        sh["d0_c"] = jnp.minimum(sh["d0_c"] + hits0, CNT_CAP)
    else:
        c0 = sh["d0_c"]
        r0 = 1.0 / (c0 + 1.6)
        delta0 = jnp.sum((target - sh["d0_p"][None]) * on_path, axis=0)
        hits0 = jnp.sum(on_path, axis=0)
        if STAT_NORM:
            delta0 = delta0 / jnp.maximum(hits0, 1.0)
            hits0 = jnp.minimum(hits0, 1.0)
        sh["d0_p"] = jnp.clip(sh["d0_p"] + r0 * delta0, 1e-4, 1 - 1e-4)
        sh["d0_c"] = jnp.minimum(c0 + hits0, float(CNT_CAP))

    # ---- d1/d2 arena: masked row updates, one scatter (dense form --
    # see the bank note above)
    if PORT:
        newd = jnp.where(onp_b[:, None, :],
                         _slot_update_int(aux["d12rows"],
                                          target_i[:, None, :]),
                         aux["d12rows"])
        win_d = _claim_win(D12_ROWS, aux["d12_idx"], B)
        d12_w = jnp.where(win_d, aux["d12_idx"], D12_ROWS)
        sh["d12"] = sh["d12"].at[d12_w].set(newd, mode="drop")
    else:
        newd = jnp.where(onp_b[:, None, :],
                         _slot_update(aux["d12rows"], target[:, None, :]),
                         aux["d12rows"])
        sh["d12"] = sh["d12"].at[aux["d12_idx"]].set(newd)

    # ---- PPM: increment the observed byte's count; halve the whole row
    # first when that count would overflow uint8 (rescale ~ ppmd.cpp
    # rescale semantics: halving preserves ratios, decays old evidence)
    # byte one-hot selection instead of take_along_axis: dynamic gathers
    # run per-element on the scalar core (~12 ns each); a single-nonzero
    # one-hot contraction is a dense vector op with the identical result
    byte_ohi = (jnp.asarray(_NODE)[None, :]
                == byte[:, None]).astype(jnp.int32)          # (B, 256)
    obs = jnp.einsum("bk,bnk->bn", byte_ohi,
                     aux["ppm_rows"].astype(jnp.int32)
                     )[:, :, None].astype(jnp.uint8)         # (B, NP, 1)
    if PPM_UPD:
        # update exclusion: bump only orders >= the highest order that
        # already contained the byte (all orders when it is novel) --
        # see the PPM_UPD note in _derive
        seen = obs[:, :, 0] > 0                              # (B, NP)
        rev = seen[:, ::-1].astype(jnp.int32)                # high 1st
        above = (jnp.cumsum(rev, axis=1) - rev) > 0
        upd = (~above[:, ::-1])[:, :, None]                  # (B, NP, 1)
    else:
        upd = jnp.bool_(True)
    needs_halve = (obs >= jnp.uint8(256 - PPM_INC)) & upd
    prow_new = jnp.where(needs_halve, aux["ppm_rows"] >> jnp.uint8(1),
                         aux["ppm_rows"])
    byte_oh = byte_ohi.astype(jnp.uint8)[:, None, :]
    prow_new = prow_new + byte_oh * jnp.where(
        upd, jnp.uint8(PPM_INC), jnp.uint8(0))
    p_ar = jnp.arange(N_PPM)
    pw = prow_new.reshape(prow_new.shape[:2] + (64, 4)).astype(jnp.uint32)
    prow_new_w = (pw[..., 0] | (pw[..., 1] << jnp.uint32(8))
                  | (pw[..., 2] << jnp.uint32(16))
                  | (pw[..., 3] << jnp.uint32(24)))          # (B,NP,64)
    if PORT:
        win_p = _claim_win(N_PPM * cfg.prows,
                           p_ar[None, :] * cfg.prows + aux["prowi"], B)
        prowi_w = jnp.where(win_p, aux["prowi"], cfg.prows)
    else:
        prowi_w = aux["prowi"]
    sh["ppm"] = sh["ppm"].at[
        p_ar[None, :], prowi_w].set(prow_new_w, mode="drop")
    if PPM_CK:
        # claim the row for this context (same winner as the row write)
        sh["ppm_ck"] = sh["ppm_ck"].at[
            p_ar[None, :], prowi_w].set(aux["pck_exp"], mode="drop")

    # ---- JVAL: bump the observed byte's count in the coefficient-value
    # distribution (halve the row first when it would overflow uint8)
    if JVAL:
        def _jval_bump(key, rows, ctx_key, n_rows):
            jr = rows                                        # (B, 256) u8
            obs_j = jnp.einsum("bk,bk->b", byte_ohi,
                               jr.astype(jnp.int32))[:, None]  # (B, 1)
            jr = jnp.where(obs_j >= 256 - 4, jr >> jnp.uint8(1), jr)
            jr = jr + byte_ohi.astype(jnp.uint8) * jnp.uint8(4)
            jidx = jnp.where(aux["jx"]["jvalid"], aux["jx"][ctx_key],
                             n_rows)
            if PORT:
                win_j = _claim_win(n_rows + 1, jidx[:, None], B)[:, 0]
                jidx = jnp.where(win_j, jidx, n_rows)
            sh[key] = sh[key].at[jidx].set(jr, mode="drop")

        _jval_bump("jval", aux["jval_rows"], "jctx", JVAL_ROWS)
        if JVAL >= 2:
            _jval_bump("jval2", aux["jval_rows2"], "jctx2", JVAL2_ROWS)

    # ---- SEE: adapt escape estimates toward observed escape events
    # (escape at order o <=> the coded byte had count 0 in that row;
    # under exclusion, count 0 in the EXCLUDED distribution)
    obs_eff = jnp.einsum(
        "bk,bnk->bn", byte_ohi.astype(aux["pcnt_eff"].dtype),
        aux["pcnt_eff"])[:, :, None]                         # (B, NP, 1)
    if PORT:
        esc_ti = (obs_eff[:, :, 0] == 0).astype(jnp.int32) * 4096
        see_mi = (aux["ptot"] > 0).astype(jnp.int32)
        d_see_i = (((esc_ti - aux["see_p"]) * 82) >> 12) * see_mi
        if STAT_NORM:
            see_cnt = jnp.zeros_like(sh["ppm_see"]).at[
                p_ar[None, :], aux["see_d"], aux["see_t"]].add(see_mi)
            see_acc = jnp.zeros_like(sh["ppm_see"]).at[
                p_ar[None, :], aux["see_d"], aux["see_t"]].add(d_see_i)
            sh["ppm_see"] = jnp.clip(
                sh["ppm_see"] + see_acc // jnp.maximum(see_cnt, 1),
                4, 3891)
        else:
            sh["ppm_see"] = jnp.clip(
                sh["ppm_see"].at[p_ar[None, :], aux["see_d"],
                                 aux["see_t"]].add(d_see_i), 4, 3891)
        _see_done = True
    else:
        _see_done = False
    esc_t = (obs_eff[:, :, 0] == 0).astype(jnp.float32)      # (B, NP)
    see_msk = (aux["ptot"] > 0).astype(jnp.float32)
    d_see = (SEE_RATE * (esc_t - aux["see_p"].astype(jnp.float32))
             * see_msk)
    if _see_done:
        pass
    elif STAT_NORM:
        see_cnt = jnp.zeros_like(sh["ppm_see"]).at[
            p_ar[None, :], aux["see_d"], aux["see_t"]].add(see_msk)
        see_acc = jnp.zeros_like(sh["ppm_see"]).at[
            p_ar[None, :], aux["see_d"], aux["see_t"]].add(d_see)
        sh["ppm_see"] = jnp.clip(
            sh["ppm_see"] + see_acc / jnp.maximum(see_cnt, 1.0),
            1e-3, 1.0 - 1e-3)
    else:
        sh["ppm_see"] = jnp.clip(
            sh["ppm_see"].at[p_ar[None, :], aux["see_d"],
                             aux["see_t"]].add(d_see),
            1e-3, 1.0 - 1e-3)

    # ---- state bank: advance ONLY the 8 path slots' automaton states
    # (8 indices/block instead of 256 -- the all-node gather from the
    # tiny transition table was the profiled hot spot), adapt the shared
    # per-(model, state) probability (src/models/indirect.cpp:16-31),
    # and re-pack the new state's current stretch into the slot.
    # All path-node and per-state indexing below is one-hot contraction
    # instead of take_along_axis/scatter: single-nonzero sums are exact
    # in any dtype and run dense on the VPU/MXU, while dynamic gathers
    # cost ~12 ns/element on the scalar core (the profiled cost center).
    s_ar = jnp.arange(N_SBANK)
    oh8i = (n8[:, :, None] == jnp.asarray(_NODE)[None, None, :]
            ).astype(jnp.int32)                              # (B, 8, 256)
    s8p = jnp.einsum("bok,bnk->bno", oh8i,
                     aux["srows"].astype(jnp.int32))         # (B, NS, 8)
    s8 = s8p & 0xFF                                          # states
    t8_i = jnp.broadcast_to(
        t8.astype(jnp.int32)[:, None, :], (B, N_SBANK, 8))
    ohs = (s8[..., None] == jnp.arange(256)[None, None, None, :]
           ).astype(jnp.int32)                               # (B,NS,8,256)
    # both successor states packed in one word -> one (B,NS,8,256)
    # contraction instead of two (exact: single-nonzero sums)
    nxt01 = jnp.einsum(
        "bnos,ns->bno", ohs,
        jnp.asarray(_SBANK_NEXT[:, :, 0].astype(np.int32)
                    | (_SBANK_NEXT[:, :, 1].astype(np.int32) << 8)))
    nxt0, nxt1 = nxt01 & 0xFF, nxt01 >> 8
    nxt8 = jnp.where(t8_i == 1, nxt1, nxt0)                  # (B, NS, 8)
    ohn = (nxt8[..., None] == jnp.arange(256)[None, None, None, :]
           ).astype(jnp.int32)
    m8 = jnp.sum(oh8i, axis=1)                               # (B, 256) 0/1
    if PORT:
        pm12 = jnp.einsum("bnos,ns->bno", ohs, sh["sbank_p"])
        errs12 = t8_i * 4096 - pm12
        if SBANK_ADAPT:
            r16s = jnp.einsum(
                "bnos,ns->bno", ohs,
                jnp.maximum(1311, 65536 // (sh["sbank_c"] + 2)))
        else:
            r16s = 1311                                      # 0.02 * 65536
        d12s = (r16s * errs12) >> 16
        sb_cnt = jnp.einsum("bnos->ns", ohs)
        sb_acc = jnp.einsum("bnos,bno->ns", ohs, d12s)
        if STAT_NORM:
            sh["sbank_p"] = jnp.clip(
                sh["sbank_p"] + sb_acc // jnp.maximum(sb_cnt, 1),
                1, 4095)
        else:
            sh["sbank_p"] = jnp.clip(sh["sbank_p"] + sb_acc, 1, 4095)
        if SBANK_ADAPT:
            sh["sbank_c"] = jnp.minimum(
                sh["sbank_c"] + (sb_cnt if not STAT_NORM else
                                 (sb_cnt > 0).astype(jnp.int32)), 1024)
        p_nxt12 = jnp.einsum("bnos,ns->bno", ohn, sh["sbank_p"])
        st13s = stretch13_from_p12(p_nxt12).astype(jnp.uint32)
        packed = nxt8.astype(jnp.uint32) | (st13s << U8)
        vals_d = jnp.einsum("bok,bno->bnk", oh8i,
                            packed.astype(jnp.int32)).astype(jnp.uint32)
        new_srows = jnp.where(m8[:, None, :] > 0, vals_d, aux["srows"])
        win_s = _claim_win(N_SBANK * cfg.rows,
                           s_ar[None, :] * cfg.rows + aux["srowi"], B)
        srowi_w = jnp.where(win_s, aux["srowi"], cfg.rows)
        sh["sbank"] = sh["sbank"].at[
            s_ar[None, :], srowi_w].set(new_srows, mode="drop")
    else:
        ohs_f = ohs.astype(jnp.float32)
        pm = jnp.einsum("bnos,ns->bno", ohs_f, sh["sbank_p"])
        errs = t8[:, None, :] - pm
        if SBANK_ADAPT:
            rate8 = jnp.einsum(
                "bnos,ns->bno", ohs_f,
                jnp.maximum(SBANK_RATE, 1.0 / (sh["sbank_c"] + 2.0)))
        else:
            rate8 = SBANK_RATE
        sb_cnt = jnp.einsum("bnos->ns", ohs_f)
        sb_acc = jnp.einsum("bnos,bno->ns", ohs_f, rate8 * errs)
        if STAT_NORM:
            sh["sbank_p"] = jnp.clip(
                sh["sbank_p"] + sb_acc / jnp.maximum(sb_cnt, 1.0),
                1e-4, 1 - 1e-4)
            if SBANK_ADAPT:
                # one shared visit per step per state (batch-invariant)
                sh["sbank_c"] = jnp.minimum(
                    sh["sbank_c"] + (sb_cnt > 0), 1024.0)
        else:
            sh["sbank_p"] = jnp.clip(sh["sbank_p"] + sb_acc,
                                     1e-4, 1 - 1e-4)
            if SBANK_ADAPT:
                sh["sbank_c"] = jnp.minimum(sh["sbank_c"] + sb_cnt,
                                            1024.0)
        p_nxt = jnp.einsum("bnos,ns->bno", ohn.astype(jnp.float32),
                           sh["sbank_p"])                    # (B, NS, 8)
        st13 = jnp.clip(_stretch_f(p_nxt) * 256.0 + 4096.0,
                        0, 8191).astype(jnp.uint32)
        packed = nxt8.astype(jnp.uint32) | (st13 << U8)
        vals_d = jnp.einsum("bok,bno->bnk", oh8i,
                            packed.astype(jnp.int32)).astype(jnp.uint32)
        new_srows = jnp.where(m8[:, None, :] > 0, vals_d, aux["srows"])
        sh["sbank"] = sh["sbank"].at[
            s_ar[None, :], aux["srowi"]].set(new_srows)

    # ---- match confidence: dense one-hot aggregation (no scatter)
    def _mc_update_int(key, exp_bit, alive_m, conf, lenb):
        hit_i = (exp_bit == target_i[:, None, :]).astype(jnp.int32)
        w_i = alive_m.astype(jnp.int32) * \
            on_path.astype(jnp.int32)[:, None, :]            # (B, NM, 256)
        n_al = jnp.sum(w_i, axis=2)                          # (B, NM)
        frac12 = (jnp.sum(hit_i * w_i, axis=2) << 12) \
            // jnp.maximum(n_al, 1)
        derr_i = (((frac12 - conf) * 123) >> 12) \
            * jnp.minimum(n_al, 1)                           # 0.03 * 4096
        oh_i = (jnp.arange(32)[None, None, :]
                == lenb[:, :, None]).astype(jnp.int32)
        d_mc_i = jnp.sum(oh_i * derr_i[:, :, None], axis=0)  # (NM, 32)
        if STAT_NORM:
            act = (derr_i != 0).astype(jnp.int32)
            n_mc = jnp.sum(oh_i * act[:, :, None], axis=0)
            d_mc_i = d_mc_i // jnp.maximum(n_mc, 1)
        sh[key] = jnp.clip(sh[key] + d_mc_i, 4, 4092)

    def _mc_update_f32(key, exp_bit, alive_m, conf, lenb):
        hit = (exp_bit.astype(jnp.float32) == target[:, None, :])
        af = alive_m.astype(jnp.float32)
        wsum = af * on_path[:, None, :]                      # (B, NM, 256)
        n_alive = jnp.sum(wsum, axis=2)                      # (B, NM)
        frac_hit = jnp.sum(hit * wsum, axis=2) / jnp.maximum(n_alive, 1.0)
        derr = (frac_hit - conf) * 0.03 * jnp.minimum(n_alive, 1.0)
        oh_len = (jnp.arange(32)[None, None, :]
                  == lenb[:, :, None]).astype(jnp.float32)
        d_mc = jnp.sum(oh_len * derr[:, :, None], axis=0)    # (NM, 32)
        if STAT_NORM:
            active = (jnp.abs(derr) > 0).astype(jnp.float32)
            n_mc = jnp.sum(oh_len * active[:, :, None], axis=0)
            d_mc = d_mc / jnp.maximum(n_mc, 1.0)
        sh[key] = jnp.clip(sh[key] + d_mc, 1e-3, 1 - 1e-3)

    _mc = _mc_update_int if PORT else _mc_update_f32
    _mc("match_conf", aux["exp_bit"], aux["alive"], aux["conf"],
        aux["lenb"])
    if MATCH2:
        _mc("match2_conf", aux["exp_bit2"], aux["alive2"], aux["conf2"],
            aux["lenb2"])
    if RUNX:
        _mc("runx_conf", aux["rx_bit"], aux["rx_alive"], aux["rx_conf"],
            aux["rx_b"])
        # (run-table refresh now happens in the row-header write above)
    if VMATCH:
        v_af = aux["valive"].astype(jnp.float32)             # (B,)
        vhit = (aux["vexp"] == byte).astype(jnp.float32)
        vderr = (vhit - aux["vconf"]) * 0.03 * v_af
        voh = (jnp.arange(32)[None, :]
               == aux["vlml"][:, None]).astype(jnp.float32)
        d_vm = jnp.sum(voh * vderr[:, None], axis=0)
        if STAT_NORM:
            n_vm = jnp.sum(voh * v_af[:, None], axis=0)
            d_vm = d_vm / jnp.maximum(n_vm, 1.0)
        sh["vmatch_conf"] = jnp.clip(
            sh["vmatch_conf"] + d_vm, 1e-3, 1 - 1e-3)
    if LMS:
        lhit = (aux["lms_pbyte"] == byte).astype(jnp.float32)
        lderr = (lhit - aux["lms_conf"]) * 0.02
        if LMS == 2:   # only media blocks teach the shared conf table
            lderr = lderr * aux["lms_med"].astype(jnp.float32)
        loh = (jnp.arange(16)[None, :]
               == aux["lms_errb"][:, None]).astype(jnp.float32)
        d_lm = jnp.sum(loh * lderr[:, None], axis=0)
        if STAT_NORM:
            d_lm = d_lm / jnp.maximum(jnp.sum(loh, axis=0), 1.0)
        sh["lms_conf"] = jnp.clip(
            sh["lms_conf"] + d_lm, 1e-3, 1 - 1e-3)

    # ---- mixers
    if PORT:
        return _update_mixers_int(cfg, sh, aux, target_i, on_path, n8,
                                  t8, B)
    B_f = 1.0 / B if MIX_NORM else 1.0       # dense-row mean vs sum
    err1 = (target[:, None, :] - aux["p1"]) * on_path[:, None, :]  # (B,8,256)
    dws = jnp.einsum("bmk,bnk->bmn", err1, aux["x"])         # (B, 8, NIN)
    if BANK_CH > 1:
        # per-channel LR (round-3 BANK_CH conditioning fix, VERDICT #3):
        # the appended confidence/maturity channels are collinear with
        # their primary stretches, so full-rate updates let them race
        # the primaries and destabilize the mix (rounds 1-2 measured
        # BANK_CH>1 as a loss).  Zero-init (round 2) + quarter-rate
        # learning on the auxiliary columns.
        n_pri = N_INPUTS - (BANK_CH - 1) * N_BANK
        ch_scale = jnp.concatenate([
            jnp.ones(n_pri, jnp.float32),
            jnp.full(N_INPUTS - n_pri, 0.25, jnp.float32)])
        dws = dws * ch_scale[None, None, :]
    sh["w1"] = sh["w1"].at[0].set(
        aux["w_const"] + lr * B_f * jnp.sum(dws[:, 0], axis=0))
    lvl_onehot = jnp.asarray(_LVL_ONEHOT)                    # (8, 256)
    dl = jnp.einsum("lk,bk,bnk->ln", lvl_onehot, err1[:, 1], aux["x"])
    sh["w1"] = jax.lax.dynamic_update_slice_in_dim(
        sh["w1"], aux["w_level"] + lr * B_f * dl, 1, axis=0)
    if MIX_NORM:
        # per-row mean over the blocks that hit each gate row this step
        cnt1 = jnp.zeros(_MIX1_TOTAL, jnp.float32
                         ).at[aux["dyn_idx"]].add(1.0)
        acc1 = jnp.zeros((_MIX1_TOTAL, N_INPUTS), jnp.float32
                         ).at[aux["dyn_idx"]].add(dws[:, 2:])
        sh["w1"] = sh["w1"] + lr * acc1 / jnp.maximum(cnt1[:, None], 1.0)
    elif MIX_BOOST:
        cnt_dyn = sh["w1_cnt"][aux["dyn_idx"]]               # (B, 9)
        boost = 1.0 + MIX_BOOST * MIX_BOOST_N / (cnt_dyn + MIX_BOOST_N)
        sh["w1"] = sh["w1"].at[aux["dyn_idx"]].add(
            (lr * boost)[:, :, None] * dws[:, 2:])
        sh["w1_cnt"] = sh["w1_cnt"].at[aux["dyn_idx"]].add(1.0)
    else:
        sh["w1"] = sh["w1"].at[aux["dyn_idx"]].add(lr * dws[:, 2:])
    sh["bias1"] = sh["bias1"] + lr * B_f * jnp.sum(err1, axis=0)

    err2 = (target[:, None, :] - aux["p2"]) * on_path[:, None, :]  # (B,L2,256)
    dw2 = jnp.einsum("lk,bk,bmk->lm", lvl_onehot, err2[:, 0], aux["st1"])
    sh["w2"] = sh["w2"] + lr * B_f * dw2
    dw2b = jnp.einsum("bk,bmk->bm", err2[:, 1], aux["st1"])
    dw2c = jnp.einsum("bk,bmk->bm", err2[:, 2], aux["st1"])
    if MIX_NORM:
        cb = jnp.zeros(256, jnp.float32).at[aux["b1"]].add(1.0)
        ab = jnp.zeros((256, M2IN), jnp.float32).at[aux["b1"]].add(dw2b)
        sh["w2b"] = sh["w2b"] + lr * ab / jnp.maximum(cb[:, None], 1.0)
        cc = jnp.zeros(64, jnp.float32).at[aux["clsg"]].add(1.0)
        ac = jnp.zeros((64, M2IN), jnp.float32).at[aux["clsg"]].add(dw2c)
        sh["w2c"] = sh["w2c"] + lr * ac / jnp.maximum(cc[:, None], 1.0)
    else:
        sh["w2b"] = sh["w2b"].at[aux["b1"]].add(lr * dw2b)
        sh["w2c"] = sh["w2c"].at[aux["clsg"]].add(lr * dw2c)
    if MIX2X:
        dw2x = jnp.einsum("bjk,bmk->bjm", err2[:, 3:], aux["st1"])
        if MIX_NORM:
            c2x = jnp.zeros(_MIX2_TOTAL, jnp.float32
                            ).at[aux["dyn2_idx"]].add(1.0)
            a2x = jnp.zeros((_MIX2_TOTAL, M2IN), jnp.float32
                            ).at[aux["dyn2_idx"]].add(dw2x)
            sh["w2x"] = sh["w2x"] + lr * a2x / jnp.maximum(
                c2x[:, None], 1.0)
        else:
            sh["w2x"] = sh["w2x"].at[aux["dyn2_idx"]].add(lr * dw2x)
    sh["bias2"] = sh["bias2"] + lr * B_f * jnp.sum(err2, axis=0)

    err3 = (target - aux["p_mix"]) * on_path                 # (B, 256)
    dw3 = jnp.einsum("lk,bk,bjk->lj", lvl_onehot, err3, aux["st2"])
    sh["w3"] = sh["w3"] + lr * B_f * dw3
    sh["bias3"] = sh["bias3"] + lr * B_f * jnp.sum(err3, axis=0)

    # ---- APMs: in-row one-hot updates, one row scatter
    oh8f = oh8i.astype(jnp.float32)                          # (B, 8, 256)
    p_tree_p = jnp.einsum("bok,bk->bo", oh8f, aux["p_tree"])  # (B, 8)
    errp = (t8 - p_tree_p) * APM_RATE
    j33 = jnp.arange(33)

    def apm_row_delta(tl, frac):
        tl_p = jnp.einsum("bok,bk->bo", oh8i, tl)            # (B, 8)
        f_p = jnp.einsum("bok,bk->bo", oh8f, frac)
        oh_l = (j33[None, None, :] == tl_p[:, :, None]).astype(jnp.float32)
        oh_r = (j33[None, None, :]
                == (tl_p + 1)[:, :, None]).astype(jnp.float32)
        return jnp.sum(oh_l * ((1 - f_p) * errp)[:, :, None]
                       + oh_r * (f_p * errp)[:, :, None], axis=1)

    d_apm = jnp.stack([apm_row_delta(t, f)
                       for t, f in zip(aux["tls"], aux["frs"])], axis=1)
    newapm = jnp.clip(aux["apm_rows"] + d_apm, 1e-4, 1 - 1e-4)
    sh["apm"] = sh["apm"].at[aux["apm_idx"]].set(newapm)

    # ---- final blend weights (match-state gated).  The update is
    # count-normalized per gate row: a summed .add scales with however
    # many of the B blocks share the row that step, and at B=256 with
    # stretch-domain inputs (|st| up to 12) one step could move a weight
    # by ~50 -- enough to destabilize the FINAL combiner, which has no
    # downstream stage to correct it.  Mean semantics keep the step size
    # batch-invariant; weights are clipped as a backstop.
    if W_APM_LEARN:
        err_f = (target - aux["p_tree"]) * on_path           # (B, 256)
        dwa = jnp.einsum("bk,bjk->bj", err_f, aux["st_in"])
        cnt = jnp.zeros(64, jnp.float32).at[aux["longest"]].add(1.0)
        acc = jnp.zeros((64, 1 + N_APM),
                        jnp.float32).at[aux["longest"]].add(dwa)
        sh["w_apm"] = jnp.clip(
            sh["w_apm"] + lr * acc / jnp.maximum(cnt[:, None], 1.0),
            -4.0, 4.0)
    if SSE2:
        # serial-stage internal mixer (per-gate mean, like w_apm)
        err_s = (target - aux["p_tree"]) * on_path           # (B, 256)
        ds = jnp.stack(
            [jnp.einsum("bk,bk->b", err_s, aux["sse2_stf"]),
             jnp.einsum("bk,bk->b", err_s, aux["sse2_stp"])], axis=1)
        cnt_s = jnp.zeros(256, jnp.float32).at[aux["sse2_g"]].add(1.0)
        acc_s = jnp.zeros((256, 2), jnp.float32).at[aux["sse2_g"]].add(ds)
        sh["w_sse"] = jnp.clip(
            sh["w_sse"] + lr * acc_s / jnp.maximum(cnt_s[:, None], 1.0),
            -4.0, 4.0)
    return sh


def _update_mixers_int(cfg, sh, aux, target_i, on_path, n8, t8, B):
    """Integer mixer/APM/final-blend updates (portable profile).

    Errors are p12 (target*4096 - p12), inputs st256; weight deltas land
    in 16-bit-fraction weights as (lr12 * ((err*x) >> 8)) >> 8, biases
    in 16-bit-fraction ln units as (lr12 * err12) >> 8.  Aggregations
    over the batch are integer scatter-adds (associative, so exact on
    every backend); MIX_NORM means are integer divisions.  Weights clip
    to +-8*65536 (the _idot overflow bound)."""
    lr12 = max(1, int(round(MIX_LR * 4096)))
    onp_i = on_path.astype(jnp.int32)
    lvl_i = jnp.asarray(_LVL_ONEHOT.astype(np.int32))        # (8, 256)
    x = aux["x"]

    err1 = (target_i[:, None, :] * 4096 - aux["p1"]) \
        * onp_i[:, None, :]                                  # (B, M1, 256)
    dws8 = jnp.einsum("bmk,bnk->bmn", err1, x) >> 8          # (B, M1, NIN)
    if BANK_CH > 1:
        # quarter-rate aux channels (see the f32 twin's note)
        n_pri = N_INPUTS - (BANK_CH - 1) * N_BANK
        dws8 = jnp.concatenate(
            [dws8[:, :, :n_pri], dws8[:, :, n_pri:] >> 2], axis=2)
    agg_c = jnp.sum(dws8[:, 0], axis=0)
    if MIX_NORM:
        agg_c = agg_c // B
    w1 = sh["w1"].at[0].set(
        jnp.clip(aux["w_const"] + ((lr12 * agg_c) >> 8),
                 -524288, 524288))
    dl3 = jnp.einsum("lk,bk,bnk->lbn", lvl_i, err1[:, 1], x)  # (8, B, NIN)
    dl = jnp.sum(dl3 >> 8, axis=1)
    if MIX_NORM:
        dl = dl // B
    w1 = jax.lax.dynamic_update_slice_in_dim(
        w1, jnp.clip(aux["w_level"] + ((lr12 * dl) >> 8),
                     -524288, 524288), 1, axis=0)
    cnt1 = jnp.zeros(_MIX1_TOTAL, jnp.int32).at[aux["dyn_idx"]].add(1)
    acc1 = jnp.zeros((_MIX1_TOTAL, N_INPUTS),
                     jnp.int32).at[aux["dyn_idx"]].add(dws8[:, 2:])
    if MIX_NORM:
        acc1 = acc1 // jnp.maximum(cnt1[:, None], 1)
    sh["w1"] = jnp.clip(w1 + ((lr12 * acc1) >> 8), -524288, 524288)
    db1 = jnp.sum(err1, axis=0)
    if MIX_NORM:
        db1 = db1 // B
    sh["bias1"] = sh["bias1"] + ((lr12 * db1) >> 8)

    err2 = (target_i[:, None, :] * 4096 - aux["p2"]) \
        * onp_i[:, None, :]                                  # (B, 3, 256)
    d23 = jnp.einsum("lk,bk,bmk->lbm", lvl_i, err2[:, 0], aux["st1"])
    dw2 = jnp.sum(d23 >> 8, axis=1)
    if MIX_NORM:
        dw2 = dw2 // B
    sh["w2"] = jnp.clip(sh["w2"] + ((lr12 * dw2) >> 8), -524288, 524288)
    dw2b = jnp.einsum("bk,bmk->bm", err2[:, 1], aux["st1"]) >> 8
    dw2c = jnp.einsum("bk,bmk->bm", err2[:, 2], aux["st1"]) >> 8
    cb = jnp.zeros(256, jnp.int32).at[aux["b1"]].add(1)
    ab = jnp.zeros((256, M2IN), jnp.int32).at[aux["b1"]].add(dw2b)
    cc = jnp.zeros(64, jnp.int32).at[aux["clsg"]].add(1)
    ac = jnp.zeros((64, M2IN), jnp.int32).at[aux["clsg"]].add(dw2c)
    if MIX_NORM:
        ab = ab // jnp.maximum(cb[:, None], 1)
        ac = ac // jnp.maximum(cc[:, None], 1)
    sh["w2b"] = jnp.clip(sh["w2b"] + ((lr12 * ab) >> 8), -524288, 524288)
    sh["w2c"] = jnp.clip(sh["w2c"] + ((lr12 * ac) >> 8), -524288, 524288)
    if MIX2X:
        dw2x = jnp.einsum("bjk,bmk->bjm", err2[:, 3:], aux["st1"]) >> 8
        c2x = jnp.zeros(_MIX2_TOTAL, jnp.int32).at[aux["dyn2_idx"]].add(1)
        a2x = jnp.zeros((_MIX2_TOTAL, M2IN), jnp.int32
                        ).at[aux["dyn2_idx"]].add(dw2x)
        if MIX_NORM:
            a2x = a2x // jnp.maximum(c2x[:, None], 1)
        sh["w2x"] = jnp.clip(sh["w2x"] + ((lr12 * a2x) >> 8),
                             -524288, 524288)
    db2 = jnp.sum(err2, axis=0)
    if MIX_NORM:
        db2 = db2 // B
    sh["bias2"] = sh["bias2"] + ((lr12 * db2) >> 8)

    err3 = (target_i * 4096 - aux["p_mix"]) * onp_i          # (B, 256)
    d33 = jnp.einsum("lk,bk,bjk->lbj", lvl_i, err3, aux["st2"])
    dw3 = jnp.sum(d33 >> 8, axis=1)
    if MIX_NORM:
        dw3 = dw3 // B
    sh["w3"] = jnp.clip(sh["w3"] + ((lr12 * dw3) >> 8), -524288, 524288)
    db3 = jnp.sum(err3, axis=0)
    if MIX_NORM:
        db3 = db3 // B
    sh["bias3"] = sh["bias3"] + ((lr12 * db3) >> 8)

    # ---- APMs: integer deltas, associative scatter-ADD + dense clip
    # (the table is small, so the dense clip is cheap)
    oh8m = (n8[:, :, None] == jnp.asarray(_NODE)[None, None, :]
            ).astype(jnp.int32)                              # (B, 8, 256)
    ptree12_p = jnp.einsum("bok,bk->bo", oh8m, aux["p_tree12"])  # (B, 8)
    t8i = t8.astype(jnp.int32)
    errp12 = (((t8i * 4096 - ptree12_p) * 82) >> 12)         # 0.02 * 4096
    j33 = jnp.arange(33)

    def apm_row_delta_i(tl, fr):
        tl_p = jnp.einsum("bok,bk->bo", oh8m, tl)            # (B, 8)
        f_p = jnp.einsum("bok,bk->bo", oh8m, fr)
        oh_l = (j33[None, None, :] == tl_p[:, :, None]).astype(jnp.int32)
        oh_r = (j33[None, None, :]
                == (tl_p + 1)[:, :, None]).astype(jnp.int32)
        return jnp.sum(
            oh_l * (((128 - f_p) * errp12) >> 7)[:, :, None]
            + oh_r * ((f_p * errp12) >> 7)[:, :, None], axis=1)

    d_apm = jnp.stack([apm_row_delta_i(t, f)
                       for t, f in zip(aux["tls"], aux["frs"])], axis=1)
    acc_apm = jnp.zeros_like(sh["apm"]).at[aux["apm_idx"]].add(d_apm)
    sh["apm"] = jnp.clip(sh["apm"] + acc_apm, 1, 4095)

    if W_APM_LEARN:
        err_f = (target_i * 4096 - aux["p_tree12"]) * onp_i  # (B, 256)
        dwa = jnp.einsum("bk,bjk->bj", err_f, aux["st_in"]) >> 8
        cnt = jnp.zeros(64, jnp.int32).at[aux["longest"]].add(1)
        acc = jnp.zeros((64, 1 + N_APM),
                        jnp.int32).at[aux["longest"]].add(dwa)
        sh["w_apm"] = jnp.clip(
            sh["w_apm"] + ((lr12 * (acc // jnp.maximum(cnt[:, None], 1)))
                           >> 8),
            -262144, 262144)
    if SSE2:
        err_s = (target_i * 4096 - aux["p_tree12"]) * onp_i  # (B, 256)
        ds = jnp.stack(
            [jnp.einsum("bk,bk->b", err_s, aux["sse2_stf"]) >> 8,
             jnp.einsum("bk,bk->b", err_s, aux["sse2_stp"]) >> 8], axis=1)
        cnt_s = jnp.zeros(256, jnp.int32).at[aux["sse2_g"]].add(1)
        acc_s = jnp.zeros((256, 2), jnp.int32).at[aux["sse2_g"]].add(ds)
        sh["w_sse"] = jnp.clip(
            sh["w_sse"] + ((lr12 * (acc_s
                                    // jnp.maximum(cnt_s[:, None], 1)))
                           >> 8),
            -262144, 262144)
    return sh


def _aux_writes_b(cfg, sh, pb, byte, t, ind_key_prev, ind_prev_val):
    """Match-cursor repositioning + match/indirect table writes, merged
    into ONE scatter on the shared aux arena
    (cf. src/models/match.cpp:48-60, src/contexts/indirect-hash.cpp)."""
    mmask = jnp.uint32((1 << cfg.mbits) - 1)
    cs = pb["ctx"]  # already advanced to include byte
    B = byte.shape[0]
    bar = jnp.arange(B)
    # match keys: byte orders, or word-keyed contexts for order codes
    # >= 100 (the reference's word-context match models,
    # src/predictor.cpp:122-131 AddWord matches) -- 100 = (last word,
    # current prefix), 101 = (two words, current prefix)
    def _mkey(o):
        if o == 100:
            return mix32(cs["last_word"], cs["word"] + jnp.uint32(0x9E37))
        if o == 101:
            return mix32(mix32(cs["last_word2"], cs["last_word"]),
                         cs["word"] + jnp.uint32(0x85EB))
        return cs["ohash"][:, o]

    hs = jnp.stack([_mkey(o) for o in MATCH_ORDERS], axis=1)
    h = (mix32(hs, jnp.uint32(0x2545F491)) & mmask).astype(jnp.int32)
    mstride = 1 + MATCH2            # MATCH2: 2-deep recency stack per key
    moff = jnp.arange(N_MATCH, dtype=jnp.int32) \
        * (mstride << cfg.mbits)
    midx = moff[None, :] + mstride * h                       # (B, NM)
    cand = sh["aux_tbl"][midx].astype(jnp.int32)             # (B, NM)
    ins = jnp.broadcast_to(
        ((bar[:, None] << POS_BITS) | (t + 1)).astype(jnp.uint32),
        (B, N_MATCH))

    ind_base = mstride * N_MATCH * (1 << cfg.mbits)
    ind_off = ind_base + jnp.arange(N_IND, dtype=jnp.int32) * (1 << cfg.ibits)
    newv = mix32(ind_prev_val, byte[:, None].astype(jnp.uint32))  # (B, NI)
    if MATCH2:
        cand2 = sh["aux_tbl"][midx + 1].astype(jnp.int32)    # (B, NM)
        # recency shift: slot1 takes the old latest, slot0 the new pos
        widx = jnp.concatenate(
            [midx, midx + 1, ind_off[None, :] + ind_key_prev], axis=1)
        wval = jnp.concatenate([ins, cand.astype(jnp.uint32), newv],
                               axis=1)
    else:
        widx = jnp.concatenate(
            [midx, ind_off[None, :] + ind_key_prev], axis=1)  # (B, NM+NI)
        wval = jnp.concatenate([ins, newv], axis=1)
    if PORT:
        n_aux = sh["aux_tbl"].shape[0]
        win_a = _claim_win(n_aux, widx, B)
        widx_w = jnp.where(win_a, widx, n_aux)
        sh["aux_tbl"] = sh["aux_tbl"].at[widx_w].set(wval, mode="drop")
    else:
        sh["aux_tbl"] = sh["aux_tbl"].at[widx].set(wval)

    pred = pb["hist"][pb["mp_blk"],
                      jnp.clip(pb["mp_pos"], 0, cfg.block_size - 1)
                      ].astype(jnp.int32)
    ok = (pb["match_len"] > 0) & (pred == byte[:, None])
    cand_blk = cand >> POS_BITS
    cand_pos = cand & ((1 << POS_BITS) - 1)
    pb["mp_blk"] = jnp.where(ok, pb["mp_blk"], cand_blk)
    pb["mp_pos"] = jnp.where(ok, pb["mp_pos"] + 1, cand_pos)
    pb["match_len"] = jnp.where(
        ok, jnp.minimum(pb["match_len"] + 1, 65535),
        jnp.where(cand_pos > 0, 1, 0))
    if MATCH2:
        pred2 = pb["hist"][pb["mp2_blk"],
                           jnp.clip(pb["mp2_pos"], 0, cfg.block_size - 1)
                           ].astype(jnp.int32)
        ok2 = (pb["match2_len"] > 0) & (pred2 == byte[:, None])
        c2_blk = cand2 >> POS_BITS
        c2_pos = cand2 & ((1 << POS_BITS) - 1)
        pb["mp2_blk"] = jnp.where(ok2, pb["mp2_blk"], c2_blk)
        pb["mp2_pos"] = jnp.where(ok2, pb["mp2_pos"] + 1, c2_pos)
        pb["match2_len"] = jnp.where(
            ok2, jnp.minimum(pb["match2_len"] + 1, 65535),
            jnp.where(c2_pos > 0, 1, 0))
    return sh, pb


# ---------------------------------------------------------------- byte step


def make_byte_step(cfg: EngineConfig):
    imask = jnp.uint32((1 << cfg.ibits) - 1)

    def ind_keys(cs):
        """(B, N_IND) int32 keys of the double-indirect variants
        (cf. the reference's 11 Indirect-over-IndirectHash models,
        src/predictor.cpp:166-178; first 4 are the round-1 set)."""
        ks = [cs["last4"] & imask,
              cs["last4"] & jnp.uint32(0xFF),
              cs["ohash"][:, 3] & imask,
              cs["word"] & imask,
              cs["ohash"][:, 2] & imask,
              cs["ohash"][:, 4] & imask,
              cs["clsreg"] & imask,
              ((cs["last4"] >> U8) & jnp.uint32(0xFFFF)) & imask]
        assert N_IND <= len(ks), "extend ind_keys for larger CMIX_N_IND"
        return jnp.stack(ks[:N_IND], axis=1).astype(jnp.int32)

    def byte_step(sh, pb, cd, comp, inp_byte_b, t, mode):
        """One byte for every block. inp_byte_b: (B,) uint8; t scalar."""
        B = inp_byte_b.shape[0]
        ind_base = (1 + MATCH2) * N_MATCH * (1 << cfg.mbits)
        ind_off = ind_base + jnp.arange(
            N_IND, dtype=jnp.int32) * (1 << cfg.ibits)       # (NI,)
        ind_key_prev = ind_keys(pb["ctx"])                   # (B, NI)
        ind_prev_val = sh["aux_tbl"][ind_off[None, :] + ind_key_prev]

        p_tree, aux = _predict_tree_b(cfg, sh, pb, t)
        if PORT:
            p16_tree = p_tree                    # already int p16, clipped
        else:
            p16_tree = jnp.clip((p_tree * 65536.0).astype(jnp.int32),
                                64, 65472)
        vf = sh["vocab_force"][None, :]
        p16_tree = jnp.where(vf == 1, 64,
                             jnp.where(vf == 2, 65472, p16_tree)
                             ).astype(jnp.uint32)

        # ---- the only sequential part: 8 coder steps walking the tree
        byte_acc = jnp.ones(B, jnp.int32)
        emits = []
        c32 = jnp.zeros(B, jnp.uint32)
        for k in range(8):
            # one-hot select (single nonzero, exact) -- dynamic gathers
            # at (B,) shape still pay per-element scalar-core cost
            p16 = jnp.sum(jnp.where(
                jnp.asarray(_NODE)[None, :] == byte_acc[:, None],
                p16_tree, jnp.uint32(0)), axis=1)
            enc_bit = ((inp_byte_b.astype(jnp.int32) >> (7 - k)) & 1)
            cd, bit, e32, kk = _coder_bit_b(cd, comp, enc_bit, p16, mode)
            emits.append(e32)
            c32 = c32 | (kk.astype(jnp.uint32) << jnp.uint32(4 * k))
            byte_acc = byte_acc * 2 + bit
        ys = tuple(emits) + (c32,)
        byte = byte_acc & 255                                # (B,)

        sh = _update_tree_b(cfg, sh, pb, aux, byte, t)
        if LMS:
            yf = (byte.astype(jnp.float32) - 128.0) * (1.0 / 128.0)
            lerr = yf - aux["lms_pred"]                      # (B,)
            pb["lms_w"] = pb["lms_w"] + LMS_MU * lerr[:, None] \
                * aux["lms_xs"]
            pb["lms_err"] = 0.98 * pb["lms_err"] \
                + 0.02 * jnp.abs(lerr)

        pb["hist"] = jax.lax.dynamic_update_slice(
            pb["hist"], byte.astype(jnp.uint8)[:, None],
            (0, t % cfg.block_size))
        if PPM_DEEP:
            # rolling window hashes: h_t = sum b_{t-i} * A^i, i < W
            # (mod 2^32); the outgoing byte comes off the history ring
            # (pre-window reads are ring zeros -- deterministic)
            A = 0x01000193
            bu = byte.astype(jnp.uint32)
            for key, w in (("h32", 32), ("h48", 48)):
                old = jax.lax.dynamic_index_in_dim(
                    pb["hist"], jnp.mod(t - w, cfg.block_size), axis=1,
                    keepdims=False).astype(jnp.uint32)       # (B,)
                pb[key] = (pb[key] - old * jnp.uint32(
                    pow(A, w - 1, 1 << 32))) * jnp.uint32(A) + bu

        if cfg.dmc_nodes:
            pb.update(dmc.plan_step(
                {k: pb[k] for k in dmc.DMC_KEYS},
                aux["dmc_walk"], byte.astype(jnp.int32)))

        # ---- record-length voting: two consecutive equal gaps of the
        # same byte value nominate a record length; agreement with the
        # current estimate grows confidence, disagreement erodes it
        bar = jnp.arange(B)
        lp = pb["rec_lastpos"][bar, byte]                    # (B,)
        stv = pb["rec_stride"][bar, byte]
        gap = t - lp
        cand = (lp >= 0) & (gap >= 2) & (gap < 4096) & (gap == stv)
        same = cand & (gap == pb["rec_len"])
        rcnt = jnp.where(same, jnp.minimum(pb["rec_cnt"] + 1, 63),
                         jnp.where(cand, pb["rec_cnt"] - 1, pb["rec_cnt"]))
        switch = cand & ~same & (rcnt < 0)
        pb["rec_len"] = jnp.where(switch, gap, pb["rec_len"])
        pb["rec_cnt"] = jnp.where(switch, 0, rcnt)
        lane256 = jnp.arange(256)[None, :] == byte[:, None]
        pb["rec_stride"] = jnp.where(lane256, gap[:, None],
                                     pb["rec_stride"])
        pb["rec_lastpos"] = jnp.where(lane256, t, pb["rec_lastpos"])

        pb["ctx"] = update_ctx_state_batched(
            pb["ctx"], byte.astype(jnp.uint32),
            wrtw_tab=((sh["wrtw_word"], sh["wrtw_stem"])
                      if WRTW >= 2 else None))
        pb["x86"] = x86_update(pb["x86"], byte.astype(jnp.uint32))
        sh, pb = _aux_writes_b(cfg, sh, pb, byte, t, ind_key_prev,
                               ind_prev_val)
        ind_key_new = ind_keys(pb["ctx"])                    # (B, NI)
        pb["ind_val"] = sh["aux_tbl"][ind_off[None, :] + ind_key_new]
        if cfg.lstm_hidden:
            sh["lstm"], pb["lstm"] = (
                ilstm_shared_byte_update if PORT
                else lstm_shared_byte_update)(
                _lstm_cfg(cfg),
                sh["lstm"], pb["lstm"], byte)
        return sh, pb, cd, ys

    return byte_step


# ------------------------------------------------------------ segment scan


def make_segment_fn(cfg: EngineConfig):
    """Unjitted batched segment scan:
    (sh, pb, cd, t0, inp_T, comp, mode) -> (sh, pb, cd, e32, c32).

    inp_T is time-major (S, B); t0 is the starting byte index (scalar).
    """
    step = make_byte_step(cfg)

    def segment(sh, pb, cd, t0, inp_T, comp, mode):
        def body(carry, byte_b):
            sh, pb, cd, t = carry
            sh, pb, cd, ys = step(sh, pb, cd, comp, byte_b, t, mode)
            return (sh, pb, cd, t + 1), ys

        (sh, pb, cd, _), ys = jax.lax.scan(
            body, (sh, pb, cd, t0), inp_T, length=cfg.seg_size)
        e32 = jnp.stack(ys[:8], axis=-1)     # (S, B, 8)
        c32 = ys[8]                          # (S, B)
        return sh, pb, cd, e32, c32

    return segment


def make_seg_compactor(cfg: EngineConfig):
    """Unjitted ``(e32, c32) -> (seg_out, seg_len)``: compacts one
    segment's packed emission words into per-block contiguous bytes."""

    def compact(e32, c32):
        s = cfg.seg_size
        b = e32.shape[1]
        kidx = jnp.arange(8, dtype=jnp.uint32)
        cnts = ((c32[:, :, None] >> (4 * kidx)[None, None, :])
                & jnp.uint32(0xF)).astype(jnp.int32)          # (S, B, 8)
        cnts_t = jnp.transpose(cnts, (1, 0, 2)).reshape(b, s * 8)
        offs = jnp.cumsum(cnts_t, axis=1) - cnts_t
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
    """Host-looped segmented transcoder:
    ``transcode(sh, pb, inp, comp, mode) -> (hist, out, out_len)``.

    (The r3 'backend cliff' -- FAILED_PRECONDITION at N_BANK >= 65 with
    rows >= 2^14 -- was bisected in r4 to the >=65-way leading-axis bank
    gather/scatter itself and is closed by the <=64-bank table chunking;
    see BANK_SPLIT / _bank_chunks above.)

    encode: inp (B, N) uint8 padded blocks, comp zeros -> compressed.
    decode: comp (B, comp_size) streams, inp zeros -> hist are the bytes.
    sh is the (possibly pretrained) shared model state; pb the batched
    per-block state.
    """
    seg_jit = jax.jit(make_segment_fn(cfg), donate_argnums=(0, 1, 2))
    # no donation for the compactor: its outputs (uint8 seg_cap bytes)
    # can never reuse the uint32 emission buffers, so donating only
    # produced "donated buffers were not usable" warnings
    comp_jit = jax.jit(make_seg_compactor(cfg))

    def transcode(sh, pb, inp, comp, mode, meter=None, progress=None):
        """mode: scalar or per-lane (B,) vector -- a decode group mirrors
        its encode group exactly, with raw-stored/padding lanes re-fed in
        encode mode so the shared model state evolves identically.
        meter: utils.profiling.Meter; progress: callable(bytes_done)."""
        import contextlib
        ph = meter.phase if meter else (lambda _: contextlib.nullcontext())
        b = int(inp.shape[0])
        cd = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim),
            init_coder(cfg))
        comp = jnp.asarray(comp)
        mode = jnp.broadcast_to(jnp.asarray(mode, jnp.int32), (b,))
        xc = (comp[:, 0].astype(jnp.uint32) << jnp.uint32(24)) \
            | (comp[:, 1].astype(jnp.uint32) << jnp.uint32(16)) \
            | (comp[:, 2].astype(jnp.uint32) << U8) \
            | comp[:, 3].astype(jnp.uint32)
        cd["xc"] = jnp.where(mode == MODE_DECODE, xc, cd["xc"])
        cd["rptr"] = jnp.where(mode == MODE_DECODE, 4, 0).astype(jnp.int32)
        inp_T = jnp.transpose(jnp.asarray(inp))
        n_segs = cfg.block_size // cfg.seg_size
        parts = [[] for _ in range(b)]
        # one-segment-deep pipeline: dispatch segment si+1 before
        # materializing segment si's outputs, so the device never idles
        # on the host-side compaction copy (JAX dispatch is async; it is
        # the np.asarray that blocks)
        pending = None

        def drain(pend):
            seg_out, seg_len = np.asarray(pend[0]), np.asarray(pend[1])
            with ph("host"):
                for i in range(b):
                    parts[i].append(seg_out[i, :seg_len[i]].tobytes())

        for si in range(n_segs):
            seg = inp_T[si * cfg.seg_size:(si + 1) * cfg.seg_size]
            with ph("compile" if si == 0 and meter and not meter.segments
                    else "device"):
                sh, pb, cd, e32, c32 = seg_jit(
                    sh, pb, cd, jnp.int32(si * cfg.seg_size), seg, comp,
                    mode)
                seg_out, seg_len = comp_jit(e32, c32)
            if pending is not None:
                drain(pending)
            pending = (seg_out, seg_len)
            if meter:
                meter.add_segment(b * cfg.seg_size)
            if progress:
                progress((si + 1) * cfg.seg_size * b)
        if pending is not None:
            with ph("device"):
                drain(pending)
        x1 = np.asarray(cd["x1"])
        hist = np.asarray(pb["hist"])
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


def make_pretrainer(cfg: EngineConfig):
    """``(sh, data) -> sh``: replays a training stream (B=1) through the
    full model-update path; positional state is discarded afterwards
    (cf. Pretrain, src/predictor.cpp:471-487 + runner.cpp:206).

    The pretrain program runs at a FIXED internal segment length
    (independent of cfg.seg_size): the stream is padded to a multiple of
    the segment, so a seg_size-dependent length would bake the caller's
    host-chunking choice into the pretrained state -- the round-2 scale
    desync.  With the fixed length the pretrained state depends only on
    (format, dictionary, table shapes)."""
    import dataclasses
    pcfg = dataclasses.replace(cfg, seg_size=PRETRAIN_SEG)
    seg_jit = jax.jit(make_segment_fn(pcfg), donate_argnums=(0, 1, 2))

    def pretrain(sh, data):
        data = np.asarray(data)
        s = pcfg.seg_size
        n = ((len(data) + s - 1) // s) * s
        pad = np.full(n, 32, dtype=np.uint8)
        pad[:len(data)] = data
        pb = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (1,) + (1,) * x.ndim),
            init_perblock(pcfg))
        cd = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (1,) + (1,) * x.ndim),
            init_coder(cfg))
        comp = jnp.zeros((1, 8), dtype=jnp.uint8)
        mode = jnp.full((1,), MODE_ENCODE, jnp.int32)
        for si in range(n // s):
            seg = jnp.asarray(pad[si * s:(si + 1) * s][:, None])
            # t wraps so history writes stay in range
            t0 = jnp.int32((si * s) % pcfg.block_size)
            sh, pb, cd, _, _ = seg_jit(sh, pb, cd, t0, seg, comp, mode)
        # match entries point into the discarded pretrain history: zero
        # the match region of the aux arena (indirect-hash region stays)
        sh = dict(sh)
        mlen = (1 + MATCH2) * N_MATCH * (1 << pcfg.mbits)
        sh["aux_tbl"] = sh["aux_tbl"].at[:mlen].set(0)
        return sh

    return pretrain
