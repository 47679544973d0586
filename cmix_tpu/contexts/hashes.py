"""Per-byte context state: rolling hashes, words, byte classes, brackets.

Capability parity with the reference's context layer (src/contexts/*,
src/context-manager.cpp): order-N context hashes (context-hash.cpp:9-11),
word contexts (context-manager.cpp:29-48), sparse/skip contexts
(sparse.cpp:5-22), interval byte-class contexts (interval.cpp:17-19),
indirect history-of-hashes contexts (indirect-hash.cpp:13-17), and line/
bracket structure -- redesigned as one vectorized per-byte update over a
small uint32 state vector (no object registry; contexts are positions in a
fixed array, which is what lets the whole thing live inside a lax.scan).
"""

import numpy as np
import jax.numpy as jnp

MAX_ORDER = 24          # rolling hashes maintained for orders 1..MAX_ORDER
WRTW = 0                # WRT codeword-aware word tracking; set by
#                         engine._derive from the format gate.
# INVARIANT: WRTW is baked into compiled functions at trace time, not
# threaded as an operand.  Every caller that jits update_ctx_state_batched
# (directly or via the engine) MUST recompile after a gate flip -- the
# runner's _TRANSCODER_CACHE is cleared on update_gates/apply_gates for
# exactly this reason; test-local jax.jit closures must not be reused
# across _derive calls.
PHI32 = np.uint32(0x9E3779B1)
PRIME2 = np.uint32(0x85EBCA77)

# WRTW=2 (codeword -> letter-identity decode): per-word-id tables of
# the EXACT values the letter machinery below would produce for the
# word's lowercase spelling -- word hash (the mix32 chain over its
# letters) and stem hash (the chain snapshot before the matched English
# suffix).  With them, a codeword on a WRT-transformed stream latches
# the SAME last_word/last_stem identities as the raw spelled-out word
# would, so word n-gram / stem contexts unify across transformed and
# untransformed text, and morphological families ("compression" /
# "compressed") share stems exactly as they do in plain text -- the
# full in-model dictionary decode of fxcm (src/models/fxcmv1.cpp:
# 353-438,3780-3795), held as data instead of re-run per byte.
# Registered by the runner (build_wrtw_tables) before state init; the
# tables flow as ARRAY OPERANDS via shared state, so no recompile is
# needed when the dictionary changes -- only WRTW itself is trace-baked.
WRTW_TAB_N = 32768
WRTW_TABLES = None


def build_wrtw_tables(words):
    """words: iterable of lowercase spellings ordered by codeword id.
    -> (word_hash, stem_hash) uint32 arrays of length WRTW_TAB_N
    (id 0 .. len-1; padding rows are 0 = fall back to the byte hash)."""
    wt = np.zeros(WRTW_TAB_N, np.uint32)
    st = np.zeros(WRTW_TAB_N, np.uint32)

    def _mix(h, x):
        h = np.uint32((int(h) ^ x) * int(PHI32) & 0xFFFFFFFF)
        return np.uint32(int(h) ^ (int(h) >> 15))

    for i, w in enumerate(words):
        if i >= WRTW_TAB_N:
            break
        h = np.uint32(0)
        hist = [h]                      # hist[k] = hash of first k letters
        for ch in w:
            h = _mix(h, ord(ch))
            hist.append(h)
        n = len(w)
        # suffix rules mirror update_ctx_state_batched's m3/m2/m1 (the
        # wl cap at 63 is irrelevant for dictionary-length words)
        if n >= 5 and w[-3:] in ("ing", "ion"):
            s = hist[n - 3]
        elif n >= 4 and w[-2:] in ("ed", "er", "es", "ly", "al"):
            s = hist[n - 2]
        elif n >= 3 and w[-1] == "s" and w[-2] != "s":
            s = hist[n - 1]
        else:
            s = h
        wt[i], st[i] = h, s
    return wt, st


def byte_class_map():
    """256 -> 16 byte classes (format constant).

    Plays the role of the reference's hand-written interval maps
    (src/predictor.cpp:262-300): groups bytes by syntactic role so class
    n-grams generalize across literals.
    """
    cls = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        c = chr(b) if b < 128 else None
        if b in (9, 11, 12):
            v = 1
        elif b in (10, 13):
            v = 2
        elif b == 32:
            v = 3
        elif c is not None and c.isdigit():
            v = 4
        elif c is not None and "a" <= c <= "z":
            v = 5 if c in "aeiou" else 6
        elif c is not None and "A" <= c <= "Z":
            v = 7
        elif c is not None and c in ".,;:!?":
            v = 8
        elif c is not None and c in "'\"`":
            v = 9
        elif c is not None and c in "()[]{}<>":
            v = 10
        elif c is not None and c in "+-*/=%&|^~":
            v = 11
        elif c is not None and c in "_#@$\\":
            v = 12
        elif b < 32:
            v = 0
        elif b < 128:
            v = 13
        elif b < 192:
            v = 14
        else:
            v = 15
        cls[b] = v
    return cls


BYTE_CLASS = byte_class_map()

# Lowercase map (format constant): A-Z -> a-z, else identity.
_LOWER = np.arange(256, dtype=np.uint32)
_LOWER[65:91] += 32
LOWER_MAP = _LOWER

_IS_LETTER = np.zeros(256, dtype=np.uint32)
_IS_LETTER[65:91] = 1
_IS_LETTER[97:123] = 1
IS_LETTER = _IS_LETTER

# Bracket/quote maps (parity: src/contexts/bracket-context.cpp:11-35 and
# the fxcm bracket/quote streams, src/models/fxcmv1.cpp:1932-1997).
# OPEN[b] = bracket id opened by byte b (1..7), CLOSE[b] = id it closes.
# Quotes toggle: they both open and close their own id.
_BR_OPEN = np.zeros(256, dtype=np.uint32)
_BR_CLOSE = np.zeros(256, dtype=np.uint32)
for _o, _c, _i in ((40, 41, 1), (91, 93, 2), (123, 125, 3), (60, 62, 4)):
    _BR_OPEN[_o] = _i
    _BR_CLOSE[_c] = _i
for _q, _i in ((34, 5), (39, 6), (96, 7)):
    _BR_OPEN[_q] = _i
    _BR_CLOSE[_q] = _i
BR_OPEN, BR_CLOSE = _BR_OPEN, _BR_CLOSE
BRK_DEPTH = 16          # bracket stack depth (older entries drop off)
LINE_W = 64             # line-grid buffer width (columns tracked)
CELL_W = 32             # table-cell buffer width (cells tracked per line)


# Coarse 2-bit byte classes for the long class register (the fxcm
# wrt_2b stream idea, src/models/fxcmv1.cpp:51-88): letter/digit/space/other.
_CLS2 = np.full(256, 3, dtype=np.uint32)
_CLS2[65:91] = 0
_CLS2[97:123] = 0
_CLS2[48:58] = 1
for _b in (9, 10, 13, 32):
    _CLS2[_b] = 2
CLS2 = _CLS2

_IS_SENT_END = np.zeros(256, dtype=np.uint32)
for _b in (46, 33, 63):          # . ! ?
    _IS_SENT_END[_b] = 1
IS_SENT_END = _IS_SENT_END


def init_ctx_state():
    """Context scalars/vectors (per block, unbatched)."""
    return {
        "ohash": jnp.zeros(MAX_ORDER + 1, dtype=jnp.uint32),  # [o] = hash of last o bytes
        "last4": jnp.zeros((), dtype=jnp.uint32),             # packed last 4 bytes
        "last8": jnp.zeros((), dtype=jnp.uint32),             # packed bytes t-5..t-8
        "tag": jnp.zeros((), dtype=jnp.uint32),               # enclosing tag-name hash
        "tagacc": jnp.zeros((), dtype=jnp.uint32),            # in-tag accumulator
        "tagdepth": jnp.zeros((), dtype=jnp.uint32),          # open-tag nesting (capped)
        "word": jnp.zeros((), dtype=jnp.uint32),              # hash of current word prefix
        "last_word": jnp.zeros((), dtype=jnp.uint32),         # hash of last completed word
        "last_word2": jnp.zeros((), dtype=jnp.uint32),        # the word before that
        "word_pfx": jnp.zeros((), dtype=jnp.uint32),          # hash of first <=4 letters (stem)
        "wordlen": jnp.zeros((), dtype=jnp.uint32),           # letters in current word (capped)
        # suffix-strip stemming (capability class of the reference's
        # Porter2 stemmers, src/models/fxcmv1.cpp:2662-3209 and
        # src/models/paq8.cpp:1530-2998, reshaped for a rolling hash):
        # wq1..wq3 snapshot the word hash 1..3 letters ago, wtail holds
        # the last 4 lowercased letters, so a matched suffix selects
        # the pre-suffix hash as the stem -- no backtracking needed
        "wq1": jnp.zeros((), dtype=jnp.uint32),
        "wq2": jnp.zeros((), dtype=jnp.uint32),
        "wq3": jnp.zeros((), dtype=jnp.uint32),
        "wtail": jnp.zeros((), dtype=jnp.uint32),
        "last_stem": jnp.zeros((), dtype=jnp.uint32),
        "clsreg": jnp.zeros((), dtype=jnp.uint32),            # byte-class 4-bit register
        "cls2reg": jnp.zeros((), dtype=jnp.uint32),           # coarse 2-bit class register (16 B)
        "sentpos": jnp.zeros((), dtype=jnp.uint32),           # bytes since sentence end (capped)
        "linepos": jnp.zeros((), dtype=jnp.uint32),           # bytes since last newline (capped)
        # bracket stack: entries pack (bracket id << 24) | open position
        "brk_stack": jnp.zeros(BRK_DEPTH, dtype=jnp.uint32),
        "brk_depth": jnp.zeros((), dtype=jnp.uint32),
        "bytecnt": jnp.zeros((), dtype=jnp.uint32),
        # line grid: first LINE_W bytes of the current and previous line
        # (vertical column contexts for line-structured data -- the
        # capability class of fxcm's wiki table/column streams,
        # src/models/fxcmv1.cpp:2007-2147, without the wiki-markup
        # specialization)
        "lbuf": jnp.zeros(LINE_W, dtype=jnp.uint32),
        "plbuf": jnp.full(LINE_W, 0xFFFF, dtype=jnp.uint32),
        "plen": jnp.zeros((), dtype=jnp.uint32),
        # wiki/table cell streams (capability: fxcm's wiki table/column
        # streams, src/models/fxcmv1.cpp:2007-2147, generalized to any
        # '|'/TAB-delimited rows): cell index in the line, bytes since
        # the cell opened, first byte of each cell in this/previous line
        # (the column stream), and list/indent structure at line start
        "cellidx": jnp.zeros((), dtype=jnp.uint32),
        "cellpos": jnp.zeros((), dtype=jnp.uint32),
        "cellbuf": jnp.full(CELL_W, 0xFFFF, dtype=jnp.uint32),
        "pcellbuf": jnp.full(CELL_W, 0xFFFF, dtype=jnp.uint32),
        "listdepth": jnp.zeros((), dtype=jnp.uint32),
        "listchar": jnp.zeros((), dtype=jnp.uint32),
        "lsflag": jnp.ones((), dtype=jnp.uint32),
        # length of the current line's prefix that matches the previous
        # line (vertical match model state; stops growing at the first
        # mismatch, resets on newline)
        "lml": jnp.zeros((), dtype=jnp.uint32),
        # WRT codeword tracker (WRTW gate): rolling codeword-byte hash
        # and remaining continuation bytes of the current codeword
        "cwacc": jnp.zeros((), dtype=jnp.uint32),
        "cwrem": jnp.zeros((), dtype=jnp.uint32),
        # raw codeword id under construction (WRTW=2 table lookups)
        "cwid": jnp.zeros((), dtype=jnp.uint32),
    }


def line_expected(cs):
    """(expected, alive): the previous-line byte predicted at the current
    column of each block -- plbuf[linepos] inside the line, LF at its end,
    sentinel 0x1FF past it -- and whether the whole prefix so far matched."""
    lane = jnp.arange(LINE_W, dtype=jnp.uint32)
    cpos = jnp.minimum(cs["linepos"], jnp.uint32(LINE_W - 1))
    above = jnp.sum(cs["plbuf"] * (lane[None, :] == cpos[:, None]), axis=1)
    exp = jnp.where(
        (cs["linepos"] < cs["plen"]) & (cs["linepos"] < LINE_W),
        above,
        jnp.where(cs["linepos"] == cs["plen"], jnp.uint32(10),
                  jnp.uint32(0x1FF)))
    alive = (cs["lml"] == cs["linepos"]) & (exp < 256) & (cs["plen"] > 0)
    return exp, alive


def mix32(h, x):
    """uint32 hash combine (format constant)."""
    h = (h ^ x) * PHI32
    return h ^ (h >> jnp.uint32(15))


def _brk_step(stack, depth, pos, b):
    """One bracket-stack transition (works unbatched or batched: stack
    (..., D), depth/pos/b (...,))."""
    open_id = jnp.asarray(BR_OPEN)[b]
    close_id = jnp.asarray(BR_CLOSE)[b]
    idx = jnp.clip(depth.astype(jnp.int32) - 1, 0, BRK_DEPTH - 1)
    top = jnp.take_along_axis(
        stack.reshape((-1, BRK_DEPTH)), idx.reshape((-1, 1)),
        axis=1).reshape(depth.shape)
    top_id = jnp.where(depth > 0, top >> jnp.uint32(24), jnp.uint32(0))
    do_pop = (close_id > 0) & (top_id == close_id)
    do_push = (open_id > 0) & ~do_pop
    entry = (open_id << jnp.uint32(24)) | (pos & jnp.uint32(0xFFFFFF))
    pidx = jnp.minimum(depth, jnp.uint32(BRK_DEPTH - 1))
    lane = jnp.arange(BRK_DEPTH, dtype=jnp.uint32)
    sel = do_push[..., None] & (lane == pidx[..., None])
    stack = jnp.where(sel, entry[..., None], stack)
    depth = jnp.where(do_pop, jnp.maximum(depth, 1) - 1,
                      jnp.where(do_push,
                                jnp.minimum(depth + 1, BRK_DEPTH), depth))
    return stack, depth


def bracket_ctx(cs):
    """Batched bracket context value: top bracket id * 64 + capped
    distance since it opened (parity: bracket-context.cpp:31-34
    ``limit*(bracket+1)+distance``)."""
    depth = cs["brk_depth"]
    idx = jnp.clip(depth.astype(jnp.int32) - 1, 0, BRK_DEPTH - 1)
    top = jnp.take_along_axis(cs["brk_stack"], idx[:, None], axis=1)[:, 0]
    tid = jnp.where(depth > 0, top >> jnp.uint32(24), jnp.uint32(0))
    dist = jnp.where(
        depth > 0,
        jnp.minimum(cs["bytecnt"] - (top & jnp.uint32(0xFFFFFF)),
                    jnp.uint32(63)), jnp.uint32(0))
    return tid * jnp.uint32(64) + dist


def update_ctx_state_batched(cs, bytes_b, wrtw_tab=None):
    """Advance batched context state by one byte per block.

    cs leaves have a leading batch dim; bytes_b is uint32 (B,).
    wrtw_tab: None, or ((N,) u32 word-hash, (N,) u32 stem-hash) device
    tables (WRTW=2 -- see build_wrtw_tables).
    """
    b = bytes_b.astype(jnp.uint32)
    ohash = cs["ohash"]                                    # (B, MAX_ORDER+1)
    zero = jnp.zeros((b.shape[0], 1), dtype=jnp.uint32)
    new_ohash = jnp.concatenate(
        [zero, mix32(ohash[:, :-1], b[:, None])], axis=1)
    last8 = (cs["last8"] << jnp.uint32(8)) \
        | (cs["last4"] >> jnp.uint32(24))
    last4 = (cs["last4"] << jnp.uint32(8)) | b
    # xml/html tag machine (capability: paq8 XMLModel/nestModel,
    # src/models/paq8.cpp:7824-8097, :4107): '<' arms an accumulator,
    # tag-name letters hash into it ('</' marks closing via bit 31),
    # '>' or space latches it as the enclosing-tag context and adjusts
    # the nesting depth
    is_lt = b == jnp.uint32(60)
    is_gt = b == jnp.uint32(62)
    is_sp = b == jnp.uint32(32)
    is_slash = b == jnp.uint32(47)
    acc_w = cs["tagacc"]
    close_f = acc_w >> jnp.uint32(31)
    acc = acc_w & jnp.uint32(0x7FFFFFFF)
    armed = acc_w != 0
    letter = jnp.asarray(IS_LETTER)[b] == 1
    latch = armed & (is_gt | is_sp) & (acc > 1)
    tagacc = jnp.where(
        is_lt, jnp.uint32(1),
        jnp.where(armed & is_slash & (acc == 1),
                  acc_w | jnp.uint32(0x80000000),
                  jnp.where(armed & letter,
                            (close_f << jnp.uint32(31))
                            | mix32(jnp.maximum(acc, jnp.uint32(2)),
                                    jnp.asarray(LOWER_MAP)[b]),
                            jnp.where(armed & (is_gt | is_sp),
                                      jnp.uint32(0), acc_w))))
    tag = jnp.where(latch, acc, cs["tag"])
    tagdepth = jnp.where(
        latch & (close_f == 1), jnp.maximum(cs["tagdepth"], 1) - 1,
        jnp.where(latch & (close_f == 0),
                  jnp.minimum(cs["tagdepth"] + 1, jnp.uint32(15)),
                  cs["tagdepth"]))
    lower = jnp.asarray(LOWER_MAP)[b]
    is_letter = jnp.asarray(IS_LETTER)[b]
    word = jnp.where(is_letter == 1, mix32(cs["word"], lower),
                     jnp.zeros_like(cs["word"]))
    ended = (is_letter == 0) & (cs["word"] != 0)
    lettermask = (is_letter == 1)
    wq1 = jnp.where(lettermask, cs["word"], jnp.uint32(0))
    wq2 = jnp.where(lettermask, cs["wq1"], jnp.uint32(0))
    wq3 = jnp.where(lettermask, cs["wq2"], jnp.uint32(0))
    wtail = jnp.where(lettermask, (cs["wtail"] << jnp.uint32(8)) | lower,
                      jnp.uint32(0))
    # at a word end, strip one matched English suffix: the stem is the
    # hash snapshot from before the suffix letters
    t1 = cs["wtail"] & jnp.uint32(0xFF)
    t2 = (cs["wtail"] >> jnp.uint32(8)) & jnp.uint32(0xFF)
    t3 = (cs["wtail"] >> jnp.uint32(16)) & jnp.uint32(0xFF)
    wl = cs["wordlen"]
    pair = (t2 << jnp.uint32(8)) | t1
    trip = (t3 << jnp.uint32(16)) | pair

    def _cc(*chars):
        v = 0
        for ch in chars:
            v = (v << 8) | ord(ch)
        return jnp.uint32(v)

    m3 = ((trip == _cc("i", "n", "g")) | (trip == _cc("i", "o", "n"))
          ) & (wl >= 5)
    m2 = ((pair == _cc("e", "d")) | (pair == _cc("e", "r"))
          | (pair == _cc("e", "s")) | (pair == _cc("l", "y"))
          | (pair == _cc("a", "l"))) & (wl >= 4)
    m1 = (t1 == _cc("s")) & (t2 != _cc("s")) & (wl >= 3)
    stem = jnp.where(m3, cs["wq3"],
                     jnp.where(m2, cs["wq2"],
                               jnp.where(m1, cs["wq1"], cs["word"])))
    last_stem = jnp.where(ended, stem, cs["last_stem"])
    last_word = jnp.where(ended, cs["word"], cs["last_word"])
    last_word2 = jnp.where(ended, cs["last_word"], cs["last_word2"])
    if WRTW:
        # WRT codeword awareness (the in-model codeword decode of fxcm,
        # src/models/fxcmv1.cpp:353-438,3780-3795, re-specified): on a
        # WRT-transformed stream every 1/2/3-byte codeword (lead 0x80-
        # 0xBF / 0xC0-0xEF / 0xF0-0xFF, preprocess/wrt.py:114-120) IS a
        # dictionary word, and hashing its bytes is a stable word
        # identity (codeword<->word is bijective) -- so completed
        # codewords feed the word n-gram/stem contexts that pure letter
        # tracking loses on transformed text.  Routed on by the runner
        # exactly when the archive applied the WRT transform.
        # cwrem also carries an ESC-pending flag (value 15): WRT escapes
        # literal bytes >= 0x80 (and ESC/CAP/UPR themselves) as
        # ESC(0x04), byte -- the escaped byte is NOT a codeword lead and
        # must not start (or be swallowed into) codeword tracking.
        esc_pend = cs["cwrem"] == jnp.uint32(15)
        track = (cs["cwrem"] == 0) & ~esc_pend
        is_esc = track & (b == jnp.uint32(0x04))
        lead = track & (b >= jnp.uint32(0x80)) & ~is_esc
        rem_new = jnp.where(
            lead,
            jnp.where(b >= jnp.uint32(0xF0), jnp.uint32(2),
                      jnp.where(b >= jnp.uint32(0xC0), jnp.uint32(1),
                                jnp.uint32(0))),
            jnp.maximum(cs["cwrem"], jnp.uint32(1)) - jnp.uint32(1))
        in_cw = lead | ((cs["cwrem"] > 0) & ~esc_pend)
        cwacc = jnp.where(
            lead, mix32(b, jnp.uint32(0x051ED270)),
            jnp.where((cs["cwrem"] > 0) & ~esc_pend,
                      mix32(cs["cwacc"], b), cs["cwacc"]))
        cw_done = in_cw & (rem_new == 0)
        cwrem = jnp.where(is_esc, jnp.uint32(15),
                          jnp.where(in_cw, rem_new, jnp.uint32(0)))
        if WRTW >= 2:
            # decode the raw codeword id alongside the byte hash
            # (codeword layout is preprocess/wrt.py _emit_code: 1-byte
            # ids < 64, 2-byte ids < 64 + 48*256, 3-byte the rest)
            n1, n2 = jnp.uint32(64), jnp.uint32(48 * 256)
            lead_id = jnp.where(
                b >= jnp.uint32(0xF0),
                n1 + n2 + ((b - jnp.uint32(0xF0)) << jnp.uint32(16)),
                jnp.where(b >= jnp.uint32(0xC0),
                          n1 + ((b - jnp.uint32(0xC0)) << jnp.uint32(8)),
                          b - jnp.uint32(0x80)))
            cwid = jnp.where(
                lead, lead_id,
                jnp.where((cs["cwrem"] > 0) & ~esc_pend,
                          cs["cwid"] + (b << (jnp.uint32(8) * rem_new)),
                          cs["cwid"]))
        else:
            cwid = cs["cwid"]
        last_word2 = jnp.where(cw_done, last_word, last_word2)
        if WRTW >= 2 and wrtw_tab is not None:
            wi = jnp.minimum(cwid, jnp.uint32(WRTW_TAB_N - 1)
                             ).astype(jnp.int32)
            tw = wrtw_tab[0][wi]
            ts = wrtw_tab[1][wi]
            # out-of-table ids (padding rows = 0) keep the byte-hash
            # identity -- deterministic on both coder sides either way
            tw = jnp.where(tw != 0, tw, cwacc)
            ts = jnp.where(ts != 0, ts, cwacc)
            last_word = jnp.where(cw_done, tw, last_word)
            last_stem = jnp.where(cw_done, ts, last_stem)
        else:
            last_word = jnp.where(cw_done, cwacc, last_word)
            last_stem = jnp.where(cw_done, cwacc, last_stem)
    else:
        cwacc, cwrem, cwid = cs["cwacc"], cs["cwrem"], cs["cwid"]
    wordlen = jnp.where(is_letter == 1,
                        jnp.minimum(cs["wordlen"] + 1, jnp.uint32(63)),
                        jnp.zeros_like(cs["wordlen"]))
    word_pfx = jnp.where(is_letter == 0, jnp.zeros_like(cs["word_pfx"]),
                         jnp.where(cs["wordlen"] < 4,
                                   mix32(cs["word_pfx"], lower),
                                   cs["word_pfx"]))
    clsreg = (cs["clsreg"] << jnp.uint32(4)) | jnp.asarray(BYTE_CLASS)[b]
    cls2reg = (cs["cls2reg"] << jnp.uint32(2)) | jnp.asarray(CLS2)[b]
    sentpos = jnp.where(jnp.asarray(IS_SENT_END)[b] == 1,
                        jnp.zeros_like(cs["sentpos"]),
                        jnp.minimum(cs["sentpos"] + 1, jnp.uint32(1023)))
    linepos = jnp.where(b == jnp.uint32(10), jnp.zeros_like(cs["linepos"]),
                        jnp.minimum(cs["linepos"] + 1, jnp.uint32(8191)))
    stack, depth = _brk_step(cs["brk_stack"], cs["brk_depth"],
                             cs["bytecnt"], b)
    # line grid: record this byte at its column; on newline the current
    # buffer becomes the previous line (the newline byte itself is not
    # recorded, so plbuf holds the finished line's bytes)
    is_nl = b == jnp.uint32(10)
    lane = jnp.arange(LINE_W, dtype=jnp.uint32)
    wsel = (lane[None, :] == cs["linepos"][:, None]) & (~is_nl)[:, None]
    lbuf_w = jnp.where(wsel, b[:, None], cs["lbuf"])
    plbuf = jnp.where(is_nl[:, None], lbuf_w, cs["plbuf"])
    lbuf = jnp.where(is_nl[:, None], jnp.uint32(0xFFFF), lbuf_w)
    plen = jnp.where(is_nl, cs["linepos"], cs["plen"])
    vexp, valive = line_expected(cs)
    lml = jnp.where(is_nl, jnp.uint32(0),
                    jnp.where(valive & (b == vexp),
                              cs["lml"] + 1, cs["lml"]))
    # wiki/table cell machine: '|' or TAB advances the cell index; the
    # first byte of each cell is latched into cellbuf[cellidx]; newline
    # rolls cellbuf into pcellbuf (the previous row's column stream).
    # Line-start runs of ':*#;' accumulate a list depth, leading spaces
    # likewise (indent via listchar=' ').
    is_sep = (b == jnp.uint32(124)) | (b == jnp.uint32(9))
    cellidx = jnp.where(
        is_nl, jnp.uint32(0),
        jnp.where(is_sep,
                  jnp.minimum(cs["cellidx"] + 1, jnp.uint32(CELL_W - 1)),
                  cs["cellidx"]))
    cellpos = jnp.where(is_nl | is_sep, jnp.uint32(0),
                        jnp.minimum(cs["cellpos"] + 1, jnp.uint32(63)))
    clane = jnp.arange(CELL_W, dtype=jnp.uint32)
    first_of_cell = (cs["cellpos"] == 0) & (~is_nl) & (~is_sep)
    cw = (clane[None, :] == cs["cellidx"][:, None]) \
        & first_of_cell[:, None]
    cellbuf_w = jnp.where(cw, b[:, None], cs["cellbuf"])
    pcellbuf = jnp.where(is_nl[:, None], cellbuf_w, cs["pcellbuf"])
    cellbuf = jnp.where(is_nl[:, None], jnp.uint32(0xFFFF), cellbuf_w)
    is_listc = ((b == jnp.uint32(58)) | (b == jnp.uint32(42))
                | (b == jnp.uint32(35)) | (b == jnp.uint32(59))
                | (b == jnp.uint32(32)))
    lsflag = jnp.where(is_nl, jnp.uint32(1),
                       cs["lsflag"] & is_listc.astype(jnp.uint32))
    grow = (cs["lsflag"] == 1) & is_listc & (~is_nl)
    listdepth = jnp.where(
        is_nl, jnp.uint32(0),
        jnp.where(grow, jnp.minimum(cs["listdepth"] + 1, jnp.uint32(15)),
                  cs["listdepth"]))
    listchar = jnp.where(is_nl, jnp.uint32(0),
                         jnp.where(grow, b, cs["listchar"]))
    return {"ohash": new_ohash, "last4": last4, "last8": last8,
            "tag": tag, "tagacc": tagacc, "tagdepth": tagdepth,
            "word": word,
            "last_word": last_word, "last_word2": last_word2,
            "word_pfx": word_pfx, "wordlen": wordlen,
            "wq1": wq1, "wq2": wq2, "wq3": wq3, "wtail": wtail,
            "last_stem": last_stem,
            "clsreg": clsreg, "cls2reg": cls2reg, "sentpos": sentpos,
            "linepos": linepos,
            "brk_stack": stack, "brk_depth": depth,
            "bytecnt": cs["bytecnt"] + 1,
            "lbuf": lbuf, "plbuf": plbuf, "plen": plen, "lml": lml,
            "cwacc": cwacc, "cwrem": cwrem, "cwid": cwid,
            "cellidx": cellidx, "cellpos": cellpos, "cellbuf": cellbuf,
            "pcellbuf": pcellbuf, "listdepth": listdepth,
            "listchar": listchar, "lsflag": lsflag}
