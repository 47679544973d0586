"""WRT dictionary transform + filetype detection (native C++ with ctypes).

Host-side preprocessing layer, capability parity with the reference
(src/preprocess/dictionary.cpp word->codeword transform, and
src/preprocess/preprocessor.cpp:146-175 text detection).  Runs once per
stream on the host -- it is sequential and cheap (SURVEY.md section 7
step 8); the compute path stays on-device.

The C++ library (native/preproc.cpp) is built on demand; a pure-Python
fallback implements the identical scheme for environments without a
toolchain (bit-identical output, tested).
"""

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, os.pardir, "native"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpreproc.so")

ESC, CAP, UPR = 0x04, 0x05, 0x06
N1, N2 = 64, 48 * 256


def _build_native():
    src = os.path.join(_NATIVE_DIR, "preproc.cpp")
    if not os.path.exists(src):
        return None
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True, capture_output=True)
        return _LIB_PATH
    except Exception:
        return None


def _load_native():
    if not os.path.exists(_LIB_PATH) and _build_native() is None:
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.wrt_load_dict.restype = ctypes.c_void_p
    lib.wrt_load_dict.argtypes = [ctypes.c_char_p]
    lib.wrt_free_dict.argtypes = [ctypes.c_void_p]
    lib.wrt_dict_size.restype = ctypes.c_int32
    lib.wrt_dict_size.argtypes = [ctypes.c_void_p]
    for fn in (lib.wrt_encode, lib.wrt_decode):
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                       ctypes.c_char_p, ctypes.c_int64]
    lib.detect_chunks.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_char_p]
    for fn in (lib.exe_encode, lib.exe_decode):
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
                       ctypes.c_int64]
    lib.exe_score.restype = ctypes.c_int64
    lib.exe_score.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    return lib


_LIB = _load_native()


class Dictionary:
    """Word dictionary for the WRT transform (frequency-ordered word list,
    one word per line, like the reference's english.dic asset)."""

    def __init__(self, path):
        self.path = path
        self._handle = None
        if _LIB is not None:
            self._handle = _LIB.wrt_load_dict(path.encode())
        # python-side tables (fallback + decode sanity)
        self.words = []
        self.ids = {}
        with open(path, "rb") as f:
            for line in f:
                w = line.strip().decode("latin-1")
                if w and w not in self.ids:
                    self.ids[w] = len(self.words)
                    self.words.append(w)

    def __del__(self):
        if self._handle and _LIB is not None:
            _LIB.wrt_free_dict(self._handle)

    # ------------------------------------------------------------- native
    def encode(self, data: bytes) -> bytes:
        if self._handle:
            cap = 2 * len(data) + 1024
            out = ctypes.create_string_buffer(cap)
            n = _LIB.wrt_encode(self._handle, data, len(data), out, cap)
            if n >= 0:
                return out.raw[:n]
        return self._encode_py(data)

    def decode(self, data: bytes) -> bytes:
        if self._handle:
            cap = 8 * len(data) + 1024
            out = ctypes.create_string_buffer(cap)
            n = _LIB.wrt_decode(self._handle, data, len(data), out, cap)
            if n >= 0:
                return out.raw[:n]
        return self._decode_py(data)

    # ------------------------------------------------------- python twin
    def _emit_code(self, o, i):
        if i < N1:
            o.append(0x80 + i)
        elif i < N1 + N2:
            v = i - N1
            o += bytes([0xC0 + (v >> 8), v & 0xFF])
        else:
            v = i - N1 - N2
            o += bytes([0xF0 + (v >> 16), (v >> 8) & 0xFF, v & 0xFF])

    def _encode_py(self, data: bytes) -> bytes:
        o = bytearray()
        i, n = 0, len(data)
        while i < n:
            c = data[i]
            if (65 <= c <= 90) or (97 <= c <= 122):
                j = i
                while j < n and (65 <= data[j] <= 90 or 97 <= data[j] <= 122):
                    j += 1
                w = data[i:j].decode("latin-1")
                lw = w.lower()
                wid = self.ids.get(lw)
                is_lower = w == lw
                is_cap = w[0].isupper() and w[1:] == lw[1:]
                is_upper = w.isupper() and len(w) > 1
                if wid is not None and (is_lower or is_cap or is_upper):
                    if is_upper:
                        o.append(UPR)
                    elif is_cap:
                        o.append(CAP)
                    self._emit_code(o, wid)
                else:
                    o += data[i:j]
                i = j
            elif c >= 0x80 or c in (ESC, CAP, UPR):
                o += bytes([ESC, c])
                i += 1
            else:
                o.append(c)
                i += 1
        return bytes(o)

    def _decode_py(self, data: bytes) -> bytes:
        o = bytearray()
        i, n = 0, len(data)
        capmode = 0
        while i < n:
            c = data[i]
            if c == ESC and i + 1 < n:
                o.append(data[i + 1])
                i += 2
                capmode = 0
                continue
            if c == CAP:
                capmode = 1
                i += 1
                continue
            if c == UPR:
                capmode = 2
                i += 1
                continue
            if c < 0x80:
                o.append(c)
                i += 1
                capmode = 0
                continue
            if c < 0xC0:
                wid = c - 0x80
                i += 1
            elif c < 0xF0:
                if i + 1 >= n:
                    o.append(c)
                    i += 1
                    continue
                wid = N1 + ((c - 0xC0) << 8 | data[i + 1])
                i += 2
            else:
                if i + 2 >= n:
                    o.append(c)
                    i += 1
                    continue
                wid = N1 + N2 + ((c - 0xF0) << 16
                                 | data[i + 1] << 8 | data[i + 2])
                i += 3
            if 0 <= wid < len(self.words):
                w = self.words[wid]
                if capmode == 1:
                    w = w[0].upper() + w[1:]
                elif capmode == 2:
                    w = w.upper()
                o += w.encode("latin-1")
            capmode = 0
        return bytes(o)


def detect_text_chunks(data: bytes, chunk: int = 4096):
    """Per-chunk text/binary classification (1=text)."""
    import numpy as np
    nc = max(1, -(-len(data) // chunk))
    if _LIB is not None:
        out = ctypes.create_string_buffer(nc)
        _LIB.detect_chunks(data, len(data), chunk, out)
        return np.frombuffer(out.raw, dtype=np.uint8).copy()
    arr = np.frombuffer(data, dtype=np.uint8)
    types = np.zeros(nc, dtype=np.uint8)
    for c in range(nc):
        seg = arr[c * chunk:(c + 1) * chunk]
        printable = ((seg == 9) | (seg == 10) | (seg == 13)
                     | ((seg >= 32) & (seg < 127))).sum()
        types[c] = 1 if printable * 100 >= len(seg) * 90 else 0
    return types


# ------------------------------------------------------- EXE x86 transform


def exe_encode(data: bytes) -> bytes:
    """E8/E9 rel32 -> absolute transform (self-inverse pair with
    exe_decode; cf. encode_exe, preprocessor.cpp:377-441)."""
    if _LIB is None:
        return _exe_py(data, True)
    out = ctypes.create_string_buffer(len(data) or 1)
    n = _LIB.exe_encode(data, len(data), out, len(data))
    return out.raw[:n] if n >= 0 else data


def exe_decode(data: bytes) -> bytes:
    if _LIB is None:
        return _exe_py(data, False)
    out = ctypes.create_string_buffer(len(data) or 1)
    n = _LIB.exe_decode(data, len(data), out, len(data))
    return out.raw[:n] if n >= 0 else data


def _sext25(v):
    v &= 0x1FFFFFF
    return v - 0x2000000 if v & 0x1000000 else v


def _exe_cond(out, j, n):
    if j + 4 >= n or out[j + 4] not in (0x00, 0xFF):
        return False
    return (out[j] in (0xE8, 0xE9)
            or (j >= 1 and out[j - 1] == 0x0F and out[j] & 0xF0 == 0x80))


def _exe_py(data: bytes, enc: bool) -> bytes:
    """Bit-identical Python twin of the native transform (see
    native/preproc.cpp exe_encode/exe_decode).  The condition -- top
    operand byte in {0x00, 0xFF} -- is invariant under the mod-2^25
    sign-extended absolutization, so encode and decode always agree on
    which operands were transformed (no 16 MB limit, no |rel|~2^24
    asymmetry); backward encode + forward decode invert overlapping
    matches LIFO."""
    out = bytearray(data)
    n = len(data)
    rng = range(n - 5, -1, -1) if enc else range(0, max(n - 4, 0))
    for j in rng:
        if not _exe_cond(out, j, n):
            continue
        if enc:
            rel = (out[j + 1] | out[j + 2] << 8 | out[j + 3] << 16
                   | out[j + 4] << 24)
            a = _sext25(rel + j + 5)
            out[j + 1] = (a & 0xFF) ^ 0xB0
            out[j + 2] = ((a >> 8) & 0xFF) ^ 0xB0
            out[j + 3] = ((a >> 16) & 0xFF) ^ 0xB0
            out[j + 4] = (a >> 24) & 0xFF
        else:
            a = ((out[j + 1] ^ 0xB0) | (out[j + 2] ^ 0xB0) << 8
                 | (out[j + 3] ^ 0xB0) << 16 | out[j + 4] << 24)
            rel = _sext25(a - j - 5)
            out[j + 1] = rel & 0xFF
            out[j + 2] = (rel >> 8) & 0xFF
            out[j + 3] = (rel >> 16) & 0xFF
            out[j + 4] = (rel >> 24) & 0xFF
    return bytes(out)


def exe_score(data: bytes) -> int:
    if _LIB is None:
        cnt = 0
        import struct as _st
        for i in range(len(data) - 4):
            if data[i] in (0xE8, 0xE9):
                y = _st.unpack_from("<i", data, i + 1)[0]
                if -(1 << 22) < y < (1 << 22):
                    cnt += 1
        return cnt
    return int(_LIB.exe_score(data, len(data)))


# ------------------------------------------------- segmented preprocessing

SEG_RAW, SEG_TEXT, SEG_EXE = 0, 1, 2
# media segments (preprocess/media.py): entries carry a 4th field, the
# row/frame stride in bytes, threaded to the engine's record-grid contexts
SEG_IMG24, SEG_IMG8, SEG_AUDIO = 3, 4, 5
# JPEG spans pass through untouched (the scan is already entropy-coded);
# the segment type keeps them out of the text/EXE detectors and marks
# them for JPEG-aware routing (cf. preprocessor.cpp:112-124 detection)
SEG_JPEG = 6
# JPEG recoded to a DCT-coefficient stream (preprocess/jpeg.py): the
# scan's Huffman bits are host-decoded into a modelable byte stream with
# an exact inverse; spans that fail the recoder's self-check stay
# SEG_JPEG pass-through.  The segment type is recorded in the archive's
# segment table, so decode needs no gate.
SEG_JPEGC = 7
_MEDIA_SEGS = (SEG_IMG24, SEG_IMG8, SEG_AUDIO)
# segments whose meta entry carries a 4th field (record stride hint)
_STRIDE_SEGS = _MEDIA_SEGS + (SEG_JPEGC,)
_DETECT_CHUNK = 1 << 16


def transform(data: bytes, dictionary=None):
    """Detect content types and apply per-segment transforms.

    Returns (payload, segments) with segments = [(type, enc_len,
    raw_len)].  Capability parity with the reference's block segmentation
    (preprocessor.cpp:542-563): TEXT -> WRT (when a dictionary is given
    and it shrinks), EXE -> E8/E9 absolutization, else raw.
    """
    if not data:
        return data, [(SEG_RAW, 0, 0)]
    n = len(data)

    # media regions first (headers stay in the surrounding stream); the
    # chunk detector then only sees the gaps, so pixel/sample data is
    # never misclassified as text/EXE (cf. preprocessor.cpp detect()
    # precedence, src/preprocess/preprocessor.cpp:177-289)
    from cmix_tpu.preprocess.media import find_media_spans
    spans = find_media_spans(data)

    def _detect_region(lo_r, hi_r, segs):
        types = []
        offs = list(range(lo_r, hi_r, _DETECT_CHUNK))
        for lo in offs:
            chunk = data[lo:min(lo + _DETECT_CHUNK, hi_r)]
            tt = detect_text_chunks(chunk, chunk=len(chunk) or 1)
            if tt.mean() >= 0.9:
                types.append(SEG_TEXT)
            elif exe_score(chunk) * 400 >= len(chunk):
                types.append(SEG_EXE)
            else:
                types.append(SEG_RAW)
        # merge adjacent same-type detection chunks into segments
        start = 0
        for i in range(1, len(types) + 1):
            if i == len(types) or types[i] != types[start]:
                segs.append((types[start], offs[start],
                             min(offs[start] + (i - start) * _DETECT_CHUNK,
                                 hi_r), 0))
                start = i

    segs = []                                # (type, lo, hi, stride)
    pos = 0
    for sp in spans:
        if sp.data_off > pos:
            _detect_region(pos, sp.data_off, segs)
        kind = {"img24": SEG_IMG24, "img8": SEG_IMG8,
                "audio": SEG_AUDIO, "jpeg": SEG_JPEG}[sp.kind]
        segs.append((kind, sp.data_off, sp.data_off + sp.data_len,
                     sp.stride))
        pos = sp.data_off + sp.data_len
    if pos < n:
        _detect_region(pos, n, segs)

    from cmix_tpu.preprocess.media import img24_encode
    payload = bytearray()
    meta = []
    for typ, lo, hi, stride in segs:
        raw = data[lo:hi]
        if typ == SEG_TEXT and dictionary is not None:
            enc = dictionary.encode(raw)
            if len(enc) < len(raw):
                payload += enc
                meta.append((SEG_TEXT, len(enc), len(raw)))
                continue
        if typ == SEG_EXE:
            enc = exe_encode(raw)
            payload += enc
            meta.append((SEG_EXE, len(enc), len(raw)))
            continue
        if typ == SEG_IMG24:
            payload += img24_encode(raw, stride)
            meta.append((SEG_IMG24, len(raw), len(raw), stride))
            continue
        if typ in (SEG_IMG8, SEG_AUDIO):     # pass-through + stride hint
            payload += raw
            meta.append((typ, len(raw), len(raw), stride))
            continue
        if typ == SEG_JPEG:
            # measured on-chip: fixed-width row-major planes with the
            # record-grid stride hint archive a real photo at 0.952x
            # the original vs 0.991x pass-through
            if os.environ.get("CMIX_JPEGC", "1") != "0":
                from cmix_tpu.preprocess.jpeg import (
                    jpeg_recode, jpeg_stride)
                enc = jpeg_recode(raw)       # None unless exact inverse
                if enc is not None:
                    from cmix_tpu.preprocess.jpeg import recoded_geometry
                    body_off, clens = recoded_geometry(enc) or (0, [])
                    payload += enc
                    # geometry rides in the segment table so the
                    # decoder can address (component, zigzag) per byte
                    # before any payload exists (engine JPEGX contexts)
                    meta.append((SEG_JPEGC, len(enc), len(raw),
                                 jpeg_stride(raw), body_off,
                                 tuple(clens[:4])))
                    continue
            payload += raw                   # pass-through, no stride
            meta.append((SEG_JPEG, len(raw), len(raw)))
            continue
        payload += raw
        meta.append((SEG_RAW, len(raw), len(raw)))
    return bytes(payload), meta


def block_strides(meta, n_blocks, block_size):
    """Per-block forced record length from media segment strides.

    A media segment's stride engages for a block when it covers more of
    the block than any other media segment and at least a quarter of it.
    Derived purely from the segment table, so encode and decode agree
    (the forced length changes predictions and is part of the format).
    """
    import numpy as np
    cover = np.zeros(n_blocks, dtype=np.int64)
    forced = np.zeros(n_blocks, dtype=np.int32)
    off = 0
    for entry in meta:
        typ, enc_len = entry[0], entry[1]
        if typ in _STRIDE_SEGS and len(entry) > 3 and 2 <= entry[3] < 4096:
            stride = entry[3]
            b0 = off // block_size
            b1 = min((off + enc_len - 1) // block_size, n_blocks - 1)
            for b in range(b0, b1 + 1):
                lo = max(off, b * block_size)
                hi = min(off + enc_len, (b + 1) * block_size)
                c = hi - lo
                if c > cover[b] and c * 4 >= block_size:
                    cover[b] = c
                    forced[b] = stride
        off += enc_len
    return forced


def block_jpeg_coords(meta, n_blocks, block_size):
    """Per-block JPEGX addressing: (rel0 (nb,) int32, clen (nb, 4) int32).

    For a block whose dominant coverage is a recoded-JPEG segment,
    rel0 + t is the byte's offset into that segment's coefficient
    planes (negative while still in the verbatim header) and clen holds
    the per-component plane lengths; rel0 = INT32_MIN marks blocks with
    no JPEG coverage.  Derived purely from the segment table so encode
    and decode agree (part of the format, like block_strides)."""
    import numpy as np
    rel0 = np.full(n_blocks, np.iinfo(np.int32).min, dtype=np.int32)
    clen = np.zeros((n_blocks, 4), dtype=np.int32)
    cover = np.zeros(n_blocks, dtype=np.int64)
    off = 0
    for entry in meta:
        typ, enc_len = entry[0], entry[1]
        if typ == SEG_JPEGC and len(entry) > 5 and entry[5]:
            body_off, clens = entry[4], entry[5]
            b0 = off // block_size
            b1 = min((off + enc_len - 1) // block_size, n_blocks - 1)
            for b in range(b0, b1 + 1):
                lo = max(off, b * block_size)
                hi = min(off + enc_len, (b + 1) * block_size)
                c = hi - lo
                if c > cover[b] and c * 4 >= block_size:
                    cover[b] = c
                    rel0[b] = b * block_size - off - body_off
                    clen[b] = 0
                    for i, cl in enumerate(clens[:4]):
                        clen[b, i] = cl
        off += enc_len
    return rel0, clen


def block_kinds(meta, n_blocks, block_size):
    """Per-block dominant content kind (SEG_* id with the most coverage).

    Derived purely from the archive's segment table so encode and decode
    agree -- the kind gates mixer weight rows (engine MIX_KIND) and is
    therefore part of the format, like block_strides."""
    import numpy as np
    cover = np.zeros((n_blocks, 8), dtype=np.int64)
    off = 0
    for entry in meta:
        typ, enc_len = entry[0], entry[1]
        if enc_len and 0 <= typ < 8:
            b0 = off // block_size
            b1 = min((off + enc_len - 1) // block_size, n_blocks - 1)
            for b in range(b0, b1 + 1):
                lo = max(off, b * block_size)
                hi = min(off + enc_len, (b + 1) * block_size)
                cover[b, typ] += hi - lo
        off += enc_len
    return np.argmax(cover, axis=1).astype(np.int32)


def untransform(payload: bytes, meta, dictionary=None) -> bytes:
    out = bytearray()
    off = 0
    for entry in meta:
        typ, enc_len = entry[0], entry[1]
        seg = payload[off:off + enc_len]
        off += enc_len
        if typ == SEG_TEXT:
            assert dictionary is not None
            out += dictionary.decode(seg)
        elif typ == SEG_EXE:
            out += exe_decode(seg)
        elif typ == SEG_IMG24:
            from cmix_tpu.preprocess.media import img24_decode
            out += img24_decode(seg, entry[3])
        elif typ == SEG_JPEGC:
            from cmix_tpu.preprocess.jpeg import jpeg_unrecode
            out += jpeg_unrecode(seg)
        else:
            out += seg
    return bytes(out)
