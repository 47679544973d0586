"""Binary arithmetic (range) coder -- normative numpy spec implementation.

Carry-less 32-bit range coder over 16-bit probabilities, structurally the
same construction as the reference coder (src/coder/encoder.cpp:14-39,
src/coder/decoder.cpp:5-33): interval [x1, x2], split point computed with
the overflow-free two-part product, renormalization one byte at a time while
the top bytes of x1 and x2 agree.  Differences from the reference (ours is a
new format, not a bitstream clone):

* p16 comes straight from the model pipeline (p12 << 4 domain), no
  Discretize() float step (encoder.cpp:10-12 there).
* Flush emits 4 bytes of x1 (reference emits 1; we trade 3 bytes for an
  unconditionally-safe decoder priming of 4 bytes).

The JAX transcoder (cmix_tpu/engine.py) implements the identical integer
recurrence inside ``lax.scan``; tests assert byte-for-byte equality against
this implementation.
"""

import numpy as np

M32 = 0xFFFFFFFF


def _xmid(x1, x2, p16):
    r = x2 - x1
    return (x1 + (r >> 16) * p16 + (((r & 0xFFFF) * p16) >> 16)) & M32


class Encoder:
    def __init__(self):
        self.x1 = 0
        self.x2 = M32
        self.out = bytearray()

    def encode(self, bit, p16):
        assert 1 <= p16 <= 65535
        xmid = _xmid(self.x1, self.x2, p16)
        if bit:
            self.x2 = xmid
        else:
            self.x1 = (xmid + 1) & M32
        while ((self.x1 ^ self.x2) & 0xFF000000) == 0:
            self.out.append(self.x2 >> 24)
            self.x1 = (self.x1 << 8) & M32
            self.x2 = ((self.x2 << 8) | 0xFF) & M32

    def flush(self):
        for i in range(4):
            self.out.append((self.x1 >> 24) & 0xFF)
            self.x1 = (self.x1 << 8) & M32
        return bytes(self.out)


class Decoder:
    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.x1 = 0
        self.x2 = M32
        self.x = 0
        for _ in range(4):
            self.x = ((self.x << 8) | self._next()) & M32

    def _next(self):
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def decode(self, p16):
        assert 1 <= p16 <= 65535
        xmid = _xmid(self.x1, self.x2, p16)
        bit = 1 if self.x <= xmid else 0
        if bit:
            self.x2 = xmid
        else:
            self.x1 = (xmid + 1) & M32
        while ((self.x1 ^ self.x2) & 0xFF000000) == 0:
            self.x1 = (self.x1 << 8) & M32
            self.x2 = ((self.x2 << 8) | 0xFF) & M32
            self.x = ((self.x << 8) | self._next()) & M32
        return bit


def encode_bits(bits, p16s):
    enc = Encoder()
    for b, p in zip(bits, p16s):
        enc.encode(int(b), int(p))
    return enc.flush()


def decode_bits(data, p16s):
    dec = Decoder(data)
    return np.array([dec.decode(int(p)) for p in p16s], dtype=np.uint8)
