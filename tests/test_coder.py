"""Range coder spec tests (numpy normative implementation)."""

import numpy as np

from cmix_tpu.coder.rangecoder import Encoder, Decoder, encode_bits, decode_bits


def test_roundtrip_random_probs():
    rng = np.random.RandomState(0)
    n = 5000
    bits = rng.randint(0, 2, n)
    p16s = rng.randint(1, 65536, n)
    data = encode_bits(bits, p16s)
    back = decode_bits(data, p16s)
    assert np.array_equal(bits, back)


def test_roundtrip_skewed():
    rng = np.random.RandomState(1)
    n = 20000
    p = 64000
    bits = (rng.rand(n) < p / 65536.0).astype(np.int32)
    data = encode_bits(bits, [p] * n)
    # compression should approach the entropy of the source
    h = -(p / 65536) * np.log2(p / 65536) - (1 - p / 65536) * np.log2(1 - p / 65536)
    assert len(data) * 8 < n * h * 1.05 + 64
    assert np.array_equal(decode_bits(data, [p] * n), bits)


def test_extreme_probs():
    bits = [0, 1] * 100
    p16s = [1, 65535] * 100
    assert np.array_equal(decode_bits(encode_bits(bits, p16s), p16s), bits)
    bits = [1, 0] * 100
    data = encode_bits(bits, p16s)  # maximally wrong model still round-trips
    assert np.array_equal(decode_bits(data, p16s), bits)


def test_streaming_state_matches():
    rng = np.random.RandomState(2)
    enc = Encoder()
    bits = rng.randint(0, 2, 1000)
    ps = rng.randint(1, 65536, 1000)
    for b, p in zip(bits, ps):
        enc.encode(int(b), int(p))
    data = enc.flush()
    dec = Decoder(data)
    for b, p in zip(bits, ps):
        assert dec.decode(int(p)) == b
