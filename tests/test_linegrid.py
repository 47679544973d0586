"""Line-grid context tests: previous-line column buffer and the vertical
match state (capability class of fxcm's wiki column streams,
src/models/fxcmv1.cpp:2007-2147, and a line-anchored match model)."""

import numpy as np
import jax
import jax.numpy as jnp

from cmix_tpu.contexts.hashes import (
    init_ctx_state, update_ctx_state_batched, line_expected, LINE_W)


def _feed(data):
    cs = jax.tree_util.tree_map(lambda x: x[None], init_ctx_state())
    out = []
    for b in data:
        exp, alive = line_expected(cs)
        out.append((int(np.asarray(exp)[0]), bool(np.asarray(alive)[0]),
                    int(np.asarray(cs["lml"])[0])))
        cs = update_ctx_state_batched(cs, jnp.asarray([b], jnp.uint32))
    return cs, out


def test_previous_line_bytes_expected():
    data = b"abcde\nabcxy\n"
    _, out = _feed(data)
    # second line positions 0..4 expect the previous line's bytes
    second = out[6:11]
    assert [e for e, _, _ in second] == [ord(c) for c in "abcde"]
    # prefix matched for a, b, c; alive until the first mismatch (x != d)
    assert [a for _, a, _ in second] == [True, True, True, True, False]
    # matched-prefix lengths grow 0,1,2,3 then freeze at 3
    assert [m for _, _, m in second] == [0, 1, 2, 3, 3]


def test_newline_expected_at_line_end():
    data = b"ab\nab"
    _, out = _feed(data + b"x")
    # after replaying 'ab' on line 2, column 2 == plen -> expect LF
    e, alive, lml = out[5]
    assert e == 10 and alive and lml == 2


def test_sentinel_past_previous_line():
    data = b"ab\nabcd"
    _, out = _feed(data + b"x")
    e, alive, _ = out[6]          # column 3 > plen=2
    assert e == 0x1FF and not alive


def test_long_lines_capped():
    line = bytes(range(33, 33 + 100))
    _, out = _feed(line + b"\n" + line)
    e, alive, _ = out[101 + LINE_W]   # past the buffer width
    assert not alive
