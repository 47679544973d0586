"""Wiki/table cell-stream context tests (capability class of fxcm's wiki
table/column streams, src/models/fxcmv1.cpp:2007-2147): cell index,
cell-relative position, previous-row column buffer, list/indent depth."""

import numpy as np
import jax
import jax.numpy as jnp

from cmix_tpu.contexts.hashes import (
    init_ctx_state, update_ctx_state_batched, CELL_W)


def _feed(data):
    cs = jax.tree_util.tree_map(lambda x: x[None], init_ctx_state())
    trace = []
    for b in data:
        cs = update_ctx_state_batched(cs, jnp.asarray([b], jnp.uint32))
        trace.append({k: np.asarray(cs[k])[0] for k in
                      ("cellidx", "cellpos", "listdepth", "listchar")})
    return cs, trace


def test_cell_index_and_position():
    _, tr = _feed(b"ab|cde|f\nxy")
    # after 'b' (pos 1 in cell 0), after '|' cell 1 pos 0, 'c' pos 1
    assert tr[1]["cellidx"] == 0 and tr[1]["cellpos"] == 2
    assert tr[2]["cellidx"] == 1 and tr[2]["cellpos"] == 0
    assert tr[3]["cellpos"] == 1
    assert tr[6]["cellidx"] == 2            # second '|'
    assert tr[8]["cellidx"] == 0            # newline resets
    assert tr[10]["cellpos"] == 2


def test_previous_row_column_stream():
    cs, _ = _feed(b"ab|cd|ef\nx")
    pc = np.asarray(cs["pcellbuf"])[0]
    # first byte of each cell of the finished row: a, c, e
    assert pc[0] == ord("a") and pc[1] == ord("c") and pc[2] == ord("e")
    assert pc[3] == 0xFFFF                  # untouched cells stay absent
    cur = np.asarray(cs["cellbuf"])[0]
    assert cur[0] == ord("x")               # new row latches fresh


def test_tab_separator_counts():
    _, tr = _feed(b"a\tb\tc")
    assert tr[4]["cellidx"] == 2


def test_list_depth_and_char():
    _, tr = _feed(b"text\n**bold item\n")
    assert tr[3]["listdepth"] == 0
    assert tr[6]["listdepth"] == 2 and tr[6]["listchar"] == ord("*")
    # depth frozen once a non-list byte appears
    assert tr[10]["listdepth"] == 2
    # newline resets
    assert tr[16]["listdepth"] == 0


def test_indent_depth():
    _, tr = _feed(b"\n    code")
    assert tr[4]["listdepth"] == 4 and tr[4]["listchar"] == ord(" ")
    assert tr[8]["listdepth"] == 4


def test_cell_index_caps():
    data = b"|" * (CELL_W + 10)
    _, tr = _feed(data)
    assert tr[-1]["cellidx"] == CELL_W - 1


def test_suffix_strip_stem():
    """Inflected forms map to one stem context (the Porter2-class
    capability, fxcmv1.cpp:2662-3209): 'jumping'/'jumped'/'jumps' end
    with the same last_stem hash, distinct from 'jumper-like' stems of
    other words."""
    import jax.numpy as jnp
    import numpy as np
    from cmix_tpu.contexts.hashes import (
        init_ctx_state, update_ctx_state_batched)

    def run(text):
        cs = init_ctx_state()
        cs = {k: jnp.broadcast_to(v, (1,) + v.shape) for k, v in cs.items()}
        for ch in text.encode():
            cs = update_ctx_state_batched(
                cs, jnp.asarray([ch], dtype=jnp.uint32))
        return int(np.asarray(cs["last_stem"])[0])

    s_base = run("they jump ")
    assert run("they jumping ") == s_base
    assert run("they jumped ") == s_base
    assert run("they jumps ") == s_base
    assert run("they walked ") != s_base
    # 'ss' endings are not plural-stripped
    assert run("the glass ") != run("the glas ")
