"""x86 instruction-structure context tests (cf. paq8 exeModel,
src/models/paq8.cpp:6590-7546)."""

import numpy as np
import jax.numpy as jnp

from cmix_tpu.contexts.x86 import (
    init_x86_state, x86_update, x86_ctx_vals,
    PH_OP, PH_OP2, PH_MODRM, PH_TAIL)


def _run(code):
    import jax
    st = jax.tree_util.tree_map(lambda x: x[None], init_x86_state())
    phases = []
    for b in code:
        phases.append(int(np.asarray(st["phase"])[0]))
        st = x86_update(st, jnp.asarray([b], jnp.uint32))
    return st, phases


def test_call_rel32():
    # E8 xx xx xx xx  -> opcode then 4 tail bytes, then fresh opcode
    st, phases = _run(bytes([0xE8, 0x10, 0x20, 0x30, 0x40, 0x90]))
    assert phases == [PH_OP, PH_TAIL, PH_TAIL, PH_TAIL, PH_TAIL, PH_OP]
    assert int(np.asarray(st["phase"])[0]) == PH_OP   # nop consumed


def test_modrm_and_disp():
    # 8B 45 FC = mov eax, [ebp-4]: opcode, modrm (mod=01 -> disp8), tail
    st, phases = _run(bytes([0x8B, 0x45, 0xFC]))
    assert phases == [PH_OP, PH_MODRM, PH_TAIL]
    assert int(np.asarray(st["phase"])[0]) == PH_OP
    assert int(np.asarray(st["modrm"])[0]) == 0x45


def test_prefix_then_twobyte():
    # 66 0F 6F 00 = movdqa: prefix, 0F escape, opcode2 (modrm), modrm
    st, phases = _run(bytes([0x66, 0x0F, 0x6F, 0x00]))
    assert phases == [PH_OP, PH_OP, PH_OP2, PH_MODRM]
    assert int(np.asarray(st["op"])[0]) == 0x16F      # 0x100 | 0x6F
    assert int(np.asarray(st["phase"])[0]) == PH_OP   # mod=0 rm=0: done


def test_ctx_vals_shape_and_gate():
    import jax
    st = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (3,)), init_x86_state())
    vals, gate = x86_ctx_vals(st)
    assert vals.shape == (3, 4)
    assert gate.shape == (3,)
    assert int(np.asarray(gate).max()) < 64


def test_streams_independent():
    import jax
    st = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (2,)), init_x86_state())
    # lane 0 sees call rel32, lane 1 sees nop: phases diverge
    st = x86_update(st, jnp.asarray([0xE8, 0x90], jnp.uint32))
    ph = np.asarray(st["phase"])
    assert ph[0] == PH_TAIL and ph[1] == PH_OP
