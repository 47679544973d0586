"""x86 instruction-structure contexts, vectorized over blocks.

Capability parity with the reference's exeModel (src/models/paq8.cpp:
6590-7546): parse the byte stream as x86 instructions and expose
(opcode, position-in-instruction, ModRM, decode phase) as model
contexts, so code sections compress with instruction-aware statistics
instead of flat byte n-grams.

TPU-first redesign: instead of the reference's branchy per-byte C++
parser, the decoder here is a tiny vectorized state machine -- a few
(B,) uint32 registers advanced once per byte through 256-entry LUTs
(format constants, built procedurally below from x86 encoding rules;
no tables are copied).  It is a deliberately *coarse* decoder: 32-bit
mode, operand-size prefixes do not change immediate widths, and x87 /
3-byte-opcode subtleties collapse to "has ModRM".  Contexts only need
to be *stable and informative*, not a correct disassembly -- encode and
decode run the same machine, so any parse is self-consistent.

Phases: 0 = expecting an opcode (or prefix), 1 = expecting the second
byte of a 0F opcode, 2 = expecting ModRM, 3 = expecting SIB,
4 = consuming displacement/immediate bytes (``rem`` counts down).
"""

import numpy as np
import jax.numpy as jnp

# ------------------------------------------------------ LUT construction


def _build_tables():
    """(is_prefix, has_modrm1, imm1, has_modrm2, imm2, is_jump1) uint8[256].

    imm width is the total displacement-free immediate byte count that
    follows the opcode (and ModRM/SIB/disp if any).
    """
    is_prefix = np.zeros(256, np.uint8)
    for b in (0x26, 0x2E, 0x36, 0x3E, 0x64, 0x65, 0x66, 0x67,
              0xF0, 0xF2, 0xF3):
        is_prefix[b] = 1

    m1 = np.zeros(256, np.uint8)       # 1-byte opcode: has ModRM
    i1 = np.zeros(256, np.uint8)       # 1-byte opcode: immediate bytes
    j1 = np.zeros(256, np.uint8)       # 1-byte opcode: relative jump
    for b in range(0x40):              # ALU block: 8 groups of 8
        k = b & 7
        if k < 4:
            m1[b] = 1
        elif k == 4:
            i1[b] = 1
        elif k == 5:
            i1[b] = 4
    # 0x40-0x5F inc/dec/push/pop reg: nothing
    m1[0x62] = m1[0x63] = 1
    i1[0x68] = 4
    m1[0x69] = 1
    i1[0x69] = 4
    i1[0x6A] = 1
    m1[0x6B] = 1
    i1[0x6B] = 1
    for b in range(0x70, 0x80):        # Jcc rel8
        i1[b] = 1
        j1[b] = 1
    for b in range(0x80, 0x90):        # grp1 + test/xchg/mov/lea
        m1[b] = 1
    i1[0x80] = i1[0x82] = i1[0x83] = 1
    i1[0x81] = 4
    i1[0x9A] = 6                       # far call ptr16:32
    for b in (0xA0, 0xA1, 0xA2, 0xA3):  # mov moffs
        i1[b] = 4
    i1[0xA8] = 1
    i1[0xA9] = 4
    for b in range(0xB0, 0xB8):        # mov r8, imm8
        i1[b] = 1
    for b in range(0xB8, 0xC0):        # mov r32, imm32
        i1[b] = 4
    m1[0xC0] = m1[0xC1] = 1
    i1[0xC0] = i1[0xC1] = 1
    i1[0xC2] = 2
    m1[0xC4] = m1[0xC5] = m1[0xC6] = m1[0xC7] = 1
    i1[0xC6] = 1
    i1[0xC7] = 4
    i1[0xC8] = 3                       # enter imm16, imm8
    i1[0xCA] = 2
    i1[0xCD] = 1
    for b in range(0xD0, 0xD4):        # shift grp2
        m1[b] = 1
    i1[0xD4] = i1[0xD5] = 1
    for b in range(0xD8, 0xE0):        # x87
        m1[b] = 1
    for b in range(0xE0, 0xE4):        # loop/jcxz rel8
        i1[b] = 1
        j1[b] = 1
    for b in (0xE4, 0xE5, 0xE6, 0xE7):  # in/out imm8
        i1[b] = 1
    i1[0xE8] = i1[0xE9] = 4            # call/jmp rel32
    j1[0xE8] = j1[0xE9] = 1
    i1[0xEA] = 6                       # jmp far
    i1[0xEB] = 1                       # jmp rel8
    j1[0xEB] = 1
    m1[0xF6] = m1[0xF7] = 1            # grp3 (imm for /0 ignored: coarse)
    m1[0xFE] = m1[0xFF] = 1            # grp4/5

    m2 = np.zeros(256, np.uint8)       # 0F xx: has ModRM
    i2 = np.zeros(256, np.uint8)
    # most two-byte opcodes take ModRM; mark the main no-ModRM ranges
    m2[:] = 1
    for b in (0x05, 0x06, 0x07, 0x08, 0x09, 0x0B, 0x0E, 0x30, 0x31,
              0x32, 0x33, 0x34, 0x35, 0x77, 0xA0, 0xA1, 0xA2, 0xA8,
              0xA9, 0xAA):
        m2[b] = 0
    for b in range(0x80, 0x90):        # Jcc rel32
        m2[b] = 0
        i2[b] = 4
    for b in range(0xC8, 0xD0):        # bswap
        m2[b] = 0
    for b in range(0x70, 0x74):        # pshuf imm8
        i2[b] = 1
    i2[0xA4] = i2[0xAC] = 1            # shld/shrd imm8
    i2[0xBA] = 1                       # grp8 bt imm8
    for b in range(0xC2, 0xC7):        # cmpps etc imm8
        i2[b] = 1
    return is_prefix, m1, i1, m2, i2, j1


(IS_PREFIX, MODRM1, IMM1, MODRM2, IMM2, ISJMP1) = _build_tables()

PH_OP, PH_OP2, PH_MODRM, PH_SIB, PH_TAIL = 0, 1, 2, 3, 4


def init_x86_state():
    """Per-block decoder registers (unbatched; runner broadcasts)."""
    z = jnp.zeros((), dtype=jnp.uint32)
    return {"phase": z, "rem": z, "pimm": z, "op": z, "modrm": z,
            "ipos": z, "opln": z, "lastjmp": z,
            # opcode-stream history: previous opcode and a rolling hash
            # of the last opcodes (operand bytes excluded) -- the
            # reference exeModel's opcode n-gram contexts
            # (src/models/paq8.cpp:6590-7546 Cache of recent opcodes)
            "pop": z, "pop2": z, "ophist": z}


def x86_update(st, b):
    """Advance the decoder by one byte.  st leaves (B,), b uint32 (B,)."""
    phase, rem = st["phase"], st["rem"]
    pimm, op, modrm = st["pimm"], st["op"], st["modrm"]
    ipos, opln = st["ipos"], st["opln"]

    pfx = jnp.asarray(IS_PREFIX)[b]
    m1 = jnp.asarray(MODRM1)[b]
    i1 = jnp.asarray(IMM1)[b]
    m2 = jnp.asarray(MODRM2)[b]
    i2 = jnp.asarray(IMM2)[b]
    jj = jnp.asarray(ISJMP1)[b]

    at_op = phase == PH_OP
    at_op2 = phase == PH_OP2
    is_pfx = at_op & (pfx == 1)
    is_esc = at_op & (b == 0x0F) & ~is_pfx
    is_op1 = at_op & ~is_pfx & ~is_esc
    has_m = jnp.where(is_op1, m1, m2)
    imm = jnp.where(is_op1, i1, i2).astype(jnp.uint32)
    opc = jnp.where(at_op2, b | jnp.uint32(0x100), b)
    new_op = jnp.where(is_op1 | at_op2, opc, op)

    # ModRM byte: displacement size from (mod, rm); SIB when rm=4, mod<3
    mod = (b >> jnp.uint32(6)) & 3
    rm = b & jnp.uint32(7)
    disp = jnp.where(mod == 1, 1,
                     jnp.where(mod == 2, 4,
                               jnp.where((mod == 0) & (rm == 5), 4, 0)
                               )).astype(jnp.uint32)
    need_sib = (rm == 4) & (mod != 3)
    at_mr = phase == PH_MODRM
    at_sib = phase == PH_SIB
    # SIB with base=5, mod=0 adds disp32 (mod is in the saved modrm)
    sib_extra = jnp.where(
        ((b & jnp.uint32(7)) == 5) & ((modrm >> jnp.uint32(6)) == 0),
        jnp.uint32(4), jnp.uint32(0))
    at_tail = phase == PH_TAIL

    started = is_op1 | at_op2
    new_pimm = jnp.where(started, imm, pimm)
    new_modrm = jnp.where(at_mr, b, jnp.where(started, 0, modrm))

    # phase transitions
    nxt = jnp.where(
        is_pfx, PH_OP,
        jnp.where(is_esc, PH_OP2,
                  jnp.where(started,
                            jnp.where(has_m == 1, PH_MODRM,
                                      jnp.where(imm > 0, PH_TAIL, PH_OP)),
                            phase))).astype(jnp.uint32)
    tail_after_mr = disp + new_pimm
    nxt = jnp.where(at_mr,
                    jnp.where(need_sib, PH_SIB,
                              jnp.where(tail_after_mr > 0, PH_TAIL, PH_OP)),
                    nxt)
    new_rem = jnp.where(started, imm, rem)
    new_rem = jnp.where(at_mr, tail_after_mr, new_rem)
    tail_after_sib = rem + sib_extra
    nxt = jnp.where(at_sib,
                    jnp.where(tail_after_sib > 0, PH_TAIL, PH_OP), nxt)
    new_rem = jnp.where(at_sib, tail_after_sib, new_rem)
    dec = at_tail & (rem > 0)
    new_rem = jnp.where(dec, rem - 1, new_rem)
    nxt = jnp.where(dec, jnp.where(rem - 1 > 0, PH_TAIL, PH_OP), nxt)

    done = nxt == PH_OP                      # next byte starts fresh
    new_ipos = jnp.where(done, jnp.uint32(0),
                         jnp.minimum(ipos + 1, jnp.uint32(15)))
    new_opln = jnp.where(started, jnp.minimum(ipos + 1, jnp.uint32(15)),
                         opln)
    lastjmp = jnp.where(started & (jj == 1) & is_op1, jnp.uint32(1),
                        jnp.where(done, jnp.uint32(0),
                                  st["lastjmp"]))
    pop = jnp.where(started, op, st["pop"])
    pop2 = jnp.where(started, st["pop"], st["pop2"])
    ophist = jnp.where(
        started,
        st["ophist"] * jnp.uint32(0x2545F491) + opc + jnp.uint32(1),
        st["ophist"])
    return {"phase": nxt, "rem": jnp.minimum(new_rem, jnp.uint32(15)),
            "pimm": new_pimm, "op": new_op, "modrm": new_modrm,
            "ipos": new_ipos, "opln": new_opln, "lastjmp": lastjmp,
            "pop": pop, "pop2": pop2, "ophist": ophist}


def x86_ctx_vals(st):
    """Context values (B, 4) uint32 + mixer gate (B,) in [0, 64).

    1. (opcode, position-in-instruction) -- the workhorse code context
    2. (opcode, ModRM) -- addressing-mode-aware
    3. (phase, remaining tail bytes, last byte class of opcode)
    4. (opcode, in-jump flag, position) -- call/jump target bytes
    """
    from cmix_tpu.contexts.hashes import mix32
    op, ipos = st["op"], st["ipos"]
    v1 = mix32(op * jnp.uint32(16) + ipos, jnp.uint32(0xE8A3C51D))
    v2 = mix32(op, st["modrm"] + jnp.uint32(0x200))
    v3 = mix32(st["phase"] * jnp.uint32(16) + st["rem"],
               op & jnp.uint32(0xF0))
    v4 = mix32(op * jnp.uint32(32) + st["lastjmp"] * jnp.uint32(16)
               + ipos, jnp.uint32(0x9D5F3A2B))
    gate = (st["phase"] * jnp.uint32(16)
            + jnp.minimum(st["rem"], jnp.uint32(15))) & jnp.uint32(63)
    return jnp.stack([v1, v2, v3, v4], axis=1), gate


def x86_ext_vals(st):
    """Opcode-stream contexts (B, 2): (prev op, op, pos) bigram and the
    rolling opcode-history hash crossed with position (the exeModel's
    opcode n-gram class)."""
    from cmix_tpu.contexts.hashes import mix32
    v5 = mix32(st["pop"] * jnp.uint32(0x600) + st["op"] * jnp.uint32(2)
               + jnp.minimum(st["ipos"], jnp.uint32(1)),
               jnp.uint32(0x7F4A7C15))
    v6 = mix32(st["ophist"],
               st["ipos"] + jnp.uint32(0x61C88647))
    return jnp.stack([v5, v6], axis=1)


def x86_ext_vals2(st):
    """Deeper exeModel-class contexts (B, 2), active at X86X>=2:
    the opcode TRIGRAM (exeModel keeps a cache of recent opcodes and
    hashes several-deep opcode n-grams, src/models/paq8.cpp:6590-7546)
    and (opcode, ModRM reg field, phase) -- the /r field selects the
    sub-operation for the 0x80/0xC0/0xF6/0xFE opcode groups, so it IS
    part of the effective opcode."""
    from cmix_tpu.contexts.hashes import mix32
    v7 = mix32(mix32(st["pop2"], st["pop"] + jnp.uint32(0x8F1B)),
               st["op"] * jnp.uint32(4)
               + jnp.minimum(st["ipos"], jnp.uint32(3)))
    v8 = mix32(st["op"] * jnp.uint32(64)
               + ((st["modrm"] >> jnp.uint32(3)) & jnp.uint32(7))
               * jnp.uint32(8) + st["phase"],
               jnp.uint32(0xC2B2AE35))
    return jnp.stack([v7, v8], axis=1)
