"""All experimental env gates enabled at once: the interaction oracle.

Gates are module-level constants read at import, so this drives the real
CLI in a subprocess with every gate on.  Catches shape/index clashes
between gated features (each is round-trip-tested alone when added; this
covers the combination).
"""

import os
import subprocess
import sys


def test_all_gates_roundtrip(tmp_path):
    src = tmp_path / "in.bin"
    # mixed content: text with table rows + binary tail
    row = b"| alpha | beta | 1234 |\n"
    data = (b"Some prose first. " * 40 + row * 60
            + bytes(range(256)) * 8)
    src.write_bytes(data)
    out = tmp_path / "out.tcmx"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": "/root/repo",
        "MIX_AUX": "1", "MIX_DYN2": "1", "MIX_KIND": "1",
        "VMATCH": "1", "LMS": "1", "BANK_CH": "3", "WIKI": "1",
        "PPM_EXCL": "1", "SBANK_ADAPT": "1", "X86X": "1",
        "APM2X": "1",
    })
    r = subprocess.run(
        [sys.executable, "-m", "cmix_tpu.runner", "t", str(src),
         str(out), "--block-size", "2048", "--tbits", "12",
         "--lstm", "0", "--max-batch", "4"],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
