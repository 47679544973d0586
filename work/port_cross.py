"""TPU-encode -> CPU-decode portability proof (PORT=1).

enc mode (run with the axon TPU plugin on PYTHONPATH): compress the
probe file on the REAL TPU chip, write work/port_cross.tcmx.
dec mode (run with JAX_PLATFORMS=cpu, plugin stripped): decode the
archive on CPU and byte-compare -- a different platform, different XLA
backend, different executable.  Bit-exact decode = the portability
contract the reference only achieves with -O3 (README:16).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
MODE = sys.argv[1]
ARCH = "/root/repo/work/port_cross.tcmx"
DATA = "/root/repo/testdata/text100k.raw"


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass
    from cmix_tpu import engine
    from cmix_tpu.engine import EngineConfig
    from cmix_tpu.runner import compress, decompress

    data = open(DATA, "rb").read()
    if MODE == "enc":
        engine.update_gates({"PORT": 1})
        cfg = EngineConfig(block_size=1 << 14, tbits=20, lstm_hidden=0,
                           dmc_nodes=16384, seg_size=2048)  # DMC: integer in PORT (r3)
        print("devices:", jax.devices(), flush=True)
        t0 = time.time()
        arch = compress(data, cfg, max_batch=8)
        open(ARCH, "wb").write(arch)
        print(f"TPU PORT encode: {len(data)} -> {len(arch)} "
              f"bpb={8 * len(arch) / len(data):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    else:
        print("devices:", jax.devices(), flush=True)
        arch = open(ARCH, "rb").read()
        t0 = time.time()
        back = decompress(arch, max_batch=8)
        ok = back == data
        print(f"CPU decode of TPU archive: roundtrip={ok} "
              f"({time.time() - t0:.0f}s)", flush=True)
        assert ok, "CROSS-PLATFORM DECODE MISMATCH"


main()
