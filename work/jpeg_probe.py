"""Engine ratio on a real JPEG: recoded vs pass-through.

Usage: jpeg_probe.py [jpeg_path]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/.cache/uv/archive-v0/bkR2mW-tl5zRXjZ0kWF47/matplotlib/" \
    "mpl-data/sample_data/grace_hopper.jpg"


def main():
    from cmix_tpu.engine import EngineConfig
    from cmix_tpu.runner import compress

    with open(path, "rb") as f:
        data = f.read()
    cfg = EngineConfig(block_size=1 << 14, tbits=20, mbits=18, ibits=16,
                       lstm_hidden=256, seg_size=2048)
    for label, env in (("recoded", "1"), ("passthrough", "0")):
        os.environ["CMIX_JPEGC"] = env
        t0 = time.time()
        arch = compress(data, cfg)
        print(f"{label}: {len(data)} -> {len(arch)} "
              f"({len(arch) / len(data):.4f}) in {time.time() - t0:.0f}s",
              flush=True)


main()
