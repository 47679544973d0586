"""Single-combo JPEG probe (queue-runner friendly: one compile per
process).  Gates ride the environment like every probe; prints one line
``jpeg=<ratio>``.  Target (VERDICT #5): <= 0.88x original."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass


def main():
    from cmix_tpu.engine import EngineConfig
    import cmix_tpu.runner as runner

    with open("/root/repo/testdata/media/grace_hopper.jpg", "rb") as f:
        data = f.read()
    cfg = EngineConfig(block_size=1 << 14,
                       tbits=int(os.environ.get("TBITS", 20)),
                       mbits=18, ibits=16, lstm_hidden=256, seg_size=2048)
    t0 = time.time()
    arch = runner.compress(data, cfg, max_batch=32)
    print(f"jpeg={len(arch) / len(data):.4f}({time.time() - t0:.0f}s)",
          flush=True)


main()
