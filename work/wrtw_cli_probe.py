"""WRTW full-CLI A/B on dict-mode natural text: includes the WRT
transform AND dictionary pretraining (the path where WRTW=2's
letter-identity unification with the pretrained stream can pay).
Set WRTW_ROUTE=1/2 outside; prints one line."""
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

    name = os.environ.get("FILE", "nat1m")
    data = open(f"/root/repo/testdata/{name}.raw", "rb").read()
    cfg = EngineConfig(block_size=1 << 17, tbits=22, mbits=20, ibits=18,
                       pbits=22, lstm_hidden=256, seg_size=2048)
    t0 = time.time()
    arch = runner.compress(
        data, cfg, max_batch=8,
        dictionary="/root/repo/cmix_tpu/data/english.dic")
    bpb = 8 * len(arch) / len(data)
    print(f"{name}-cli={bpb:.4f} ({time.time() - t0:.0f}s, "
          f"WRTW_ROUTE={os.environ.get('WRTW_ROUTE', '1')})", flush=True)


main()
