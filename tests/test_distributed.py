"""Multi-host plumbing + profiling subsystem tests (virtual device mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from cmix_tpu.parallel.distributed import (
    init_distributed, global_mesh, host_block_span, make_ordered_gather,
    broadcast_state, gather_streams)
from cmix_tpu.utils.profiling import Meter, Progress, trace


def test_init_single_process():
    nproc, pid = init_distributed()
    assert nproc == 1 and pid == 0


def test_host_block_span_covers_all():
    lo, hi = host_block_span(13)
    assert (lo, hi) == (0, 13)


def test_global_mesh_axes():
    mesh = global_mesh(n_dp=4, n_tp=2)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (4, 2)


def test_ordered_gather_identity_and_order():
    mesh = global_mesh(n_dp=8, n_tp=1)
    g = make_ordered_gather(mesh)
    lens = jnp.arange(8, dtype=jnp.int32) + 1
    payload = (jnp.arange(8 * 16, dtype=jnp.int32)
               .reshape(8, 16).astype(jnp.uint8))
    lens_all, pay_all = g(lens, payload)
    np.testing.assert_array_equal(np.asarray(lens_all), np.asarray(lens))
    np.testing.assert_array_equal(np.asarray(pay_all), np.asarray(payload))


def test_gather_streams_trims_lengths():
    mesh = global_mesh(n_dp=8, n_tp=1)
    payload = np.tile(np.arange(16, dtype=np.uint8)[None], (8, 1))
    lens = np.arange(8, dtype=np.int32) + 1
    streams = gather_streams(mesh, payload, lens)
    assert [len(s) for s in streams] == list(range(1, 9))
    assert streams[3] == bytes(range(4))


def test_broadcast_state_replicates():
    mesh = global_mesh(n_dp=8, n_tp=1)
    state = {"w": np.arange(10, dtype=np.float32), "b": np.float32(3.0)}
    rep = broadcast_state(state, mesh)
    assert rep["w"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(rep["w"]), state["w"])


def test_two_process_gather_and_broadcast():
    """REAL multi-process path (SURVEY section 4): two OS processes, 4
    virtual CPU devices each, one global dp=8 mesh; cross-process
    ordered gather preserves block order and broadcast replicates."""
    import subprocess
    import sys
    import os
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    env["PYTHONPATH"] = "/root/repo"
    coord = "localhost:12473"
    procs = [subprocess.Popen(
        [sys.executable, "/root/repo/tests/mp_worker.py",
         str(r), "2", coord],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for r in range(2)]
    outs = []
    for pr in procs:
        try:
            out, err = pr.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((pr.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0 and "OK" in out, (rc, out, err[-2000:])


def test_meter_report():
    m = Meter()
    with m.phase("compile"):
        pass
    with m.phase("device"):
        sum(range(1000))
    m.add_segment(4096)
    m.bytes, m.out_bytes = 4096, 1024
    r = m.report({"mode": "test"})
    assert r["segments"] == 1 and r["bpb"] == 2.0 and r["mode"] == "test"
    assert "compile" in r["phases_s"] and r["mb_s"] > 0


def test_progress_and_trace_noop(capsys):
    p = Progress(100, interval=0.0)
    p.update(50)
    p.update(100)
    assert "100.00%" in capsys.readouterr().err
    with trace(None):
        pass
