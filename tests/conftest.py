"""Test harness: force an 8-virtual-device CPU platform.

Mirrors SURVEY.md section 4's plan: multi-chip behavior is validated on a
virtual CPU mesh; real-TPU runs happen in bench.py.  The axon
sitecustomize imports jax at interpreter start, so the env var alone is
latched -- update the live config too (before any backend is created).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    # Suite budget (VERDICT r3 #10): the default run completes in
    # <10 min on this 2-vCPU box; the heavy roundtrip/scale matrix runs
    # with RUN_SLOW=1 (full format coverage, ~25+ min).
    config.addinivalue_line(
        "markers", "slow: heavy roundtrip/scale cases (see RUN_SLOW)")


def pytest_collection_modifyitems(config, items):
    # slow cases are skipped unless RUN_SLOW=1 (or an explicit -m
    # selection asks for them), so a plain `pytest tests/` IS the fast
    # suite -- the documented behavior, not a convention the caller
    # must remember
    import pytest as _pytest
    run_slow = os.environ.get("RUN_SLOW") not in (None, "", "0")
    mexpr = config.getoption("-m") or ""
    # only a marker expression that actually mentions 'slow' takes over
    # gating; e.g. `-m foo` must not silently enable the slow matrix
    if run_slow or "slow" in mexpr:
        return
    skip = _pytest.mark.skip(reason="slow; set RUN_SLOW=1 to enable")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
