"""Test harness: force an 8-virtual-device CPU platform before jax imports.

Mirrors SURVEY.md section 4's plan: multi-chip behavior is validated on a
virtual CPU mesh; real-TPU runs happen in bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")
