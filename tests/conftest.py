import os
import sys

# Force an 8-device virtual CPU mesh for sharding tests; must be set before
# jax import anywhere in the test process.
# The shell exports JAX_PLATFORMS=axon (TPU); tests must run on CPU with a
# virtual 8-device mesh, so override unconditionally.  jax is already
# imported by a pytest plugin at this point (its config snapshotted the env),
# so update the live config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Install the WORKING gurobipy facade before any test imports the reference's
# cycle_decomposition (several fixtures do `if "gurobipy" not in sys.modules`
# stubbing — this must win regardless of test order so the reference MIQP
# differentials get a real solver, not an empty stub).
import coral_tpu.graph.gurobi_compat as _gurobi_compat  # noqa: E402

sys.modules.setdefault("gurobipy", _gurobi_compat)

import pytest  # noqa: E402

# Test tiers: every reference-as-oracle module (they import and run the
# reference pipeline in-process — the bulk of suite wall-clock) is marked
# `differential` automatically.  Quick edit loop:
#   python -m pytest tests/ -q -m "not differential"     (< ~2 min)
# The driver / CI run the full suite (no -m filter).
_DIFFERENTIAL_FILES = ("test_reference_", "test_gbm39_parity")


def pytest_collection_modifyitems(config, items):
    mark = pytest.mark.differential
    for item in items:
        if any(tag in item.nodeid for tag in _DIFFERENTIAL_FILES):
            item.add_marker(mark)
