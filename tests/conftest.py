"""Test environment: force CPU with an 8-device virtual mesh.

SURVEY.md §4 implication: exercise the pjit/shard_map paths without TPUs via
`--xla_force_host_platform_device_count=8`. Must run before jax initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: amortize XLA CPU compiles across test runs.
import jax  # noqa: E402

# The axon sitecustomize pre-sets jax_platforms="axon,cpu" at interpreter
# boot, which beats the env var — force CPU for tests explicitly.
jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ---------------------------------------------------------------------------
# Fast default suite (VERDICT r1 weak #7): this box has ONE cpu core, so the
# heavy e2e tests (gnn trainer, integration miou, train step) dominate the
# ~10 min serial wall time. `pytest -q` runs the fast subset; the slow e2e
# tests run with `pytest --runslow` (or RUN_SLOW=1).
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run @pytest.mark.slow end-to-end tests",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow e2e: run with --runslow / RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
