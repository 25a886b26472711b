"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
CPU platform to expose 8 virtual devices (SURVEY.md §4's multi-chip test
strategy). The session environment pins JAX_PLATFORMS=axon (the TPU tunnel)
via a sitecustomize hook, so the platform must be forced through
jax.config *after* importing jax — env vars alone are overridden.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="module", autouse=True)
def _bounded_compiler_state():
    """Drop accumulated jit executables between test modules.

    Past ~400 tests of retained executables the XLA CPU compiler starts
    segfaulting inside backend_compile on the suite's larger unrolled
    programs (observed three times, at whichever late module compiles
    next — test_workflow twice, test_umbrella once; every module passes
    in isolation). Clearing per module re-compiles shared programs but
    keeps the compiler's memory bounded and the suite deterministic.
    """
    jax.clear_caches()
    yield


def pytest_addoption(parser):
    parser.addoption(
        "--full",
        action="store_true",
        default=False,
        help="run the full suite including slow-tier tests "
        "(golden co-training, subprocess parity, workflow drivers)",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: the default run skips ``slow``-marked tests so an
    iteration loop pays minutes, not the full golden/workflow cost. Run
    everything with ``--full`` (or select the slow tier alone with
    ``-m slow``). No test is ever deleted — only deferred."""
    if config.getoption("--full") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: run with --full (or -m slow)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
