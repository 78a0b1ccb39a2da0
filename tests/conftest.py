"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference repo ships zero tests (SURVEY.md §4); this suite is the
framework's quality gate.  Multi-device behavior is exercised on CPU via
``xla_force_host_platform_device_count`` — the standard substitute for a
real TPU pod in unit tests.
"""

import os

# Must be set before jax initializes.  Force-override: the surrounding
# environment may point JAX at a (single) real TPU via a tunnel
# (JAX_PLATFORMS=axon, set again by a sitecustomize hook that calls
# jax.config.update at interpreter start); unit tests always run on the
# virtual CPU mesh, so override both the env var AND the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()


# ---------------------------------------------------------------------------
# Fast-by-default suite: tests marked `slow` (the scratch-torch golden
# towers, multi-minute on this 1-core box) are deselected unless --runslow
# is given.  `pytest tests/ -q` is the fast gate; `pytest tests/ --runslow`
# is the full gate (run at least once per round).
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full gate)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
