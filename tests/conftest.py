"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The reference's test axis is the multi-backend matrix (SURVEY.md section 4);
ours is multi-device: every test runs on 8 virtual CPU devices so sharding /
collective paths are exercised without TPU pod hardware.

Note: this environment registers a TPU backend from sitecustomize before
pytest starts, so the platform must be overridden via jax.config (env vars
alone are not enough).
"""
import os
import sys

# `pytest --tpu` keeps the ambient TPU backend (for the `-m fast` gate
# tier); the env var must be decided before jax import, so peek at argv.
_USE_TPU = "--tpu" in sys.argv

flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU and "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")


def pytest_addoption(parser):
    parser.addoption(
        "--tpu", action="store_true", default=False,
        help="run on the ambient TPU backend instead of the 8-device "
             "virtual CPU mesh (use with `-m fast`: the full suite "
             "compiles too much for the chip tier)")
