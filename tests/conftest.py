"""Test configuration: run everything on a virtual 8-device CPU mesh.

jax is preloaded at interpreter start (sitecustomize registers the TPU
backend), so platform/x64 selection must go through ``jax.config.update``
— environment variables are too late.  Multi-chip sharding is validated
without TPU hardware via 8 virtual CPU devices; the driver separately
dry-runs the multi-chip path through ``__graft_entry__.dryrun_multichip``.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end solves (deselect with -m 'not slow')"
    )
