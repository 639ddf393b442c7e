"""Test configuration: force JAX onto CPU with 8 virtual devices so the whole
suite (including multi-chip sharding tests) runs without TPU hardware, per
SURVEY section 4 (e).  Must run before jax is imported anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
