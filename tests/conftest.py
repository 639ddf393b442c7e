"""Test configuration: force JAX onto CPU with 8 virtual devices so the whole
suite (including multi-chip sharding tests) runs without TPU hardware, per
SURVEY section 4 (e).

NOTE: in this environment jax is pre-imported at interpreter start with
JAX_PLATFORMS=axon (a remote TPU tunnel).  Setting env vars alone is too
late; we must override via jax.config BEFORE the backend is first used.
Running unit tests over the tunnel is pathologically slow (every dispatch is
a network round trip) -- bench.py, by contrast, intentionally uses the real
TPU backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the pinned-golden test compiles a full CIF
# rate-controlled scan (~2.5 min cold on CPU); cache hits make suite
# re-runs cheap.  Correctness-neutral (caches compiled artifacts only).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("P64_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the CPU backend; got "
        f"{jax.default_backend()} -- the axon/TPU tunnel would make the "
        "suite pathologically slow")
    assert jax.device_count() == 8, jax.device_count()
