"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on virtual CPU devices (the driver separately dry-run-compiles
the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# The CI image pre-imports jax via sitecustomize with JAX_PLATFORMS=axon
# (remote TPU tunnel), so env setdefault is not enough: override the
# already-imported config before any backend initializes.  Running the
# suite over the tunnel makes every dispatch a network round-trip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import pytest  # noqa: E402

# Serialize XLA:CPU compilation + persistent-cache writes across
# threads: multi-party tests compile from k threads at once, and the
# XLA:CPU AOT executable (de)serializer in this jaxlib build segfaults
# intermittently under concurrent compile/serialize (observed twice in
# full-suite runs, both inside compile_or_get_cached on worker
# threads).  A process-wide lock costs a little parallel-compile time
# and removes the crash window.
import threading as _threading  # noqa: E402

_compile_lock = _threading.RLock()


def _install_compile_lock():
    from jax._src import compiler as _jcompiler

    # compile_or_get_cached covers cache READ (AOT deserialize), the
    # compile itself, and the cache WRITE (AOT serialize) — crashes
    # were observed in all three under thread concurrency.
    orig = _jcompiler.compile_or_get_cached

    def locked(*a, **kw):
        with _compile_lock:
            return orig(*a, **kw)

    _jcompiler.compile_or_get_cached = locked


_install_compile_lock()


@pytest.fixture(scope="session")
def small_group():
    """A small (256-bit) safe-prime group for fast protocol tests."""
    from vmn_tpu.arith.pgroup import ModPGroup

    return ModPGroup.named("test256")


@pytest.fixture(scope="session")
def modp2048():
    from vmn_tpu.arith.pgroup import ModPGroup

    return ModPGroup.named("modp2048")
