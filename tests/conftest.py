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
# Persist only compiles worth >=2 s: the XLA:CPU AOT serializer in this
# jaxlib build segfaults intermittently (upstream bug — observed in
# executable.serialize() during cache writes and in the deserializer
# during reads, all under the compile lock below).  Caching only the
# expensive programs keeps warm suite runs fast while cutting the
# number of (de)serialize calls ~10x.
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

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


def _protocol_threads_live() -> bool:
    """True when worker threads (multi-party protocol tests) are live.

    Daemon threads (board hint loops) and ThreadPoolExecutor workers
    (the verifier's membership pool) don't count — they only wait or
    run host-side native code.
    """
    cur = _threading.current_thread()
    if cur is not _threading.main_thread():
        return True
    for t in _threading.enumerate():
        if t is cur or t.daemon:
            continue
        if t.name.startswith(("ThreadPoolExecutor", "MainThread")):
            continue
        return True
    return False


def _install_compile_lock():
    from jax._src import compilation_cache as _jcc
    from jax._src import compiler as _jcompiler

    # Segfaults were observed in the XLA:CPU AOT serializer AND
    # deserializer, exclusively while multi-party protocol tests had
    # other threads executing XLA programs (a compile lock alone did
    # not stop them, so the (de)serializer appears unsafe against
    # concurrent *execution*, not just compilation).  While protocol
    # worker threads are live, bypass persistent-cache reads and
    # writes entirely; the in-process pjit cache still dedupes.
    # (jax.config.update is NOT enough: is_cache_used() memoizes.)
    orig_get = _jcc.get_executable_and_time
    orig_put = _jcc.put_executable_and_time

    def gated_get(*a, **kw):
        if _protocol_threads_live():
            return None, None
        return orig_get(*a, **kw)

    def gated_put(*a, **kw):
        if _protocol_threads_live():
            return None
        return orig_put(*a, **kw)

    _jcc.get_executable_and_time = gated_get
    _jcc.put_executable_and_time = gated_put

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
