"""vmn_tpu — a TPU-native verifiable mix-net framework.

A from-scratch re-design of the capabilities of Verificatum VMN
(https://github.com/verificatum/verificatum-vmn) for TPU hardware:

- compute core (modular bigint arithmetic, group operations, proof batching)
  runs on TPU via JAX/XLA with Pallas kernels for the hot loops;
- serialization, hashing and protocol orchestration run on the host;
- inter-party communication uses an authenticated bulletin board (HTTP),
  never device collectives — collectives are used only *within* one party's
  pod slice, where trust is uniform.

Layer map (mirrors reference SURVEY.md §1):
  arith/    — multi-limb Montgomery arithmetic + group/field/ring layer
              (reference: VCR com.verificatum.arithm, external to VMN repo)
  ops/      — Pallas TPU kernels and batched multi-exponentiation
              (reference: gmpmee/vec native C layer)
  eio/      — byte-tree canonical serialization
              (reference: VCR com.verificatum.eio)
  crypto/   — hash functions, PRG, random oracle, random sources
              (reference: VCR com.verificatum.crypto)
  protocol/ — El Gamal, zero-knowledge proofs (Terelius–Wikström),
              mix-net sessions, standalone verifier
              (reference: VMN com.verificatum.protocol.*)
  parallel/ — device-mesh sharding of the ciphertext axis
  cli/      — operator tools (vmn/vmni/vmnv/... equivalents)
"""

__version__ = "0.1.0"


def _machine_tag() -> str:
    """Short fingerprint of this host's CPU feature set, used to scope
    the persistent compile cache per machine type."""
    import hashlib
    import platform

    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    ident += " " + " ".join(sorted(line.split()[2:]))
                    break
    except OSError:
        pass
    return "m" + hashlib.sha256(ident.encode()).hexdigest()[:10]


def _enable_persistent_compile_cache():
    """Turn on JAX's persistent compilation cache for every entry point.

    The CI/TPU image pre-imports jax from sitecustomize, so setting
    JAX_COMPILATION_CACHE_DIR in tool scripts after that import is a
    no-op (the config default was already materialized) — which made
    every CLI invocation recompile every program at ~10 s+ per program
    over the device tunnel.  Configuring through jax.config here fixes
    that for bench/CLI/tests alike.  Opt out with VMN_JAX_CACHE=0.
    """
    import os

    flag = os.environ.get("VMN_JAX_CACHE", "1")
    if flag in ("0", "", "off"):
        return
    # Default to a USER-SCOPED directory: a world-shared /tmp path could
    # be pre-created or tampered with by another local user, and JAX does
    # not authenticate cache entries that feed the proof computation.
    default_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "vmn_tpu", "jax"
    )
    cache_dir = (
        flag if flag not in ("1", "on") else
        os.environ.get("JAX_COMPILATION_CACHE_DIR", default_dir)
    )
    # Scope by a host-CPU fingerprint: XLA:CPU AOT entries bake in the
    # compile machine's feature set, and loading one compiled on a
    # different host SEGFAULTS (observed with a shared /tmp cache on
    # heterogeneous CI hosts).
    cache_dir = os.path.join(cache_dir, _machine_tag())
    try:
        if os.path.exists(cache_dir):
            st = os.stat(cache_dir)
            if st.st_uid != os.getuid():
                return  # refuse a directory owned by someone else
        else:
            os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get(
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0"
            )),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

# Version string embedded in proofs.  The reference embeds the VCR version
# (reference: ProtocolElGamal.java:659-683 hashes VCR.version() into the
# global prefix; MixNetElGamalSession.java:102-103 writes it to `version`).
# Proofs produced by this framework are only byte-compatible with a
# reference installation of the same version.
VCR_COMPAT_VERSION = "3.1.0"
