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

# Version string embedded in proofs.  The reference embeds the VCR version
# (reference: ProtocolElGamal.java:659-683 hashes VCR.version() into the
# global prefix; MixNetElGamalSession.java:102-103 writes it to `version`).
# Proofs produced by this framework are only byte-compatible with a
# reference installation of the same version.
VCR_COMPAT_VERSION = "3.1.0"
