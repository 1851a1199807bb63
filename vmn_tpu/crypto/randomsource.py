"""Sources of (true or seeded) randomness for provers.

Mirrors VCR's RandomSource/RandomDevice.  Prover-side randomness (blinders,
permutation, re-encryption exponents) comes from here; *verifier-side*
randomness is always derived deterministically via the random oracle, so
only provers consume this module.
"""

from __future__ import annotations

import os

from vmn_tpu.crypto.prg import PRGHeuristic
from vmn_tpu.crypto.hash import SHA256


class RandomSource:
    def read_bytes(self, n: int) -> bytes:
        raise NotImplementedError

    def random_int(self, nbits: int) -> int:
        """Uniform integer in [0, 2^nbits)."""
        nbytes = (nbits + 7) // 8
        raw = bytearray(self.read_bytes(nbytes))
        extra = 8 * nbytes - nbits
        if extra:
            raw[0] &= 0xFF >> extra
        return int.from_bytes(raw, "big")

    def random_int_mod(self, modulus: int) -> int:
        """Uniform integer in [0, modulus) by rejection sampling."""
        nbits = modulus.bit_length()
        while True:
            x = self.random_int(nbits)
            if x < modulus:
                return x


class RandomDevice(RandomSource):
    """OS entropy (reference: com.verificatum.crypto.RandomDevice)."""

    MARSHAL_NAME = "com.verificatum.crypto.RandomDevice"

    def read_bytes(self, n: int) -> bytes:
        return os.urandom(n)

    def to_bytetree(self):
        from vmn_tpu.eio.bytetree import string_leaf

        return string_leaf("/dev/urandom")

    @classmethod
    def from_bytetree(cls, bt) -> "RandomDevice":
        return cls()


class SeededSource(RandomSource):
    """Deterministic source for tests and reproducible demos."""

    def __init__(self, seed: bytes):
        self._prg = PRGHeuristic(SHA256)
        self._prg.set_seed(SHA256.hash(seed))

    def read_bytes(self, n: int) -> bytes:
        return self._prg.read_bytes(n)


class DeviceSource(RandomSource):
    """Prover randomness expanded ON THE DEVICE by a keyed PRF.

    Bulk random exponent arrays (re-encryption exponents, bridging-
    commitment blinders) are the largest host->device uploads of a mix:
    ~300 MB per full-width draw at N = 2^20 with a host PRG.  This
    source instead ships only a 256-bit seed and expands it on-device
    with JAX's Threefry-2x32 (20 rounds — the full-strength variant of
    the Salmon et al. counter PRF), so a draw costs a few device ops
    and no bulk transfer.  `FField.random`/`random_bits_raw` dispatch
    to `random_limbs` when the source provides it; everything
    downstream is unchanged.

    Host-side draws (scalars, permutation keys, protocol nonces) come
    from a domain-separated SHA-256 counter PRG over the same seed, so
    a DeviceSource is a drop-in RandomSource.

    Security note (docs/DEVIATIONS.md): this replaces only PRIVATE
    prover randomness.  Verifier challenges and every transcript-
    derived value still ride the reference-exact SHA-256 PRG chain.
    The reference's default source is likewise a heuristic PRG
    (RandomDevice / PRGHeuristic, com.verificatum.crypto).
    """

    def __init__(self, seed: bytes):
        self._seed = SHA256.hash(seed)
        self._prg = PRGHeuristic(SHA256)
        self._prg.set_seed(SHA256.hash(self._seed + b"/host"))
        self._draws = 0

    MARSHAL_NAME = "vmn_tpu.crypto.DeviceSource"

    def read_bytes(self, n: int) -> bytes:
        return self._prg.read_bytes(n)

    def to_bytetree(self):
        from vmn_tpu.eio.bytetree import leaf

        return leaf(self._seed)

    @classmethod
    def from_bytetree(cls, bt) -> "DeviceSource":
        src = cls(b"")
        src._seed = bytes(bt.data)
        src._prg = PRGHeuristic(SHA256)
        src._prg.set_seed(SHA256.hash(src._seed + b"/host"))
        return src

    def random_limbs(self, n: int, bits: int):
        """(n, Lt) uint32 tensor of 16-bit limbs (LSB-first) holding n
        uniform `bits`-bit integers, generated on the default device."""
        import jax

        key = jax.random.key(
            (int.from_bytes(self._seed[:8], "big") ^ 0x5D31C0DE)
            & 0x7FFFFFFFFFFFFFFF
        )
        # fold in the WHOLE 256-bit seed, one 31-bit word at a time
        for i in range(8, 32, 4):
            key = jax.random.fold_in(
                key, int.from_bytes(self._seed[i:i + 4], "big") & 0x7FFFFFFF
            )
        draw = self._draws
        self._draws += 1
        return _prf_limbs(key, draw, n, bits)


import functools as _functools  # noqa: E402

import jax as _jax  # noqa: E402


@_functools.partial(_jax.jit, static_argnames=("n", "bits"))
def _prf_limbs(key, draw, n: int, bits: int):
    """One fused device program: Threefry words -> masked 16-bit limbs.

    Kept OUT of the method so the expansion (stack/reshape/mask) fuses
    into a single XLA executable — dispatched op-by-op the intermediate
    materializations cost ~10x the PRF itself at N = 2^20.
    """
    import jax
    import jax.numpy as jnp

    from vmn_tpu.arith.limbs import LIMB_BITS, num_limbs

    key = jax.random.fold_in(key, draw)
    Lt = num_limbs(bits)
    nw = (Lt + 1) // 2  # 32-bit words
    words = jax.random.bits(key, (n, nw), jnp.uint32)
    limbs = jnp.stack(
        [words & 0xFFFF, words >> LIMB_BITS], axis=-1
    ).reshape(n, 2 * nw)[:, :Lt]
    top = bits - LIMB_BITS * (Lt - 1)
    if top < LIMB_BITS:
        row = jnp.full((Lt,), 0xFFFF, jnp.uint32).at[Lt - 1].set(
            (1 << top) - 1
        )
        limbs = limbs & row
    return limbs


from vmn_tpu.eio.marshal import register as _register  # noqa: E402

_register(RandomDevice.MARSHAL_NAME)(RandomDevice)
_register(DeviceSource.MARSHAL_NAME)(DeviceSource)
