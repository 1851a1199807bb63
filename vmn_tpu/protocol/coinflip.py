"""Joint coin flipping and the interactive challenger.

Rebuild of the reference's interactive-proof substrate
(reference: CoinFlipPRingSource.java:66 — joint randomness via
commit-then-open coin flipping; ChallengerI.java:39 — interactive
challenges pulled from the coin-flip source).

Construction: for each round, every party commits
H(domain || j || round || seed_j) to 32 random bytes, then opens; the
round's coins are PRG(H(round || seed_1 || ... || seed_k)) — unbiased
if at least one party is honest.  A party that fails to open correctly
is excluded and flagged (the reference recovers such seeds from
Pedersen VSS shares; here mis-opening is treated as a protocol fault —
the active-set machinery removes the party).

All parties execute challenge rounds in the same global order, so the
per-scope round counter keeps them aligned.
"""

from __future__ import annotations

import struct
from typing import Optional

from vmn_tpu.crypto.hash import SHA256, Hashfunction
from vmn_tpu.crypto.prg import PRGHeuristic
from vmn_tpu.protocol.com.board import BulletinBoard

_DOMAIN = b"vmn_tpu.coinflip.v1"


class CoinFlipError(Exception):
    pass


class CoinFlipPRingSource:
    """Joint coin-flip source over a bulletin-board scope."""

    def __init__(self, board: BulletinBoard, randomsource,
                 hf: Hashfunction = SHA256):
        self.board = board
        self.rs = randomsource
        self.hf = hf
        self.round = 0

    def coin_bytes(self, n: int) -> bytes:
        """Flip one round and expand to n bytes."""
        rid = self.round
        self.round += 1
        b = self.board
        j = b.j
        seed = self.rs.read_bytes(32)
        com = self.hf.hash(
            _DOMAIN + struct.pack(">II", j, rid) + seed
        )
        b.publish(f"CFCommit{rid}", com)

        commits = {}
        for l in range(1, b.k + 1):
            commits[l] = (
                com if l == j else b.wait_for(l, f"CFCommit{rid}")
            )

        b.publish(f"CFOpen{rid}", seed)
        seeds = {}
        for l in range(1, b.k + 1):
            s = seed if l == j else b.wait_for(l, f"CFOpen{rid}")
            want = self.hf.hash(
                _DOMAIN + struct.pack(">II", l, rid) + s
            )
            if want != commits[l]:
                raise CoinFlipError(f"party {l} mis-opened commitment")
            seeds[l] = s

        joined = self.hf.hash(
            struct.pack(">I", rid)
            + b"".join(seeds[l] for l in range(1, b.k + 1))
        )
        prg = PRGHeuristic(self.hf)
        prg.set_seed(joined)
        return prg.read_bytes(n)

    def coin_int(self, nbits: int) -> int:
        nbytes = (nbits + 7) // 8
        raw = bytearray(self.coin_bytes(nbytes))
        extra = 8 * nbytes - nbits
        if extra:
            raw[0] &= 0xFF >> extra
        return int.from_bytes(raw, "big")


class ChallengerI:
    """Interactive challenger: challenges are jointly flipped coins
    (reference: ChallengerI.java:53-60 — the data argument is unused,
    the prover's messages are already on the board when the flip
    happens)."""

    def __init__(self, source: CoinFlipPRingSource):
        self.source = source

    def challenge(self, data, vbitlen: int, rbitlen: int = 0) -> bytes:
        nbytes = (vbitlen + 7) // 8
        raw = bytearray(self.source.coin_bytes(nbytes))
        extra = 8 * nbytes - vbitlen
        if extra:
            raw[0] &= 0xFF >> extra
        return bytes(raw)
