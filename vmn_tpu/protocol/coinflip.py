"""Joint coin flipping over the ring, backed by Pedersen VSS.

Rebuild of the reference construction (reference:
CoinFlipPRingSource.java:66, CoinFlipPRing.java:71): a coin is prepared
by every party dealing a random ring pair (s, t) through Pedersen
verifiable secret sharing with commitment polynomial c_m = g^{a_m}h^{b_m}
over an independent generator h (the BiExpProd homomorphism restricted
to (g, h), CoinFlipPRing.java:240-259); the instances are collapsed by
summation.  Collecting the coin publicly *recovers* the joint sharing
from any `threshold` valid shares and projects the first component —
so a party that mis-opens, goes silent, or deals garbage is
disqualified or reconstructed, and can neither block nor bias the coin
(the round-1 hash commit-open sketch raised on any mis-open, letting
one Byzantine party kill every interactive session).

Used by `ChallengerI` for interactive proofs (reference:
ChallengerI.java:53-60).
"""

from __future__ import annotations

from typing import Optional

from vmn_tpu.crypto.hash import SHA256
from vmn_tpu.crypto.prg import PRGHeuristic


class CoinFlipError(Exception):
    pass


class _HomGenerator:
    """The restricted homomorphism (a, b) -> g^a h^b as a 'generator'
    consumed by the Pedersen machinery (reference: BiExpProd restricted
    to (g, h), CoinFlipPRing.java:254-259).  Commitments are plain
    base-group elements; shares/exponents are ring PAIRS."""

    def __init__(self, g, h):
        self._g = g
        self._h = h

    def exp(self, pair):
        a, b = pair.components
        return self._g.exp(a).mul(self._h.exp(b))


class _HomGroup:
    """Group adapter seen by `run_pedersen`: pair ring, hom generator,
    base-group commitments."""

    def __init__(self, base_group, h):
        from vmn_tpu.arith.pgroup import PPRing

        self.base = base_group
        self.ring = PPRing(base_group.ring, base_group.ring)
        self.g = _HomGenerator(base_group.g, h)

    def one(self, shape=()):
        return self.base.one(shape)

    def elem_from_bytetree(self, bt, size=None, validate=True):
        return self.base.elem_from_bytetree(bt, size, validate)


class CoinFlipPRingSource:
    """Joint coin-flip source over a bulletin-board scope.

    `prepare_coins(n)` runs the VSS dealing phase ahead of time
    (reference: prepareCoins CoinFlipPRingSource.java:153); `coin_bytes`
    collects prepared coins (recovery) on demand.
    """

    def __init__(self, ctx, board, randomsource, cipher=None, h=None):
        self.ctx = ctx
        self.board = board
        self.rs = randomsource
        self.cipher = cipher
        base = ctx.pgroup
        if h is None:
            # Independent generator with unknown discrete log, derived
            # via the random oracle (reference seeds the source with the
            # jointly generated IndependentGenerator; an RO generator is
            # the non-interactive equivalent, IndependentGeneratorsRO).
            h = ctx.independent_generators("coinflipgen", 1).get(0)
        self.hom = _HomGroup(base, h)
        self._prepared = []  # list of SequentialResult
        self._counter = 0

    # ------------------------------------------------------------ prepare

    def prepare_coins(self, n: int) -> None:
        """Deal `n` coins ahead of use: every party VSS-shares a random
        pair; instances collapse by summation."""
        from vmn_tpu.protocol.secretsharing.pedersen import (
            run_pedersen_sequential,
        )

        for _ in range(n):
            cid = self._counter
            self._counter += 1
            seq = run_pedersen_sequential(
                self.ctx,
                self.board.scope(f"coin{cid:03d}"),
                self.rs,
                dealers=range(1, self.board.k + 1),
                cipher=self.cipher,
                group=self.hom,
                threshold=self.ctx.par.threshold,
            )
            self._prepared.append((cid, seq))

    # ------------------------------------------------------------ collect

    def _collect(self):
        """Recover one prepared coin: all parties open their collapsed
        shares; any `threshold` Feldman-valid shares reconstruct
        (reference: CoinFlipPRing.getCoin -> pedersen.recover)."""
        from vmn_tpu.eio.bytetree import ByteTree, ByteTreeError
        from vmn_tpu.protocol.distr.dkg import evaluate_poly_in_exp
        from vmn_tpu.protocol.secretsharing.shamir import shamir_recover

        if not self._prepared:
            self.prepare_coins(1)
        cid, seq = self._prepared.pop(0)
        b = self.board.scope(f"open{cid:03d}")
        t = self.ctx.par.threshold
        ring = self.hom.ring

        share_bytes = seq.share.to_bytetree().to_bytes()
        b.publish("Share", share_bytes)
        shares = {}
        for l in range(1, self.board.k + 1):
            raw = share_bytes if l == self.board.j else b.wait_for(
                l, "Share"
            )
            try:
                s = ring.from_bytetree(ByteTree.from_bytes(raw))
            except (ByteTreeError, ValueError):
                continue
            if self.hom.g.exp(s).equals(
                evaluate_poly_in_exp(seq.poly_in_exp, l)
            ):
                shares[l] = s
            if len(shares) == t:
                break
        if len(shares) < t:
            raise CoinFlipError("fewer than threshold valid coin shares")
        pair = shamir_recover(ring, shares, t)
        return pair.components[0]  # project(0), reference getCoin

    def coin_bytes(self, n: int) -> bytes:
        """Concatenate recovered ring coins into n bytes.

        Each coin yields floor((qbits - rbitlen)/8) bytes to keep the
        statistical distance bound (reference: getCoinBytes
        CoinFlipPRingSource.java:232)."""
        q = self.ctx.pgroup.ring.q
        per = max(1, (q.bit_length() - self.ctx.rbitlen) // 8)
        out = b""
        while len(out) < n:
            coin = self._collect()
            val = coin.to_int()
            out += val.to_bytes((q.bit_length() + 7) // 8, "big")[-per:]
        return out[:n]

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
