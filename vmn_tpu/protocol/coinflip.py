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
        # When set, the first collect tops the prepared pool up to this
        # many coins in one dealing burst (reference: prepareCoins,
        # CoinFlipPRingSource.java:153).  Identical on every party, so
        # the dealing schedule stays in lockstep.
        self.pre_target = 0

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
        """Recover one prepared coin (see _collect_many)."""
        return self._collect_many(1)[0]

    def _collect_many(self, ncoins: int):
        """Recover `ncoins` prepared coins in ONE board round: every
        party opens ALL its collapsed shares in a single message; any
        `threshold` Feldman-valid shares reconstruct each coin
        (reference: CoinFlipPRing.getCoin -> pedersen.recover;
        the per-batch round amortizes the open exchange the way
        prepareCoins amortizes dealing, CoinFlipPRingSource.java:
        153-232)."""
        from vmn_tpu.eio.bytetree import ByteTree, ByteTreeError, node
        from vmn_tpu.protocol.distr.dkg import evaluate_poly_in_exp
        from vmn_tpu.protocol.secretsharing.shamir import shamir_recover

        want = max(ncoins, self.pre_target)
        self.pre_target = 0  # one pre-dealt burst per session
        if len(self._prepared) < want:
            self.prepare_coins(want - len(self._prepared))
        batch = [self._prepared.pop(0) for _ in range(ncoins)]
        b = self.board.scope(f"open{batch[0][0]:03d}x{ncoins:03d}")
        t = self.ctx.par.threshold
        ring = self.hom.ring

        my_bytes = node(
            *[seq.share.to_bytetree() for _, seq in batch]
        ).to_bytes()
        b.publish("Shares", my_bytes)
        shares = [dict() for _ in batch]
        for l in range(1, self.board.k + 1):
            if all(len(s) >= t for s in shares):
                break
            raw = my_bytes if l == self.board.j else b.wait_for(
                l, "Shares"
            )
            try:
                bt = ByteTree.from_bytes(raw)
                kids = list(bt.children)
            except (ByteTreeError, ValueError):
                continue
            if len(kids) != ncoins:
                continue
            for i, (cid, seq) in enumerate(batch):
                if len(shares[i]) >= t:
                    continue
                try:
                    s = ring.from_bytetree(kids[i])
                except (ByteTreeError, ValueError):
                    continue
                if self.hom.g.exp(s).equals(
                    evaluate_poly_in_exp(seq.poly_in_exp, l)
                ):
                    shares[i][l] = s
        out = []
        for i in range(ncoins):
            if len(shares[i]) < t:
                raise CoinFlipError(
                    "fewer than threshold valid coin shares"
                )
            pair = shamir_recover(ring, shares[i], t)
            out.append(pair.components[0])  # project(0), ref getCoin
        return out

    def coin_bytes(self, n: int) -> bytes:
        """Concatenate recovered ring coins into n bytes.

        Each coin yields floor((qbits - rbitlen)/8) bytes to keep the
        statistical distance bound (reference: getCoinBytes
        CoinFlipPRingSource.java:232).  All coins for the request are
        recovered in one batched open round."""
        q = self.ctx.pgroup.ring.q
        per = max(1, (q.bit_length() - self.ctx.rbitlen) // 8)
        qbytes = (q.bit_length() + 7) // 8
        ncoins = -(-n // per)
        out = b""
        for coin in self._collect_many(ncoins):
            out += coin.to_int().to_bytes(qbytes, "big")[-per:]
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
