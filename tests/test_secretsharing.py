"""Secret-sharing substrate tests: Pedersen VSS round trip, complaint
path, dealer disqualification, recovery, DKG over Naor-Yung PlainKeys,
independent generators — the equivalent of the reference demos
DemoPedersen / DemoPedersenSequential / DemoPlainKeys / DemoDKG /
DemoIndependentGenerator (reference: Makefile.am:83-95 demo order).
"""

import threading

import pytest

from vmn_tpu.arith.pgroup import ModPGroup
from vmn_tpu.crypto.randomsource import SeededSource
from vmn_tpu.eio.bytetree import leaf
from vmn_tpu.protocol.com.board import LocalBoardHub
from vmn_tpu.protocol.context import ProtocolContext, ProtocolParams
from vmn_tpu.protocol.distr.dkg import evaluate_poly_in_exp, run_dkg
from vmn_tpu.protocol.distr.indgen import (
    independent_generators_i,
    run_independent_generator,
)
from vmn_tpu.protocol.distr.plainkeys import run_plainkeys
from vmn_tpu.protocol.secretsharing import (
    recover_secret,
    run_pedersen,
    run_pedersen_sequential,
)

K, T = 3, 2


def _ctx(k=K, t=T):
    return ProtocolContext(
        ProtocolParams(
            sid="SS", k=k, threshold=t, pgroup=ModPGroup.named("test256")
        )
    )


def _run(k, fn):
    """Run fn(j, board, rs) in k threads; return 1-based results list."""
    hub = LocalBoardHub(k)
    results = [None] * (k + 1)
    errors = []

    def run(j):
        try:
            results[j] = fn(j, hub.board(j), SeededSource(f"p{j}".encode()))
        except Exception:  # noqa: BLE001
            import traceback

            errors.append(traceback.format_exc())

    threads = [
        threading.Thread(target=run, args=(j,), daemon=True)
        for j in range(1, k + 1)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors[0]
    return results


def test_pedersen_roundtrip_and_recovery():
    ctx = _ctx()

    def party(j, board, rs):
        res = run_pedersen(ctx, board, rs, dealer=1)
        assert res.ok
        # share consistency: g^share == poly(j)
        g = ctx.pgroup.g
        assert g.exp(res.share).equals(
            evaluate_poly_in_exp(res.poly_in_exp, j)
        )
        secret = recover_secret(ctx, board, res, group=ctx.pgroup)
        return res.constant_in_exp.to_ints(), secret.to_int()

    results = _run(K, party)
    consts = {tuple(r[0]) for r in results[1:]}
    secrets = {r[1] for r in results[1:]}
    assert len(consts) == 1 and len(secrets) == 1
    # recovered secret matches the public constant term g^secret
    grp = ctx.pgroup
    assert pow(grp.g_int, secrets.pop(), grp.p) == consts.pop()[0]


def test_pedersen_complaint_path():
    """A corrupted share triggers a complaint; the dealer opens the
    share publicly, the complainer adopts it, dealer stays qualified
    (reference: Pedersen.java receiveShare complaint branch)."""
    ctx = _ctx()

    class CorruptTo3:
        def encrypt(self, to_party, data):
            return b"garbage" if to_party == 3 else data

        def decrypt(self, data):
            if data == b"garbage":
                raise ValueError("cannot decrypt")
            return data

    def party(j, board, rs):
        cipher = CorruptTo3() if j == 1 else CorruptTo3()
        res = run_pedersen(ctx, board, rs, dealer=1, cipher=cipher)
        assert res.ok
        g = ctx.pgroup.g
        assert g.exp(res.share).equals(
            evaluate_poly_in_exp(res.poly_in_exp, j)
        )
        return res.constant_in_exp.to_ints()

    results = _run(K, party)
    assert len({tuple(r) for r in results[1:]}) == 1


def test_pedersen_bad_dealer_disqualified():
    """A dealer publishing a malformed polynomial is replaced by the
    trivial sharing of 0, deterministically for every party."""
    ctx = _ctx()

    def party(j, board, rs):
        if j == 1:  # malicious dealer publishes garbage
            b = board.scope("ped01")
            b.publish("Polynomial", b"\xff\x00garbage")
            for i in range(1, K + 1):
                b.publish(f"Share{i:02d}", b"junk")
            b.publish("Complaint", b"\x00")
            return None
        res = run_pedersen(ctx, board, rs, dealer=1)
        assert not res.ok
        assert res.share.to_int() == 0
        return res.poly_in_exp.to_ints()

    results = _run(K, party)
    # trivial polynomial: all ones
    for r in results[2:]:
        assert all(x == 1 for x in r)


def test_sequential_collapse_and_dkg_with_plainkeys():
    ctx = _ctx()

    def party(j, board, rs):
        pk = run_plainkeys(ctx, board, rs)
        assert all(pk.pkeys[l] is not None for l in range(1, K + 1))
        cipher = pk.cipher(rs)
        dkg = run_dkg(ctx, board, rs, cipher)
        g = ctx.pgroup.g
        # share lies on the joint polynomial
        assert g.exp(dkg.secret_share).equals(
            evaluate_poly_in_exp(dkg.poly_in_exp, j)
        )
        return dkg.joint_public_key.to_ints()

    results = _run(K, party)
    assert len({tuple(r) for r in results[1:]}) == 1


def test_independent_generator_joint():
    ctx = _ctx()

    def party(j, board, rs):
        h, seq = run_independent_generator(ctx, board, rs)
        assert len(seq.qualified) == K
        assert h.is_in_group()
        return h.to_ints()

    results = _run(K, party)
    vals = {tuple(r) for r in results[1:]}
    assert len(vals) == 1
    assert vals.pop()[0] != ctx.pgroup.g_int


def test_independent_generators_interactive():
    from vmn_tpu.protocol.coinflip import CoinFlipPRingSource

    ctx = _ctx()
    n = 5

    def party(j, board, rs):
        src = CoinFlipPRingSource(ctx, board.scope("coins"), rs)
        gens = independent_generators_i(ctx, src, n)
        assert gens.is_in_group()
        return gens.to_ints()

    results = _run(K, party)
    assert len({tuple(r) for r in results[1:]}) == 1


def test_coinflip_vss_recovery_with_byzantine_party():
    """A party that publishes garbage at coin opening cannot block the
    flip: the coin is recovered from the remaining threshold shares
    (reference: CoinFlipPRing.getCoin -> Pedersen.recover semantics)."""
    from vmn_tpu.protocol.coinflip import CoinFlipPRingSource

    ctx = _ctx()

    class _EvilBoard:
        """Wraps a board scope; corrupts THIS party's opened share."""

        def __init__(self, inner):
            self.inner = inner

        def __getattr__(self, name):
            return getattr(self.inner, name)

        def scope(self, name):
            return _EvilBoard(self.inner.scope(name))

        def publish(self, label, data):
            if label == "Share" and "open" in getattr(
                self.inner, "prefix", ""
            ):
                data = b"\x00garbage"
            self.inner.publish(label, data)

    def party(j, board, rs):
        b = board.scope("coins")
        if j == K:  # last party mis-opens its coin share
            b = _EvilBoard(b)
        src = CoinFlipPRingSource(ctx, b, rs)
        return src.coin_bytes(16)

    results = _run(K, party)
    vals = {r for r in results[1:]}
    assert len(vals) == 1  # all parties agree despite the cheater
    assert len(vals.pop()) == 16
