"""Single-process prove/verify round-trips of the proof cores.

Mirrors the reference's unit-test tier (reference:
hvzk/TestPoSCBasicTW.java:1-164 — prove/verify round-trip of the PoSC
core in one process, including failure injection), extended to the PoS
and CCPoS cores.
"""

import pytest

from vmn_tpu.arith.pgroup import Permutation
from vmn_tpu.crypto.hash import Hashfunction
from vmn_tpu.crypto.prg import PRGHeuristic
from vmn_tpu.crypto.randomsource import SeededSource
from vmn_tpu.protocol import elgamal
from vmn_tpu.protocol.hvzk.pos_tw import (
    PoSParams,
    PoSProver,
    PoSVerifier,
)
from vmn_tpu.protocol.hvzk.posc_tw import PoSCProver, PoSCVerifier
from vmn_tpu.protocol.hvzk.ccpos_w import CCPoSProver, CCPoSVerifier

N = 16
SEED = b"\x01" * 32
V_INT = int.from_bytes(b"\x5a" * 16, "big")


def _prg(seed: bytes):
    prg = PRGHeuristic(Hashfunction("SHA-256"))
    prg.set_seed(seed)
    return prg


@pytest.fixture(scope="module")
def setup():
    from vmn_tpu.arith.pgroup import ModPGroup

    grp = ModPGroup.named("test256")
    rs = SeededSource(b"hvzk-test")
    prg = PRGHeuristic(Hashfunction("SHA-256"))
    par = PoSParams(128, 128, 128, prg)
    h = grp.random_array(N, _prg(b"\x02" * 32), 128)
    return grp, rs, prg, par, h


def _commitment(grp, rs, h):
    field = grp.ring
    r = field.random((N,), rs, 128)
    pi = Permutation.random(N, rs)
    u = h.mul(grp.g.exp(r)).permute(pi)
    return r, pi, u


def test_posc_roundtrip(setup):
    grp, rs, prg, par, h = setup
    g = grp.g
    r, pi, u = _commitment(grp, rs, h)

    P = PoSCProver(par, rs)
    P.set_instance(g, h, u, r, pi)
    commitment = P.commit(SEED)

    V = PoSCVerifier(par)
    V.set_instance(g, h, u)
    V.set_batch_vector(SEED)
    V.set_commitment(commitment)
    reply = P.reply(V_INT)
    assert V.verify(reply, V_INT)


def test_posc_rejects_tampered_reply(setup):
    grp, rs, prg, par, h = setup
    g = grp.g
    r, pi, u = _commitment(grp, rs, h)

    P = PoSCProver(par, rs)
    P.set_instance(g, h, u, r, pi)
    commitment = P.commit(SEED)
    V = PoSCVerifier(par)
    V.set_instance(g, h, u)
    V.set_batch_vector(SEED)
    V.set_commitment(commitment)
    reply = P.reply(V_INT)
    # Failure injection (reference: TestPoSCBasicTW failure path):
    # flip the challenge — the reply must no longer verify.
    assert not V.verify(reply, V_INT + 1)


def test_posc_rejects_wrong_commitment_exponents(setup):
    grp, rs, prg, par, h = setup
    g = grp.g
    r, pi, u = _commitment(grp, rs, h)
    # Prover lies: claims different exponents than the commitment's.
    bad_r = grp.ring.random((N,), rs, 128)

    P = PoSCProver(par, rs)
    P.set_instance(g, h, u, bad_r, pi)
    commitment = P.commit(SEED)
    V = PoSCVerifier(par)
    V.set_instance(g, h, u)
    V.set_batch_vector(SEED)
    V.set_commitment(commitment)
    assert not V.verify(P.reply(V_INT), V_INT)


def _keypair(grp, rs):
    x = grp.ring.random((), rs, 0)
    y = grp.g.exp(x)
    return elgamal.ElGamalPublicKey(grp.g, y)


def test_pos_roundtrip_and_tamper(setup):
    grp, rs, prg, par, h = setup
    g = grp.g
    pk = _keypair(grp, rs)
    pk_elem = pk.widen(1).as_ciph_elem()

    # ciphertexts w, re-encrypted + permuted to wp
    field = grp.ring
    m = grp.random_array(N, _prg(b"\x03" * 32), 128)
    renc = field.random((N,), rs, 0)
    w = elgamal.encrypt(pk, m, renc)
    s = field.random((N,), rs, 0)
    pi = Permutation.random(N, rs)
    wp = w.mul(elgamal.reencryption_factors(pk.widen(1), s)).permute(pi.inv())

    P = PoSProver(par, rs)
    P.precompute(g, h, pi)
    P.set_instance(pk_elem, w, wp, s)

    V = PoSVerifier(par)
    V.precompute(g, h)
    V.set_instance(pk_elem, w, wp)
    V.set_permutation_commitment(P.u.to_bytetree())
    V.set_batch_vector(SEED)
    V.compute_AF()
    commitment = P.commit(SEED)
    V.set_commitment(commitment)
    reply = P.reply(V_INT)
    assert V.verify(reply, V_INT)
    assert not V.verify(reply, V_INT + 1)

    # different output list must not verify
    V2 = PoSVerifier(par)
    V2.precompute(g, h)
    V2.set_instance(pk_elem, w, w)
    V2.set_permutation_commitment(P.u.to_bytetree())
    V2.set_batch_vector(SEED)
    V2.compute_AF()
    V2.set_commitment(commitment)
    assert not V2.verify(reply, V_INT)


def test_ccpos_roundtrip_and_tamper(setup):
    grp, rs, prg, par, h = setup
    g = grp.g
    pk = _keypair(grp, rs)
    pk_elem = pk.widen(1).as_ciph_elem()
    field = grp.ring

    r, pi, u = _commitment(grp, rs, h)
    m = grp.random_array(N, _prg(b"\x04" * 32), 128)
    renc = field.random((N,), rs, 0)
    w = elgamal.encrypt(pk, m, renc)
    s = field.random((N,), rs, 0)
    wp = w.mul(elgamal.reencryption_factors(pk.widen(1), s)).permute(pi.inv())

    P = CCPoSProver(par, rs)
    P.set_instance(g, h, u, pk_elem, w, wp, r, pi, s)
    commitment = P.commit(SEED)

    V = CCPoSVerifier(par)
    V.set_instance(g, h, u, pk_elem, w, wp)
    V.set_batch_vector(SEED)
    V.compute_AB()
    V.set_commitment(commitment)
    reply = P.reply(V_INT)
    assert V.verify(reply, V_INT)
    assert not V.verify(reply, V_INT - 1)


def test_posc_multi_round():
    """PoSCMulti: one batched round proving own + verifying all other
    parties' permutation commitments (reference: hvzk/PoSCMulti.java:40)."""
    import threading

    from vmn_tpu.arith.pgroup import ModPGroup, Permutation
    from vmn_tpu.crypto.randomsource import SeededSource
    from vmn_tpu.protocol.com.board import LocalBoardHub
    from vmn_tpu.protocol.context import ProtocolContext, ProtocolParams
    from vmn_tpu.protocol.hvzk.pos_tw import PoSParams
    from vmn_tpu.protocol.hvzk.posc_multi import PoSCMulti

    k, n = 3, 6
    group = ModPGroup.named("test256")
    params = ProtocolParams(sid="Multi", k=k, threshold=k, pgroup=group)
    hub = LocalBoardHub(k)
    results = [None] * (k + 1)
    errors = []

    # Every party publishes its commitment first (as precomp does),
    # then one PoSCMulti round proves/verifies all of them.
    def run(j):
        try:
            ctx = ProtocolContext(params)
            rs = SeededSource(f"mp{j}".encode())
            board = hub.board(j).scope("poscmulti")
            gens = ctx.independent_generators("gens", n)
            g = ctx.pgroup.g
            field = ctx.pgroup.ring
            r = field.random((n,), rs, ctx.rbitlen)
            pi = Permutation.random(n, rs)
            u = gens.mul(g.exp(r)).permute(pi)
            board.publish(f"U{j}", u.to_bytetree().to_bytes())
            us = {}
            for l in range(1, k + 1):
                raw = (
                    u.to_bytetree().to_bytes() if l == j
                    else board.wait_for(l, f"U{l}")
                )
                from vmn_tpu.eio.bytetree import ByteTree

                us[l] = ctx.pgroup.elem_from_bytetree(
                    ByteTree.from_bytes(raw), n
                )
            par = PoSParams(ctx.vbitlen, ctx.ebitlen, ctx.rbitlen, ctx.prg)
            multi = PoSCMulti(ctx, board, rs, par)
            results[j] = multi.execute(g, gens, us, r, pi)
        except Exception:  # noqa: BLE001
            import traceback

            errors.append(traceback.format_exc())

    ths = [threading.Thread(target=run, args=(j,), daemon=True)
           for j in range(1, k + 1)]
    for t in ths:
        t.start()
    for t in ths:
        t.join(timeout=300)
    assert not errors, errors[0]
    for j in range(1, k + 1):
        assert all(results[j].values()), results[j]


def test_ccpos_raised_roundtrip_and_tamper(setup):
    """Raised-mode (precomp) CCPoS verification: valid transcript
    passes, tampered reply and wrong challenge fail (reference 50-bit
    raised verifier optimization, ShufflerElGamalSession raised
    generators)."""
    grp, rs, prg, par, h = setup
    g = grp.g
    pk = _keypair(grp, rs)
    pk_elem = pk.widen(1).as_ciph_elem()
    field = grp.ring

    r, pi, u = _commitment(grp, rs, h)
    m = grp.random_array(N, _prg(b"\x05" * 32), 128)
    renc = field.random((N,), rs, 0)
    w = elgamal.encrypt(pk, m, renc)
    s = field.random((N,), rs, 0)
    wp = w.mul(elgamal.reencryption_factors(pk.widen(1), s)).permute(pi.inv())

    raised_exp = field.from_int(12345)
    raisedh = h.exp_bits(raised_exp, 64)
    raisedu = u.exp_bits(raised_exp, 64)

    P = CCPoSProver(par, rs)
    P.set_instance(g, h, u, pk_elem, w, wp, r, pi, s)
    commitment = P.commit(SEED)

    V = CCPoSVerifier(par)
    V.set_instance(g, h, u, pk_elem, w, wp)
    V.set_batch_vector(SEED)
    V.compute_AB(raisedu=raisedu)
    V.set_commitment(commitment)
    reply = P.reply(V_INT)
    assert V.verify(reply, V_INT, raisedh=raisedh,
                    raised_exponent=raised_exp)
    assert not V.verify(reply, V_INT - 1, raisedh=raisedh,
                        raised_exponent=raised_exp)
    # tamper one byte of k_E inside the reply
    raw = bytearray(reply.to_bytes())
    raw[-3] ^= 0x01
    from vmn_tpu.eio.bytetree import ByteTree

    assert not V.verify(ByteTree.from_bytes(bytes(raw)), V_INT,
                        raisedh=raisedh, raised_exponent=raised_exp)
