"""End-to-end mix-net tests: k parties over the in-memory board,
mix (shuffle + decrypt), then standalone Fiat–Shamir verification —
the equivalent of the reference's DemoMixNetElGamal protocol demo
(reference: DemoMixNetElGamal.java:80-150) plus `vmnv`.
"""

import threading

import pytest

from vmn_tpu.arith.pgroup import ModPGroup
from vmn_tpu.crypto.randomsource import SeededSource
from vmn_tpu.protocol import elgamal
from vmn_tpu.protocol.com.board import LocalBoardHub
from vmn_tpu.protocol.context import ProtocolParams
from vmn_tpu.protocol.mixnet.party import MixNetParty
from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

N = 8


def _params(k, threshold, sid="TestSID"):
    return ProtocolParams(
        sid=sid,
        k=k,
        threshold=threshold,
        pgroup=ModPGroup.named("test256"),
    )


def _run_parties(params, tmp_path, fn):
    """Run fn(party, j) for each of k parties in threads; return results."""
    hub = LocalBoardHub(params.k)
    results = [None] * (params.k + 1)
    errors = []

    def run(j):
        try:
            rs = SeededSource(f"party{j}".encode())
            party = MixNetParty(
                params, hub.board(j), rs, str(tmp_path / f"Party{j:02d}")
            )
            results[j] = fn(party, j)
        except Exception as e:  # noqa: BLE001
            import traceback

            errors.append((j, e, traceback.format_exc()))

    threads = [
        threading.Thread(target=run, args=(j,), daemon=True)
        for j in range(1, params.k + 1)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, f"party errors: {errors[0][2]}"
    return results


def _encrypt_counters(group, pk, n, width=1):
    """Demo-ciphertext generation (reference: ProtocolElGamalDemo)."""
    rs = SeededSource(b"ciphertexts")
    msgs = [group.encode_message(f"{i:08d}".encode()) for i in range(n)]
    m = group.from_ints(msgs)
    r = group.ring.random((n,), rs, 0)
    return elgamal.encrypt(pk, m, r), msgs


@pytest.mark.parametrize("k,threshold", [(1, 1), (3, 2)])
def test_mix_and_verify(tmp_path, k, threshold):
    params = _params(k, threshold)
    group = params.pgroup

    # --- keygen ---------------------------------------------------------
    pks = _run_parties(params, tmp_path, lambda p, j: (p, p.keygen()))
    parties = [None] + [pks[j][0] for j in range(1, k + 1)]
    pk = pks[1][1]
    for j in range(2, k + 1):
        assert pks[j][1].y.equals(pk.y), "parties disagree on public key"

    ciphs, msgs = _encrypt_counters(group, pk, N)

    # --- mix ------------------------------------------------------------
    def do_mix(party, j):
        session = party.session("auxsid1", 1)
        return session.mix(ciphs)

    hub = LocalBoardHub(k)
    results = [None] * (k + 1)
    errors = []

    def run(j):
        try:
            party = parties[j]
            party.board = hub.board(j)
            results[j] = do_mix(party, j)
        except Exception:  # noqa: BLE001
            import traceback

            errors.append(traceback.format_exc())

    threads = [
        threading.Thread(target=run, args=(j,), daemon=True)
        for j in range(1, k + 1)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, f"party errors: {errors[0]}"

    # Plaintext multiset preserved (reference: DemoMixNetElGamal.java:80-92).
    out_ints = results[1].to_ints()
    assert sorted(out_ints) == sorted(msgs)
    assert out_ints != msgs or k == 1  # permuted (k>=2 shuffles twice)
    for j in range(2, k + 1):
        assert results[j].equals(results[1])

    # --- standalone verification ---------------------------------------
    nizkp = tmp_path / "Party01" / "nizkp.auxsid1"
    verifier = FiatShamirVerifier(params, nizkp)
    res = verifier.verify(expected_type="mixing")
    assert res.ok
    assert res.width == 1
    assert res.active_threshold >= threshold

    # Tampering must be detected: flip a byte in the reply of party 1.
    reply = nizkp / "proofs" / "PoSReply01.bt"
    raw = bytearray(reply.read_bytes())
    raw[-1] ^= 1
    reply.write_bytes(bytes(raw))
    res2 = FiatShamirVerifier(params, nizkp).verify()
    assert not res2.ok


def test_external_key_shuffle_and_verify(tmp_path):
    """External-key mode: `vmn -setpk` + shuffle-only sessions against
    a key generated elsewhere — no secret shares, no decryption
    (reference: MixNetElGamal.setPublicKey:227-242 and the
    external-key-shuffle flows of demo/mixnet/check)."""
    from vmn_tpu.protocol.elgamal import ElGamalPublicKey

    group = ModPGroup.named("test256")
    params = ProtocolParams(
        sid="Ext", k=1, threshold=1, pgroup=group,
    )
    hub = LocalBoardHub(1)
    party = MixNetParty(
        params, hub.board(1), SeededSource(b"ext-party"),
        str(tmp_path / "P1"),
    )
    # the external key: y = g^x for an x nobody in the protocol holds
    x = 123456789
    key_grp = party.ctx.key_group()
    pk = ElGamalPublicKey(key_grp.g, key_grp.g.exp(
        key_grp.ring.from_int(x)
    ))
    party.set_public_key(pk)

    msgs = [group.encode_message(f"{i:08d}".encode()) for i in range(5)]
    m = group.from_ints(msgs)
    r = group.ring.random((5,), SeededSource(b"ext-enc"), 0)
    ciphs = elgamal.encrypt(pk, m, r)

    session = party.session("ext", 1)
    out = session.shuffle(ciphs)

    # the shuffled list decrypts (externally, with x) to the same
    # multiset
    u, v = out.project(0), out.project(1)
    f = u.exp(group.ring.from_int(x))
    plain = v.div(f)
    assert sorted(plain.to_ints()) == sorted(msgs)

    nizkp = tmp_path / "P1" / "nizkp.ext"
    res = FiatShamirVerifier(params, nizkp).verify(
        expected_type="shuffling"
    )
    assert res.ok

    # a fresh party in the same directory resumes the persisted
    # external key (reference: ExternalPublicKey.bt cache)
    p2 = MixNetParty(
        params, hub.board(1), SeededSource(b"other"),
        str(tmp_path / "P1"),
    )
    p2.load_keys()
    assert p2.full_public_key().y.equals(pk.y)
