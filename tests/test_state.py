"""Durable protocol state: precomp persistence across processes,
marker-file one-shot state machine, crash resume, byte-tree key state,
and active-set decryption.

Reference behaviors being matched: the offline/online split survives a
process boundary (ShufflerElGamalSession.java:534-663 disk caches), the
session state machine is one-way (`.precomp/.shuffle/.decrypt`,
MixNetElGamalSession.java:162-170), keygen state is cached
(DKG.java:147-175), and deactivated servers are excluded from
decryption (DistrElGamalSession.java:112-187 + ProtocolBBT active set).
"""

import threading

import pytest

from vmn_tpu.arith.pgroup import ModPGroup
from vmn_tpu.cli import vmn, vmnd, vmni, vmnv
from vmn_tpu.crypto.randomsource import SeededSource
from vmn_tpu.protocol import elgamal
from vmn_tpu.protocol.com.board import LocalBoardHub
from vmn_tpu.protocol.context import ProtocolParams
from vmn_tpu.protocol.mixnet.party import MixNetParty, ProtocolError
from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

GROUP = "named:test256"
N = 6


def _setup_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert vmni.main([
        "-prot", "-sid", "StateTest", "-nopart", "1", "-thres", "1",
        "-pgroup", GROUP, "-stub", "stub.xml",
    ]) == 0
    assert vmni.main([
        "-party", "-name", "Party01", "-stub", "stub.xml",
        "-dir", str(tmp_path / "p1"), "-seed", "",
        "-out", "localProtInfo.xml",
    ]) == 0
    assert vmni.main(["-merge", "localProtInfo.xml",
                      "-out", "protInfo.xml"]) == 0
    (tmp_path / "seed").write_bytes(b"state-seed")
    priv = (tmp_path / "privInfo.xml").read_text()
    priv = priv.replace("<seed />", f"<seed>{tmp_path}/seed</seed>")
    priv = priv.replace("<seed></seed>", f"<seed>{tmp_path}/seed</seed>")
    (tmp_path / "privInfo.xml").write_text(priv)


def test_precomp_survives_process_boundary(tmp_path, monkeypatch):
    """`vmn -precomp` followed by `vmn -mix` as SEPARATE invocations must
    run the commitment-consistent (CCPoS) online path, not silently fall
    back to plain PoS."""
    _setup_cli(tmp_path, monkeypatch)
    assert vmn.main(["-keygen", "privInfo.xml", "protInfo.xml",
                     "publicKey.bt"]) == 0
    assert vmnd.main(["-ciphs", "publicKey.bt", "ciphertexts.bt",
                      "-N", str(N), "-pgroup", GROUP]) == 0

    # Separate invocation 1: offline precomputation.
    assert vmn.main(["-precomp", "privInfo.xml", "protInfo.xml",
                     "-maxciph", "10"]) == 0
    state = tmp_path / "p1" / "state" / "session.default"
    assert (state / ".precomp").exists()
    assert (state / "ReencFactors.bt").exists()

    # Separate invocation 2: online mix — must pick up the precomp.
    assert vmn.main(["-mix", "privInfo.xml", "protInfo.xml",
                     "ciphertexts.bt", "plaintexts.bt"]) == 0
    proofs = tmp_path / "p1" / "nizkp.default" / "proofs"
    assert (proofs / "maxciph").exists(), "CCPoS path did not run"
    assert (proofs / "CCPoSCommitment01.bt").exists()
    assert (proofs / "KeepList01.bt").exists()

    # The transcript must verify through the precomp verifier path.
    assert vmnv.main(["protInfo.xml",
                      str(tmp_path / "p1" / "nizkp.default"),
                      "-mix"]) == 0


def test_mix_resume_is_idempotent(tmp_path, monkeypatch):
    """Re-running `vmn -mix` after completion (e.g. after a crash during
    output delivery) reloads the recorded result instead of failing or
    re-shuffling."""
    _setup_cli(tmp_path, monkeypatch)
    assert vmn.main(["-keygen", "privInfo.xml", "protInfo.xml",
                     "publicKey.bt"]) == 0
    assert vmnd.main(["-ciphs", "publicKey.bt", "ciphertexts.bt",
                      "-N", str(N), "-pgroup", GROUP]) == 0
    assert vmn.main(["-mix", "privInfo.xml", "protInfo.xml",
                     "ciphertexts.bt", "plaintexts.bt"]) == 0
    first = (tmp_path / "plaintexts.bt").read_bytes()
    assert vmn.main(["-mix", "privInfo.xml", "protInfo.xml",
                     "ciphertexts.bt", "plaintexts2.bt"]) == 0
    assert (tmp_path / "plaintexts2.bt").read_bytes() == first

    # -delete resets the session; a fresh mix then works again.
    assert vmn.main(["-delete", "privInfo.xml", "protInfo.xml"]) == 0
    assert vmn.main(["-mix", "privInfo.xml", "protInfo.xml",
                     "ciphertexts.bt", "plaintexts3.bt"]) == 0


def test_keygen_idempotent_bytetree_state(tmp_path, monkeypatch):
    """keygen persists byte-tree key state (no pickle) and re-running it
    reloads the same key."""
    _setup_cli(tmp_path, monkeypatch)
    assert vmn.main(["-keygen", "privInfo.xml", "protInfo.xml",
                     "publicKey.bt"]) == 0
    pk1 = (tmp_path / "publicKey.bt").read_bytes()
    state = tmp_path / "p1" / "state"
    assert (state / "KeyAndPoly.bt").exists()
    assert (state / "FullPublicKey.bt").exists()
    assert not (tmp_path / "p1" / ".vmn_state").exists()
    assert vmn.main(["-keygen", "privInfo.xml", "protInfo.xml",
                     "publicKey2.bt"]) == 0
    assert (tmp_path / "publicKey2.bt").read_bytes() == pk1


def _run_parties(params, tmp_path, fn):
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
        except Exception:  # noqa: BLE001
            import traceback

            errors.append(traceback.format_exc())

    threads = [
        threading.Thread(target=run, args=(j,), daemon=True)
        for j in range(1, params.k + 1)
        if params_active(params, j)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, f"party errors: {errors[0]}"
    return results


def params_active(params, j):
    act = getattr(params, "_test_active", None)
    return act is None or act[j]


def test_decrypt_with_deactivated_party(tmp_path):
    """k=3, t=2: deactivate party 3 (as `-sact 1,2` would); the mix —
    including distributed decryption — completes with the active
    threshold and the transcript verifies."""
    params = ProtocolParams(
        sid="ActTest", k=3, threshold=2,
        pgroup=ModPGroup.named("test256"),
    )
    group = params.pgroup
    active = [False, True, True, False]  # 1-based; party 3 off

    # Keygen with ALL parties (key setup precedes deactivation).
    pks = _run_parties(params, tmp_path, lambda p, j: (p, p.keygen()))
    parties = [None] + [pks[j][0] if pks[j] else None for j in range(1, 4)]
    pk = pks[1][1]

    rs = SeededSource(b"ciphertexts")
    msgs = [group.encode_message(f"{i:08d}".encode()) for i in range(N)]
    m = group.from_ints(msgs)
    r = group.ring.random((N,), rs, 0)
    ciphs = elgamal.encrypt(pk, m, r)

    # Mix with party 3 deactivated.
    hub = LocalBoardHub(3)
    results = [None] * 4
    errors = []

    def run(j):
        try:
            party = parties[j]
            party.board = hub.board(j)
            party.set_active(active)
            session = party.session("auxact", 1)
            results[j] = session.mix(ciphs)
        except Exception:  # noqa: BLE001
            import traceback

            errors.append(traceback.format_exc())

    threads = [
        threading.Thread(target=run, args=(j,), daemon=True)
        for j in (1, 2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, f"party errors: {errors[0]}"

    out_ints = results[1].to_ints()
    assert sorted(out_ints) == sorted(msgs)
    assert results[2].equals(results[1])

    nizkp = tmp_path / "Party01" / "nizkp.auxact"
    res = FiatShamirVerifier(params, nizkp).verify(expected_type="mixing")
    assert res.ok
