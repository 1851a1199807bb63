"""Precomputation-mode end-to-end test: precomp (PoSC) -> committed
shuffle (CCPoS) -> decrypt -> standalone verification
(reference: ShufflerElGamalSession precomp/committedShuffle paths and
the `maxciph`/`forcedmaxciph` configs of demo/mixnet/check)."""

import threading

import pytest

from vmn_tpu.arith.pgroup import ModPGroup
from vmn_tpu.crypto.randomsource import SeededSource
from vmn_tpu.protocol import elgamal
from vmn_tpu.protocol.com.board import LocalBoardHub
from vmn_tpu.protocol.context import ProtocolParams
from vmn_tpu.protocol.mixnet.party import MixNetParty
from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

N = 6
MAXCIPH = 10


def test_precomp_mix_and_verify(tmp_path):
    k, threshold = 3, 2
    params = ProtocolParams(
        sid="TestSID", k=k, threshold=threshold,
        pgroup=ModPGroup.named("test256"),
    )
    group = params.pgroup

    hub = LocalBoardHub(k)
    results = [None] * (k + 1)
    pks = [None] * (k + 1)
    errors = []
    barrier = threading.Barrier(k)

    enc_rs = SeededSource(b"ciphertexts")
    msgs = [group.encode_message(f"{i:08d}".encode()) for i in range(N)]

    def run(j):
        try:
            rs = SeededSource(f"party{j}".encode())
            party = MixNetParty(
                params, hub.board(j), rs, str(tmp_path / f"Party{j:02d}")
            )
            pks[j] = party.keygen()
            barrier.wait()
            session = party.session("aux", 1)
            session.precomp(MAXCIPH)
            barrier.wait()
            # Every party encrypts against the same key; party 1's
            # ciphertexts are used (deterministic seed).
            m = group.from_ints(msgs)
            r = group.ring.random((N,), SeededSource(b"encr"), 0)
            ciphs = elgamal.encrypt(pks[j], m, r)
            results[j] = session.mix(ciphs)
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
        t.join(timeout=900)
    assert not errors, f"party errors: {errors[0]}"

    out_ints = results[1].to_ints()
    assert sorted(out_ints) == sorted(msgs)
    for j in range(2, k + 1):
        assert results[j].equals(results[1])

    nizkp = tmp_path / "Party01" / "nizkp.aux"
    assert (nizkp / "proofs" / "maxciph").exists()
    assert (nizkp / "proofs" / "PoSCCommitment01.bt").exists()
    assert (nizkp / "proofs" / "CCPoSCommitment01.bt").exists()
    res = FiatShamirVerifier(params, nizkp).verify(expected_type="mixing")
    assert res.ok

    # Tamper with a CCPoS reply -> must fail.
    r_file = nizkp / "proofs" / "CCPoSReply02.bt"
    raw = bytearray(r_file.read_bytes())
    raw[-1] ^= 1
    r_file.write_bytes(bytes(raw))
    assert not FiatShamirVerifier(params, nizkp).verify().ok
