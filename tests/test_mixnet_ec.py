"""End-to-end mix over an EC group (P-256) — the reference's default
benchmark group (reference: bench_config:33-45)."""

import pytest

from vmn_tpu.arith.ec import ECqPGroup
from vmn_tpu.crypto.randomsource import SeededSource
from vmn_tpu.protocol import elgamal
from vmn_tpu.protocol.com.board import LocalBoardHub
from vmn_tpu.protocol.context import ProtocolParams
from vmn_tpu.protocol.mixnet.party import MixNetParty
from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

N = 5


def test_ec_mix_and_verify(tmp_path):
    group = ECqPGroup.named("P-256")
    params = ProtocolParams(sid="ECTest", k=1, threshold=1, pgroup=group)

    hub = LocalBoardHub(1)
    rs = SeededSource(b"party1")
    party = MixNetParty(params, hub.board(1), rs, str(tmp_path / "P1"))
    pk = party.keygen()

    msgs = [group.encode_message(f"msg{i}".encode()) for i in range(N)]
    m = group.from_affine(msgs)
    r = group.ring.random((N,), SeededSource(b"enc"), 0)
    ciphs = elgamal.encrypt(pk, m, r)

    session = party.session("aux", 1)
    out = session.mix(ciphs)

    got = sorted(
        group.decode_message(pt) for pt in group.to_affine(out)
    )
    assert got == sorted(f"msg{i}".encode() for i in range(N))

    nizkp = tmp_path / "P1" / "nizkp.aux"
    res = FiatShamirVerifier(params, nizkp).verify(expected_type="mixing")
    assert res.ok

    # tamper -> reject
    f = nizkp / "proofs" / "PoSReply01.bt"
    raw = bytearray(f.read_bytes())
    raw[-1] ^= 1
    f.write_bytes(bytes(raw))
    assert not FiatShamirVerifier(params, nizkp).verify().ok
