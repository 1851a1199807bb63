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


def test_ec_interactive_coinflip(tmp_path):
    """Coin flipping (interactive challenger substrate) works over EC
    groups — regression: the batched ModP dealing path raised
    AttributeError on ECArray commitments."""
    import threading

    from vmn_tpu.protocol.coinflip import CoinFlipPRingSource
    from vmn_tpu.protocol.com.board import LocalBoardHub
    from vmn_tpu.protocol.context import ProtocolContext, ProtocolParams

    k = 3
    params = ProtocolParams(
        sid="ECCoin", k=k, threshold=2, noninteractive=False,
        pgroup=ECqPGroup.named("P-224"),
    )
    hub = LocalBoardHub(k)
    outs = [None] * (k + 1)
    errs = []

    def go(j):
        try:
            ctx = ProtocolContext(params)
            src = CoinFlipPRingSource(
                ctx, hub.board(j), SeededSource(f"ec{j}".encode())
            )
            outs[j] = src.coin_bytes(8)
        except Exception:  # noqa: BLE001
            import traceback

            errs.append(traceback.format_exc())

    ths = [threading.Thread(target=go, args=(j,), daemon=True)
           for j in range(1, k + 1)]
    [t.start() for t in ths]
    [t.join(timeout=600) for t in ths]
    assert not errs, errs[0]
    assert outs[1] == outs[2] == outs[3] and len(outs[1]) == 8


def test_ec_product_group_random_array_stream_position():
    """Batched EC point derivation must leave the PRG stream exactly
    where the sequential derivation would (regression: speculative
    chunk reads shifted the second factor of a product group)."""
    from vmn_tpu.arith.pgroup import PPGroup
    from vmn_tpu.crypto.hash import SHA256
    from vmn_tpu.crypto.prg import PRGHeuristic

    grp = ECqPGroup.named("P-256")
    pp = PPGroup(grp, 2)
    prg = PRGHeuristic(SHA256)
    prg.set_seed(SHA256.hash(b"pp-ec"))
    arr = pp.random_array(6, prg, 8)

    # sequential host reference
    prg2 = PRGHeuristic(SHA256)
    prg2.set_seed(SHA256.hash(b"pp-ec"))
    bits = grp.p.bit_length() + 8
    nbytes = (bits + 7) // 8
    extra = 8 * nbytes - bits

    def seq_points(n):
        pts = []
        while len(pts) < n:
            t = int.from_bytes(prg2.read_bytes(nbytes), "big")
            if extra:
                t >>= extra
            x = t % grp.p
            y = grp.curve_y(x)
            if y is not None:
                pts.append((x, y if y % 2 == 0 else grp.p - y))
        return pts

    want0 = seq_points(6)
    want1 = seq_points(6)
    assert arr.project(0).to_affine() == want0
    assert arr.project(1).to_affine() == want1
