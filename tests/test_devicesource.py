"""DeviceSource: device-expanded prover randomness (DEVIATIONS.md #8).

Pins determinism (same seed -> same draws, across instances), draw
independence, bit-width bounds, marshal round-trip, and a full
mix+verify where the party's private randomness comes from the device
PRF while the transcript stays verifiable by the unchanged verifier.
"""

import tempfile
from pathlib import Path

from vmn_tpu.arith.pgroup import ModPGroup
from vmn_tpu.crypto.hash import SHA256
from vmn_tpu.crypto.prg import PRGHeuristic
from vmn_tpu.crypto.randomsource import DeviceSource, SeededSource
from vmn_tpu.eio.marshal import marshal, unmarshal
from vmn_tpu.protocol import elgamal
from vmn_tpu.protocol.com.board import LocalBoardHub
from vmn_tpu.protocol.context import ProtocolParams
from vmn_tpu.protocol.mixnet.party import MixNetParty
from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

GROUP = ModPGroup.named("test256")


def test_determinism_and_independence():
    ring = GROUP.ring
    a = ring.random((64,), DeviceSource(b"s"), 128).to_ints()
    rs = DeviceSource(b"s")
    a2 = ring.random((64,), rs, 128).to_ints()
    b = ring.random((64,), rs, 128).to_ints()
    assert a == a2  # same seed, same draw index
    assert a != b  # draw counter advances
    assert a != ring.random((64,), DeviceSource(b"t"), 128).to_ints()
    assert all(0 <= x < ring.q for x in a)


def test_bit_bounds():
    ring = GROUP.ring
    r = ring.random_bits(256, 100, DeviceSource(b"s")).to_ints()
    assert all(x < (1 << 100) for x in r)
    # not collapsing to narrow values
    assert max(x.bit_length() for x in r) > 90


def test_marshal_roundtrip():
    rs = DeviceSource(b"seed-bytes")
    rs2 = unmarshal(marshal(rs))
    assert isinstance(rs2, DeviceSource)
    ring = GROUP.ring
    assert (
        ring.random((8,), rs, 64).to_ints()
        == ring.random((8,), rs2, 64).to_ints()
    )


def test_mix_and_verify_with_device_randomness():
    params = ProtocolParams(sid="DS", k=1, threshold=1, pgroup=GROUP)
    hub = LocalBoardHub(1)
    with tempfile.TemporaryDirectory() as tmp:
        party = MixNetParty(params, hub.board(1), DeviceSource(b"p1"), tmp)
        pk = party.keygen()
        prg = PRGHeuristic(SHA256)
        prg.set_seed(SHA256.hash(b"m"))
        m = GROUP.random_array(8, prg, params.rbitlen)
        r = GROUP.ring.random((8,), SeededSource(b"e"), 0)
        ciphs = elgamal.encrypt(pk, m, r)
        pt = party.session("d", 1).mix(ciphs)
        assert sorted(pt.to_ints()) == sorted(m.to_ints())
        res = FiatShamirVerifier(params, Path(tmp) / "nizkp.d").verify(
            expected_type="mixing"
        )
        assert res.ok
