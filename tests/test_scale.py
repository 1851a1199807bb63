"""Four-digit-N end-to-end tests (reference: the check matrix runs
N in {100, 10000} and forced-maxciph configs, demo/mixnet/check:84,
.checkbaseconf:1-120).  Exercises the regimes tiny-N tests never
reach: multi-tile batches (N > TILE_N lanes), real disk-spill
thresholds, and keep-list shrink at scale.

Set VMN_SKIP_SLOW=1 to skip locally; CI runs them.
"""

import os

import pytest

from vmn_tpu.arith.pgroup import ModPGroup
from vmn_tpu.crypto.randomsource import SeededSource
from vmn_tpu.protocol import elgamal
from vmn_tpu.protocol.com.board import LocalBoardHub
from vmn_tpu.protocol.context import ProtocolParams
from vmn_tpu.protocol.mixnet.party import MixNetParty
from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

slow = pytest.mark.skipif(
    os.environ.get("VMN_SKIP_SLOW") == "1",
    reason="VMN_SKIP_SLOW=1",
)

N = 1024


def _encrypt(group, pk, n, tag=b"scale-encr"):
    from vmn_tpu.crypto.hash import SHA256
    from vmn_tpu.crypto.prg import PRGHeuristic

    # PRG-derived plaintexts: encode_message would cost n host pows
    prg = PRGHeuristic(SHA256)
    prg.set_seed(SHA256.hash(tag))
    m = group.random_array(n, prg, 8)
    r = group.ring.random((n,), SeededSource(tag + b"-r"), 0)
    return m.to_ints(), elgamal.encrypt(pk, m, r)


@slow
def test_plain_mix_n1024_arrays_file(tmp_path):
    """k=1 mix + standalone verification at N=1024 with the file
    backend at its REAL spill threshold (tiny-N tests force
    MIN_SPILL_BYTES=0 and never hit the memmap paths at size)."""
    from vmn_tpu.arith import storage

    storage.set_backend("file", tmp_path / "arrays")
    try:
        group = ModPGroup.named("test256")
        params = ProtocolParams(
            sid="Scale", k=1, threshold=1, pgroup=group,
        )
        hub = LocalBoardHub(1)
        party = MixNetParty(
            params, hub.board(1), SeededSource(b"scale-party"),
            str(tmp_path / "P1"),
        )
        pk = party.keygen()
        msgs, ciphs = _encrypt(group, pk, N)
        out = party.session("scale", 1).mix(ciphs)
        assert sorted(out.to_ints()) == sorted(msgs)
        res = FiatShamirVerifier(
            params, tmp_path / "P1" / "nizkp.scale"
        ).verify(expected_type="mixing")
        assert res.ok
    finally:
        storage.set_backend("ram")


@slow
def test_precomp_shrink_n1024(tmp_path):
    """Precomputation for maxciph=1280 shrunk to N=1024 via the
    keep-list protocol — boundary behavior of shrink/spill at a size
    where tile-boundary off-by-ones would actually show
    (reference: forcedmaxciph config; PermutationCommitment.java:
    390-471)."""
    group = ModPGroup.named("test256")
    params = ProtocolParams(
        sid="ScaleP", k=1, threshold=1, pgroup=group,
    )
    hub = LocalBoardHub(1)
    party = MixNetParty(
        params, hub.board(1), SeededSource(b"scalep-party"),
        str(tmp_path / "P1"),
    )
    pk = party.keygen()
    session = party.session("scalep", 1)
    session.precomp(1280)
    msgs, ciphs = _encrypt(group, pk, N, tag=b"scalep")
    out = session.mix(ciphs)
    assert sorted(out.to_ints()) == sorted(msgs)
    nizkp = tmp_path / "P1" / "nizkp.scalep"
    assert (nizkp / "proofs" / "KeepList01.bt").exists()
    res = FiatShamirVerifier(params, nizkp).verify(
        expected_type="mixing"
    )
    assert res.ok


@pytest.mark.skipif(
    os.environ.get("VMN_TPU_TESTS") != "1",
    reason="TPU-only scale test; set VMN_TPU_TESTS=1 on a TPU host",
)
def test_tpu_kernel_parity_n_2_20():
    """Kernel correctness at N=2^20 on real hardware: the fused exp
    kernel over 4096 grid steps agrees with host bignum pow on sampled
    rows (reference analogue: N=10^6 north-star scale)."""
    import numpy as np

    import jax.numpy as jnp

    from vmn_tpu.arith.limbs import int_to_limbs, limbs_to_int
    from vmn_tpu.arith.mont import MontCtx
    from vmn_tpu.ops.mont_kernels import mont_exp_pallas

    group = ModPGroup.named("test256")
    ctx = MontCtx(group.p)
    n = 1 << 20
    rng = np.random.default_rng(0)
    base_ints = [int(x) for x in rng.integers(2, 1 << 62, size=64)]
    a = ctx.encode(base_ints)
    a = jnp.tile(a, (n // 64, 1))
    e = jnp.asarray(
        rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    )
    out = mont_exp_pallas(
        a, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256
    )
    # sample rows across distinct grid tiles
    idx = [0, 255, 256, 65535, 65536, n - 1]
    rows = np.asarray(ctx.from_mont(out[jnp.asarray(idx)]))
    e_host = np.asarray(e)
    for k, i in enumerate(idx):
        ei = sum(
            int(e_host[i, j]) << (16 * j) for j in range(16)
        )
        want = pow(base_ints[i % 64], ei, group.p)
        assert limbs_to_int(rows[k]) == want, f"row {i}"


@pytest.mark.skipif(
    os.environ.get("VMN_TPU_TESTS") != "1",
    reason="TPU-only north-star test; set VMN_TPU_TESTS=1 on a TPU host",
)
def test_tpu_northstar_full_protocol_2_20():
    """The north star on real hardware: full mix+prove+VERIFY at
    N=2^20 > 10^6 ciphertexts, 2048-bit group, with plaintext-multiset
    correctness (reference: the mixing_lengths axis of
    demo/mixnet/benchmarks/bench_config:33-46 at production scale;
    exercises the HBM discipline — phase backpressure, chunked scans,
    bounded kernel launches, super-chunked multi-exp)."""
    from tools.bench_suite import _mix_once

    cps, dt, dtv, ok = _mix_once(1 << 20, time_verify=True,
                                 check_correct=True)
    assert ok
    assert cps > 0 and dtv > 0
