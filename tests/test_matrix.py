"""Check-matrix e2e tests: width>1, keywidth>1, interactive mode, EC
groups at k=3 — the pytest port of the reference's CLI configuration
matrix (reference: demo/mixnet/check:84 — `width`, `keywidth31/32`,
`interactive`, EC configs; .checkbaseconf:1-120).

Each config runs a full mix among k in-process parties over the local
board and checks plaintext-multiset preservation; non-interactive
configs additionally run the standalone verifier.
"""

import threading

import numpy as np
import pytest

from vmn_tpu.arith.ec import ECqPGroup
from vmn_tpu.arith.pgroup import ModPGroup, PPArray
from vmn_tpu.crypto.randomsource import SeededSource
from vmn_tpu.protocol import elgamal
from vmn_tpu.protocol.com.board import LocalBoardHub
from vmn_tpu.protocol.context import ProtocolParams
from vmn_tpu.protocol.mixnet.party import MixNetParty
from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

N = 5


def _run_mix(tmp_path, params, width, auxsid="mx"):
    """keygen + width-w encrypt + mix among k parties; returns
    (msgs, outs, nizkp_dir)."""
    k = params.k
    group = params.pgroup
    hub = LocalBoardHub(k)
    parties = [None] * (k + 1)
    sessions = [None] * (k + 1)
    pks = [None] * (k + 1)
    errors = []

    def setup(j):
        try:
            rs = SeededSource(f"party{j}".encode())
            p = MixNetParty(
                params, hub.board(j), rs, str(tmp_path / f"Party{j:02d}")
            )
            pks[j] = p.keygen()
            parties[j] = p
        except Exception:  # noqa: BLE001
            import traceback

            errors.append(traceback.format_exc())

    _join(_spawn(setup, k), errors)

    pk = pks[1]
    plain_grp = elgamal.plain_group(params.pgroup, width)
    key_grp = parties[1].ctx.key_group()

    msgs = [group.encode_message(f"{i:08d}".encode()) for i in range(N)]
    if hasattr(group, "from_affine"):  # EC group: messages are points
        enc = group.from_affine(msgs)
    else:
        enc = group.from_ints(msgs)
    base = (
        enc
        if params.keywidth == 1
        else key_grp.product(*[enc] * params.keywidth)
    )
    if width == 1:
        m = base
    else:
        m = PPArray(
            elgamal.plain_group(key_grp, width), tuple([base] * width)
        )
    enc_rs = SeededSource(b"ciphertexts")
    r = elgamal.plain_group(key_grp, width).ring.random((N,), enc_rs, 0)
    ciphs = elgamal.encrypt(pk.widen(width), m, r)

    hub2 = LocalBoardHub(k)
    outs = [None] * (k + 1)

    def mix(j):
        try:
            parties[j].board = hub2.board(j)
            outs[j] = parties[j].session(auxsid, width).mix(ciphs)
        except Exception:  # noqa: BLE001
            import traceback

            errors.append(traceback.format_exc())

    _join(_spawn(mix, k), errors)

    # plaintext multiset preserved in the first leaf
    out1 = outs[1]
    leaf = out1
    while isinstance(leaf, PPArray):
        leaf = leaf.project(0)
    if hasattr(group, "from_affine"):
        got = leaf.to_affine()
    else:
        got = leaf.to_ints()
    assert sorted(got) == sorted(msgs)
    for j in range(2, k + 1):
        assert outs[j].equals(out1)
    return msgs, outs, tmp_path / "Party01" / f"nizkp.{auxsid}"


def _spawn(fn, k):
    ths = [
        threading.Thread(target=fn, args=(j,), daemon=True)
        for j in range(1, k + 1)
    ]
    for t in ths:
        t.start()
    return ths


def _join(ths, errors):
    for t in ths:
        t.join(timeout=600)
    assert not errors, f"party errors: {errors[0]}"


def test_width2_mix_and_verify(tmp_path):
    """width=2 plaintexts via product groups (reference: `width`
    config)."""
    params = ProtocolParams(
        sid="W2", k=1, threshold=1, pgroup=ModPGroup.named("test256"),
    )
    _, _, nizkp = _run_mix(tmp_path, params, width=2)
    res = FiatShamirVerifier(params, nizkp).verify(expected_type="mixing")
    assert res.ok
    assert res.width == 2


def test_keywidth2_mix_and_verify(tmp_path):
    """keywidth=2: keys in PPGroup(pgroup, 2) (reference: `keywidth31`
    config)."""
    params = ProtocolParams(
        sid="KW2", k=1, threshold=1, keywidth=2,
        pgroup=ModPGroup.named("test256"),
    )
    _, _, nizkp = _run_mix(tmp_path, params, width=1)
    res = FiatShamirVerifier(params, nizkp).verify(expected_type="mixing")
    assert res.ok


def test_interactive_mix(tmp_path):
    """Interactive proofs: challenges from joint coin flipping instead
    of the random oracle (reference: `interactive` config; no
    standalone verification — vmnv only covers Fiat-Shamir)."""
    params = ProtocolParams(
        sid="Int", k=2, threshold=2, noninteractive=False,
        pgroup=ModPGroup.named("test256"),
    )
    _run_mix(tmp_path, params, width=1)


def test_ec_k3_mix_and_verify(tmp_path):
    """EC group (P-224) with k=3, t=2 (reference: EC configs of
    .checkbaseconf)."""
    params = ProtocolParams(
        sid="EC3", k=3, threshold=2, pgroup=ECqPGroup.named("P-224"),
    )
    _, _, nizkp = _run_mix(tmp_path, params, width=1)
    res = FiatShamirVerifier(params, nizkp).verify(expected_type="mixing")
    assert res.ok


def test_arrays_file_mix_and_verify(tmp_path):
    """arrays=file: resident arrays and intermediate ciphertext lists
    spill to disk memmaps (reference: `ram`/file configs of the check
    matrix; ProtocolElGamal.java:332-345)."""
    from vmn_tpu.arith import storage

    storage.set_backend("file", tmp_path / "arrays")
    storage.MIN_SPILL_BYTES, saved = 0, storage.MIN_SPILL_BYTES
    try:
        params = ProtocolParams(
            sid="AF", k=1, threshold=1,
            pgroup=ModPGroup.named("test256"),
        )
        _, _, nizkp = _run_mix(tmp_path, params, width=1)
        res = FiatShamirVerifier(params, nizkp).verify(
            expected_type="mixing"
        )
        assert res.ok
        assert any((tmp_path / "arrays").glob("spill*.npy"))
    finally:
        storage.MIN_SPILL_BYTES = saved
        storage.set_backend("ram")


def test_provable_primitives_mix_and_verify(tmp_path):
    """Full mix + standalone verification with PROVABLE primitives:
    PRGElGamal batching vectors and a Pedersen/Merkle-Damgaard random
    oracle hash (reference: `provablehash`/`provableprg` configs of
    demo/mixnet/check; info_files:125-131)."""
    params = ProtocolParams(
        sid="Prov", k=1, threshold=1,
        pgroup=ModPGroup.named("test256"),
        prg_name="elgamal:test256:4:64",
        rohash_name="pedersen:test256",
    )
    _, _, nizkp = _run_mix(tmp_path, params, width=1)
    res = FiatShamirVerifier(params, nizkp).verify(
        expected_type="mixing"
    )
    assert res.ok


def test_thresholdlarge_k7_t4(tmp_path):
    """k=7 mix-servers with threshold 4 (reference: `thresholdlarge`
    config, demo/mixnet/.checkbaseconf NO_MIXSERVERS=7 THRESHOLD=4)."""
    group = ModPGroup.named("test256")
    params = ProtocolParams(
        sid="K7", k=7, threshold=4, pgroup=group
    )
    _, _, nizkp = _run_mix(tmp_path, params, 1)
    res = FiatShamirVerifier(params, nizkp).verify(expected_type="mixing")
    assert res.ok


def test_keywidth2_width2_combined(tmp_path):
    """keywidth=2 AND width=2 in one run (reference: `keywidth32`
    config — KEYWIDTH=3 WIDTH=2)."""
    params = ProtocolParams(
        sid="KW32", k=1, threshold=1, keywidth=2,
        pgroup=ModPGroup.named("test256"),
    )
    _, _, nizkp = _run_mix(tmp_path, params, width=2)
    res = FiatShamirVerifier(params, nizkp).verify(expected_type="mixing")
    assert res.ok
    assert res.width == 2
