"""Adversarial end-to-end tests: one party misbehaves LIVE (not just a
tampered transcript) and the protocol completes for the honest
majority, mirroring the reference's Byzantine defaults — input
passthrough for a failed shuffle proof, exclusion via the correct-
indices machinery for bad decryption factors, threshold recovery for a
mis-opened coin (reference: ShufflerElGamalSession.java:300-330,
DistrElGamalSession.java:488-515, CoinFlipPRing.java:71)."""

import threading

import pytest

from vmn_tpu.arith.pgroup import ModPGroup
from vmn_tpu.crypto.randomsource import SeededSource
from vmn_tpu.protocol import elgamal
from vmn_tpu.protocol.com.board import LocalBoardHub
from vmn_tpu.protocol.context import ProtocolParams
from vmn_tpu.protocol.mixnet.party import MixNetParty
from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

N = 5


class TamperBoard:
    """Board proxy that mutates matching labels at publish time, so
    every OTHER party receives the corrupted message while the
    misbehaving party's local state keeps the original."""

    def __init__(self, inner, match, mutate):
        self._inner = inner
        self._match = match
        self._mutate = mutate

    def publish(self, label, data):
        if self._match(label):
            data = self._mutate(data)
        return self._inner.publish(label, data)

    def scope(self, sid):
        return TamperBoard(self._inner.scope(sid), self._match,
                           self._mutate)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _run_parties(tmp_path, params, boards, auxsid="adv",
                 interactive=False):
    k = params.k
    group = params.pgroup
    results = [None] * (k + 1)
    pks = [None] * (k + 1)
    errors = []
    barrier = threading.Barrier(k)
    msgs = [group.encode_message(f"{i:08d}".encode()) for i in range(N)]

    def run(j):
        try:
            rs = SeededSource(f"party{j}".encode())
            party = MixNetParty(
                params, boards[j], rs, str(tmp_path / f"Party{j:02d}")
            )
            pks[j] = party.keygen()
            barrier.wait()
            session = party.session(auxsid, 1)
            m = group.from_ints(msgs)
            r = group.ring.random((N,), SeededSource(b"encr"), 0)
            ciphs = elgamal.encrypt(pks[j], m, r)
            results[j] = session.mix(ciphs)
        except Exception:  # noqa: BLE001
            import traceback

            errors.append((j, traceback.format_exc()))

    threads = [
        threading.Thread(target=run, args=(j,), daemon=True)
        for j in range(1, k + 1)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=900)
    return msgs, results, errors


def test_live_tampered_pos_abort_then_deactivate(tmp_path):
    """Party 2 (a shuffler) corrupts its PoS reply ON THE BOARD.  The
    chain runs exactly `threshold` shufflers, so honest parties see
    fewer than threshold valid proofs and ABORT — the reference
    behavior (ShufflerElGamalSession.java:344-349).  The operator then
    deactivates party 2 and re-runs: the chain extends past the
    cheater (activeThreshold) and the mix completes and verifies —
    the active-set elasticity flow (-sact) end to end."""
    k = 3
    params = ProtocolParams(
        sid="AdvPoS", k=k, threshold=2,
        pgroup=ModPGroup.named("test256"),
    )
    group = params.pgroup
    hub = LocalBoardHub(k)

    def flip(data):
        raw = bytearray(data)
        raw[-1] ^= 1
        return bytes(raw)

    boards = [None] + [hub.board(j) for j in range(1, k + 1)]
    boards[2] = TamperBoard(
        boards[2], lambda lab: lab == "PoSReply2", flip
    )

    from vmn_tpu.protocol.mixnet.party import ProtocolError

    parties = [None] * (k + 1)
    perr = [None] * (k + 1)
    errors = []
    barrier = threading.Barrier(k)
    msgs = [group.encode_message(f"{i:08d}".encode()) for i in range(N)]

    def phase1(j):
        try:
            rs = SeededSource(f"party{j}".encode())
            p = MixNetParty(
                params, boards[j], rs, str(tmp_path / f"Party{j:02d}")
            )
            pk = p.keygen()
            parties[j] = p
            barrier.wait()
            session = p.session("adv", 1)
            m = group.from_ints(msgs)
            r = group.ring.random((N,), SeededSource(b"encr"), 0)
            try:
                session.shuffle(elgamal.encrypt(pk, m, r))
            except ProtocolError as e:
                perr[j] = str(e)
        except Exception:  # noqa: BLE001
            import traceback

            errors.append(traceback.format_exc())

    threads = [threading.Thread(target=phase1, args=(j,), daemon=True)
               for j in range(1, k + 1)]
    [t.start() for t in threads]
    [t.join(timeout=900) for t in threads]
    assert not errors, errors[0]
    # Honest parties abort with too few valid proofs; the cheater,
    # trusting its own proof, does not.
    assert perr[1] and "too few valid proofs" in perr[1]
    assert perr[3] and "too few valid proofs" in perr[3]

    # Operator deactivates party 2; the remaining parties re-run.
    active = [False, True, False, True]
    results = [None] * (k + 1)

    def phase2(j):
        try:
            p = parties[j]
            p.set_active(active)
            session = p.session("adv2", 1)
            m = group.from_ints(msgs)
            r = group.ring.random((N,), SeededSource(b"encr"), 0)
            results[j] = session.mix(
                elgamal.encrypt(p.full_public_key(), m, r)
            )
        except Exception:  # noqa: BLE001
            import traceback

            errors.append(traceback.format_exc())

    threads = [threading.Thread(target=phase2, args=(j,), daemon=True)
               for j in (1, 3)]
    [t.start() for t in threads]
    [t.join(timeout=900) for t in threads]
    assert not errors, errors[0]
    assert sorted(results[1].to_ints()) == sorted(msgs)
    assert results[3].equals(results[1])


def test_live_garbage_decryption_factors_isolated(tmp_path):
    """Party 2 publishes well-formed but WRONG decryption factors
    (all ones): the combined sigma verification fails, the per-party
    fallback isolates party 2, and the remaining >= threshold factors
    decrypt correctly (reference: DistrElGamalSession.java:488-515)."""
    k = 3
    params = ProtocolParams(
        sid="AdvDec", k=k, threshold=2,
        pgroup=ModPGroup.named("test256"),
    )
    group = params.pgroup
    plain = elgamal.plain_group(group, 1)
    ones = plain.one((N,)).to_bytetree().to_bytes()
    hub = LocalBoardHub(k)
    boards = [None] + [hub.board(j) for j in range(1, k + 1)]
    boards[2] = TamperBoard(
        boards[2], lambda lab: lab == "DecryptionFactors2",
        lambda data: ones,
    )
    msgs, results, errors = _run_parties(tmp_path, params, boards)
    honest_errors = [e for e in errors if e[0] != 2]
    assert not honest_errors, honest_errors[0][1]
    assert sorted(results[1].to_ints()) == sorted(msgs)
    assert results[3].equals(results[1])

    # CorrectIndices in party 1's transcript excludes party 2.
    from vmn_tpu.eio.bytetree import ByteTree

    ci = ByteTree.from_bytes(
        (tmp_path / "Party01" / "nizkp.adv" / "proofs" /
         "CorrectIndices.bt").read_bytes()
    )
    bits = list(ci.data)  # (k+1) slots; [0] unused
    assert bits[1] == 1 and bits[2] == 0 and bits[3] == 1


def test_live_coinflip_misopen_recovers(tmp_path):
    """Interactive mode: party 3 mis-opens every coin share; the
    source recovers each coin from the remaining >= threshold valid
    shares and the k=3 interactive mix completes
    (reference: CoinFlipPRing.java:71 recovery)."""
    k = 3
    params = ProtocolParams(
        sid="AdvCoin", k=k, threshold=2, noninteractive=False,
        pgroup=ModPGroup.named("test256"),
    )
    hub = LocalBoardHub(k)

    def garble(data):
        return b"\x00" * 4

    boards = [None] + [hub.board(j) for j in range(1, k + 1)]
    boards[3] = TamperBoard(
        boards[3], lambda lab: lab == "Shares", garble
    )
    msgs, results, errors = _run_parties(tmp_path, params, boards)
    assert not errors, errors[0][1]
    assert sorted(results[1].to_ints()) == sorted(msgs)
    for j in (2, 3):
        assert results[j].equals(results[1])


class CrashBoard:
    """Board proxy that simulates a crash: forwards the matching
    publish, then raises — the party dies right after its message
    reaches the board."""

    class Crash(Exception):
        pass

    def __init__(self, inner, label):
        self._inner = inner
        self._label = label

    def publish(self, label, data):
        self._inner.publish(label, data)
        if label == self._label:
            raise CrashBoard.Crash(label)

    def scope(self, sid):
        return CrashBoard(self._inner.scope(sid), self._label)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_kill_and_restart_mid_shuffle(tmp_path):
    """Party 2 crashes right after publishing its shuffled ciphertext
    list (before its PoS proof) and is RESTARTED with a fresh device
    random source.  Session randomness derives from a persisted seed,
    so the restarted party republishes byte-identical contributions,
    the board's idempotent-put accepts the replay, and the mix
    completes and verifies (reference: disk-cached secrets,
    PermutationCommitment.java:156-218,
    ShufflerElGamalSession.java:548-663)."""
    from vmn_tpu.crypto.randomsource import RandomDevice

    k = 3
    params = ProtocolParams(
        sid="Crash", k=k, threshold=2,
        pgroup=ModPGroup.named("test256"),
    )
    group = params.pgroup
    hub = LocalBoardHub(k)
    msgs = [group.encode_message(f"{i:08d}".encode()) for i in range(N)]
    results = [None] * (k + 1)
    errors = []
    barrier = threading.Barrier(k)

    def ciphs_for(pk):
        m = group.from_ints(msgs)
        r = group.ring.random((N,), SeededSource(b"encr"), 0)
        return elgamal.encrypt(pk, m, r)

    def run(j):
        try:
            board = hub.board(j)
            if j == 2:
                board = CrashBoard(board, "Ciphertext2")
            rs = SeededSource(f"party{j}".encode())
            p = MixNetParty(
                params, board, rs, str(tmp_path / f"Party{j:02d}")
            )
            pk = p.keygen()
            barrier.wait()
            try:
                results[j] = p.session("crash", 1).mix(ciphs_for(pk))
            except CrashBoard.Crash:
                # restart with a DIFFERENT (device) random source and a
                # clean board connection; persisted state must carry
                # the session randomness
                p2 = MixNetParty(
                    params, hub.board(j), RandomDevice(),
                    str(tmp_path / f"Party{j:02d}"),
                )
                p2.load_keys()
                results[j] = p2.session("crash", 1).mix(
                    ciphs_for(p2.full_public_key())
                )
        except Exception:  # noqa: BLE001
            import traceback

            errors.append(traceback.format_exc())

    threads = [threading.Thread(target=run, args=(j,), daemon=True)
               for j in range(1, k + 1)]
    [t.start() for t in threads]
    [t.join(timeout=900) for t in threads]
    assert not errors, errors[0]
    assert sorted(results[1].to_ints()) == sorted(msgs)
    for j in (2, 3):
        assert results[j].equals(results[1])

    nizkp = tmp_path / "Party01" / "nizkp.crash"
    assert FiatShamirVerifier(params, nizkp).verify(
        expected_type="mixing"
    ).ok
