"""Signed HTTP bulletin board: publish/wait_for round trip across three
in-process servers, signature rejection, scoping."""

import threading

import pytest

from vmn_tpu.crypto.randomsource import SeededSource
from vmn_tpu.crypto.signature import SignatureKeyPair
from vmn_tpu.protocol.com.board import BoardError
from vmn_tpu.protocol.com.http import HTTPBulletinBoard
from vmn_tpu.protocol.info import PartyInfo, PrivateInfo, ProtocolInfo


def _free_ports(n):
    import socket

    socks = []
    ports = []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        socks.append(s)
        ports.append(s.getsockname()[1])
    for s in socks:
        s.close()
    return ports


def test_signature_roundtrip():
    rs = SeededSource(b"sig-test")
    kp = SignatureKeyPair.generate(rs, "test256")
    sig = kp.sign(b"hello", rs)
    assert kp.public.verify(b"hello", sig)
    assert not kp.public.verify(b"hellO", sig)
    bad = bytearray(sig)
    bad[-1] ^= 1
    assert not kp.public.verify(b"hello", bytes(bad))
    # hex round trip
    kp2 = SignatureKeyPair.from_hex(kp.to_hex())
    assert kp2.public.verify(b"hello", kp.sign(b"hello", rs))


def test_http_board(tmp_path):
    k = 3
    rs = SeededSource(b"board-test")
    keys = [None] + [
        SignatureKeyPair.generate(rs, "test256") for _ in range(k)
    ]
    ports = _free_ports(2 * k)
    prot = ProtocolInfo(nopart=k, parties=[
        PartyInfo(
            name=f"P{j}",
            pkey=keys[j].public.to_hex(),
            http=f"http://127.0.0.1:{ports[2 * (j - 1)]}",
            hint=f"127.0.0.1:{ports[2 * (j - 1) + 1]}",
        )
        for j in range(1, k + 1)
    ])
    privs = [None] + [
        PrivateInfo(name=f"P{j}", skey=keys[j].to_hex(),
                    dir=str(tmp_path / f"p{j}"))
        for j in range(1, k + 1)
    ]
    boards = [None] + [
        HTTPBulletinBoard(prot, privs[j], j) for j in range(1, k + 1)
    ]
    try:
        # basic publish / wait_for across parties
        boards[1].publish("Hello", b"from-1")
        assert boards[2].wait_for(1, "Hello") == b"from-1"
        assert boards[3].wait_for(1, "Hello") == b"from-1"

        # scoped labels are independent
        s2 = boards[2].scope("sess")
        s2.publish("Hello", b"scoped-2")
        assert boards[1].scope("sess").wait_for(2, "Hello") == b"scoped-2"

        # concurrent wait unblocks on publish (hint or poll)
        result = {}

        def waiter():
            result["v"] = boards[3].wait_for(2, "Late")

        t = threading.Thread(target=waiter)
        t.start()
        boards[2].publish("Late", b"late-msg")
        t.join(timeout=30)
        assert result.get("v") == b"late-msg"

        # tampered signature is rejected: forge store content
        root1 = boards[1]
        from vmn_tpu.eio.bytetree import leaf, node

        fake = node(leaf(b"evil"), leaf(b"\x00" * 288)).to_bytes()
        root1._store.put("Forged", fake)
        with pytest.raises(BoardError):
            boards[2].wait_for(1, "Forged")

        # accounting
        assert boards[1].sent_bytes > 0
        assert boards[2].received_bytes > 0
    finally:
        for j in range(1, k + 1):
            boards[j].shutdown()


def test_board_persists_across_restart(tmp_path):
    """The disk-backed store re-serves previously published messages
    after a restart (board side of crash recovery), and idempotent
    re-publish of identical content is a no-op while changed content
    is refused."""
    rs = SeededSource(b"persist-test")
    kp = SignatureKeyPair.generate(rs, "test256")

    def mk_prot(ports):
        return ProtocolInfo(nopart=1, parties=[
            PartyInfo(name="P1", pkey=kp.public.to_hex(),
                      http=f"http://127.0.0.1:{ports[0]}",
                      hint=f"127.0.0.1:{ports[1]}")
        ])

    prot = mk_prot(_free_ports(2))
    priv = PrivateInfo(name="P1", skey=kp.to_hex(),
                       dir=str(tmp_path / "p1"))

    b1 = HTTPBulletinBoard(prot, priv, 1)
    try:
        b1.publish("Durable", b"payload-1")
        b1.publish("Durable", b"payload-1")  # idempotent no-op
        with pytest.raises(BoardError):
            b1.publish("Durable", b"payload-CHANGED")
    finally:
        b1.shutdown()

    # Fresh process equivalent: new board over the same directory
    # (fresh ports: the OS may hold the old listener in TIME_WAIT).
    b2 = HTTPBulletinBoard(mk_prot(_free_ports(2)), priv, 1)
    try:
        assert b2.wait_for(1, "Durable") == b"payload-1"
    finally:
        b2.shutdown()


def test_store_scope_pruning(tmp_path):
    """`vmn -delete` prunes a session's board spool: messages under the
    deleted scope disappear from disk and memory; other scopes stay
    (reference: MixNetElGamalSession.deleteState:136-150)."""
    from vmn_tpu.protocol.com.http import _Store

    st = _Store(tmp_path / "spool")
    st.put("session.aux/shuffle/Ciphertext1", b"a" * 10)
    st.put("session.other/shuffle/Ciphertext1", b"b" * 10)
    st.put("toplevel", b"c")
    st.delete_scope("session.aux")
    assert st.get("session.aux/shuffle/Ciphertext1") is None
    assert st.get("session.other/shuffle/Ciphertext1") == b"b" * 10
    assert st.get("toplevel") == b"c"
    # restart from the same spool: deletion is durable
    st2 = _Store(tmp_path / "spool")
    assert st2.get("session.aux/shuffle/Ciphertext1") is None
    assert st2.get("session.other/shuffle/Ciphertext1") == b"b" * 10


def test_local_board_scope_pruning():
    from vmn_tpu.protocol.com.board import LocalBoardHub

    hub = LocalBoardHub(2)
    b1 = hub.board(1)
    b1.scope("session.aux").publish("X", b"1")
    b1.scope("session.keep").publish("X", b"2")
    b1.delete_scope("session.aux")
    assert (1, "session.keep/X") in hub._messages
    assert (1, "session.aux/X") not in hub._messages
