"""Byte-tree format tests (reference: VCR com.verificatum.eio.ByteTree,
format from the public Verificatum verifier spec)."""

import pytest

from vmn_tpu.eio import (
    ByteTree,
    ByteTreeError,
    leaf,
    node,
    int_leaf,
    string_leaf,
    signed_int_leaf,
    fixed_int_leaf,
)


def test_leaf_roundtrip():
    bt = leaf(b"\x01\x02\x03")
    assert bt.to_bytes() == b"\x01\x00\x00\x00\x03\x01\x02\x03"
    back = ByteTree.from_bytes(bt.to_bytes())
    assert back.is_leaf and back.data == b"\x01\x02\x03"


def test_node_roundtrip():
    bt = node(leaf(b"ab"), node(leaf(b""), leaf(b"c")))
    raw = bt.to_bytes()
    assert raw[0] == 0x00
    assert raw[1:5] == b"\x00\x00\x00\x02"
    back = ByteTree.from_bytes(raw)
    assert not back.is_leaf
    assert back[0].data == b"ab"
    assert back[1][0].data == b""
    assert back[1][1].data == b"c"


def test_empty_node():
    bt = node()
    assert bt.to_bytes() == b"\x00\x00\x00\x00\x00"
    assert len(ByteTree.from_bytes(bt.to_bytes())) == 0


def test_int_leaf():
    assert int_leaf(7).to_bytes() == b"\x01\x00\x00\x00\x04\x00\x00\x00\x07"
    assert int_leaf(-1).data == b"\xff\xff\xff\xff"


def test_signed_int_leaf_java_biginteger_semantics():
    # Java BigInteger.toByteArray: 255 -> 00 ff (sign bit preserved)
    assert signed_int_leaf(255).data == b"\x00\xff"
    assert signed_int_leaf(127).data == b"\x7f"
    assert signed_int_leaf(128).data == b"\x00\x80"
    assert signed_int_leaf(0).data == b"\x00"
    assert signed_int_leaf(255).to_int_signed() == 255


def test_fixed_int_leaf():
    assert fixed_int_leaf(255, 4).data == b"\x00\x00\x00\xff"
    with pytest.raises(OverflowError):
        fixed_int_leaf(1 << 32, 4)


def test_trailing_bytes_rejected():
    raw = leaf(b"x").to_bytes() + b"\x00"
    with pytest.raises(ByteTreeError):
        ByteTree.from_bytes(raw)


def test_truncated_rejected():
    raw = leaf(b"abcdef").to_bytes()[:-2]
    with pytest.raises(ByteTreeError):
        ByteTree.from_bytes(raw)


def test_total_size():
    bt = node(leaf(b"ab"), leaf(b"abcd"))
    assert bt.total_size() == len(bt.to_bytes())


def test_string_leaf_utf8():
    assert string_leaf("abc").data == b"abc"
    assert string_leaf("é").data == b"\xc3\xa9"


def test_file_roundtrip(tmp_path):
    bt = node(leaf(b"hello"), int_leaf(42))
    p = tmp_path / "x.bt"
    bt.write_file(p)
    assert ByteTree.read_file(p) == bt


# ----------------------------------------------------- lazy raw trees


def test_lazy_roundtrip_and_equality():
    from vmn_tpu.eio.bytetree import lazy_from_bytes

    t = node(leaf(b"abc"), node(leaf(b"x"), leaf(b"yz")), leaf(b""))
    raw = t.to_bytes()
    lz = lazy_from_bytes(raw)
    assert lz == t
    assert lz.to_bytes() == raw
    assert lz[0].data == b"abc"
    assert lz[1][1].data == b"yz"
    assert len(lz) == 3
    assert not lz.is_leaf and lz[0].is_leaf
    assert lz.total_size() == len(raw)
    # lazy children embedded under an eager node serialize correctly
    w = node(lz[1], leaf(b"q"))
    assert ByteTree.from_bytes(w.to_bytes()) == w
    assert w.total_size() == len(w.to_bytes())


def test_lazy_rejects_malformed():
    from vmn_tpu.eio.bytetree import lazy_from_bytes

    raw = node(leaf(b"abc"), leaf(b"d")).to_bytes()
    for bad in (raw[:-1], raw + b"\x00", b"\x02\x00\x00\x00\x01a", b""):
        with pytest.raises(ByteTreeError):
            lazy_from_bytes(bad)


def test_lazy_rejects_too_deep():
    from vmn_tpu.eio.bytetree import lazy_from_bytes

    deep = b"\x01\x00\x00\x00\x00"
    for _ in range(100):
        deep = b"\x00\x00\x00\x00\x01" + deep
    with pytest.raises(ByteTreeError):
        lazy_from_bytes(deep)


def test_lazy_type_errors_match_eager():
    from vmn_tpu.eio.bytetree import lazy_from_bytes

    lz = lazy_from_bytes(node(leaf(b"ab")).to_bytes())
    with pytest.raises(ByteTreeError):
        lz.data  # node has no data
    with pytest.raises(ByteTreeError):
        lz[0].children  # leaf has no children


def test_lazy_uniform_array_fast_paths():
    import numpy as np

    from vmn_tpu.eio.bytetree import (
        array_leaf_node,
        ec_points_node,
        lazy_from_bytes,
        parse_ec_point_array,
        parse_uniform_array,
    )

    arr = np.arange(512 * 16, dtype=np.uint8).reshape(512, 16)
    outer = node(array_leaf_node(arr), leaf(b"tail"))
    lz = lazy_from_bytes(outer.to_bytes())
    got = parse_uniform_array(lz[0])
    assert got is not None and np.array_equal(got, arr)

    xb = np.arange(256 * 33, dtype=np.uint8).reshape(256, 33) % 251
    yb = (xb + 7) % 251
    ec = lazy_from_bytes(ec_points_node(xb, yb).to_bytes())
    pair = parse_ec_point_array(ec, 33)
    assert pair is not None
    assert np.array_equal(pair[0], xb) and np.array_equal(pair[1], yb)
    # wrong coordinate width falls back to None, not a crash
    assert parse_ec_point_array(ec, 32) is None
