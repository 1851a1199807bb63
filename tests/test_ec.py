"""EC group layer tests on P-256 (plus curve-constant sanity for all
named curves)."""

import numpy as np
import pytest

from vmn_tpu.arith.ec import _CURVES, ECqPGroup
from vmn_tpu.crypto.hash import SHA256
from vmn_tpu.crypto.prg import PRGHeuristic
from vmn_tpu.crypto.randomsource import SeededSource


@pytest.fixture(scope="module")
def grp():
    return ECqPGroup.named("P-256")


def _ref_add(grp, P, Q):
    """Reference affine point addition with Python ints."""
    p = grp.p
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if P == Q:
        lam = (3 * x1 * x1 + grp.a) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def _ref_mul(grp, P, k):
    acc = None
    add = P
    while k:
        if k & 1:
            acc = _ref_add(grp, acc, add)
        add = _ref_add(grp, add, add)
        k >>= 1
    return acc


def test_curve_constants():
    for name, (p, a, b, gx, gy, n) in _CURVES.items():
        assert (gy * gy - (gx**3 + a * gx + b)) % p == 0, name
        g = ECqPGroup.named(name)
        assert g.curve_y(gx) in (gy % p, (p - gy) % p), name


def test_generator_order(grp):
    # n*G = infinity
    e = grp.ring.from_int(grp.n % grp.ring.q)  # == 0 mod n
    out = grp.g.exp(e)
    assert grp.to_affine(out)[0] is None


def test_point_ops_parity(grp):
    rs = SeededSource(b"ec-test")
    ks = [rs.random_int_mod(grp.n) for _ in range(6)] + [0, 1, 2]
    G = (grp.gx, grp.gy)
    want = [_ref_mul(grp, G, k) for k in ks]
    e = grp.ring.from_ints(ks)
    got = grp.to_affine(grp.g.exp(e))
    assert got == want

    # add: P_i + P_j
    pts = grp.g.exp(e)
    doubled = pts.mul(pts)
    want2 = [_ref_add(grp, w, w) for w in want]
    assert grp.to_affine(doubled) == want2

    # inv / div
    assert grp.to_affine(pts.div(pts)) == [None] * len(ks)

    # prod
    acc = None
    for w in want:
        acc = _ref_add(grp, acc, w)
    assert grp.to_affine(pts.prod())[0] == acc


def test_exp_prod(grp):
    rs = SeededSource(b"ec-ep")
    ks = [rs.random_int_mod(grp.n) for _ in range(5)]
    es = [rs.random_int(64) for _ in range(5)]
    pts = grp.g.exp(grp.ring.from_ints(ks))
    got = grp.to_affine(pts.exp_prod(grp.ring.from_ints(es), 64))[0]
    want = _ref_mul(
        grp, (grp.gx, grp.gy),
        sum(k * e for k, e in zip(ks, es)) % grp.n,
    )
    assert got == want


def test_bytetree_roundtrip(grp):
    rs = SeededSource(b"ec-bt")
    ks = [rs.random_int_mod(grp.n) for _ in range(4)] + [0]  # incl inf
    pts = grp.g.exp(grp.ring.from_ints(ks))
    bt = pts.to_bytetree()
    back = grp.elem_from_bytetree(bt, 5)
    assert back.equals(pts)
    assert back.is_in_group()
    # scalar
    g2 = grp.elem_from_bytetree(grp.g.to_bytetree())
    assert g2.equals(grp.g)


def test_random_array(grp):
    prg = PRGHeuristic(SHA256)
    prg.set_seed(b"\x07" * 32)
    h = grp.random_array(5, prg, 10)
    assert h.is_in_group()
    affs = grp.to_affine(h)
    assert len({a[0] for a in affs}) == 5


def test_message_encoding(grp):
    for msg in (b"", b"hello world", b"x" * 20):
        pt = grp.encode_message(msg)
        assert grp.curve_y(pt[0]) is not None
        assert grp.decode_message(pt) == msg


@pytest.mark.parametrize("name", ["P-224", "P-384", "P-521"])
def test_point_ops_parity_all_curves(name):
    """Scalar-mul/add parity on the remaining NIST curves — covers the
    odd limb counts (14/24/33) the P-256 tests never exercise
    (reference: vec-accelerated curves, demo/mixnet/.conf notes)."""
    grp = ECqPGroup.named(name)
    rs = SeededSource(f"ec-{name}".encode())
    ks = [rs.random_int_mod(grp.n) for _ in range(3)] + [0, 1, 2]
    G = (grp.gx, grp.gy)
    want = [_ref_mul(grp, G, k) for k in ks]
    e = grp.ring.from_ints(ks)
    got = grp.to_affine(grp.g.exp(e))
    assert got == want

    # add/prod consistency: sum of the six multiples
    pts = grp.g.exp(e)
    total = pts.prod()
    ksum = sum(ks) % grp.n
    assert grp.to_affine(total)[0] == _ref_mul(grp, G, ksum)

    # serialization round trip at this coordinate width
    bt = pts.to_bytetree()
    back = grp.elem_from_bytetree(bt, len(ks))
    assert back.equals(pts)
