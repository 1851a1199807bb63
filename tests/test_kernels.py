"""Direct Pallas TPU kernel tests (interpret mode on CPU).

The kernels in vmn_tpu/ops/mont_kernels.py are the entire performance
story; these tests check them limb-for-limb against Python bignum
arithmetic without TPU hardware, including edge values (0, 1, m-1, zero
and maximal exponents).  A kernel regression previously would only have
surfaced as a wrong election result on hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vmn_tpu.arith.limbs import int_to_limbs, limbs_to_int
from vmn_tpu.arith.mont import MontCtx
from vmn_tpu.ops.mont_kernels import (
    mont_exp_pallas,
    mont_fb8_exp_pallas,
    mont_fb_exp_pallas,
    mont_mul_pallas,
)

P256 = int(
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff72ef",
    16,
)


@pytest.fixture(scope="module")
def ctx():
    return MontCtx(P256)


def _to_mont_np(ctx, xs):
    return np.asarray(
        ctx.to_mont(jnp.asarray(
            np.stack([int_to_limbs(x % ctx.m, ctx.L) for x in xs])
        ))
    )


def _from_mont_ints(ctx, arr):
    out = np.asarray(ctx.from_mont(jnp.asarray(arr)))
    return [limbs_to_int(row) for row in out]


def _edge_values(m):
    return [0, 1, 2, m - 1, m - 2, m // 2, 3, m // 3, 12345, m - 12345]


def test_mont_mul_pallas_interpret(ctx):
    m = ctx.m
    vals = _edge_values(m)
    a_ints = vals + vals[::-1]
    b_ints = vals[::-1] + vals
    a = jnp.asarray(_to_mont_np(ctx, a_ints))
    b = jnp.asarray(_to_mont_np(ctx, b_ints))
    with pltpu.force_tpu_interpret_mode():
        out = mont_mul_pallas(a, b, ctx.m_limbs, ctx.mprime)
    got = _from_mont_ints(ctx, np.asarray(out))
    # mont_mul of Montgomery forms yields Montgomery form of product
    want = [(x % m) * (y % m) % m for x, y in zip(a_ints, b_ints)]
    assert got == want


def test_mont_exp_pallas_interpret(ctx):
    m = ctx.m
    bases = [2, 1, m - 1, 3, 12345, m - 2, 7, 1 << 60]
    exps = [0, 1, 2, m - 2, (1 << 255) - 1, 65537, 50, 3]
    a = jnp.asarray(_to_mont_np(ctx, bases))
    e = jnp.asarray(
        np.stack([int_to_limbs(x, ctx.L) for x in exps])
    )
    with pltpu.force_tpu_interpret_mode():
        out = mont_exp_pallas(
            a, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256
        )
    got = _from_mont_ints(ctx, np.asarray(out))
    want = [pow(b % m, x, m) for b, x in zip(bases, exps)]
    assert got == want


def test_mont_fb_exp_pallas_interpret(ctx):
    m = ctx.m
    g = 4
    exps = [0, 1, 2, m - 2, (1 << 255) - 1, 65537, 50, 3]
    tbl = ctx.fb_table_pallas(g, 256)
    e = jnp.asarray(np.stack([int_to_limbs(x, ctx.L) for x in exps]))
    with pltpu.force_tpu_interpret_mode():
        out = mont_fb_exp_pallas(
            tbl, e, ctx.m_limbs, ctx.mprime, ctx.one_mont
        )
    got = _from_mont_ints(ctx, np.asarray(out))
    want = [pow(g, x, m) for x in exps]
    assert got == want


def test_mont_fb8_exp_pallas_interpret(ctx):
    m = ctx.m
    g = 4
    exps = [0, 1, 2, m - 2, (1 << 255) - 1, 65537, 50, 3]
    tbl = ctx.fixed_base_table(g, 256, 8)
    e = jnp.asarray(np.stack([int_to_limbs(x, ctx.L) for x in exps]))
    with pltpu.force_tpu_interpret_mode():
        out = mont_fb8_exp_pallas(
            tbl, e, ctx.m_limbs, ctx.mprime, ctx.one_mont
        )
    got = _from_mont_ints(ctx, np.asarray(out))
    want = [pow(g, x, m) for x in exps]
    assert got == want


def test_kernels_match_xla_path(ctx):
    """Pallas kernels and the portable XLA fallback agree on random
    batches (the dispatch layer switches between them by backend)."""
    from vmn_tpu.arith import mont as mont_mod

    rng = np.random.default_rng(7)
    N = 160
    a_ints = [int.from_bytes(rng.bytes(31), "big") % ctx.m
              for _ in range(N)]
    e_ints = [int.from_bytes(rng.bytes(31), "big") for _ in range(N)]
    a = jnp.asarray(_to_mont_np(ctx, a_ints))
    e = jnp.asarray(np.stack([int_to_limbs(x, ctx.L) for x in e_ints]))

    xla = mont_mod.mont_exp(
        a, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256
    )
    with pltpu.force_tpu_interpret_mode():
        pal = mont_exp_pallas(
            a, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256
        )
    assert np.array_equal(np.asarray(xla), np.asarray(pal))


def test_mont_expprod_pallas_interpret(ctx):
    """Digit-position-parallel multi-exp kernel vs Python bignum, over
    several batch sizes (padding paths) and exponent bit bounds."""
    from vmn_tpu.ops.mont_kernels import mont_expprod_pallas

    m = ctx.m
    rng = np.random.default_rng(11)
    for N, nbits in [(5, 256), (160, 256), (300, 100), (64, 16)]:
        b_ints = [int.from_bytes(rng.bytes(31), "big") % m
                  for _ in range(N)]
        e_ints = [
            int.from_bytes(rng.bytes((nbits + 7) // 8), "big")
            % (1 << nbits)
            for _ in range(N)
        ]
        # edge exponents: zero and the max bound
        e_ints[0] = 0
        e_ints[-1] = (1 << nbits) - 1
        b = jnp.asarray(_to_mont_np(ctx, b_ints))
        e = jnp.asarray(np.stack([int_to_limbs(x, ctx.L) for x in e_ints]))
        with pltpu.force_tpu_interpret_mode():
            out = mont_expprod_pallas(
                b, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, nbits
            )
        got = _from_mont_ints(ctx, np.asarray(out)[None])[0]
        want = 1
        for x, k in zip(b_ints, e_ints):
            want = want * pow(x, k, m) % m
        assert got == want, (N, nbits)


def test_mont_expprod_matches_host_straus(ctx):
    """Fused kernel vs the host-tree Straus path on a random batch."""
    from vmn_tpu.arith import mont as mont_mod

    rng = np.random.default_rng(13)
    N = 200
    a_ints = [int.from_bytes(rng.bytes(31), "big") % ctx.m
              for _ in range(N)]
    e_ints = [int.from_bytes(rng.bytes(32), "big") for _ in range(N)]
    a = jnp.asarray(_to_mont_np(ctx, a_ints))
    e = jnp.asarray(np.stack([int_to_limbs(x, ctx.L) for x in e_ints]))
    host = mont_mod._expprod_shared(
        a, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256, False
    )
    from vmn_tpu.ops.mont_kernels import mont_expprod_pallas

    with pltpu.force_tpu_interpret_mode():
        pal = mont_expprod_pallas(
            a, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256
        )
    assert np.array_equal(np.asarray(host), np.asarray(pal))


# ---------------------------------------------------------- EC kernels


def _host_ec_add(p, a, P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if P == Q:
        lam = (3 * x1 * x1 + a) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def _host_ec_mul(p, a, P, k):
    acc = None
    add = P
    while k:
        if k & 1:
            acc = _host_ec_add(p, a, acc, add)
        add = _host_ec_add(p, a, add, add)
        k >>= 1
    return acc


def test_ec_scalar_mul_pallas_interpret():
    """Fused Jacobian scalar-mul kernel vs host affine arithmetic,
    including identity scalars and the infinity input point."""
    from vmn_tpu.arith.ec import ECqPGroup
    from vmn_tpu.ops import ec_kernels, mont_kernels

    grp = ECqPGroup.named("P-256")
    ctx = grp.ctx
    p, a = grp.p, grp.a
    G = (grp.gx, grp.gy)
    scalars = [0, 1, 2, 3, grp.n - 1, grp.n - 2, 12345,
               (1 << 255) + 99, grp.n // 3, 7]
    pts = [_host_ec_mul(p, a, G, i + 2) for i in range(len(scalars))]
    want = [_host_ec_mul(p, a, pt, k) for pt, k in zip(pts, scalars)]

    xs = ctx.encode([pt[0] for pt in pts])
    ys = ctx.encode([pt[1] for pt in pts])
    inf = jnp.zeros((len(pts),), bool)
    Le = (256 + 15) // 16
    e = jnp.asarray(np.stack([
        int_to_limbs(k, Le) for k in scalars
    ]))

    old = mont_kernels.INTERPRET
    mont_kernels.INTERPRET = True
    try:
        X, Y, Z = ec_kernels.ec_scalar_mul_pallas(
            xs, ys, inf, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256
        )
        x_aff, y_aff, inf_out = grp.curve.normalize(X, Y, Z)
    finally:
        mont_kernels.INTERPRET = old
    got_x = _from_mont_ints(ctx, np.asarray(x_aff))
    got_y = _from_mont_ints(ctx, np.asarray(y_aff))
    infs = np.asarray(inf_out)
    for i, w in enumerate(want):
        if w is None:
            assert infs[i], f"row {i}: expected infinity"
        else:
            assert not infs[i] and (got_x[i], got_y[i]) == w, f"row {i}"

    # infinity input point stays infinity under any scalar
    X, Y, Z = None, None, None
    mont_kernels.INTERPRET = True
    try:
        X, Y, Z = ec_kernels.ec_scalar_mul_pallas(
            ctx.encode([0]), ctx.encode([0]), jnp.ones((1,), bool),
            e[:1], ctx.m_limbs, ctx.mprime, ctx.one_mont, 256,
        )
    finally:
        mont_kernels.INTERPRET = old
    assert np.all(np.asarray(Z) == 0)


def test_ec_point_add_pallas_interpret():
    """Jacobian add kernel vs host affine arithmetic, incl. P+P, P+(-P),
    inf+P and P+inf."""
    from vmn_tpu.arith.ec import ECqPGroup
    from vmn_tpu.ops import ec_kernels, mont_kernels

    grp = ECqPGroup.named("P-256")
    ctx = grp.ctx
    p, a = grp.p, grp.a
    G = (grp.gx, grp.gy)
    P2 = _host_ec_add(p, a, G, G)
    P3 = _host_ec_add(p, a, P2, G)
    negG = (G[0], p - G[1])
    cases = [
        (G, P2),      # general
        (G, G),       # double
        (G, negG),    # inverse -> inf
        (None, P3),   # inf + P
        (P3, None),   # P + inf
        (None, None),  # inf + inf
        (P2, P3),
        (P3, P3),
    ]
    want = [_host_ec_add(p, a, u, v) for u, v in cases]

    def enc(col):
        xs = ctx.encode([0 if q is None else q[0] for q in col])
        ys = ctx.encode([0 if q is None else q[1] for q in col])
        z = jnp.stack([
            jnp.zeros((ctx.L,), jnp.uint32) if q is None
            else jnp.asarray(ctx.one_mont) for q in col
        ])
        return xs, ys, z

    x1, y1, z1 = enc([c[0] for c in cases])
    x2, y2, z2 = enc([c[1] for c in cases])
    old = mont_kernels.INTERPRET
    mont_kernels.INTERPRET = True
    try:
        X, Y, Z = ec_kernels.ec_point_add_pallas(
            x1, y1, z1, x2, y2, z2, ctx.m_limbs, ctx.mprime
        )
        x_aff, y_aff, inf_out = grp.curve.normalize(X, Y, Z)
    finally:
        mont_kernels.INTERPRET = old
    got_x = _from_mont_ints(ctx, np.asarray(x_aff))
    got_y = _from_mont_ints(ctx, np.asarray(y_aff))
    infs = np.asarray(inf_out)
    for i, w in enumerate(want):
        if w is None:
            assert infs[i], f"case {i}: expected infinity"
        else:
            assert not infs[i] and (got_x[i], got_y[i]) == w, f"case {i}"


def test_ec_multiexp_pallas_interpret(monkeypatch):
    """Digit-position-parallel EC multi-exp kernel vs host arithmetic,
    over batch sizes exercising padding and a zero/max scalar."""
    from vmn_tpu.arith.ec import ECqPGroup
    from vmn_tpu.ops import ec_kernels, mont_kernels

    # small position-block unroll + tile keep the interpret-mode XLA
    # graph compilable in seconds (CPU inlines every kernel op; on TPU
    # Mosaic compiles the kernel once)
    monkeypatch.setattr(ec_kernels, "_EP_JB", 4)
    monkeypatch.setattr(ec_kernels, "TILE_N", 128)

    grp = ECqPGroup.named("P-256")
    ctx = grp.ctx
    p, a = grp.p, grp.a
    G = (grp.gx, grp.gy)
    rng = np.random.default_rng(17)
    # small nbits keep the interpret-mode graphs compilable in seconds
    # on CPU; digit/padding logic is identical at any size
    for N, nbits in [(5, 64), (70, 32)]:
        pts = [_host_ec_mul(p, a, G, i + 2) for i in range(N)]
        ks = [int.from_bytes(rng.bytes((nbits + 7) // 8), "big")
              % (1 << nbits) for _ in range(N)]
        ks[0] = 0
        ks[-1] = (1 << nbits) - 1
        want = None
        for pt, k in zip(pts, ks):
            want = _host_ec_add(p, a, want, _host_ec_mul(p, a, pt, k))
        xs = ctx.encode([pt[0] for pt in pts])
        ys = ctx.encode([pt[1] for pt in pts])
        inf = jnp.zeros((N,), bool)
        Le = (nbits + 15) // 16
        e = jnp.asarray(np.stack([int_to_limbs(k, Le) for k in ks]))
        old = mont_kernels.INTERPRET
        mont_kernels.INTERPRET = True
        try:
            X, Y, Z = ec_kernels.ec_multiexp_pallas(
                grp.curve, xs, ys, inf, e, nbits
            )
            x_aff, y_aff, inf_out = grp.curve.normalize(X, Y, Z)
        finally:
            mont_kernels.INTERPRET = old
        gx = _from_mont_ints(ctx, np.asarray(x_aff)[None])[0]
        gy = _from_mont_ints(ctx, np.asarray(y_aff)[None])[0]
        assert (gx, gy) == want, (N, nbits)


def test_ec_fb_exp_pallas_interpret(monkeypatch):
    """Windowed fixed-base EC kernel vs host arithmetic (table built on
    device), incl. scalar 0 -> infinity."""
    from vmn_tpu.arith.ec import ECqPGroup, _ec_fb_table_device
    from vmn_tpu.ops import ec_kernels, mont_kernels

    monkeypatch.setattr(ec_kernels, "TILE_N", 128)

    grp = ECqPGroup.named("P-256")
    ctx = grp.ctx
    p, a = grp.p, grp.a
    G = (grp.gx, grp.gy)
    scalars = [0, 1, 2, (1 << 64) - 1, 12345, (1 << 63) + 99, 7]
    want = [_host_ec_mul(p, a, G, k) for k in scalars]
    gpt = grp.g
    X0, Y0, Z0 = gpt._jac()
    tbx, tby = _ec_fb_table_device(grp.curve, X0, Y0, Z0, 16)
    Le = (64 + 15) // 16
    e = jnp.asarray(np.stack([int_to_limbs(k, Le) for k in scalars]))
    old = mont_kernels.INTERPRET
    mont_kernels.INTERPRET = True
    try:
        X, Y, Z = ec_kernels.ec_fb_exp_pallas(
            tbx, tby, e, ctx.m_limbs, ctx.mprime, ctx.one_mont
        )
        x_aff, y_aff, inf_out = grp.curve.normalize(X, Y, Z)
    finally:
        mont_kernels.INTERPRET = old
    got_x = _from_mont_ints(ctx, np.asarray(x_aff))
    got_y = _from_mont_ints(ctx, np.asarray(y_aff))
    infs = np.asarray(inf_out)
    for i, w in enumerate(want):
        if w is None:
            assert infs[i], f"row {i}: expected infinity"
        else:
            assert not infs[i] and (got_x[i], got_y[i]) == w, f"row {i}"
