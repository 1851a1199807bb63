"""Benchmark suite: micro kernel rates, scaling curves, roofline.

The §6 measurement surface (reference: demo/mixnet/benchmarks —
`*_lengths`, `*_parties`, `*_keywidths_widths` scaling runs + report
extraction; BASELINE.md targets: modexp/s/chip and ciphertexts/s).

Writes BENCH_micro.json at the repo root:

    {"micro": {...per-op rates...},
     "mix_lengths": [{"n": N, "cps": ...}, ...],
     "mix_parties": [{"k": K, "cps": ...}, ...],
     "mix_widths": [{"width": W, "cps": ...}, ...],
     "roofline": {...}}

Run on the TPU host:  python -m tools.bench_suite [sections]
sections ⊆ {micro, lengths, parties, widths} (default: all).
"""

import json
import os
import sys
import time
from pathlib import Path


import jax
import jax.numpy as jnp
import numpy as np

ROOT = Path(__file__).resolve().parent.parent


@jax.jit
def _first(o):
    return o.reshape(-1)[0]


def _force(out):
    np.asarray(_first(out))


def _timeit(fn, reps=3):
    out = fn()
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        _force(fn())
    return (time.perf_counter() - t0) / reps


def bench_micro():
    from vmn_tpu.arith.pgroup import ModPGroup
    from vmn_tpu.ops.mont_kernels import (
        mont_exp_pallas,
        mont_fb8_exp_pallas,
        mont_fb_exp_pallas,
        mont_mul_pallas,
    )

    group = ModPGroup.named("modp2048")
    ctx = group.ctx
    rng = np.random.default_rng(0)
    out = {}
    N = 65536
    a = ctx.encode([int(rng.integers(2, 2**63)) for _ in range(64)])
    a = jnp.tile(a, (N // 64, 1))
    e_full = jnp.asarray(
        rng.integers(0, 1 << 16, size=(N, 128), dtype=np.uint32)
    )
    e_256 = jnp.asarray(
        rng.integers(0, 1 << 16, size=(N, 16), dtype=np.uint32)
    )

    t = _timeit(lambda: mont_mul_pallas(a, a, ctx.m_limbs, ctx.mprime))
    out["mont_mul_per_sec"] = round(N / t)

    n_exp = 8192
    t = _timeit(lambda: mont_exp_pallas(
        a[:n_exp], e_full[:n_exp], ctx.m_limbs, ctx.mprime,
        ctx.one_mont, 2048,
    ))
    out["modexp_2048bit_per_sec_per_chip"] = round(n_exp / t, 1)

    t = _timeit(lambda: mont_exp_pallas(
        a, e_256, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256
    ))
    out["modexp_256bit_per_sec_per_chip"] = round(N / t, 1)

    t4 = ctx.fb_table_pallas(group.g_int, 2048)
    t = _timeit(lambda: mont_fb_exp_pallas(
        t4, e_full, ctx.m_limbs, ctx.mprime, ctx.one_mont
    ))
    out["fixed_base_w4_per_sec"] = round(N / t, 1)

    t8 = ctx.fixed_base_table(group.g_int, 2048, 8)
    t = _timeit(lambda: mont_fb8_exp_pallas(
        t8, e_full, ctx.m_limbs, ctx.mprime, ctx.one_mont
    ))
    out["fixed_base_w8_per_sec"] = round(N / t, 1)

    t = _timeit(lambda: ctx.expprod(a, e_256, 256))
    out["expprod_256bit_per_sec"] = round(N / t, 1)
    t = _timeit(lambda: ctx.expprod(a, e_full, 2047))
    out["expprod_2047bit_per_sec"] = round(N / t, 1)

    # EC P-256: fused Jacobian scalar-mul kernel (the reference default
    # bench group, bench_config:33-45, served there by native `vec`).
    from vmn_tpu.arith.ec import ECqPGroup
    from vmn_tpu.ops.ec_kernels import ec_scalar_mul_pallas

    ec = ECqPGroup.named("P-256")
    ectx = ec.ctx
    n_ec = 16384
    pts = ec.g.broadcast(n_ec)
    e_ec = jnp.asarray(
        rng.integers(0, 1 << 16, size=(n_ec, 16), dtype=np.uint32)
    )

    def _ec_run():
        X, Y, Z = ec_scalar_mul_pallas(
            pts.x, pts.y, pts.inf, e_ec, ectx.m_limbs, ectx.mprime,
            ectx.one_mont, 256,
        )
        return X

    t = _timeit(_ec_run)
    out["p256_scalar_mul_per_sec_per_chip"] = round(n_ec / t, 1)

    # EC simultaneous multi-exp: sum_i e_i*P_i via the fused
    # digit-position-parallel Straus kernel (reference: vec/gmpmee
    # spowm over EC, SURVEY.md §2.3).  Benched at N=2^17 — the
    # dispatch crossover where it beats naive scalar-mul + add-tree
    # (arith/ec.py exp_prod).
    from vmn_tpu.ops.ec_kernels import ec_multiexp_pallas

    # Distinct random bases P_i = s_i * G — production multi-exp inputs
    # are arbitrary array elements, not copies of one point; identical
    # bases would collapse the result to (sum e_i)*G and hide a
    # per-element kernel bug behind a still-plausible rate.
    n_mx = 1 << 17
    pts_g = ec.g.broadcast(n_mx)
    s_mx = jnp.asarray(
        rng.integers(0, 1 << 16, size=(n_mx, 16), dtype=np.uint32)
    )
    Xr, Yr, Zr = ec_scalar_mul_pallas(
        pts_g.x, pts_g.y, pts_g.inf, s_mx, ectx.m_limbs, ectx.mprime,
        ectx.one_mont, 256,
    )
    bx, by, binf = ec.curve.normalize(Xr, Yr, Zr)
    e_mx = jnp.asarray(
        rng.integers(0, 1 << 16, size=(n_mx, 16), dtype=np.uint32)
    )

    # Cheap correctness gate before publishing a rate: kernel multi-exp
    # at small N must equal per-element scalar-mul + product tree.
    from vmn_tpu.arith.ec import ECArray

    ns = 256
    Xs, Ys, Zs = ec_multiexp_pallas(
        ec.curve, bx[:ns], by[:ns], binf[:ns], e_mx[:ns], 256
    )
    gx, gy, ginf = ec.curve.normalize(Xs, Ys, Zs)
    Xn, Yn, Zn = ec_scalar_mul_pallas(
        bx[:ns], by[:ns], binf[:ns], e_mx[:ns], ectx.m_limbs,
        ectx.mprime, ectx.one_mont, 256,
    )
    nx, ny, ninf = ec.curve.normalize(Xn, Yn, Zn)
    want = ECArray(ec, nx, ny, ninf).prod()
    if not (
        np.array_equal(np.asarray(gx), np.asarray(want.x))
        and np.array_equal(np.asarray(gy), np.asarray(want.y))
        and bool(np.asarray(ginf)) == bool(np.asarray(want.inf))
    ):
        raise AssertionError("EC multi-exp kernel mismatch vs naive path")

    def _mx_run():
        X, _, _ = ec_multiexp_pallas(
            ec.curve, bx, by, binf, e_mx, 256
        )
        return X

    t = _timeit(_mx_run)
    out["p256_multiexp_per_sec_per_chip"] = round(n_mx / t, 1)
    # EC fixed-base: no separate micro row — the windowed-table kernel
    # is kept out of the production dispatch (measured 4.6x layout
    # penalty, arith/ec.py _exp_impl) so shared-base EC exps ride the
    # general fused scalar-mul kernel benched above.

    # Roofline: in-kernel Montgomery product rate vs VPU lane-op bound.
    # One CIOS product = L iterations x (2 muls + ~8 adds/shifts/masks)
    # over L-limb rows = ~10*L^2 = 164k lane-ops at L=128.
    exp_t = n_exp / out["modexp_2048bit_per_sec_per_chip"]
    mults_per_exp = 2048 + 512 + 14  # squarings + windows + table
    in_kernel_mults = out["modexp_2048bit_per_sec_per_chip"] * mults_per_exp
    lane_ops = in_kernel_mults * 10 * 128 * 128
    out["roofline"] = {
        "in_kernel_montmul_per_sec": round(in_kernel_mults),
        "lane_ops_per_sec": f"{lane_ops:.3e}",
        "note": (
            "~10 VPU lane-ops per limb-pair per CIOS iteration; v5e "
            "VPU peak is O(1e12-4e12) lane-ops/s — the exp kernel "
            "runs within a small factor of the integer-multiply bound"
        ),
    }
    return out


def _mix_once(n, k=1, threshold=1, width=1, group_name="modp2048",
              time_verify=False, noninteractive=True,
              check_correct=False):
    """One timed in-process mix (threads for k>1); returns ciphs/s."""
    import tempfile
    import threading
    from pathlib import Path

    from vmn_tpu.arith.pgroup import ModPGroup, PPArray
    from vmn_tpu.crypto.hash import SHA256
    from vmn_tpu.crypto.prg import PRGHeuristic
    from vmn_tpu.crypto.randomsource import DeviceSource, SeededSource
    from vmn_tpu.protocol import elgamal
    from vmn_tpu.protocol.com.board import LocalBoardHub
    from vmn_tpu.protocol.context import ProtocolParams
    from vmn_tpu.protocol.mixnet.party import MixNetParty

    if group_name.startswith("P-"):
        from vmn_tpu.arith.ec import ECqPGroup

        group = ECqPGroup.named(group_name)
    else:
        group = ModPGroup.named(group_name)
    params = ProtocolParams(
        sid=f"BS{n}.{k}.{width}.{group_name}.{int(noninteractive)}",
        k=k, threshold=threshold, pgroup=group,
        noninteractive=noninteractive,
    )
    hub = LocalBoardHub(k)
    with tempfile.TemporaryDirectory() as tmp:
        parties = [None] * (k + 1)
        errs = []

        def keyg(j):
            try:
                p = MixNetParty(params, hub.board(j),
                                DeviceSource(f"bs{j}".encode()),
                                f"{tmp}/P{j}")
                p.keygen()
                parties[j] = p
            except Exception:  # noqa: BLE001
                import traceback

                errs.append(traceback.format_exc())

        ths = [threading.Thread(target=keyg, args=(j,))
               for j in range(1, k + 1)]
        [t.start() for t in ths]
        [t.join() for t in ths]
        assert not errs, errs[0]
        pk = parties[1].full_public_key()

        prg = PRGHeuristic(SHA256)
        prg.set_seed(SHA256.hash(b"bs-msgs"))
        m = group.random_array(n, prg, params.rbitlen)
        if width > 1:
            plain = elgamal.plain_group(group, width)
            m = PPArray(plain, tuple([m] * width))
        r = elgamal.plain_group(group, width).ring.random(
            (n,), SeededSource(b"bs-enc"), 0
        )
        ciphs = elgamal.encrypt(pk.widen(width), m, r)
        del r  # 0.5 GB at N=2^20 — dead after encryption
        jax.block_until_ready(jax.tree_util.tree_leaves(
            [getattr(c, "limbs", getattr(c, "x", None))
             for c in _leaves(ciphs)]
        ))

        # warm pass
        hub2 = LocalBoardHub(k)
        _run_mix(parties, hub2, "warm", width, ciphs, k)
        import gc

        gc.collect()  # free warm-pass device buffers before timing
        hub3 = LocalBoardHub(k)
        t0 = time.time()
        outs = _run_mix(parties, hub3, "timed", width, ciphs, k)
        leaf = outs[1]
        while hasattr(leaf, "components"):
            leaf = leaf.project(0)
        np.asarray(getattr(leaf, "limbs", getattr(leaf, "x", None)))
        dt = time.time() - t0
        correct = None
        if check_correct:
            correct = sorted(leaf.to_ints()) == sorted(m.to_ints())
        dt_verify = None
        if time_verify:
            from vmn_tpu.protocol.mixnet.verifier import (
                FiatShamirVerifier,
            )

            # warm, then timed (vmnv equivalent on the nizkp transcript)
            FiatShamirVerifier(
                params, Path(tmp) / "P1" / "nizkp.warm"
            ).verify(expected_type="mixing")
            t0 = time.time()
            vres = FiatShamirVerifier(
                params, Path(tmp) / "P1" / "nizkp.timed"
            ).verify(expected_type="mixing")
            assert vres.ok
            dt_verify = time.time() - t0
    if check_correct and time_verify:
        return n / dt, dt, dt_verify, correct
    if time_verify:
        return n / dt, dt, dt_verify
    return n / dt, dt


def _leaves(pp):
    if hasattr(pp, "components"):
        out = []
        for c in pp.components:
            out.extend(_leaves(c))
        return out
    return [pp]


def _run_mix(parties, hub, aux, width, ciphs, k):
    import threading

    outs = [None] * (k + 1)
    errs = []

    def mix(j):
        try:
            parties[j].board = hub.board(j)
            outs[j] = parties[j].session(aux, width).mix(ciphs)
        except Exception:  # noqa: BLE001
            import traceback

            errs.append(traceback.format_exc())

    ths = [threading.Thread(target=mix, args=(j,))
           for j in range(1, k + 1)]
    [t.start() for t in ths]
    [t.join() for t in ths]
    assert not errs, errs[0]
    return outs


def main():
    sections = sys.argv[1:] or [
        "micro", "lengths", "parties", "widths", "p256", "verify",
        "interactive",
    ]
    path = ROOT / "BENCH_micro.json"
    report = {}
    if path.exists():
        report = json.loads(path.read_text())

    def _flush():
        report["meta"] = {
            "group": "modp2048",
            "device": str(jax.devices()[0]),
            "note": "single chip over the dev tunnel; host<->device "
                    "transfer rides the tunnel and is much faster on a "
                    "real TPU host",
        }
        path.write_text(json.dumps(report, indent=1) + "\n")

    if "micro" in sections:
        report["micro"] = bench_micro()
        print(json.dumps({"micro": report["micro"]}, indent=1))
        _flush()

    if "lengths" in sections:
        rows = []
        for n in (4096, 16384, 65536):
            cps, dt = _mix_once(n)
            rows.append({"n": n, "cps": round(cps, 1),
                         "seconds": round(dt, 1)})
            print(rows[-1])
        report["mix_lengths"] = rows
        _flush()

    if "parties" in sections:
        rows = []
        for k in (1, 3):
            cps, dt = _mix_once(8192, k=k, threshold=max(1, k - 1))
            rows.append({"k": k, "n": 8192, "cps": round(cps, 1),
                         "seconds": round(dt, 1)})
            print(rows[-1])
        report["mix_parties"] = rows
        _flush()

    if "widths" in sections:
        rows = []
        for w in (1, 2):
            cps, dt = _mix_once(8192, width=w)
            rows.append({"width": w, "n": 8192, "cps": round(cps, 1),
                         "seconds": round(dt, 1)})
            print(rows[-1])
        report["mix_widths"] = rows
        _flush()

    if "p256" in sections:
        cps, dt, dtv = _mix_once(16384, group_name="P-256",
                                 time_verify=True)
        report["mix_p256"] = {
            "n": 16384, "cps": round(cps, 1), "seconds": round(dt, 1),
            "verify_seconds": round(dtv, 1),
            "verify_cps": round(16384 / dtv, 1),
        }
        print(report["mix_p256"])
        _flush()

    if "verify" in sections:
        cps, dt, dtv = _mix_once(65536, time_verify=True)
        report["mix_verify_2048"] = {
            "n": 65536, "cps": round(cps, 1), "seconds": round(dt, 1),
            "verify_seconds": round(dtv, 1),
            "verify_cps": round(65536 / dtv, 1),
            "mix_prove_verify_cps": round(65536 / (dt + dtv), 1),
        }
        print(report["mix_verify_2048"])
        _flush()

    if "northstar" in sections:
        # The north star: full mix+prove+verify at N=2^20 (pushable to
        # 10^6 via VMN_NORTHSTAR_N), 2048-bit, on the chip — the
        # reference's mixing_lengths axis taken to production scale
        # (demo/mixnet/benchmarks/bench_config:33-46; BASELINE.json).
        n = int(os.environ.get("VMN_NORTHSTAR_N", str(1 << 20)))
        cps, dt, dtv, ok = _mix_once(n, time_verify=True,
                                     check_correct=True)
        report["northstar"] = {
            "n": n, "cps": round(cps, 1), "seconds": round(dt, 1),
            "verify_seconds": round(dtv, 1),
            "verify_cps": round(n / dtv, 1),
            "mix_prove_verify_cps": round(n / (dt + dtv), 1),
            "correct": bool(ok), "verify_ok": True,
        }
        print(report["northstar"])
        _flush()

    if "interactive" in sections:
        # Interactive vs Fiat-Shamir correctness proofs, k=3 at two
        # sizes (reference: `interactive` row of .checkbaseconf; the
        # interactive path adds the coin-flipping challenge rounds)
        rows = []
        for n in (4096, 16384):
            cps_fs, dt_fs = _mix_once(n, k=3, threshold=2)
            cps_int, dt_int = _mix_once(
                n, k=3, threshold=2, noninteractive=False
            )
            rows.append({
                "n": n, "k": 3,
                "fs_seconds": round(dt_fs, 1),
                "interactive_seconds": round(dt_int, 1),
                "interactive_over_fs": round(dt_int / dt_fs, 2),
            })
            print(rows[-1])
        report["interactive"] = rows
        _flush()

    _flush()
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
