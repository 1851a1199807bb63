"""Warm, step-level profile of the k=1 decryption internals.

Usage: python tools/profile_decrypt.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384

    from vmn_tpu.arith.pgroup import ModPGroup
    from vmn_tpu.crypto.hash import SHA256
    from vmn_tpu.crypto.prg import PRGHeuristic
    from vmn_tpu.crypto.randomsource import SeededSource
    from vmn_tpu.protocol import elgamal

    group = ModPGroup.named("modp2048")
    ring = group.ring
    rs = SeededSource(b"dec")
    prg = PRGHeuristic(SHA256)
    prg.set_seed(SHA256.hash(b"dec-msgs"))

    kp = elgamal.keygen(group, rs)
    x, pk = kp.sk, kp.pk
    m = group.random_array(n, prg, 128)
    r = ring.random((n,), rs, 0)
    w = elgamal.encrypt(pk, m, r)

    t0 = [time.perf_counter()]

    def _sync_fetch(obj):
        np.asarray(obj[(slice(0, 1),) * obj.ndim])

    def mark(name, obj=None):
        if obj is not None:
            _sync_fetch(obj)
        t = time.perf_counter()
        print(f"  {name:28s} {t - t0[0]:7.2f}s", flush=True)
        t0[0] = time.perf_counter()

    for it in range(2):
        print(f"--- iteration {it}", flush=True)
        u = w.project(0)
        v_comp = w.project(1)
        f = u.exp(x.neg())
        mark("factors u^-x (full exp)", f.limbs)
        fb = f.to_bytetree().to_bytes()
        mark(f"fetch+encode factors ({len(fb)>>20}MB)")
        e = ring.random_bits_prg(n, 256, prg)
        mark("batch vector e", e.limbs)
        A = u.exp_prod(e, 256)
        mark("A = expprod u^e (256b)", A.limbs)
        rr = ring.random((), rs, 128)
        yp = group.g.exp(rr)
        Bp = A.exp(rr)
        mark("commitments yp, Bp", Bp.limbs)
        v_f = ring.random((), rs, 0)
        kx = x.neg().mul(v_f).add(rr)
        mark("reply kx", kx.limbs)
        # combined verification: g^kx = yp * y^-v ; A^kx * F^v = Bp * ...
        F = f.exp_prod(e, 256)
        mark("F = expprod f^e (256b)", F.limbs)
        lhs = A.exp(kx)
        mark("A^kx (full exp, scalar)", lhs.limbs)
        pl = v_comp.mul(f)
        mark("plaintext mul", pl.limbs)
        pb = pl.to_bytetree().to_bytes()
        mark(f"fetch+encode plain ({len(pb)>>20}MB)")


if __name__ == "__main__":
    main()
