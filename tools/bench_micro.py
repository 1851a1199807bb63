"""Microbenchmark: modexp/s/chip for the Montgomery paths.

Compares the portable XLA path against the Pallas kernels on whatever
backend JAX selects (run on TPU for real numbers; BASELINE.md target is
"modexp/s/chip: speed-of-light per chip").

Usage: python tools/bench_micro.py [N] [BITS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def _sync(out):
    # block_until_ready is unreliable over the axon tunnel; force a
    # small device->host transfer of a slice of the result instead.
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        np.asarray(leaf[..., :1])


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    from vmn_tpu.arith.mont import MontCtx
    from vmn_tpu.arith import mont

    rng = np.random.RandomState(1)
    # random odd modulus of the requested size
    m = (int.from_bytes(rng.bytes(bits // 8), "big") | (1 << (bits - 1))) | 1
    ctx = MontCtx(m)
    xs = [int.from_bytes(rng.bytes(bits // 8), "big") % m for _ in range(n)]
    es = [int.from_bytes(rng.bytes(bits // 8), "big") % m for _ in range(n)]
    a = ctx.encode(xs)
    e = ctx.encode_std(es)

    print(f"backend={jax.default_backend()} n={n} bits={bits} L={ctx.L}")

    t = timeit(lambda a, b: mont.mont_mul(a, b, ctx.m_limbs, ctx.mprime), a, a)
    print(f"xla   mont_mul : {t*1e3:9.3f} ms  {n/t:12.0f} mul/s")

    try:
        from vmn_tpu.ops.mont_kernels import mont_mul_pallas

        t = timeit(lambda a, b: mont_mul_pallas(a, b, ctx.m_limbs, ctx.mprime), a, a)
        print(f"pallas mont_mul: {t*1e3:9.3f} ms  {n/t:12.0f} mul/s")
    except Exception as exc:  # noqa: BLE001
        print("pallas mont_mul: FAILED", repr(exc))

    t = timeit(lambda a, e: ctx.exp(a, e), a, e)
    print(f"xla   mont_exp : {t*1e3:9.3f} ms  {n/t:12.0f} exp/s")

    try:
        from vmn_tpu.ops.mont_kernels import mont_exp_pallas

        t = timeit(
            lambda a, e: mont_exp_pallas(
                a, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, bits
            ),
            a,
            e,
        )
        print(f"pallas mont_exp: {t*1e3:9.3f} ms  {n/t:12.0f} exp/s")
    except ImportError:
        pass
    except Exception as exc:  # noqa: BLE001
        print("pallas mont_exp: FAILED", repr(exc))


if __name__ == "__main__":
    main()
