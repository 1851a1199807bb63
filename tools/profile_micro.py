"""Micro-profile of the hot Montgomery kernels on the current backend.

Prints per-op steady-state timings and derived modexp/s/chip.
"""

import os
import time


import jax
import jax.numpy as jnp
import numpy as np

from vmn_tpu.arith.mont import MontCtx, mont_mul, mont_exp
from vmn_tpu.arith.pgroup import ModPGroup


@jax.jit
def _first(o):
    return o.reshape(-1)[0]


def _force(out):
    # Fetch a single element: forces full execution without paying a
    # bulk device->host transfer over the tunnel.
    np.asarray(_first(out))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _force(out)
    return (time.perf_counter() - t0) / reps


def main():
    group = ModPGroup.named("modp2048")
    ctx = group.ctx
    L = ctx.L
    print(f"backend={jax.default_backend()} L={L} nbits={ctx.nbits}")

    rng = np.random.default_rng(0)
    for N in (1024, 8192, 65536):
        a = ctx.encode(
            [int(rng.integers(2, 2**63)) for _ in range(min(N, 64))]
        )
        a = jnp.tile(a, (max(1, N // a.shape[0]), 1))[:N]
        e_full = jnp.asarray(
            rng.integers(0, 1 << 16, size=(N, L), dtype=np.uint32)
        )
        e_256 = jnp.asarray(
            rng.integers(0, 1 << 16, size=(N, 16), dtype=np.uint32)
        )

        from vmn_tpu.ops.mont_kernels import (
            mont_exp_pallas,
            mont_fb_exp_pallas,
            mont_mul_pallas,
        )

        t_mul = timeit(
            lambda: mont_mul_pallas(a, a, ctx.m_limbs, ctx.mprime)
        )
        print(f"N={N:6d} mul_pallas        {t_mul*1e3:9.2f} ms  "
              f"{N/t_mul:12.0f} mults/s")

        if N <= 8192:
            t_exp = timeit(
                lambda: mont_exp_pallas(
                    a, e_full, ctx.m_limbs, ctx.mprime, ctx.one_mont, 2048
                )
            )
            print(f"N={N:6d} exp_pallas(2048b) {t_exp*1e3:9.2f} ms  "
                  f"{N/t_exp:12.1f} modexp/s")

        t_exp256 = timeit(
            lambda: mont_exp_pallas(
                a, e_256, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256
            )
        )
        print(f"N={N:6d} exp_pallas(256b)  {t_exp256*1e3:9.2f} ms  "
              f"{N/t_exp256:12.1f} modexp/s")

        tbl = ctx.fb_table_pallas(group.g_int, 2048)
        t_fb = timeit(
            lambda: mont_fb_exp_pallas(
                tbl, e_full, ctx.m_limbs, ctx.mprime, ctx.one_mont
            )
        )
        print(f"N={N:6d} fb_exp_pallas     {t_fb*1e3:9.2f} ms  "
              f"{N/t_fb:12.1f} fbexp/s")


if __name__ == "__main__":
    main()
