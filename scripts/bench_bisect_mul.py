"""Bisect where mont_mul's 24 ns/mul goes.

All variants chained REPS deep over NLANES lanes, same in/out shapes:
  conv0   : mul_acc only, feed back t[0:R8] (same as isolated conv bench)
  conv1   : mul_acc + 1 sweep of t[:R8]
  conv3   : mul_acc + sweep3 of t[:R8]
  conv9   : mul_acc + 3x sweep3 (the B variant from bench_reduce_parts)
  sweep9  : 9 sweeps only, no conv (chained on A)
  convreg : conv accumulated as VALUES via pad-shift tree (no scratch RMW)
            + sweep3
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from snark_tpu.fields import BN254
    from snark_tpu.ops.pallas_field_v3 import (
        F32,
        get_plane_field_v3,
        _sweep,
        sweep3,
    )

    NLANES = int(os.environ.get("BENCH_LANES", str(256 * 512)))
    T = 512
    pf = get_plane_field_v3(BN254.fq, 2)
    R8 = pf.R8
    REPS = 8

    def conv_values(A, B):
        """Conv via value-level pad-shift accumulation (no scratch RMW).

        t = sum_i pad_i(A[i]*B) over 2R8 rows.
        """
        terms = []
        for i in range(R8):
            prod = A[i, :][None, :] * B  # (R8, T)
            terms.append((i, prod))
        # binary tree combine with row-offset aware padding
        def pad_to(x, lo, hi, full):
            return jnp.pad(x, ((lo, full - hi), (0, 0)))

        # simple linear accumulate into a (2R8, T) value
        acc = jnp.zeros((2 * R8, B.shape[1]), F32)
        for i, prod in terms:
            acc = acc + jnp.pad(prod, ((i, R8 - i), (0, 0)))
        return acc

    def make_run(kind):
        def kernel(a_ref, b_ref, o_ref, t_ref):
            A = a_ref[...]
            B = b_ref[...]
            for _ in range(REPS):
                if kind == "conv0":
                    pf.mul_acc(A, B, t_ref)
                    A = t_ref[0:R8, :] * 1e-7
                elif kind == "conv1":
                    pf.mul_acc(A, B, t_ref)
                    A = _sweep(t_ref[0:R8, :])
                elif kind == "conv3":
                    pf.mul_acc(A, B, t_ref)
                    A = sweep3(t_ref[0:R8, :])
                elif kind == "conv9":
                    pf.mul_acc(A, B, t_ref)
                    A = sweep3(sweep3(sweep3(t_ref[0:R8, :])))
                elif kind == "sweep9":
                    for _ in range(9):
                        A = _sweep(A)
                    A = A + 1.0
                elif kind == "convreg":
                    t = conv_values(A, B)
                    A = sweep3(t[:R8])
            o_ref[...] = A

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R8, NLANES), F32),
                grid=(NLANES // T,),
                in_specs=[pl.BlockSpec((R8, T), lambda i: (0, i))] * 2,
                out_specs=pl.BlockSpec((R8, T), lambda i: (0, i)),
                scratch_shapes=[pltpu.VMEM((2 * R8, T), F32)],
            )(a, b)

        return run

    am = jnp.asarray(
        pf.pack_np([(i * 12345 + 7) % BN254.fq.modulus for i in range(256)])
    )
    am = jnp.tile(am, (1, NLANES // 256))
    bm = jnp.asarray(
        pf.pack_np([(i * 999331 + 3) % BN254.fq.modulus for i in range(256)])
    )
    bm = jnp.tile(bm, (1, NLANES // 256))

    def timeit(f, *a, iters=5):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = f(*a)
            jax.block_until_ready(out)
        return (time.time() - t0) / iters

    for kind in ("conv0", "conv1", "conv3", "conv9", "sweep9", "convreg"):
        run = make_run(kind)
        dt = timeit(run, am, bm)
        print(
            f"{kind:8s}: {REPS * NLANES / dt / 1e6:8.1f} M/s "
            f"({dt / REPS / NLANES * 1e9:7.2f} ns/op, total {dt*1e3:.2f} ms)"
        )


if __name__ == "__main__":
    main()
