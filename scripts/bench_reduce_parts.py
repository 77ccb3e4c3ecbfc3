"""Decompose mont_mul cost: which part of reduce() burns the 27 ns/mul?

Variants (all chained REPS deep, slope-comparable):
  A full mont_mul (baseline)
  B conv + sweeps only (no matmul, no cast, no carry) -- not correct math,
    just the elementwise skeleton
  C mont_mul with MXU matmuls replaced by VPU constant-band FMA convs
    (exact same math: banded constant conv == matmul by band matrix)
  D full mont_mul at tile=2048 (amortize per-matmul fixed cost)
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
        BF16,
        F32,
        get_plane_field_v3,
        _sweep,
        sweep3,
    )

    NLANES = int(os.environ.get("BENCH_LANES", str(256 * 512)))
    pf = get_plane_field_v3(BN254.fq, 2)
    R8 = pf.R8
    REPS = 8

    # np digit lists for the const-band convs (variant C)
    np_digits = [float((pf.n_prime_eff >> (8 * i)) & 0xFF) for i in range(R8)]
    p_digits = [float((pf.params.modulus >> (8 * i)) & 0xFF) for i in range(R8)]

    mnp_c = jnp.asarray(pf.M_NP).astype(BF16)
    mp_c = jnp.asarray(pf.M_P).astype(BF16)
    cols = jnp.asarray(np.concatenate([pf.CARRY_SCALE, pf.P2_COL], axis=1).T)

    def reduce_vpu(t, carry, p2):
        """reduce() with const-band VPU convs instead of MXU matmuls."""
        tlo = sweep3(t[:R8])
        # m = conv(np_digits, tlo) truncated to R8 rows
        m = np_digits[0] * tlo
        for i in range(1, R8):
            m = m.at[i:, :].add(np_digits[i] * tlo[: R8 - i, :])
        m = sweep3(m)
        # mp = conv(p_digits, m) over 2R8 rows
        mp_full = jnp.zeros_like(t)
        for i in range(R8):
            mp_full = mp_full.at[i : i + R8, :].add(p_digits[i] * m)
        s = t + mp_full
        c = jnp.round(jnp.sum(s[:R8] * carry, axis=0, keepdims=True))
        hi = s[R8:]
        out = jnp.concatenate([hi[:1] + c, hi[1:]], axis=0)
        return sweep3(out + p2)

    def make_run(kind, T):
        def kernel(mnp_ref, mp_ref, cols_ref, a_ref, b_ref, o_ref, t_ref):
            A = a_ref[...]
            B = b_ref[...]
            carry = cols_ref[0, :][:, None]
            p2 = cols_ref[1, :][:, None]
            for _ in range(REPS):
                if kind == "A":
                    A = pf.mont_mul(
                        A, B, t_ref, mnp_ref[...], mp_ref[...], carry, plus_p=p2
                    )
                elif kind == "B":
                    pf.mul_acc(A, B, t_ref)
                    t = t_ref[...]
                    x = sweep3(t[:R8])
                    x = sweep3(x)
                    A = sweep3(x + p2)
                elif kind == "C":
                    pf.mul_acc(A, B, t_ref)
                    A = reduce_vpu(t_ref[...], carry, p2)
            o_ref[...] = A

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R8, NLANES), F32),
                grid=(NLANES // T,),
                in_specs=[
                    pl.BlockSpec((R8, R8), lambda i: (0, 0)),
                    pl.BlockSpec((2 * R8, R8), lambda i: (0, 0)),
                    pl.BlockSpec((2, R8), lambda i: (0, 0)),
                    pl.BlockSpec((R8, T), lambda i: (0, i)),
                    pl.BlockSpec((R8, T), lambda i: (0, i)),
                ],
                out_specs=pl.BlockSpec((R8, T), lambda i: (0, i)),
                scratch_shapes=[pltpu.VMEM((2 * R8, T), F32)],
            )(mnp_c, mp_c, cols, a, b)

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

    for label, kind, T in (
        ("A full mont_mul T=512 ", "A", 512),
        ("B conv+sweeps  T=512 ", "B", 512),
        ("C vpu-band     T=512 ", "C", 512),
        ("A full mont_mul T=2048", "A", 2048),
        ("C vpu-band     T=2048", "C", 2048),
    ):
        run = make_run(kind, T)
        dt = timeit(run, am, bm)
        print(
            f"{label}: {REPS * NLANES / dt / 1e6:8.1f} M muls/s "
            f"({dt / REPS / NLANES * 1e9:6.2f} ns/mul)"
        )

    # verify C is bit-identical to A
    runA = make_run("A", 512)
    runC = make_run("C", 512)
    outA = np.asarray(runA(am, bm))
    outC = np.asarray(runC(am, bm))
    print("C == A:", bool((outA == outC).all()))


if __name__ == "__main__":
    main()
