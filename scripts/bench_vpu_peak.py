"""Microbench: VPU f32 throughput ceiling vs the fused kernels' usage.

Measures, slope-fitted over chained kernels inside one jit:
  1. raw FMA chain (a = a*b + c repeated) -- the VPU roofline;
  2. raw sweep chain (the base-256 carry op) -- sweeps/s ceiling;
  3. mul_acc conv alone (34 overlapped row FMAs) -- conv efficiency;
  4. full mont_mul (conv + reduce);
  5. the masked mixed add (the MSM scan step).

Prints ops/s for each and the implied ns per Montgomery mul / point add,
so we can tell scheduling headroom (kernel below roofline) from op-count
limits (kernel at roofline).
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
        PlaneFieldV3,
        _sweep,
        get_plane_field_v3,
    )

    T = int(os.environ.get("BENCH_TILE", "512"))
    NLANES = int(os.environ.get("BENCH_LANES", str(256 * 512)))
    pf = get_plane_field_v3(BN254.fq, 2)
    R8 = pf.R8

    def timeit(f, *a, iters=5):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = f(*a)
            jax.block_until_ready(out)
        return (time.time() - t0) / iters

    # ---- 1. raw FMA chain ------------------------------------------------
    REPS_FMA = 256

    def fma_kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        acc = a
        for _ in range(REPS_FMA):
            acc = acc * b + a
        o_ref[...] = acc

    @jax.jit
    def fma_run(a, b):
        return pl.pallas_call(
            fma_kernel,
            out_shape=jax.ShapeDtypeStruct((R8, NLANES), F32),
            grid=(NLANES // T,),
            in_specs=[pl.BlockSpec((R8, T), lambda i: (0, i))] * 2,
            out_specs=pl.BlockSpec((R8, T), lambda i: (0, i)),
        )(a, b)

    a = jnp.asarray(np.random.uniform(1.0, 1.0001, (R8, NLANES)).astype(np.float32))
    b = jnp.asarray(np.random.uniform(0.999, 1.0, (R8, NLANES)).astype(np.float32))
    dt = timeit(fma_run, a, b)
    fma_ops = REPS_FMA * R8 * NLANES
    print(f"raw FMA:    {fma_ops / dt / 1e12:.3f} Tfma/s  ({dt*1e3:.2f} ms)")

    # ---- 2. sweep chain ---------------------------------------------------
    REPS_SW = 64

    def sweep_kernel(a_ref, o_ref):
        z = a_ref[...]
        for _ in range(REPS_SW):
            z = _sweep(z) + 1.0
        o_ref[...] = z

    @jax.jit
    def sweep_run(a):
        return pl.pallas_call(
            sweep_kernel,
            out_shape=jax.ShapeDtypeStruct((R8, NLANES), F32),
            grid=(NLANES // T,),
            in_specs=[pl.BlockSpec((R8, T), lambda i: (0, i))],
            out_specs=pl.BlockSpec((R8, T), lambda i: (0, i)),
        )(a)

    dt = timeit(sweep_run, a)
    print(
        f"sweep:      {REPS_SW * NLANES / dt / 1e9:.2f} Gsweeps/s "
        f"({dt / REPS_SW / NLANES * 1e9 * NLANES:.3f} ms/sweep-pass, "
        f"{REPS_SW * R8 * NLANES * 4 / dt / 1e12:.3f} T'ops'/s at 4 ops/row)"
    )

    # ---- 3. conv alone ------------------------------------------------
    REPS_CV = 8

    def conv_kernel(a_ref, b_ref, o_ref, t_ref):
        A = a_ref[...]
        B = b_ref[...]
        for _ in range(REPS_CV):
            pf.mul_acc(A, B, t_ref)
            A = t_ref[0:R8, :] * 1e-7  # feed back, keep values small
        o_ref[...] = t_ref[...]

    @jax.jit
    def conv_run(a, b):
        return pl.pallas_call(
            conv_kernel,
            out_shape=jax.ShapeDtypeStruct((2 * R8, NLANES), F32),
            grid=(NLANES // T,),
            in_specs=[pl.BlockSpec((R8, T), lambda i: (0, i))] * 2,
            out_specs=pl.BlockSpec((2 * R8, T), lambda i: (0, i)),
            scratch_shapes=[pltpu.VMEM((2 * R8, T), F32)],
        )(a, b)

    dt = timeit(conv_run, a, b)
    conv_fma = REPS_CV * R8 * R8 * NLANES
    print(
        f"conv:       {conv_fma / dt / 1e12:.3f} Tfma/s effective "
        f"({dt / REPS_CV / NLANES * 1e9:.2f} ns/conv-lane)"
    )

    # ---- 4. full mont_mul chain ----------------------------------------
    REPS_MM = 32
    cols = jnp.asarray(np.concatenate([pf.CARRY_SCALE, pf.P2_COL], axis=1))

    def mm_kernel(cols_ref, a_ref, b_ref, o_ref, t_ref):
        A = a_ref[...]
        B = b_ref[...]
        carry = cols_ref[:, 0:1]
        p2 = cols_ref[:, 1:2]
        for _ in range(REPS_MM):
            A = pf.mont_mul(A, B, t_ref, carry, plus_p=p2)
        o_ref[...] = A

    @jax.jit
    def mm_run(a, b):
        return pl.pallas_call(
            mm_kernel,
            out_shape=jax.ShapeDtypeStruct((R8, NLANES), F32),
            grid=(NLANES // T,),
            in_specs=[
                pl.BlockSpec((R8, 2), lambda i: (0, 0)),
                pl.BlockSpec((R8, T), lambda i: (0, i)),
                pl.BlockSpec((R8, T), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((R8, T), lambda i: (0, i)),
            scratch_shapes=[pltpu.VMEM((2 * R8, T), F32)],
        )(cols, a, b)

    am = jnp.asarray(
        pf.pack_np([(i * 12345 + 7) % BN254.fq.modulus for i in range(256)])
    )
    am = jnp.tile(am, (1, NLANES // 256))
    bm = jnp.asarray(
        pf.pack_np([(i * 999331 + 3) % BN254.fq.modulus for i in range(256)])
    )
    bm = jnp.tile(bm, (1, NLANES // 256))
    dt = timeit(mm_run, am, bm)
    print(
        f"mont_mul:   {REPS_MM * NLANES / dt / 1e6:.1f} M muls/s "
        f"({dt / REPS_MM / NLANES * 1e9:.2f} ns/mul)"
    )

    # ---- 5. masked mixed add (the scan step) ----------------------------
    from snark_tpu.ops.pallas_curve import (
        get_plane_curve,
        make_masked_mixed_add_rows,
        pack_rows_u8_host,
        rows_pad_width,
    )
    from snark_tpu.ops.curve_host import host_g1

    curve = BN254
    pc = get_plane_curve(curve)
    hc = host_g1(curve)
    madd = make_masked_mixed_add_rows(curve, 256)
    LAN = 256 * 320
    pool = [hc.scalar_mul(hc.generator, k + 1) for k in range(64)]
    rows = pack_rows_u8_host(pc, pool)
    rw = rows_pad_width(curve, "g1")
    rows_p = np.zeros((64, rw), np.uint8)
    rows_p[:, : rows.shape[1]] = rows
    rows_big = jnp.asarray(np.tile(rows_p, (LAN // 64, 1)))
    X = jnp.zeros((R8, LAN), F32)
    Y = jnp.broadcast_to(jnp.asarray(pf.ONE_MONT_COL), (R8, LAN))
    Z = jnp.zeros((R8, LAN), F32)
    mask = jnp.concatenate(
        [jnp.ones((1, LAN), F32), jnp.zeros((1, LAN), F32)], axis=0
    )

    @jax.jit
    def madd_chain(X, Y, Z, rows, mask):
        for _ in range(4):
            X, Y, Z = madd(X, Y, Z, rows, mask)
        return X, Y, Z

    dt = timeit(madd_chain, X, Y, Z, rows_big, mask)
    print(
        f"mixed madd: {4 * LAN / dt / 1e6:.1f} M adds/s "
        f"({dt / 4 / LAN * 1e9:.1f} ns/add)"
    )


if __name__ == "__main__":
    main()
