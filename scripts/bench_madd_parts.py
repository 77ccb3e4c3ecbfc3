"""Decompose the production madd-rows kernel cost IN CONTEXT.

Monkeypatches pallas_curve._madd_mixed_body / sweep3 with perf-only
variants (math deliberately wrong where noted), rebuilds the scan kernel,
and times the REAL _window_sums_impl pipeline at 2^20 signed c=13 — so
every number includes the gather, decode, mask blend and while-loop
exactly as production runs them.

Variants:
  full      shipped body (reference; correct)
  nosub     muls only, RCB15 glue (subs/triples/kp) removed  [wrong math]
  halfmul   ~half the muls (t0,t1,m4 + 1 pair + 1 cmul)      [wrong math]
  sweep2    global sweep3 -> 2 sweeps (reduce + norms)        [wrong math]
  sweep1    global sweep3 -> 1 sweep                          [wrong math]
  vpu       MXU band matmuls off (scalar-conv reduce backend) [correct]
  nodecode  rows ignored; Q synthesized from acc planes       [wrong math]
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
    import random

    import jax.numpy as jnp
    import numpy as np

    from snark_tpu.fields import BN254
    from snark_tpu.fields.host import Fp
    from snark_tpu.ops import msm_plane, pallas_curve
    from snark_tpu.ops.msm import scalars_to_digits_signed
    from snark_tpu.ops.msm_plane import PlaneMsm
    from snark_tpu.ops.curve_host import host_g1
    from snark_tpu.ops.pallas_curve import pack_rows_u8_host, get_plane_curve
    from snark_tpu.ops import pallas_field_v3 as pfv3

    log_n = int(os.environ.get("BENCH_LOG_N", "20"))
    tile = int(os.environ.get("BENCH_TILE", "1024"))
    n = 1 << log_n
    c = 13
    curve = BN254
    pc = get_plane_curve(curve)
    hc = host_g1(curve)
    fr = Fp(curve.fr)
    rng = random.Random(7)
    pool = [hc.scalar_mul(hc.generator, k + 1) for k in range(64)]
    table = jnp.asarray(np.tile(pack_rows_u8_host(pc, pool), (n // 64, 1)))
    scalars = [rng.randrange(0, curve.fr.modulus) for _ in range(n)]
    digits_t = jnp.asarray(
        scalars_to_digits_signed(fr.to_limbs_array(scalars), c, curve.fr.num_bits)
    ).T

    real_body = pallas_curve._madd_mixed_body
    real_sweep3 = pfv3.sweep3
    real_ctx = pallas_curve.PlaneCurve.field_ctx

    def body_nosub(F, P, Q):
        X1, Y1, Z1 = P
        X2, Y2 = Q
        a = F.mul(X1, X2)
        b = F.mul(Y1, Y2)
        d = F.mul(Y2, Z1)
        e = F.mul(X2, Z1)
        m4 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
        i = F.cmul_b3(Z1)
        j = F.cmul_b3(F.norm(F.add(e, X1)))
        x3 = F.mul_pair(a, b, d, j, sign2=-1.0)
        y3 = F.mul_pair(b, i, j, a)
        z3 = F.mul_pair(i, d, a, m4)
        return x3, y3, z3

    def body_halfmul(F, P, Q):
        X1, Y1, Z1 = P
        X2, Y2 = Q
        a = F.mul(X1, X2)
        b = F.mul(Y1, Y2)
        m4 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
        i = F.cmul_b3(Z1)
        x3 = F.mul_pair(a, b, m4, i, sign2=-1.0)
        return x3, F.norm(F.add(b, i)), F.norm(F.add(a, i))

    def body_nodecode(F, P, Q):
        X1, Y1, Z1 = P
        return real_body(F, P, (F.norm(Z1), F.norm(Y1)))

    def sweep2(z):
        return pfv3._sweep_n(z, 2)

    def sweep1(z):
        return pfv3._sweep_n(z, 1)

    def ctx_vpu(self, group, t_ref, cols, mnp=None, mp=None, mb3=None, pf=None):
        return real_ctx(self, group, t_ref, cols, None, None, None, pf=pf)

    def build_and_time(label, body=None, sw=None, vpu=False):
        pallas_curve._madd_mixed_body = body or real_body
        if sw is not None:
            pfv3.sweep3 = sw
            pallas_curve.sweep3 = sw
        if vpu:
            pallas_curve.PlaneCurve.field_ctx = ctx_vpu
        try:
            # fresh plan (bypass caches) so the kernel rebuilds
            plan = PlaneMsm(curve, c, None, tile, None, "g1", True, 1)
            out = plan._sums(table, digits_t)
            np.asarray(out[0])
            iters = 3
            t0 = time.time()
            for _ in range(iters):
                out = plan._sums(table, digits_t)
                np.asarray(out[0])
            dt = (time.time() - t0) / iters
            adds = n * plan.W
            print(
                f"{label:9s}: {dt*1e3:8.1f} ms  ({adds/dt/1e6:6.1f} M adds/s)",
                flush=True,
            )
        finally:
            pallas_curve._madd_mixed_body = real_body
            pfv3.sweep3 = real_sweep3
            pallas_curve.sweep3 = real_sweep3
            pallas_curve.PlaneCurve.field_ctx = real_ctx

    build_and_time("full")
    build_and_time("nosub", body=body_nosub)
    build_and_time("halfmul", body=body_halfmul)
    build_and_time("sweep2", sw=sweep2)
    build_and_time("sweep1", sw=sweep1)
    build_and_time("vpu", vpu=True)
    build_and_time("nodecode", body=body_nodecode)


if __name__ == "__main__":
    main()
