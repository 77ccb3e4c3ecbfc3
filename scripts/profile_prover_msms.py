"""Time each prover MSM shape standalone on the chip.

Isolates the config-2 MSM stage: one _sums per (group, c, signed, tile)
at the 2^16 prover shapes, sync-forced, so regressions attribute to a
specific plan configuration instead of queue position.

env: PROF_LOG_N (default 16), PROF_TILES (csv, default auto),
     PROF_CONFIGS (csv of g1s11,g2s11,g1u10,h13 — default all)
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
    from snark_tpu.ops.curve_host import host_g1, host_g2
    from snark_tpu.ops.msm import scalars_to_digits, scalars_to_digits_signed
    from snark_tpu.ops.msm_plane import get_plane_msm
    from snark_tpu.ops.pallas_curve import get_plane_curve, pack_rows_u8_host

    log_n = int(os.environ.get("PROF_LOG_N", "16"))
    n = 1 << log_n
    curve = BN254
    pc = get_plane_curve(curve)
    fr = Fp(curve.fr)
    rng = random.Random(7)
    nbits = curve.fr.num_bits

    pool_g1 = [host_g1(curve).scalar_mul(host_g1(curve).generator, k + 1)
               for k in range(16)]
    pool_g2 = [host_g2(curve).scalar_mul(host_g2(curve).generator, k + 1)
               for k in range(16)]
    tbl_g1 = jnp.asarray(np.tile(pack_rows_u8_host(pc, pool_g1), (n // 16, 1)))
    tbl_g2 = jnp.asarray(
        np.tile(pack_rows_u8_host(pc, pool_g2, "g2"), (n // 16, 1))
    )
    scalars = [rng.randrange(0, curve.fr.modulus) for _ in range(n)]
    limbs = fr.to_limbs_array(scalars)

    def timeit(plan, tbl, dig_t):
        out = plan._sums(tbl, dig_t)
        np.asarray(out[0])
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            out = plan._sums(tbl, dig_t)
            np.asarray(out[0])
        return (time.time() - t0) / iters

    tiles_env = os.environ.get("PROF_TILES", "")
    tiles = [int(t) for t in tiles_env.split(",") if t] or [None]
    cfgs = (os.environ.get("PROF_CONFIGS") or "g1s11,g2s11,g1u10,h13").split(",")

    for tile in tiles:
        for cfg in cfgs:
            if cfg == "g1s11":
                plan = get_plane_msm(curve, 11, nbits, tile=tile, signed=True)
                dig = scalars_to_digits_signed(limbs, 11, nbits)
                tbl = tbl_g1
            elif cfg == "g2s11":
                plan = get_plane_msm(
                    curve, 11, nbits, tile=tile, group="g2", signed=True
                )
                dig = scalars_to_digits_signed(limbs, 11, nbits)
                tbl = tbl_g2
            elif cfg == "g1u10":
                plan = get_plane_msm(curve, 10, nbits, tile=tile)
                dig = scalars_to_digits(limbs, 10, nbits)
                tbl = tbl_g1
            elif cfg == "h13":
                plan = get_plane_msm(curve, 13, nbits, tile=tile, signed=True)
                dig = scalars_to_digits_signed(limbs, 13, nbits)
                tbl = tbl_g1
            else:
                continue
            dt = timeit(plan, tbl, jnp.asarray(np.asarray(dig)).T)
            adds = n * plan.W
            print(
                f"{cfg:7s} tile={plan.tile:5d} W={plan.W:3d} "
                f"{dt*1e3:8.1f} ms  ({adds/dt/1e6:6.1f} M adds/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
