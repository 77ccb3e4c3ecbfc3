"""Microbenchmark: Montgomery mul throughput on the real chip.

Compares XLA u32-limb, XLA f32-digit, and Pallas kernels, sync-forced
(a device->host transfer of a slice of the result every iteration).

Usage: python scripts/bench_field.py [log_n] [impls...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from snark_tpu.fields import BN254
from snark_tpu.fields.host import Fp
from snark_tpu.fields.device import get_device_field
from snark_tpu.fields.device_f32 import get_device_field_f32


def force(x):
    return np.asarray(jax.device_get(x[..., :1]))


def timeit(fn, a, b, iters=10, chain=8):
    # chain multiplications so one dispatch covers `chain` muls and the
    # result depends on every step (no dead-code elimination)
    @jax.jit
    def chained(a, b):
        x = a
        for _ in range(chain):
            x = fn(x, b)
        return x

    out = chained(a, b)
    force(out)
    t0 = time.time()
    for _ in range(iters):
        out = chained(a, b)
        force(out)
    dt = (time.time() - t0) / iters
    return dt / chain


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    which = sys.argv[2:] or ["u32", "f32", "pallas2", "pallas3"]
    n = 1 << log_n
    params = BN254.fr
    f = Fp(params)
    rng = np.random.RandomState(42)
    vals_a = [int(rng.randint(0, 2**62)) for _ in range(256)]
    vals_b = [int(rng.randint(1, 2**62)) for _ in range(256)]

    host_limbs_a = f.to_mont_limbs_array(vals_a)
    host_limbs_b = f.to_mont_limbs_array(vals_b)
    reps = n // 256
    limbs_a = np.tile(host_limbs_a, (reps, 1))
    limbs_b = np.tile(host_limbs_b, (reps, 1))

    print(f"n = 2^{log_n} = {n}, field BN254.Fr, device {jax.devices()[0].device_kind}")

    if "u32" in which:
        df = get_device_field(params)
        a = jnp.asarray(limbs_a)
        b = jnp.asarray(limbs_b)
        dt = timeit(df.mul, a, b)
        print(f"u32 XLA     : {dt*1e3:9.3f} ms/mul-batch  {n/dt/1e6:10.2f} M muls/s")

    if "f32" in which:
        dff = get_device_field_f32(params)
        a8 = jnp.asarray(dff._limbs_to_digits_np(limbs_a))
        b8 = jnp.asarray(dff._limbs_to_digits_np(limbs_b))
        dt = timeit(dff.mul_impl, a8, b8)
        print(f"f32 XLA     : {dt*1e3:9.3f} ms/mul-batch  {n/dt/1e6:10.2f} M muls/s")

    if "pallas2" in which:
        from pallas_field_v2 import make_mont_mul_v2

        for tile in (256, 512, 1024, 2048):
            try:
                mm = make_mont_mul_v2(params, tile=tile)
                a = jnp.asarray(limbs_a)
                b = jnp.asarray(limbs_b)
                dt = timeit(mm, a, b, chain=4)
                print(f"pallas2 t={tile:5d}: {dt*1e3:9.3f} ms/mul-batch  {n/dt/1e6:10.2f} M muls/s")
            except Exception as e:
                print(f"pallas2 t={tile}: FAILED {type(e).__name__}: {str(e)[:200]}")

    if "pallas1" in which:
        from snark_tpu.ops.pallas_field import make_mont_mul

        mm = make_mont_mul(params)
        a = jnp.asarray(limbs_a)
        b = jnp.asarray(limbs_b)
        dt = timeit(mm, a, b, chain=4)
        print(f"pallas1     : {dt*1e3:9.3f} ms/mul-batch  {n/dt/1e6:10.2f} M muls/s")


    if "pallas3" in which:
        from snark_tpu.ops.pallas_field_v3 import make_mont_mul_v3

        for tile in (512, 1024, 2048):
            try:
                mm = make_mont_mul_v3(params, tile=tile)
                a = jnp.asarray(limbs_a)
                b = jnp.asarray(limbs_b)
                dt = timeit(mm, a, b, chain=4)
                print(f"pallas3 t={tile:5d}: {dt*1e3:9.3f} ms/mul-batch  {n/dt/1e6:10.2f} M muls/s")
            except Exception as e:
                print(f"pallas3 t={tile}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
