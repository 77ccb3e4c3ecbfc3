"""BASELINE.json graded-config harness.

Runs the configs that fit the current hardware and prints one JSON line per
config. Config sizes / device requirements:

  1: 2^10 a*b=c chain, CPU synthesize + sat-check          (always runs)
  2: 2^16-constraint Groth16-style prove, 1 chip           (CONFIG2=1)
  3: 2^20 BLS12-381 Groth16 prove, 1 host                  (CONFIG3=1; CONFIG3_LOG_N to shrink)
  4: 2^24 distributed prove pieces (sharded MSM + six-step (CONFIG4=1; CONFIG4_LOG_N; runs on
     NTT over the mesh), scaling efficiency 1 vs N devices  whatever mesh jax.devices() offers)
  5: 256 x 2^18 batched proving throughput                 (CONFIG5=1; CONFIG5_B / CONFIG5_LOG_N)

Usage: python scripts/run_configs.py            # config 1
       CONFIG2=1 python scripts/run_configs.py  # + config 2 on the chip
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache: without it every config run re-pays every
# TPU AOT compile (~30-80 s per program through the tunnel helper) —
# r5's first 2^20 config-3 "fresh setup" was ~50% compiles for this
# reason
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def config1():
    from snark_tpu.fields import BN254_FR, Fp
    from snark_tpu.models import MulChainCircuit
    from snark_tpu.relations import new_ref

    n = 1 << 10
    t0 = time.time()
    cs = new_ref(Fp(BN254_FR))
    MulChainCircuit(seed=7, n=n, batch=True).generate_constraints(cs)
    cs.finalize()
    sat = cs.is_satisfied()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "config": 1,
                "desc": "2^10 a*b=c chain, synthesize+sat-check (CPU)",
                "constraints": n,
                "satisfied": sat,
                "wall_s": round(dt, 3),
            }
        )
    )
    assert sat


def config2():
    from snark_tpu.fields import BN254
    from snark_tpu.groth16 import Groth16, ProvingKey
    from snark_tpu.models import MulChainCircuit

    n = (1 << 16) - 64  # domain rounds to 2^16
    g16 = Groth16(BN254)
    circuit = MulChainCircuit(seed=7, n=n, batch=True)
    pk_path = os.environ.get("CONFIG2_PK", ".cache/config2_bn254.npz")
    t0 = time.time()
    if pk_path and os.path.exists(pk_path):
        pk = ProvingKey.load(pk_path)
        vk = pk.vk
    else:
        pk, vk = g16.circuit_specific_setup(circuit, random.Random(0))
        if pk_path:
            os.makedirs(os.path.dirname(pk_path) or ".", exist_ok=True)
            pk.save(pk_path)
    t_setup = time.time() - t0
    g16.prove(pk, circuit, rng=random.Random(5))  # warm (kernel compiles)
    t0 = time.time()
    proof = g16.prove(pk, circuit, rng=random.Random(1))
    t_prove = time.time() - t0
    t0 = time.time()
    ok = g16.verify(vk, [7], proof)
    t_verify = time.time() - t0
    print(
        json.dumps(
            {
                "config": 2,
                "desc": "2^16-constraint Groth16 prove (1 chip)",
                "constraints": n,
                "domain": pk.domain_size,
                "verified": ok,
                "setup_s": round(t_setup, 2),
                "prove_s": round(t_prove, 2),
                "verify_s": round(t_verify, 2),
            }
        )
    )
    assert ok


def config3():
    """BLS12-381 Groth16 prove (BASELINE config 3). Same prover code as
    config 2 — every kernel (plane field, RCB15 curve, MSM, NTT) is generic
    over CurveParams; BLS12-381 widens the digit planes (Fq 381 bits) and
    the scalar windows (Fr 255 bits). CONFIG3_LOG_N shrinks the 2^20
    default for smoke runs; CONFIG3_PK=path caches the proving key."""
    from snark_tpu.fields import BLS12_381
    from snark_tpu.groth16 import Groth16, ProvingKey
    from snark_tpu.models import MulChainCircuit

    log_n = int(os.environ.get("CONFIG3_LOG_N", "20"))
    n = (1 << log_n) - 64
    g16 = Groth16(BLS12_381)
    circuit = MulChainCircuit(seed=7, n=n, batch=True)
    pk_path = os.environ.get("CONFIG3_PK", "")
    t0 = time.time()
    if pk_path and os.path.exists(pk_path):
        pk = ProvingKey.load(pk_path)
        vk = pk.vk
    else:
        pk, vk = g16.circuit_specific_setup(circuit, random.Random(0))
        if pk_path:
            pk.save(pk_path)
    t_setup = time.time() - t0
    g16.prove(pk, circuit, rng=random.Random(5))  # warm (kernel compiles)
    t0 = time.time()
    proof = g16.prove(pk, circuit, rng=random.Random(1))
    t_prove = time.time() - t0
    t0 = time.time()
    ok = g16.verify(vk, [7], proof)
    t_verify = time.time() - t0
    print(
        json.dumps(
            {
                "config": 3,
                "desc": "BLS12-381 Groth16 prove (1 host)",
                "constraints": n,
                "domain": pk.domain_size,
                "verified": ok,
                "setup_s": round(t_setup, 2),
                "prove_s": round(t_prove, 2),
                "verify_s": round(t_verify, 2),
            }
        )
    )
    assert ok


def config4():
    """Distributed prove pieces over the device mesh (BASELINE config 4),
    on the PRODUCTION plane dist stack: DistPlaneMsm (point-sharded fused
    bucket pipeline, window-block all_to_all + sharded folds) and
    DistPlaneNtt (six-step, 3 all_to_all), timed on a 1-device mesh vs the
    full mesh. Scaling efficiency = t1 / (N * tN). On this image the mesh
    is whatever jax.devices() offers (8 virtual CPU devices or 1 real
    chip); the code path is the real multi-host one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snark_tpu.fields import BN254, BN254_FR, Fp
    from snark_tpu.ops.curve_host import host_g1
    from snark_tpu.ops.msm import scalars_to_digits_signed
    from snark_tpu.ops.msm_plane import pick_window_plane_signed
    from snark_tpu.ops.pallas_curve import get_plane_curve, pack_rows_u8_host
    from snark_tpu.parallel import make_mesh
    from snark_tpu.parallel.plane_dist import DistPlaneMsm, DistPlaneNtt

    log_n = int(os.environ.get("CONFIG4_LOG_N", "12"))
    n = 1 << log_n
    ndev = len(jax.devices())
    curve = BN254
    fr = Fp(BN254_FR)
    rng = random.Random(3)
    pc = get_plane_curve(curve)
    hc = host_g1(curve)
    pool = [hc.scalar_mul(hc.generator, k + 1) for k in range(64)]
    rows = np.tile(pack_rows_u8_host(pc, pool), (n // 64, 1))
    scalars = [fr.rand(rng) for _ in range(n)]
    c = int(os.environ.get(
        "CONFIG4_C", str(pick_window_plane_signed(max(n // ndev, 256)))
    ))
    digits = np.asarray(
        scalars_to_digits_signed(
            fr.to_limbs_array(scalars), c, curve.fr.num_bits
        )
    )
    iters = int(os.environ.get("CONFIG4_ITERS", "3"))

    def time_msm(mesh_n):
        mesh = make_mesh((mesh_n,), ("tp",))
        dm = DistPlaneMsm(curve, c, mesh, "tp", signed=True)
        tbl = dm.shard_table(rows)
        jax.block_until_ready(dm.window_sums(tbl, digits))  # compile + warm
        t0 = time.time()
        for _ in range(iters):
            jax.block_until_ready(dm.window_sums(tbl, digits))
        return (time.time() - t0) / iters

    t1 = time_msm(1)
    tn = time_msm(ndev) if ndev > 1 else t1
    eff_msm = t1 / (ndev * tn)

    # six-step plane NTT over the mesh
    n1 = 1 << (log_n // 2)
    while n1 % ndev or (n // n1) % ndev:
        n1 *= 2
    n2 = n // n1
    coeffs = [fr.rand(rng) for _ in range(n)]

    def time_ntt(mesh_n):
        mesh = make_mesh((mesh_n,), ("sp",))
        dn = DistPlaneNtt(BN254_FR, n1, n2, mesh, "sp")
        x = jnp.asarray(dn.pf.pack_np(coeffs))
        jax.block_until_ready(dn.fft(x))
        t0 = time.time()
        for _ in range(iters):
            jax.block_until_ready(dn.fft(x))
        return (time.time() - t0) / iters

    s1 = time_ntt(1)
    sn = time_ntt(ndev) if ndev > 1 else s1
    eff_ntt = s1 / (ndev * sn)
    print(
        json.dumps(
            {
                "config": 4,
                "desc": "distributed plane MSM + six-step plane NTT over mesh",
                "n": n,
                "devices": ndev,
                "backend": jax.default_backend(),
                "window_bits": c,
                "msm_1dev_s": round(t1, 4),
                "msm_ndev_s": round(tn, 4),
                "msm_scaling_eff": round(eff_msm, 3),
                "ntt_1dev_s": round(s1, 4),
                "ntt_ndev_s": round(sn, 4),
                "ntt_scaling_eff": round(eff_ntt, 3),
            }
        )
    )


def config5():
    """Batched proving throughput (BASELINE config 5): B proofs of one
    2^LOG_N-constraint circuit shape. On a multi-device mesh the batch is
    dp-sharded through BatchProver (vmapped device core); on one chip the
    honest throughput number is the production plane-kernel prover looped
    over the batch (witness synthesis for proof i+1 overlaps device work
    of proof i via async dispatch). Spec: CONFIG5_B=256 CONFIG5_LOG_N=18;
    CONFIG5_PK caches the proving key."""
    import jax

    from snark_tpu.fields import BN254
    from snark_tpu.groth16 import Groth16, ProvingKey
    from snark_tpu.models import MulChainCircuit
    from snark_tpu.parallel import BatchProver, make_mesh
    from snark_tpu.relations import SynthesisMode, new_ref

    B = int(os.environ.get("CONFIG5_B", "256"))
    log_n = int(os.environ.get("CONFIG5_LOG_N", "18"))
    n = (1 << log_n) - 64
    ndev = len(jax.devices())
    use_mesh = ndev > 1 and B % ndev == 0 and os.environ.get(
        "CONFIG5_MESH", "1"
    ) == "1"
    g16 = Groth16(BN254)
    circuits = [MulChainCircuit(seed=s, n=n, batch=True) for s in range(B)]
    pk_path = os.environ.get("CONFIG5_PK", "")
    if pk_path and os.path.exists(pk_path):
        pk = ProvingKey.load(pk_path)
        vk = pk.vk
    else:
        pk, vk = g16.circuit_specific_setup(circuits[0], random.Random(0))
        if pk_path:
            pk.save(pk_path)
    if use_mesh:
        mesh = make_mesh((ndev,), ("dp",))
        bp = BatchProver(g16, pk, mesh=mesh, axis="dp")
        bp.prove_batch(circuits[: max(ndev, 1)], rng=random.Random(9))  # warm
        t0 = time.time()
        proofs = bp.prove_batch(circuits, rng=random.Random(1))
        dt = time.time() - t0
        mode = "dp-mesh vmap"
    else:
        rng = random.Random(1)
        fr = g16.fr

        def witness(circuit):
            cs = new_ref(fr)
            cs.set_mode(
                SynthesisMode.prove(
                    construct_matrices=False, generate_lc_assignments=False
                )
            )
            circuit.generate_constraints(cs)
            return cs.full_assignment()

        # warm/compile on proof 0
        z0 = witness(circuits[0])
        g16._prove_from_assignment(pk, z0, fr.rand(rng), fr.rand(rng))
        # pipeline: witness synthesis of proof i+1 runs on a worker thread
        # while proof i's device MSMs execute (the main thread spends most
        # of the prove blocked in device readbacks, where the GIL is
        # released; the C++ synthesis engine releases it too). rng draws
        # stay on the main thread in the original order (determinism).
        import concurrent.futures as _cf

        rs_pairs = [(fr.rand(rng), fr.rand(rng)) for _ in circuits]
        t0 = time.time()
        proofs = []
        with _cf.ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(witness, circuits[0])
            for i in range(B):
                z = fut.result()
                if i + 1 < B:
                    fut = ex.submit(witness, circuits[i + 1])
                proofs.append(
                    g16._prove_from_assignment(pk, z, *rs_pairs[i])
                )
        dt = time.time() - t0
        mode = "plane-kernel loop (1 chip, witness prefetch)"
    ok = all(
        g16.verify(vk, [s], pf) for s, pf in list(enumerate(proofs))[:4]
    )
    print(
        json.dumps(
            {
                "config": 5,
                "desc": "batched proving throughput",
                "mode": mode,
                "batch": B,
                "constraints": n,
                "devices": ndev,
                "verified_sample": ok,
                "wall_s": round(dt, 2),
                "proofs_per_s": round(B / dt, 3),
            }
        )
    )
    assert ok


if __name__ == "__main__":
    config1()
    if os.environ.get("CONFIG2") == "1":
        config2()
    if os.environ.get("CONFIG3") == "1":
        config3()
    if os.environ.get("CONFIG4") == "1":
        config4()
    if os.environ.get("CONFIG5") == "1":
        config5()
