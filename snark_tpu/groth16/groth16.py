"""Groth16: circuit-specific setup, prove, verify.

The flagship proof system (SURVEY.md §7 stage 5), implementing the SNARK
trait contract of the reference (snark/src/lib.rs:22-81) over the GR1CS
R1CS predicate. Follows the arkworks/libsnark conventions:

  * proof (A, B, C) with A, C in G1 and B in G2 (eprint 2016/260):
      A = α + Σ z_i u_i(τ) + r δ
      B = β + Σ z_i v_i(τ) + s δ
      C = (Σ_{witness} z_i (β u_i + α v_i + w_i) + h(τ) Z(τ)) / δ + s A + r B1 − r s δ
  * verify: e(A, B) = e(α, β) · e(Σ x_i γabc_i, γ) · e(C, δ), with the
    public input NOT including the leading ONE (snark/src/lib.rs:59-66
    convention — the vk encodes γabc_0).

TPU split: synthesis is host-side; matrices ship to device once at setup
(padded CSR inside the proving key); proving runs matvec -> NTT -> h and
all MSMs on device; the verifier pairs on host.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..fields.host import Fp
from ..fields.params import CurveParams
from ..ops.curve import get_g1_ops, get_g2_ops
from ..ops.curve_host import host_g1, host_g2
from ..ops.msm import (
    FixedBasePlan,
    msm,
    msm_device_digits,
    msm_host_combine,
    pick_window,
    scalars_to_digits,
    scalars_to_digits_signed,
    signed_digits_from_u8_planes,
)
from ..ops.msm_plane import (
    get_plane_msm,
    pick_window_plane,
    pick_window_plane_signed,
)
from ..ops.ntt_plane import _bit_reverse_indices, get_plane_ntt
from ..ops.pallas_curve import (
    get_plane_curve,
    pack_rows_u8_host,
    table_from_query_u32,
)
from ..ops.fixed_base_plane import get_plane_fixed_base
from ..ops.pallas_field_v3 import F32
from ..ops.pallas_field import digits8_from_limbs
from ..relations import (
    ConstraintSystem,
    ConstraintSystemRef,
    OptimizationGoal,
    R1CS_PREDICATE_LABEL,
    SynthesisMode,
    new_ref,
)
from .pairing import get_pairing
from .qap import (
    PaddedCsr,
    WitnessMapPlan,
    domain_size_for,
    evaluate_variable_polys_at_tau,
)
from .qap_device import (
    combine_uvw_device,
    evaluate_uvw_device,
    from_mont_chunked,
    powers_device,
)
from ..fields.device import get_device_field


@dataclass
class VerifyingKey:
    curve: CurveParams
    alpha_g1: tuple
    beta_g2: tuple
    gamma_g2: tuple
    delta_g2: tuple
    gamma_abc_g1: list  # one affine G1 point per instance variable


@dataclass
class PreparedVerifyingKey:
    vk: VerifyingKey
    alpha_beta: Any  # e(alpha, beta) in Fq12
    gamma_g2_neg: tuple
    delta_g2_neg: tuple


@dataclass
class Proof:
    a: tuple  # G1 affine
    b: tuple  # G2 affine
    c: tuple  # G1 affine


@dataclass
class ProvingKey:
    vk: VerifyingKey
    beta_g1: tuple
    delta_g1: tuple
    # device-resident query tables (N, 3, K) projective Montgomery points
    # (legacy layout: batch/dist paths; the single-chip prover uses the u8
    # row tables below, the fused-Pallas MSM layout)
    a_query: jnp.ndarray
    b_g1_query: jnp.ndarray
    b_g2_query: jnp.ndarray
    h_query: jnp.ndarray
    l_query: jnp.ndarray
    # device-resident circuit matrices (padded CSR) + sizes
    mat_a: PaddedCsr
    mat_b: PaddedCsr
    mat_c: PaddedCsr
    num_instance: int
    num_witness: int
    num_constraints: int
    domain_size: int
    # (N, 2·K·R8+1) uint8 affine row tables for the plane MSM
    a_tbl: jnp.ndarray = None
    b_g1_tbl: jnp.ndarray = None
    b_g2_tbl: jnp.ndarray = None
    h_tbl: jnp.ndarray = None
    l_tbl: jnp.ndarray = None

    # ----- persistence (checkpoint/resume: generate a pk once, reload) ---
    def save(self, path: str) -> None:
        """Persist to an .npz: device arrays verbatim + vk via the
        arkworks-layout byte codec (SURVEY.md §5 checkpoint/resume)."""
        from ..snark import serialize as ser

        queries = {}
        for name in ("a_query", "b_g1_query", "b_g2_query", "h_query", "l_query"):
            v = getattr(self, name)
            if v is not None:  # skipped under SNARK_TPU_SETUP_QUERY=0
                queries[name] = np.asarray(v)
        np.savez_compressed(
            path,
            vk=np.frombuffer(ser.serialize_vk(self.vk), dtype=np.uint8),
            curve=self.vk.curve.name,
            beta_g1=np.frombuffer(
                ser.serialize_g1(self.vk.curve, self.beta_g1), dtype=np.uint8
            ),
            delta_g1=np.frombuffer(
                ser.serialize_g1(self.vk.curve, self.delta_g1), dtype=np.uint8
            ),
            **queries,
            a_tbl=np.asarray(self.a_tbl),
            b_g1_tbl=np.asarray(self.b_g1_tbl),
            b_g2_tbl=np.asarray(self.b_g2_tbl),
            h_tbl=np.asarray(self.h_tbl),
            l_tbl=np.asarray(self.l_tbl),
            mat_a_cols=np.asarray(self.mat_a.cols),
            mat_a_coeffs=np.asarray(self.mat_a.coeffs),
            mat_b_cols=np.asarray(self.mat_b.cols),
            mat_b_coeffs=np.asarray(self.mat_b.coeffs),
            mat_c_cols=np.asarray(self.mat_c.cols),
            mat_c_coeffs=np.asarray(self.mat_c.coeffs),
            sizes=np.asarray(
                [
                    self.num_instance,
                    self.num_witness,
                    self.num_constraints,
                    self.domain_size,
                ],
                dtype=np.int64,
            ),
        )

    @staticmethod
    def load(path: str) -> "ProvingKey":
        from ..fields.params import get_curve
        from ..snark import serialize as ser

        z = np.load(path, allow_pickle=False)
        curve = get_curve(str(z["curve"]))
        vk = ser.deserialize_vk(z["vk"].tobytes(), curve)
        beta_g1, _ = ser.deserialize_g1(curve, z["beta_g1"].tobytes())
        delta_g1, _ = ser.deserialize_g1(curve, z["delta_g1"].tobytes())
        sizes = z["sizes"]

        def csr(prefix):
            return PaddedCsr(
                jnp.asarray(z[prefix + "_cols"]),
                jnp.asarray(z[prefix + "_coeffs"]),
                int(z[prefix + "_cols"].shape[0]),
            )

        def q(name):
            return jnp.asarray(z[name]) if name in z else None

        return ProvingKey(
            vk=vk,
            beta_g1=beta_g1,
            delta_g1=delta_g1,
            a_query=q("a_query"),
            b_g1_query=q("b_g1_query"),
            b_g2_query=q("b_g2_query"),
            h_query=q("h_query"),
            l_query=q("l_query"),
            a_tbl=jnp.asarray(z["a_tbl"]),
            b_g1_tbl=jnp.asarray(z["b_g1_tbl"]),
            b_g2_tbl=jnp.asarray(z["b_g2_tbl"]),
            h_tbl=jnp.asarray(z["h_tbl"]),
            l_tbl=jnp.asarray(z["l_tbl"]),
            mat_a=csr("mat_a"),
            mat_b=csr("mat_b"),
            mat_c=csr("mat_c"),
            num_instance=int(sizes[0]),
            num_witness=int(sizes[1]),
            num_constraints=int(sizes[2]),
            domain_size=int(sizes[3]),
        )


# fixed-base table caches per curve (generator tables are circuit-independent)
_G1_TABLES: dict = {}
_G2_TABLES: dict = {}


def _g1_fixed_base(curve: CurveParams):
    key = curve.name
    if key not in _G1_TABLES:
        ops = get_g1_ops(curve)
        plan = FixedBasePlan(ops, c=8)
        hc = host_g1(curve)
        table = plan.make_table(
            hc.generator, hc, curve.fr.num_bits, ops.pack_affine_host
        )
        _G1_TABLES[key] = (plan, table)
    return _G1_TABLES[key]


def _g2_fixed_base(curve: CurveParams):
    key = curve.name
    if key not in _G2_TABLES:
        ops = get_g2_ops(curve)
        plan = FixedBasePlan(ops, c=8)
        hc = host_g2(curve)
        table = plan.make_table(
            hc.generator, hc, curve.fr.num_bits, ops.pack_affine_host
        )
        _G2_TABLES[key] = (plan, table)
    return _G2_TABLES[key]


def _padded_digits(curve: CurveParams, scalars: list[int], c: int) -> tuple:
    """Digit matrix padded to a power-of-two batch (zero scalars -> identity
    contributions), so fixed-base executables are shared across sizes."""
    fr = Fp(curve.fr)
    n = len(scalars)
    n_pad = 1 << max(2, (n - 1).bit_length())
    digits = scalars_to_digits(
        fr.to_limbs_array(list(scalars) + [0] * (n_pad - n)), c, curve.fr.num_bits
    )
    return digits, n


# chunk bound for the fixed-base executions: the legacy u32 add kernel
# materializes (6, N, L, L) limb-product intermediates, which at 2^20+
# scalars exceeds HBM (observed: 29 GB at BLS12-381 2^21-padded). Chunks
# share one executable (fixed shape) and concatenate on device.
_FB_CHUNK = 1 << 16


def _fixed_base_run(plan, table, curve, scalars) -> jnp.ndarray:
    digits, n = _padded_digits(curve, scalars, plan.c)
    N = digits.shape[0]
    if N <= _FB_CHUNK:
        return plan(table, digits)[:n]
    outs = [
        plan(table, digits[i : i + _FB_CHUNK])
        for i in range(0, N, _FB_CHUNK)
    ]
    return jnp.concatenate(outs, axis=0)[:n]


def _fixed_base_g1(curve: CurveParams, scalars: list[int]) -> jnp.ndarray:
    """[s_i]G1 as a device (N, 3, L) array."""
    plan, table = _g1_fixed_base(curve)
    return _fixed_base_run(plan, table, curve, scalars)


def _fixed_base_g2(curve: CurveParams, scalars: list[int]) -> jnp.ndarray:
    plan, table = _g2_fixed_base(curve)
    return _fixed_base_run(plan, table, curve, scalars)


def assemble_proof(g16, pk, A_sum, B_sum, B1_sum, L_sum, H_sum, r, s) -> Proof:
    """Host tail of the prover: fold the five MSM results into (A, B, C)
    per eprint 2016/260 (O(1) point ops; shared by the single-chip,
    batched, and distributed provers)."""
    g1, g2 = g16.hg1, g16.hg2
    p = g16.fr.p
    vk = pk.vk
    A = g1.add(g1.add(vk.alpha_g1, A_sum), g1.scalar_mul(pk.delta_g1, r))
    B = g2.add(g2.add(vk.beta_g2, B_sum), g2.scalar_mul(vk.delta_g2, s))
    B1 = g1.add(g1.add(pk.beta_g1, B1_sum), g1.scalar_mul(pk.delta_g1, s))
    C = g1.add(L_sum, H_sum)
    C = g1.add(C, g1.scalar_mul(A, s))
    C = g1.add(C, g1.scalar_mul(B1, r))
    C = g1.add(C, g1.neg(g1.scalar_mul(pk.delta_g1, r * s % p)))
    return Proof(a=A, b=B, c=C)


class Groth16:
    """SNARK implementation (CircuitSpecificSetupSNARK flavor)."""

    def __init__(self, curve: CurveParams):
        self.curve = curve
        self.fr = Fp(curve.fr)
        self.g1_ops = get_g1_ops(curve)
        self.g2_ops = get_g2_ops(curve)
        self.hg1 = host_g1(curve)
        self.hg2 = host_g2(curve)
        self.pairing = get_pairing(curve)
        self._wm_plans: dict[int, WitnessMapPlan] = {}

    def _witness_plan(self, n: int) -> WitnessMapPlan:
        if n not in self._wm_plans:
            self._wm_plans[n] = WitnessMapPlan(self.curve.fr, n)
        return self._wm_plans[n]

    # ------------------------------------------------------------------
    def _query_and_table(self, scalars, group: str = "g1", perm=None):
        """[s_i]·G for one setup query vector -> (u32 query array,
        u8 plane-MSM row table).

        Plane fixed-base path for large vectors (SNARK_TPU_SETUP_PLANE=0
        forces legacy); both representations are derived from one host
        affine list so the u8 table bytes are identical to the legacy
        table_from_query_u32 output (same pack_rows_u8_host codec).
        """
        import os

        ops = self.g1_ops if group == "g1" else self.g2_ops
        pc = get_plane_curve(self.curve)
        # SNARK_TPU_SETUP_PLANE_MIN lets tests force the plane path at
        # small sizes (the h-table perm branch is otherwise only reachable
        # with domain >= the default threshold)
        plane_min = int(os.environ.get("SNARK_TPU_SETUP_PLANE_MIN", "2048"))
        use_plane = (
            len(scalars) >= plane_min
            and os.environ.get("SNARK_TPU_SETUP_PLANE", "1") == "1"
        )
        if isinstance(scalars, np.ndarray) and not use_plane:
            # device-QAP limbs (standard form) -> host ints for the
            # legacy small-vector fixed-base path
            scalars = self.fr.from_limbs_array(scalars)
        if use_plane:
            # bigger chunks amortize per-chunk dispatch/transfer overhead
            # (2^24 setups run 2^18; the default 2^16 keeps small-setup
            # compiles cheap and matches the cached program shapes)
            fb = get_plane_fixed_base(
                self.curve,
                group,
                chunk=int(os.environ.get("SNARK_TPU_SETUP_CHUNK", str(1 << 16))),
            )
            if os.environ.get("SNARK_TPU_SETUP_DEVICE_PACK", "1") == "1":
                # fully device-side affine conversion + packing (the r3
                # host tail — bigint unpack + batch inversion + per-int
                # repack — was the dominant setup cost; VERDICT r3 item 6)
                # SNARK_TPU_SETUP_QUERY=0 skips the legacy u32 query
                # arrays (only the ark-bytes pk codec and the dist
                # prover's h re-table need them; halves codec transfer
                # at 2^24 scale)
                want_q = os.environ.get("SNARK_TPU_SETUP_QUERY", "1") == "1"
                rows, query_np = fb.rows_and_query(
                    scalars, want_query=want_q
                )
                if query_np is None:
                    if perm is not None:
                        ident = np.zeros((1, rows.shape[1]), np.uint8)
                        KR8 = get_plane_curve(self.curve).R8 * fb.K
                        ident[0, KR8 : KR8 + fb.pc.R8] = np.asarray(
                            fb.pc.pf.ONE_MONT_COL[:, 0], np.uint8
                        )
                        pidx = np.asarray(perm)
                        rows = np.where(
                            (pidx >= 0)[:, None],
                            rows[np.maximum(pidx, 0)],
                            ident,
                        )
                    if os.environ.get("SNARK_TPU_SETUP_HOST_TABLES") == "1":
                        # 2^24-scale: keep tables host-resident (the five
                        # device tables total ~7 GB — resident jnp arrays
                        # would OOM the chip mid-setup; the prover
                        # re-uploads/slices on use)
                        return None, rows
                    return None, jnp.asarray(rows)
                if perm is not None:
                    ident = np.zeros((1, rows.shape[1]), np.uint8)
                    KR8 = get_plane_curve(self.curve).R8 * fb.K
                    ident[0, KR8 : KR8 + fb.pc.R8] = np.asarray(
                        fb.pc.pf.ONE_MONT_COL[:, 0], np.uint8
                    )
                    pidx = np.asarray(perm)
                    rows = np.where(
                        (pidx >= 0)[:, None],
                        rows[np.maximum(pidx, 0)],
                        ident,
                    )
                return jnp.asarray(query_np), jnp.asarray(rows)
            affs = fb.affine(scalars)
            query = ops.pack_affine_host(affs)
            affs_t = (
                [affs[j] if j >= 0 else None for j in perm]
                if perm is not None
                else affs
            )
            tbl = jnp.asarray(pack_rows_u8_host(pc, affs_t, group))
            return query, tbl
        fb = _fixed_base_g1 if group == "g1" else _fixed_base_g2
        query = fb(self.curve, scalars)
        tbl = jnp.asarray(
            table_from_query_u32(pc, ops, query, group, perm=perm)
        )
        return query, tbl

    def circuit_specific_setup(self, circuit, rng: random.Random):
        """-> (ProvingKey, VerifyingKey). Mirrors SNARK::circuit_specific_setup
        (snark/src/lib.rs:43-46) with the canonical call shape of SURVEY §3.1."""
        import time as _time

        _prof = os.environ.get("SNARK_TPU_SETUP_PROFILE") == "1"
        _t0 = _time.time()

        def _tick(label):
            if _prof:
                print(
                    f"  setup[{label}]: {_time.time() - _t0:8.1f}s",
                    flush=True,
                )

        fr = self.fr
        cs = new_ref(fr)
        cs.set_optimization_goal(OptimizationGoal.Constraints)
        cs.set_mode(SynthesisMode.setup())
        circuit.generate_constraints(cs)
        cs.finalize()
        _tick("synthesize+finalize")
        nc = cs.num_constraints()
        ni = cs.num_instance_variables
        nw = cs.num_witness_variables
        m = ni + nw
        n = domain_size_for(nc, ni)

        # toxic waste
        alpha = fr.rand(rng)
        beta = fr.rand(rng)
        gamma = fr.rand(rng)
        delta = fr.rand(rng)
        tau = fr.rand(rng)

        p = fr.p
        gamma_inv = fr.inv(gamma)
        delta_inv = fr.inv(delta)

        # instance map: device QAP (vectorized CSR extraction + device
        # Lagrange/batch-inverse/powers, groth16/qap_device.py) with the
        # pure-Python path as fallback + oracle (SNARK_TPU_SETUP_DEVICE_QAP=0)
        inner = cs.inner
        coo_abc = inner.to_coo_arrays(R1CS_PREDICATE_LABEL)
        interner_values = inner.field_interner.values
        _tick("coo extraction")
        dev = (
            evaluate_uvw_device(
                self.curve.fr, coo_abc, interner_values, nc, ni, m, tau
            )
            if os.environ.get("SNARK_TPU_SETUP_DEVICE_QAP", "1") == "1"
            else None
        )
        if dev is not None:
            dfr = get_device_field(self.curve.fr)
            u_m, v_m, w_m, z_tau = dev
            gabc_m, l_m = combine_uvw_device(
                dfr, u_m, v_m, w_m, beta, alpha, gamma_inv, delta_inv, ni
            )
            zd = z_tau * delta_inv % p
            h_m = powers_device(dfr, tau, n - 1, scale=zd)
            # standard-form limb arrays feed the fixed-base digit
            # extraction directly (no Python-int round trip)
            u_scalars = np.asarray(from_mont_chunked(dfr, u_m))
            v_scalars = np.asarray(from_mont_chunked(dfr, v_m))
            l_scalars = np.asarray(from_mont_chunked(dfr, l_m))
            h_scalars = np.asarray(from_mont_chunked(dfr, h_m))
            gamma_abc = dfr.to_host_ints(gabc_m)
            _tick("device QAP + scalars")
        else:
            matrices = cs.to_matrices()[R1CS_PREDICATE_LABEL]
            u, v, w, z_tau = evaluate_variable_polys_at_tau(
                self.curve.fr, matrices, nc, ni, m, tau
            )
            gamma_abc = [
                (beta * u[i] + alpha * v[i] + w[i]) % p * gamma_inv % p
                for i in range(ni)
            ]
            l_scalars = [
                (beta * u[i] + alpha * v[i] + w[i]) % p * delta_inv % p
                for i in range(ni, m)
            ]
            zd = z_tau * delta_inv % p
            h_scalars = []
            t_pow = 1
            for _ in range(n - 1):
                h_scalars.append(t_pow * zd % p)
                t_pow = t_pow * tau % p
            u_scalars, v_scalars = u, v

        # G1/G2 queries + u8 MSM row tables via device fixed-base MSM.
        # Large setups run on the fused-Pallas plane path (one u8 row
        # gather + in-VMEM mixed add per lane·window — ~2-3 s per 2^20
        # query vs ~10 min on the legacy u32 kernels); both products
        # (u32 query array, u8 table) are packed from ONE host affine
        # conversion (vectorized unpack + Montgomery batch inversion).
        rev = _bit_reverse_indices(n)
        # h_tbl row k holds the point for coefficient bitrev(k) (the plane
        # NTT's h pipeline emits h in bit-reversed order; coeff n-1 is
        # structurally zero and has no query point -> identity row)
        h_perm = [int(rev[k]) if rev[k] < n - 1 else -1 for k in range(n)]
        a_query, a_tbl = self._query_and_table(u_scalars)
        _tick("a_query")
        b_g1_query, b_g1_tbl = self._query_and_table(v_scalars)
        _tick("b_g1_query")
        b_g2_query, b_g2_tbl = self._query_and_table(v_scalars, group="g2")
        _tick("b_g2_query")
        h_query, h_tbl = self._query_and_table(h_scalars, perm=h_perm)
        _tick("h_query")
        l_query, l_tbl = self._query_and_table(l_scalars)
        _tick("l_query")
        gamma_abc_pts = self.g1_ops.to_affine_host(
            _fixed_base_g1(self.curve, gamma_abc)
        )
        _tick("gamma_abc pts")

        g1 = self.hg1
        g2 = self.hg2
        vk = VerifyingKey(
            curve=self.curve,
            alpha_g1=g1.scalar_mul(g1.generator, alpha),
            beta_g2=g2.scalar_mul(g2.generator, beta),
            gamma_g2=g2.scalar_mul(g2.generator, gamma),
            delta_g2=g2.scalar_mul(g2.generator, delta),
            gamma_abc_g1=gamma_abc_pts,
        )

        # device matrices for the prover (padded CSR; includes only the
        # real constraint rows — consistency rows are appended at prove
        # time). Vectorized COO construction on the device-QAP path.
        fr_params = self.curve.fr
        if dev is not None:
            mat_a = PaddedCsr.from_coo(coo_abc[0], interner_values, fr_params, nc)
            mat_b = PaddedCsr.from_coo(coo_abc[1], interner_values, fr_params, nc)
            mat_c = PaddedCsr.from_coo(coo_abc[2], interner_values, fr_params, nc)
        else:
            mat_a = PaddedCsr.from_rows(matrices[0], fr_params, nc)
            mat_b = PaddedCsr.from_rows(matrices[1], fr_params, nc)
            mat_c = PaddedCsr.from_rows(matrices[2], fr_params, nc)

        pk = ProvingKey(
            vk=vk,
            beta_g1=g1.scalar_mul(g1.generator, beta),
            delta_g1=g1.scalar_mul(g1.generator, delta),
            a_query=a_query,
            b_g1_query=b_g1_query,
            b_g2_query=b_g2_query,
            h_query=h_query,
            l_query=l_query,
            a_tbl=a_tbl,
            b_g1_tbl=b_g1_tbl,
            b_g2_tbl=b_g2_tbl,
            h_tbl=h_tbl,
            l_tbl=l_tbl,
            mat_a=mat_a,
            mat_b=mat_b,
            mat_c=mat_c,
            num_instance=ni,
            num_witness=nw,
            num_constraints=nc,
            domain_size=n,
        )
        return pk, vk

    # alias for the CircuitSpecificSetupSNARK::setup default (lib.rs:84-93)
    setup = circuit_specific_setup

    # ------------------------------------------------------------------
    # ProvingKey canonical bytes (snark/src/lib.rs:25-27: the SNARK trait
    # bounds ProvingKey by CanonicalSerialize + CanonicalDeserialize)
    # ------------------------------------------------------------------
    def pk_to_bytes(self, pk: ProvingKey, compress: bool = True) -> bytes:
        """Full ark-layout ProvingKey bytes (field order per arkworks
        groth16: vk ‖ beta_g1 ‖ delta_g1 ‖ five affine query Vecs)."""
        from ..snark import serialize as ser

        return ser.serialize_pk_points(
            pk.vk,
            pk.beta_g1,
            pk.delta_g1,
            self.g1_ops.to_affine_host(pk.a_query),
            self.g1_ops.to_affine_host(pk.b_g1_query),
            self.g2_ops.to_affine_host(pk.b_g2_query),
            self.g1_ops.to_affine_host(pk.h_query),
            self.g1_ops.to_affine_host(pk.l_query),
            compress,
        )

    def pk_from_bytes(self, data: bytes, circuit, compress: bool = True) -> ProvingKey:
        """Rebuild a device-resident ProvingKey from ark-layout bytes.

        The byte layout carries only the cryptographic material (like
        arkworks); the circuit matrices are re-synthesized from `circuit`
        in Setup mode — the same re-synthesis arkworks' prove performs.
        """
        from ..snark import serialize as ser
        from ..ops.pallas_curve import pack_rows_u8_host

        vk, beta_g1, delta_g1, (a_q, b1_q, b2_q, h_q, l_q) = (
            ser.deserialize_pk_points(data, self.curve, compress)
        )
        fr = self.fr
        cs = new_ref(fr)
        cs.set_optimization_goal(OptimizationGoal.Constraints)
        cs.set_mode(SynthesisMode.setup())
        circuit.generate_constraints(cs)
        cs.finalize()
        matrices = cs.to_matrices()[R1CS_PREDICATE_LABEL]
        nc = cs.num_constraints()
        ni = cs.num_instance_variables
        nw = cs.num_witness_variables
        n = domain_size_for(nc, ni)
        assert len(h_q) == n - 1 and len(a_q) == ni + nw

        fr_params = self.curve.fr
        pc = get_plane_curve(self.curve)
        rev = _bit_reverse_indices(n)
        h_padded = [h_q[rev[k]] if rev[k] < n - 1 else None for k in range(n)]
        return ProvingKey(
            vk=vk,
            beta_g1=beta_g1,
            delta_g1=delta_g1,
            a_query=self.g1_ops.pack_affine_host(a_q),
            b_g1_query=self.g1_ops.pack_affine_host(b1_q),
            b_g2_query=self.g2_ops.pack_affine_host(b2_q),
            h_query=self.g1_ops.pack_affine_host(h_q),
            l_query=self.g1_ops.pack_affine_host(l_q),
            a_tbl=jnp.asarray(pack_rows_u8_host(pc, a_q)),
            b_g1_tbl=jnp.asarray(pack_rows_u8_host(pc, b1_q)),
            b_g2_tbl=jnp.asarray(pack_rows_u8_host(pc, b2_q, "g2")),
            h_tbl=jnp.asarray(pack_rows_u8_host(pc, h_padded)),
            l_tbl=jnp.asarray(pack_rows_u8_host(pc, l_q)),
            mat_a=PaddedCsr.from_rows(matrices[0], fr_params, nc),
            mat_b=PaddedCsr.from_rows(matrices[1], fr_params, nc),
            mat_c=PaddedCsr.from_rows(matrices[2], fr_params, nc),
            num_instance=ni,
            num_witness=nw,
            num_constraints=nc,
            domain_size=n,
        )

    # ------------------------------------------------------------------
    def prove(self, pk: ProvingKey, circuit, rng: random.Random | None = None,
              r: int | None = None, s: int | None = None,
              deterministic: bool = False) -> Proof:
        """Synthesize the witness and produce (A, B, C).

        The reference requires `RngCore + CryptoRng` for proving randomness
        (snark/src/lib.rs:16-19,50-54): r = s = 0 yields a valid but
        NON-zero-knowledge proof, so omitting `rng` (and r/s) raises unless
        the caller opts in explicitly with `deterministic=True`. Use
        `utils.rng.secure_rng()` (OS entropy) in production.

        Synthesis runs with construct_matrices=False — the device already
        holds the CSR matrices from setup (a TPU-first deviation: arkworks
        re-synthesizes matrices on every prove; see SynthesisMode knobs at
        gr1cs/mod.rs:82-89 and bench.rs:95-98).
        """
        fr = self.fr
        if rng is None and r is None and s is None and not deterministic:
            raise ValueError(
                "prove() without an rng (or explicit r/s) produces a proof "
                "with ZERO zero-knowledge; pass rng=secure_rng(), explicit "
                "r/s, or deterministic=True to opt in"
            )
        if r is None:
            r = fr.rand(rng) if rng is not None else 0
        if s is None:
            s = fr.rand(rng) if rng is not None else 0

        cs = new_ref(fr)
        cs.set_mode(SynthesisMode.prove(construct_matrices=False,
                                        generate_lc_assignments=False))
        circuit.generate_constraints(cs)
        z = cs.full_assignment()
        assert len(z) == pk.num_instance + pk.num_witness

        proof_dev = self._prove_from_assignment(pk, z, r, s)
        return proof_dev

    def _prove_from_assignment(self, pk: ProvingKey, z: list[int], r: int, s: int) -> Proof:
        import os
        import time as _time

        import jax as _jax

        fr = self.fr
        p = fr.p
        n = pk.domain_size
        ni = pk.num_instance
        nc = pk.num_constraints
        plan = self._witness_plan(n)
        df = plan.df

        profile = os.environ.get("SNARK_TPU_PROVE_PROFILE") == "1"
        _t = [_time.time()]

        def tick(label, *sync):
            """Stage timestamps for the prove profile (forces a device sync
            so the stage boundary is real, not dispatch-queue depth)."""
            if not profile:
                return
            if sync:
                _jax.block_until_ready(sync)
            now = _time.time()
            print(f"  prove[{label}]: {(now - _t[0]) * 1e3:8.1f} ms", flush=True)
            _t[0] = now

        # device witness vector (Montgomery) and the three constraint evals
        z_mont = df.array(z)
        tick("z upload", z_mont)
        a_rows = plan.matvec(pk.mat_a, z_mont)  # (nc, L)
        b_rows = plan.matvec(pk.mat_b, z_mont)
        c_rows = plan.matvec(pk.mat_c, z_mont)
        tick("matvec x3", a_rows, b_rows, c_rows)

        pad = n - nc - ni
        inst_mont = z_mont[:ni]
        zeros_pad = jnp.zeros((pad, df.L), dtype=z_mont.dtype)
        zeros_inst = jnp.zeros((ni, df.L), dtype=z_mont.dtype)
        a_evals = jnp.concatenate([a_rows, inst_mont, zeros_pad], axis=0)
        b_evals = jnp.concatenate([b_rows, zeros_inst, zeros_pad], axis=0)
        c_evals = jnp.concatenate([c_rows, zeros_inst, zeros_pad], axis=0)

        # MSMs: fused-Pallas plane MSM, window sums on device + host Horner
        # combine (the sequential doubling tail is latency-bound batch-1
        # work — host is faster). Digits for BOTH z and h are extracted on
        # device (z_mont is already resident; the host numpy extraction +
        # upload cost ~0.7 s of the 3.0 s warm 2^16 prove).
        nbits = self.curve.fr.num_bits
        m = len(z)
        plane_min = int(os.environ.get("SNARK_TPU_PLANE_MSM_MIN", "2048"))
        if m >= plane_min:
            # h via the fused-Pallas plane NTT (wide-Mont digit planes,
            # bit-reversal-free DIF/DIT pipeline; ops/ntt_plane.py)
            pn = get_plane_ntt(self.curve.fr, n)

            def to_planes(evals_u32):
                d = digits8_from_limbs(evals_u32, df.L).astype(F32)
                padrows = pn.pf.R8 - d.shape[0]
                d = jnp.pad(d, ((0, padrows), (0, 0)))
                return pn.k.remont(d)[0]

            h_bitrev = pn.h_from_evals(
                to_planes(a_evals), to_planes(b_evals), to_planes(c_evals)
            )
            h_std_planes = pn.to_std_canonical(h_bitrev)  # (R8, n) canonical
            tick("plane NTT h", h_std_planes)
        else:
            h_mont = plan.h_from_evals(a_evals, b_evals, c_evals)  # (n, K)
            h_std = df.from_mont(h_mont[: n - 1])
        if m >= plane_min:
            # fused-Pallas plane MSM (the production path) with SIGNED
            # (balanced) digits: one extra window bit at the same bucket
            # budget (c=13 signed: 20 windows vs 26 unsigned at 2^20, and
            # the h MSM drops from 32 unsigned-c=8 windows to 20); the
            # point tables stay N positive rows — signs ride the gather
            # payload and the kernel negates Y in-kernel.
            c_z = pick_window_plane_signed(m)
            z_std = df.from_mont(z_mont)  # (M, L) u32 standard form
            z_digits = signed_digits_from_u8_planes(
                digits8_from_limbs(z_std, df.L), c_z, nbits
            )
            tick("z digits (device)")
            plan_g1 = get_plane_msm(self.curve, c_z, nbits, signed=True)
            plan_g2 = get_plane_msm(
                self.curve, c_z, nbits, group="g2", signed=True
            )
            # h digits come straight off the canonical digit planes on
            # device (same signed c as the z MSMs)
            h_digits = signed_digits_from_u8_planes(h_std_planes, c_z, nbits)
            plan_h = plan_g1
            # dispatch ALL five window-sum pipelines before any host sync:
            # the readbacks below then overlap host Horner of MSM k with
            # device compute of MSM k+1
            sA = plan_g1.window_sums(pk.a_tbl, z_digits)
            sB = plan_g2.window_sums(pk.b_g2_tbl, z_digits)
            sB1 = plan_g1.window_sums(pk.b_g1_tbl, z_digits)
            sL = plan_g1.window_sums(pk.l_tbl, z_digits[ni:])
            sH = plan_h.window_sums(pk.h_tbl, h_digits)
            tick("MSM dispatch x5")
            W = int(z_digits.shape[1])
            A_sum = plan_g1.combine_host(sA, W, self.hg1)
            tick("MSM A (g1)")
            B_sum = plan_g2.combine_host(sB, W, self.hg2)
            tick("MSM B (g2)")
            B1_sum = plan_g1.combine_host(sB1, W, self.hg1)
            L_sum = plan_g1.combine_host(sL, W, self.hg1)
            tick("MSM B1+L (g1)")
            H_sum = plan_h.combine_host(sH, int(h_digits.shape[1]), self.hg1)
            tick("MSM H (g1)")
        else:
            # small circuits: the bucket-lane setup of the plane MSM
            # (W·2^c lanes) dwarfs N — use the legacy batched-XLA path
            c_z = pick_window(m)
            z_digits = scalars_to_digits(fr.to_limbs_array(z), c_z, nbits)
            A_sum = msm_host_combine(self.g1_ops, self.hg1, pk.a_query, z_digits, c_z)
            B_sum = msm_host_combine(self.g2_ops, self.hg2, pk.b_g2_query, z_digits, c_z)
            B1_sum = msm_host_combine(self.g1_ops, self.hg1, pk.b_g1_query, z_digits, c_z)
            L_sum = msm_host_combine(
                self.g1_ops, self.hg1, pk.l_query, z_digits[ni:], c_z
            )
            c_h = pick_window(max(4, n - 1))
            c_h = 1 << (c_h.bit_length() - 1)
            h_digits = df.window_digits(h_std, c_h, nbits)
            H_sum = msm_host_combine(self.g1_ops, self.hg1, pk.h_query, h_digits, c_h)

        return assemble_proof(self, pk, A_sum, B_sum, B1_sum, L_sum, H_sum, r, s)

    # ------------------------------------------------------------------
    def process_vk(self, vk: VerifyingKey) -> PreparedVerifyingKey:
        """Precompute the pairing terms (SNARK::process_vk, lib.rs:69-71)."""
        alpha_beta = self.pairing.pairing(vk.alpha_g1, vk.beta_g2)
        return PreparedVerifyingKey(
            vk=vk,
            alpha_beta=alpha_beta,
            gamma_g2_neg=self.hg2.neg(vk.gamma_g2),
            delta_g2_neg=self.hg2.neg(vk.delta_g2),
        )

    def verify_with_processed_vk(
        self, pvk: PreparedVerifyingKey, public_input: list[int], proof: Proof
    ) -> bool:
        """public_input WITHOUT the leading ONE (lib.rs:76-80 convention)."""
        vk = pvk.vk
        assert len(public_input) == len(vk.gamma_abc_g1) - 1
        g1 = self.hg1
        acc = vk.gamma_abc_g1[0]
        for x, pt in zip(public_input, vk.gamma_abc_g1[1:]):
            acc = g1.add(acc, g1.scalar_mul(pt, x % self.fr.p))
        lhs = self.pairing.multi_pairing(
            [
                (proof.a, proof.b),
                (acc, pvk.gamma_g2_neg),
                (proof.c, pvk.delta_g2_neg),
            ]
        )
        return lhs == pvk.alpha_beta

    def verify(self, vk: VerifyingKey, public_input: list[int], proof: Proof) -> bool:
        """Default-impl shape: process_vk ∘ verify_with_processed_vk
        (snark/src/lib.rs:59-66)."""
        return self.verify_with_processed_vk(self.process_vk(vk), public_input, proof)
