"""Batched proving (the "dp" analogue — BASELINE config 5).

Many proofs of the SAME circuit shape (one proving key), different
witnesses: the whole device pipeline (padded-CSR matvec -> NTT h-poly ->
five MSMs) is vmapped over the batch and sharded over a mesh axis, so every
chip proves its slice of the batch independently — embarrassingly parallel,
zero cross-chip traffic inside a proof.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.host import Fp
from ..groth16.groth16 import Groth16, Proof, ProvingKey
from ..ops.msm import MsmPlan, pick_window, scalars_to_digits
from ..relations import SynthesisMode, new_ref


class BatchProver:
    def __init__(self, g16: Groth16, pk: ProvingKey, mesh: Mesh | None = None,
                 axis: str = "dp", lite: bool = False):
        self.g16 = g16
        self.pk = pk
        self.mesh = mesh
        self.axis = axis
        # lite: compile only the A (G1) and B (G2) MSMs — used by the
        # multichip dry-run, where compile time on virtual CPU meshes
        # matters more than covering all five queries (same shardings).
        self.lite = lite
        self.fr = g16.fr
        n = pk.domain_size
        self.plan = g16._witness_plan(n)
        nbits = g16.curve.fr.num_bits
        m = pk.num_instance + pk.num_witness
        # device digit extraction needs c | 16: round pick_window down to a
        # power of two, capped at 8
        c = pick_window(m)
        self.c = min(8, 1 << (c.bit_length() - 1))
        self.msm_g1 = MsmPlan(g16.g1_ops, self.c)
        self.msm_g2 = MsmPlan(g16.g2_ops, self.c)
        self._core = jax.jit(self._core_impl)

    def _core_impl(self, z_mont, z_digits):
        """z_mont (B, M, K), z_digits (B, M, W) -> five (B, 3, K) MSM accs."""
        pk = self.pk
        plan = self.plan
        df = plan.df
        g16 = self.g16
        n, ni, nc = pk.domain_size, pk.num_instance, pk.num_constraints
        nbits = g16.curve.fr.num_bits

        def one(zm, zd):
            a_rows = plan._matvec_impl(pk.mat_a.cols, pk.mat_a.coeffs, zm)
            b_rows = plan._matvec_impl(pk.mat_b.cols, pk.mat_b.coeffs, zm)
            c_rows = plan._matvec_impl(pk.mat_c.cols, pk.mat_c.coeffs, zm)
            pad = n - nc - ni
            zeros_pad = jnp.zeros((pad, df.L), dtype=zm.dtype)
            zeros_inst = jnp.zeros((ni, df.L), dtype=zm.dtype)
            a_evals = jnp.concatenate([a_rows, zm[:ni], zeros_pad], axis=0)
            b_evals = jnp.concatenate([b_rows, zeros_inst, zeros_pad], axis=0)
            c_evals = jnp.concatenate([c_rows, zeros_inst, zeros_pad], axis=0)
            h_mont = plan._h_impl(a_evals, b_evals, c_evals)
            h_std = df.from_mont_impl(h_mont[: n - 1])
            h_digits = df.window_digits(h_std, self.c, nbits)

            a_acc = self.msm_g1._msm_impl(pk.a_query, zd)
            b_acc = self.msm_g2._msm_impl(pk.b_g2_query, zd)
            if self.lite:
                # return h digits directly (keeps the NTT pipeline live
                # without compiling a third MSM shape)
                return a_acc, b_acc, h_digits
            b1_acc = self.msm_g1._msm_impl(pk.b_g1_query, zd)
            l_acc = self.msm_g1._msm_impl(pk.l_query, zd[ni:])
            h_acc = self.msm_g1._msm_impl(pk.h_query, h_digits)
            return a_acc, b_acc, b1_acc, l_acc, h_acc

        fn = jax.vmap(one)
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(self.axis))
            z_mont = jax.lax.with_sharding_constraint(z_mont, sh)
            z_digits = jax.lax.with_sharding_constraint(z_digits, sh)
        return fn(z_mont, z_digits)

    def prove_batch(self, circuits, rng=None, rs=None) -> list[Proof]:
        """Synthesize each circuit's witness, prove the whole batch on
        device, assemble (A, B, C) per proof on host."""
        g16 = self.g16
        pk = self.pk
        fr = self.fr
        zs = []
        for circuit in circuits:
            cs = new_ref(fr)
            cs.set_mode(
                SynthesisMode.prove(construct_matrices=False,
                                    generate_lc_assignments=False)
            )
            circuit.generate_constraints(cs)
            z = cs.full_assignment()
            assert len(z) == pk.num_instance + pk.num_witness
            zs.append(z)
        B = len(zs)
        flat = [v for z in zs for v in z]
        M = len(zs[0])
        nbits = g16.curve.fr.num_bits
        z_digits = jnp.asarray(
            scalars_to_digits(fr.to_limbs_array(flat), self.c, nbits)
        ).reshape(B, M, -1)
        z_mont = self.plan.df.array(flat, mont=True).reshape(B, M, -1)

        a_acc, b_acc, b1_acc, l_acc, h_acc = self._core(z_mont, z_digits)

        if rs is None:
            rs = [
                (fr.rand(rng) if rng else 0, fr.rand(rng) if rng else 0)
                for _ in range(B)
            ]
        from ..groth16.groth16 import assemble_proof

        A_list = g16.g1_ops.to_affine_host(a_acc)
        B_list = g16.g2_ops.to_affine_host(b_acc)
        B1_list = g16.g1_ops.to_affine_host(b1_acc)
        L_list = g16.g1_ops.to_affine_host(l_acc)
        H_list = g16.g1_ops.to_affine_host(h_acc)
        proofs = []
        for i in range(B):
            r, s = rs[i]
            proofs.append(
                assemble_proof(
                    g16, pk, A_list[i], B_list[i], B1_list[i], L_list[i],
                    H_list[i], r, s,
                )
            )
        return proofs
