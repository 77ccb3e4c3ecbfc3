"""R1CS -> QAP reduction (libsnark/arkworks convention).

Mirrors arkworks groth16's `LibsnarkReduction` semantics (consumed by the
reference through the SNARK trait; SURVEY.md §2.3 "groth16"):

  * evaluation domain size = num_constraints + num_instance_variables;
  * input-consistency rows: for instance i, the A matrix gets an extra row
    (at index num_constraints + i) containing 1 at column i — this makes
    u_i(x) nonzero on the padding rows and binds the public inputs;
  * h(x) = (A(x)·B(x) − C(x)) / Z_H(x) computed on the F*-generator coset.

Split of labor: the *instance map* (setup-time Lagrange evaluation at the
toxic τ) is host-side exact big-int work with Montgomery batch inversion;
the *witness map* (prove-time Az/Bz/Cz and the h polynomial) runs on device:
padded-CSR sparse matvec (gather + batched Montgomery mul + row-sum) feeding
the NTT pipeline — no host round trips between matvec, iNTT, coset NTT and
the Hadamard step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import get_compute_field
from ..fields.host import Fp
from ..fields.params import FieldParams
from ..ops.ntt import get_ntt_plan


def domain_size_for(num_constraints: int, num_instance: int) -> int:
    n = num_constraints + num_instance
    return 1 << (n - 1).bit_length()


def batch_inverse(f: Fp, xs: list[int]) -> list[int]:
    """Montgomery's batch-inversion trick: 3n muls + one inversion."""
    n = len(xs)
    prefix = [1] * (n + 1)
    for i, x in enumerate(xs):
        prefix[i + 1] = prefix[i] * x % f.p
    inv_all = f.inv(prefix[n])
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % f.p
        inv_all = inv_all * xs[i] % f.p
    return out


def lagrange_coeffs_at(params: FieldParams, n: int, tau: int) -> list[int]:
    """L_j(tau) for the radix-2 domain H of size n, j = 0..n-1.

    L_j(x) = (Z(x) / n) * omega^j / (x - omega^j); falls back to the
    indicator if tau is in H.
    """
    f = Fp(params)
    p = params.modulus
    omega = params.root_of_unity(n)
    pows = [1] * n
    for j in range(1, n):
        pows[j] = pows[j - 1] * omega % p
    diffs = [(tau - w) % p for w in pows]
    if any(d == 0 for d in diffs):  # tau on the domain: indicator vector
        return [1 if d == 0 else 0 for d in diffs]
    z_tau = (pow(tau, n, p) - 1) % p
    n_inv = pow(n, -1, p)
    zn = z_tau * n_inv % p
    inv_diffs = batch_inverse(f, diffs)
    return [zn * w % p * inv_d % p for w, inv_d in zip(pows, inv_diffs)]


def evaluate_variable_polys_at_tau(
    params: FieldParams,
    matrices: list,  # [A, B, C] as row-lists of (coeff, col)
    num_constraints: int,
    num_instance: int,
    num_variables: int,
    tau: int,
) -> tuple[list[int], list[int], list[int], int]:
    """(u_i(tau), v_i(tau), w_i(tau)) per variable column + Z_H(tau).

    Includes the input-consistency rows in u (A side) per the libsnark
    reduction.
    """
    p = params.modulus
    n = domain_size_for(num_constraints, num_instance)
    lag = lagrange_coeffs_at(params, n, tau)
    a_mat, b_mat, c_mat = matrices
    u = [0] * num_variables
    v = [0] * num_variables
    w = [0] * num_variables
    for j in range(num_constraints):
        lj = lag[j]
        for coeff, col in a_mat[j]:
            u[col] = (u[col] + coeff * lj) % p
        for coeff, col in b_mat[j]:
            v[col] = (v[col] + coeff * lj) % p
        for coeff, col in c_mat[j]:
            w[col] = (w[col] + coeff * lj) % p
    # input consistency rows: A[num_constraints + i][i] = 1
    for i in range(num_instance):
        u[i] = (u[i] + lag[num_constraints + i]) % p
    z_tau = (pow(tau, n, p) - 1) % p
    return u, v, w, z_tau


# ---------------------------------------------------------------------------
# Device-side witness map
# ---------------------------------------------------------------------------


@dataclass
class PaddedCsr:
    """Row-padded sparse matrix in device form: every row padded to the same
    width; zero-coefficient entries point at column 0 (harmless gather)."""

    cols: jnp.ndarray  # (rows, width) int32
    coeffs: jnp.ndarray  # (rows, width, L) uint32 Montgomery limbs
    num_rows: int

    @staticmethod
    def from_rows(rows, params: FieldParams, num_rows: int, width: int | None = None):
        df = get_compute_field(params)
        width = width or max((len(r) for r in rows), default=1)
        width = max(width, 1)
        cols = np.zeros((num_rows, width), dtype=np.int32)
        vals = [0] * (num_rows * width)
        for i, row in enumerate(rows):
            for k, (coeff, col) in enumerate(row):
                cols[i, k] = col
                vals[i * width + k] = coeff % params.modulus
        coeffs = df.array(vals).reshape(num_rows, width, -1)
        return PaddedCsr(jnp.asarray(cols), coeffs, num_rows)

    @staticmethod
    def from_coo(coo, interner_values, params: FieldParams, num_rows: int):
        """Vectorized construction from ConstraintSystem.to_coo_arrays
        output — no per-entry Python (the 2^24 setup path). Identical
        semantics to from_rows over the same matrix: absent slots get
        (col 0, coeff 0); coefficient id len(interner_values) is the
        extraction's literal-zero convention.

        SNARK_TPU_SETUP_HOST_TABLES=1 keeps cols/coeffs host-resident
        (numpy): at 2^24 the three coefficient arrays total ~6 GB and
        would OOM the chip as resident device arrays."""
        import os

        indptr, col, cid = coo
        df = get_compute_field(params)
        lens = np.diff(indptr)
        width = max(1, int(lens.max()) if len(lens) else 1)
        nnz = int(indptr[-1])
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        inner = np.arange(nnz, dtype=np.int64) - np.repeat(indptr[:-1], lens)
        flat = row_of * width + inner
        cols = np.zeros(num_rows * width, np.int32)
        cols[flat] = col
        zid = len(interner_values)
        ids = np.full(num_rows * width, zid, np.int64)
        ids[flat] = cid
        host = os.environ.get("SNARK_TPU_SETUP_HOST_TABLES") == "1"
        if host:
            from ..fields.host import Fp

            f = Fp(params)
            vals_np = np.asarray(
                f.to_mont_limbs_array(list(interner_values) + [0])
            )
            coeffs = vals_np[ids.reshape(num_rows, width)]
            return PaddedCsr(
                cols.reshape(num_rows, width), coeffs, num_rows
            )
        vals_m = jnp.concatenate(
            [df.array(list(interner_values)), df.array([0])], axis=0
        )
        coeffs = jnp.take(
            vals_m, jnp.asarray(ids.reshape(num_rows, width)), axis=0
        )
        return PaddedCsr(
            jnp.asarray(cols.reshape(num_rows, width)), coeffs, num_rows
        )


class WitnessMapPlan:
    """Jitted device pipeline: (A z, B z, C z) evals -> h coefficients."""

    def __init__(self, params: FieldParams, domain_n: int):
        self.params = params
        self.n = domain_n
        self.df = get_compute_field(params)
        self.ntt = get_ntt_plan(params, domain_n)
        f = Fp(params)
        p = params.modulus
        # 1 / Z_H on the coset (constant: Z_H(g x) = g^n - 1 for x in H)
        z_coset = (pow(params.generator, domain_n, p) - 1) % p
        self.z_coset_inv = self.df.const(pow(z_coset, -1, p))
        self._h_from_evals = jax.jit(self._h_impl)
        self._matvec = jax.jit(self._matvec_impl)

    def _matvec_impl(self, cols, coeffs, z):
        """Padded-CSR sparse matvec: rows x (width) gather/mul/sum.

        cols (R, W) int32; coeffs (R, W, L) mont; z (M, L) mont -> (R, L).
        """
        df = self.df
        zg = jnp.take(z, cols, axis=0)  # (R, W, L)
        prod = df.mul_impl(coeffs, zg)
        # sum over the row width with a log-tree of field adds
        W = prod.shape[1]
        x = prod
        while x.shape[1] > 1:
            m = x.shape[1]
            if m % 2 == 1:
                pad = jnp.broadcast_to(
                    jnp.zeros_like(x[:, :1]), x[:, :1].shape
                )
                x = jnp.concatenate([x, pad], axis=1)
                m += 1
            x = df.add_impl(x[:, : m // 2], x[:, m // 2 :])
        return x[:, 0]

    def matvec(self, mat: PaddedCsr, z_mont: jnp.ndarray) -> jnp.ndarray:
        return self._matvec(mat.cols, mat.coeffs, z_mont)

    def _h_impl(self, a_evals, b_evals, c_evals):
        """Domain evals (n, L mont) -> h coefficients (n, L mont).

        h = (A·B - C) / Z_H via coset NTTs (arkworks coset_fft path); the
        returned array's last coefficient is structurally zero.
        """
        df = self.df
        ntt = self.ntt
        a_poly = ntt._transform(a_evals, inverse=True)
        b_poly = ntt._transform(b_evals, inverse=True)
        c_poly = ntt._transform(c_evals, inverse=True)
        a_c = ntt._coset_fft_impl(a_poly)
        b_c = ntt._coset_fft_impl(b_poly)
        c_c = ntt._coset_fft_impl(c_poly)
        ab = df.mul_impl(a_c, b_c)
        num = df.sub_impl(ab, c_c)
        h_evals = df.mul_impl(num, self.z_coset_inv[None, :])
        return ntt._coset_ifft_impl(h_evals)

    def h_from_evals(self, a_evals, b_evals, c_evals) -> jnp.ndarray:
        return self._h_from_evals(a_evals, b_evals, c_evals)
