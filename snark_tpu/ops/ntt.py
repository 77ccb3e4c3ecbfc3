"""Radix-2 NTT/iNTT over device limb arrays.

Replaces ark-poly's `Radix2EvaluationDomain` (SURVEY.md §2.3): same root
conventions (`group_gen = two_adic_root ^ (2^(s - log n))`, evaluations in
natural order: out[i] = p(g^i)), so results are bit-exact with arkworks —
field arithmetic is exact, ordering is pinned by the domain definition.

TPU design: butterflies are expressed with reshapes and slices only — no
gathers or scatters — so every stage is a fused elementwise pass over
(n/2, L)-limb arrays (pure VPU work). The one permutation (bit reversal) is
a single device gather at entry. Stages are unrolled at trace time (log n
stages) and the whole transform jits to one executable per (n, field).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import get_compute_field
from ..fields.host import Fp
from ..fields.params import FieldParams


def _bit_reverse_indices(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


class NttPlan:
    """Precomputed transform for one (field, n) pair.

    Host precomputation: per-stage twiddle tables (Montgomery form) for the
    forward and inverse transforms, the bit-reversal permutation, n^{-1},
    and coset scale vectors (g^i, g^{-i} n^{-1}) for coset_fft/coset_ifft
    (the Groth16 h-poly path uses the coset over F* generator, matching
    arkworks' `coset_fft`).
    """

    def __init__(self, params: FieldParams, n: int, coset: bool = True):
        assert n & (n - 1) == 0 and n >= 2
        self.params = params
        self.n = n
        self.log_n = n.bit_length() - 1
        self.df = get_compute_field(params)
        f = Fp(params)
        p = params.modulus
        omega = params.root_of_unity(n)
        omega_inv = pow(omega, -1, p)

        self.bitrev = jnp.asarray(_bit_reverse_indices(n))

        # per-stage twiddles: stage s uses w = omega^(n / 2^(s+1)), powers 0..2^s
        def stage_tables(w_root: int):
            tables = []
            for s in range(self.log_n):
                half = 1 << s
                w = pow(w_root, n >> (s + 1), p)
                pw = 1
                vals = []
                for _ in range(half):
                    vals.append(pw)
                    pw = pw * w % p
                tables.append(self.df.array(vals))
            return tables

        self.fwd_twiddles = stage_tables(omega)
        self.inv_twiddles = stage_tables(omega_inv)
        self.n_inv = self.df.const(pow(n, -1, p))

        if coset:
            g = params.generator
            g_inv = pow(g, -1, p)
            pows, ipows = [], []
            x, y = 1, 1
            for _ in range(n):
                pows.append(x)
                ipows.append(y)
                x = x * g % p
                y = y * g_inv % p
            self.coset_scale = self.df.array(pows)
            self.coset_unscale = self.df.array(ipows)
        else:
            self.coset_scale = None
            self.coset_unscale = None

        self._fft_jit = jax.jit(functools.partial(self._transform, inverse=False))
        self._ifft_jit = jax.jit(functools.partial(self._transform, inverse=True))
        self._coset_fft_jit = jax.jit(self._coset_fft_impl)
        self._coset_ifft_jit = jax.jit(self._coset_ifft_impl)

    # ----- core transform ----------------------------------------------
    def _transform(self, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """x: (..., n, L) Montgomery limbs -> (..., n, L); leading dims batch."""
        df = self.df
        n, L = self.n, self.df.L
        batch = x.shape[:-2]
        tw = self.inv_twiddles if inverse else self.fwd_twiddles
        x = jnp.take(x, self.bitrev, axis=-2)
        for s in range(self.log_n):
            half = 1 << s
            x = x.reshape(batch + (n // (2 * half), 2, half, L))
            lo = x[..., 0, :, :]
            hi = x[..., 1, :, :]
            t = df.mul_impl(hi, tw[s])
            x = jnp.stack([df.add_impl(lo, t), df.sub_impl(lo, t)], axis=-3)
            x = x.reshape(batch + (n, L))
        if inverse:
            x = df.mul_impl(x, self.n_inv)
        return x

    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Evaluations over H in natural order: out[i] = p(g^i)."""
        return self._fft_jit(coeffs)

    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self._ifft_jit(evals)

    # ----- coset transforms (arkworks coset_fft over GENERATOR * H) -----
    def _coset_fft_impl(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        scaled = self.df.mul_impl(coeffs, self.coset_scale)
        return self._transform(scaled, inverse=False)

    def _coset_ifft_impl(self, evals: jnp.ndarray) -> jnp.ndarray:
        coeffs = self._transform(evals, inverse=True)
        return self.df.mul_impl(coeffs, self.coset_unscale)

    def coset_fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        return self._coset_fft_jit(coeffs)

    def coset_ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self._coset_ifft_jit(evals)

    # ----- host helpers -------------------------------------------------
    def z_on_coset(self) -> int:
        """Z_H(g) = g^n - 1, the vanishing-poly value on the coset (constant
        across the coset since (g x)^n - 1 = g^n x^n - 1 = g^n - 1 on H)."""
        p = self.params.modulus
        return (pow(self.params.generator, self.n, p) - 1) % p


@functools.lru_cache(maxsize=None)
def get_ntt_plan(params: FieldParams, n: int, coset: bool = True) -> NttPlan:
    return NttPlan(params, n, coset)
