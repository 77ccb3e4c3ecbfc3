"""Distributed six-step NTT (the "sp/cp" analogue, SURVEY.md §2.2, §5).

Decompose n = n1 · n2 and view the coefficient vector as an (n1, n2) matrix,
row-sharded over the mesh axis. Then (with j = j1 + n1·j2, k = k2 + n2·k1):

    X[k2 + n2 k1] = Σ_{j1} ω_{n1}^{j1 k1} · [ ω_n^{j1 k2} · Σ_{j2} x[j1 + n1 j2] ω_{n2}^{j2 k2} ]

  1. transpose the natural (n2, n1) layout to (n1, n2)   (all_to_all)
  2. local length-n2 NTTs along rows
  3. twiddle multiply by ω_n^{j1 k2}
  4. transpose to (n2, n1)                                (all_to_all)
  5. local length-n1 NTTs along rows
  6. transpose back to natural order (n1, n2) -> flatten  (all_to_all)

Each all_to_all moves n/ndev elements per chip over ICI; all compute is
local batched NTT stages (ops/ntt.py), so the whole transform is three
collectives around two dense local phases.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..fields import get_compute_field
from ..fields.host import Fp
from ..fields.params import FieldParams
from ..ops.ntt import get_ntt_plan


class DistNttPlan:
    """Forward NTT of size n = n1 * n2 over a 1-D mesh axis."""

    def __init__(self, params: FieldParams, n1: int, n2: int, mesh: Mesh, axis: str):
        self.params = params
        self.n1, self.n2 = n1, n2
        self.n = n1 * n2
        self.mesh = mesh
        self.axis = axis
        self.df = get_compute_field(params)
        self.plan1 = get_ntt_plan(params, n1, coset=False)
        self.plan2 = get_ntt_plan(params, n2, coset=False)
        f = Fp(params)
        p = params.modulus
        w = params.root_of_unity(self.n)

        def twiddle_matrix(root: int):
            # T[j1, k2] = root^(j1 * k2), (n1, n2), Montgomery form
            rows = []
            for j1 in range(n1):
                base = pow(root, j1, p)
                val = 1
                row = []
                for _ in range(n2):
                    row.append(val)
                    val = val * base % p
                rows.append(row)
            flat = [v for row in rows for v in row]
            return self.df.array(flat).reshape(n1, n2, self.df.L)

        self.twiddle = twiddle_matrix(w)
        self.twiddle_inv = twiddle_matrix(pow(w, -1, p))
        self.n_inv = self.df.const(pow(self.n, -1, p))
        # coset scale vectors (g^i / g^-i over the F* generator), sharded
        # elementwise like the data
        g = params.generator
        g_inv = pow(g, -1, p)
        pows, ipows = [], []
        x, y = 1, 1
        for _ in range(self.n):
            pows.append(x)
            ipows.append(y)
            x = x * g % p
            y = y * g_inv % p
        self.coset_scale = self.df.array(pows)
        self.coset_unscale = self.df.array(ipows)
        self._run = jax.jit(self._build(inverse=False))
        self._run_inv = jax.jit(self._build(inverse=True))
        self._coset_fft = jax.jit(
            lambda c: self._run(self.df.mul_impl(c, self.coset_scale))
        )
        self._coset_ifft = jax.jit(
            lambda e: self.df.mul_impl(self._run_inv(e), self.coset_unscale)
        )

    def _build(self, inverse: bool = False):
        n1, n2, L = self.n1, self.n2, self.df.L
        axis = self.axis
        ndev = self.mesh.shape[axis]
        assert n1 % ndev == 0 and n2 % ndev == 0
        df = self.df
        plan1, plan2 = self.plan1, self.plan2
        twiddle = self.twiddle_inv if inverse else self.twiddle
        n_inv = self.n_inv

        def local_transpose_sharded(x, rows, cols):
            """(rows/ndev, cols, L) sharded on rows -> (cols/ndev, rows, L)
            sharded on cols, via all_to_all."""
            # split the column axis into (ndev, cols/ndev); exchange
            x = x.reshape(rows // ndev, ndev, cols // ndev, L)
            x = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=0)
            # now (rows/ndev * ndev = rows, cols/ndev? ...) -> (rows, cols/ndev, L)
            x = x.reshape(rows, cols // ndev, L)
            return jnp.swapaxes(x, 0, 1)  # (cols/ndev, rows, L)

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(axis),),
            out_specs=P(axis),
        )
        def run(x_natural):
            # x_natural: (n/ndev, L) shard of the length-n vector, viewed
            # globally as (n2, n1) row-major [x[j1 + n1 j2] at row j2].
            x = x_natural.reshape(n2 // ndev, n1, L)
            # step 1: transpose -> (n1/ndev, n2, L): rows indexed by j1
            x = local_transpose_sharded(x, n2, n1)
            # step 2: local NTT_{n2} along rows (inverse transforms carry
            # their own 1/n2 factor, so fwd/inv share this structure and the
            # inverse path needs no extra global 1/n scale)
            x = plan2._transform(x, inverse=inverse)  # (n1/ndev, n2, L)
            # step 3: twiddle w^(j1 k2) — slice this chip's rows
            idx = jax.lax.axis_index(axis)
            tw = jax.lax.dynamic_slice(
                twiddle,
                (idx * (n1 // ndev), 0, 0),
                (n1 // ndev, n2, L),
            )
            x = df.mul_impl(x, tw)
            # step 4: transpose -> (n2/ndev, n1, L): rows indexed by k2
            x = local_transpose_sharded(x, n1, n2)
            # step 5: local NTT_{n1} along rows -> index k1
            x = plan1._transform(x, inverse=inverse)  # (n2/ndev, n1, L)
            # step 6: transpose -> (n1/ndev, n2, L) rows k1, cols k2;
            # flatten row-major: global index k1 * n2 + k2 = k2 + n2 k1 ✓
            x = local_transpose_sharded(x, n2, n1)
            return x.reshape(n1 // ndev * n2, L)

        return run

    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """(n, L) Montgomery coefficients -> (n, L) natural-order evals,
        identical to ops.ntt.NttPlan.fft (tested)."""
        return self._run(coeffs)

    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        """Inverse transform, identical to ops.ntt.NttPlan.ifft (tested)."""
        return self._run_inv(evals)

    def coset_fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Coset evaluations over GENERATOR·H (the Groth16 h-poly path)."""
        return self._coset_fft(coeffs)

    def coset_ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self._coset_ifft(evals)
