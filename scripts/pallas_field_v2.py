"""Pallas Montgomery multiply, v2 — scratch-ref accumulation.

v1 (pallas_field.py) lowers but runs slow: its shifted accumulations
materialize lax.pad copies per partial product and the carry network is
built from pad-shifts, which Mosaic lowers poorly. v2 eliminates pads from
the hot loop entirely:

  * partial products accumulate into a VMEM scratch ref with static
    sublane-offset slices: Z[i : i+R8] += A[i] * B;
  * carry sweeps and the Kogge-Stone network use static row slices
    (Z[1:] += c[:-1]), never pads or rolls;
  * layout is plane-major (digits on sublanes, batch on lanes), blocks
    (R8, T) with T a lane multiple.

Experimental: bit-correct under interpret mode (tested); TPU profiling is
round-2 work (ROADMAP.md §1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snark_tpu.fields.params import FieldParams
from snark_tpu.ops.pallas_field import (
    digits8_from_limbs,
    get_plane_spec,
    limbs_from_digits8,
)

F32 = jnp.float32
INV256 = np.float32(1.0 / 256.0)


def _sweep_rows(z):
    """One base-256 carry sweep via static slices (no pads)."""
    c = jnp.floor(z * INV256)
    r = z - 256.0 * c
    top = r[:1]
    rest = r[1:] + c[:-1]
    return jnp.concatenate([top, rest], axis=0)


def _strict_rows(z):
    """Strict normalization: sweeps + slice-based Kogge-Stone."""
    for _ in range(4):
        z = _sweep_rows(z)
    R = z.shape[0]
    g = (z >= 256.0).astype(F32)
    p = (z == 255.0).astype(F32)
    shift = 1
    G, P = g, p
    while shift < R:
        Gs = jnp.concatenate([jnp.zeros((shift,) + G.shape[1:], F32), G[:-shift]], 0)
        Ps = jnp.concatenate([jnp.zeros((shift,) + P.shape[1:], F32), P[:-shift]], 0)
        G = jnp.maximum(G, P * Gs)
        P = P * Ps
        shift <<= 1
    carry = jnp.concatenate([jnp.zeros((1,) + G.shape[1:], F32), G[:-1]], 0)
    z = z + carry
    return z - 256.0 * jnp.floor(z * INV256)


def make_mont_mul_v2(params: FieldParams, tile: int = 512, interpret: bool = False):
    spec = get_plane_spec(params)
    L = spec.L
    R8 = spec.R8
    np_digits = [float(spec.NP[i, 0]) for i in range(R8)]
    p_digits = [float(spec.P[i, 0]) for i in range(R8)]
    consts = jnp.asarray(
        np.concatenate([spec.P, spec.R_MINUS_P], axis=1).T
    )

    def kernel(consts_ref, a_ref, b_ref, o_ref, t_ref, m_ref):
        A = a_ref[...].astype(F32)  # (R8, T)
        B = b_ref[...].astype(F32)
        T = A.shape[1]

        # t = A*B, accumulated in the (2R8, T) scratch with static offsets
        t_ref[...] = jnp.zeros((2 * R8, T), F32)
        for i in range(R8):
            t_ref[i : i + R8, :] += A[i, :][None, :] * B
        t = _strict_rows(t_ref[...])

        # m = (t mod R) * N' mod R — constant multiplier via python floats
        m_ref[...] = jnp.zeros((R8, T), F32)
        t_lo = t[:R8]
        for i in range(R8):
            coeff = np_digits[i]
            if coeff == 0.0:
                continue
            width = R8 - i
            m_ref[i:, :] += coeff * t_lo[:width]
        m = _strict_rows(m_ref[...])

        # t + m*P, accumulated back into the wide scratch
        t_ref[...] = t
        for i in range(R8):
            coeff = p_digits[i]
            if coeff == 0.0:
                continue
            t_ref[i : i + R8, :] += coeff * m
        s = _strict_rows(t_ref[...])
        hi = s[R8:]

        # conditional subtract p (strict compare via carry of hi + (R - p))
        RMP = consts_ref[1, :][:, None]
        ext = jnp.concatenate([hi + RMP, jnp.zeros((1, T), F32)], axis=0)
        t2 = _strict_rows(ext)
        ge = t2[-1:] > 0
        out = jnp.where(ge, t2[:-1], hi)
        o_ref[...] = out.astype(jnp.int32)

    @jax.jit
    def run(a, b):
        n = a.shape[0]
        n_pad = ((n + tile - 1) // tile) * tile
        if n_pad != n:
            a = jnp.pad(a, ((0, n_pad - n), (0, 0)))
            b = jnp.pad(b, ((0, n_pad - n), (0, 0)))
        a8 = digits8_from_limbs(a, L)
        b8 = digits8_from_limbs(b, L)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R8, n_pad), jnp.int32),
            grid=(n_pad // tile,),
            in_specs=[
                pl.BlockSpec((2, R8), lambda i: (0, 0)),
                pl.BlockSpec((R8, tile), lambda i: (0, i)),
                pl.BlockSpec((R8, tile), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((R8, tile), lambda i: (0, i)),
            scratch_shapes=[
                pltpu.VMEM((2 * R8, tile), F32),
                pltpu.VMEM((R8, tile), F32),
            ],
            interpret=interpret,
        )(consts, a8, b8)
        return limbs_from_digits8(out, L)[:n]

    return run
