"""Pallas TPU kernels for multi-limb Montgomery arithmetic.

Why the XLA jnp path is slow (measured ~7M mulmod/s on v5e): every one of
the ~200 elementwise ops in a Montgomery multiply round-trips HBM, and
uint32 multiplies are emulated on the VPU. This kernel fixes both:

  * the whole multiply (or a whole curve point-add: 12 multiplies + carry
    chains) runs out of VMEM — HBM traffic is just inputs + outputs;
  * arithmetic is exact f32: field elements become 2L planes of base-2^8
    digits laid out (planes, TILE) — digit products <= 255^2 and 32-term
    antidiagonal sums stay < 2^24, exactly representable in f32, and f32
    FMA is the VPU's native full-throughput op (the Versal/AI-ASIC ZKP
    papers use the same trick for int-free bignum ML hardware).

Layout inside the kernel: (rows, T) with the batch along lanes (T = tile
size, a multiple of 128) and digit planes along sublanes — limb shifts are
static row offsets, carries are elementwise along lanes.

The in-kernel field routines are pure jnp functions, so they run under
`interpret=True` for CPU tests, bit-checked against the host field.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import FieldParams

F32 = jnp.float32
INV256 = np.float32(1.0 / 256.0)


def _to_planes(x: jnp.ndarray, L: int) -> jnp.ndarray:
    """(T, L) uint32 16-bit limbs -> (2L, T) f32 base-256 digits (LE).

    XLA-side helper (interleave reshapes don't lower in Mosaic — kernels
    receive plane-major blocks instead; see digits8_from_limbs)."""
    xi = x.astype(jnp.int32)
    lo = (xi & 0xFF).astype(F32)
    hi = ((xi >> 8) & 0xFF).astype(F32)
    inter = jnp.stack([lo, hi], axis=-1).reshape(x.shape[0], 2 * L)
    return inter.T


def _from_planes(z: jnp.ndarray, L: int) -> jnp.ndarray:
    """(2L, T) f32 strict digits (< 256) -> (T, L) int32 16-bit limbs."""
    zt = z.T.astype(jnp.int32)  # (T, 2L)
    pairs = zt.reshape(zt.shape[0], L, 2)
    return pairs[..., 0] | (pairs[..., 1] << 8)


def digits8_from_limbs(x: jnp.ndarray, L: int) -> jnp.ndarray:
    """XLA side: (N, L) uint32 16-bit limbs -> (2L, N) int32 base-256 digits
    (plane-major, ready for Pallas BlockSpecs)."""
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    lo = xi & 0xFF
    hi = (xi >> 8) & 0xFF
    inter = jnp.stack([lo, hi], axis=-1).reshape(x.shape[0], 2 * L)  # (N, 2L)
    return inter.T


def limbs_from_digits8(z: jnp.ndarray, L: int) -> jnp.ndarray:
    """XLA side: (2L, N) int32 strict digits -> (N, L) uint32 limbs."""
    zt = z.T  # (N, 2L)
    pairs = zt.reshape(zt.shape[0], L, 2)
    out = pairs[..., 0] | (pairs[..., 1] << 8)
    return jax.lax.bitcast_convert_type(out, jnp.uint32)


def _shift_rows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift digit planes to higher significance by k rows (zero fill)."""
    if k == 0:
        return x
    return jnp.concatenate(
        [jnp.zeros((k,) + x.shape[1:], x.dtype), x[:-k]], axis=0
    )


def _sweep256(z: jnp.ndarray) -> jnp.ndarray:
    """One base-256 carry sweep (exact in f32 for digits < 2^24)."""
    c = jnp.floor(z * INV256)
    return (z - 256.0 * c) + _shift_rows(c, 1)


def _relax(z: jnp.ndarray, sweeps: int = 2) -> jnp.ndarray:
    """Bring lazy digits (< 2^22) down to < ~512: safe multiplier inputs
    (511^2 * 64 < 2^24 still exact in f32)."""
    for _ in range(sweeps):
        z = _sweep256(z)
    return z


def _strict_normalize(z: jnp.ndarray) -> jnp.ndarray:
    """Exact base-256 normalization to digits < 256.

    Input digits < 2^22. Four sweeps bring digits <= 256; a Kogge-Stone
    carry-lookahead on (generate, propagate) resolves the last ripple.
    """
    for _ in range(4):
        z = _sweep256(z)
    R = z.shape[0]
    g = (z >= 256.0).astype(F32)
    p = (z == 255.0).astype(F32)
    shift = 1
    G, P = g, p
    while shift < R:
        Gs = _shift_rows(G, shift)
        Ps = _shift_rows(P, shift)
        G = jnp.maximum(G, P * Gs)  # logical or / and in f32 0-1 space
        P = P * Ps
        shift <<= 1
    carry = _shift_rows(G, 1)
    z = z + carry
    return z - 256.0 * jnp.floor(z * INV256)


class PlaneSpec:
    """Per-field constants in plane form (f32 numpy, baked into kernels)."""

    def __init__(self, params: FieldParams):
        self.params = params
        self.L = params.num_limbs
        self.R8 = 2 * self.L  # number of base-256 digits

        def planes_of(v: int, rows: int) -> np.ndarray:
            return np.array(
                [(v >> (8 * i)) & 0xFF for i in range(rows)], dtype=np.float32
            )[:, None]

        p = params.modulus
        self.P = planes_of(p, self.R8)
        self.NP = planes_of(params.n_prime, self.R8)
        self.R_MINUS_P = planes_of(params.r - p, self.R8)
        self.R2 = planes_of(params.r2, self.R8)
        self.ONE_MONT = planes_of(params.r % p, self.R8)

    # ----- field ops on (R8, T) f32 planes -----------------------------
    @staticmethod
    def _acc(Z, contrib, i: int, out_rows: int):
        """Z += contrib placed at row offset i (single lax.pad, no scatter)."""
        width = contrib.shape[0]
        padded = jax.lax.pad(
            contrib, F32(0), [(i, out_rows - i - width, 0), (0, 0, 0)]
        )
        return Z + padded

    def mul_wide(self, A, B, out_rows: int):
        """Σ_i A_i · B shifted — lazy product digits (< 2^22)."""
        R8 = self.R8
        T = A.shape[1]
        Z = jnp.zeros((out_rows, T), F32)
        for i in range(min(R8, out_rows)):
            width = min(R8, out_rows - i)
            contrib = A[i][None, :] * B[:width]
            Z = self._acc(Z, contrib, i, out_rows)
        return Z

    def mul_wide_const(self, A, c_planes: np.ndarray, out_rows: int):
        """A · constant (planes given as (rows, 1) numpy f32)."""
        rows = c_planes.shape[0]
        T = A.shape[1]
        Z = jnp.zeros((out_rows, T), F32)
        for i in range(min(rows, out_rows)):
            coeff = float(c_planes[i, 0])
            if coeff == 0.0:
                continue
            width = min(A.shape[0], out_rows - i)
            Z = self._acc(Z, coeff * A[:width], i, out_rows)
        return Z

    def mont_mul(self, A, B):
        """Montgomery product of relaxed planes -> relaxed planes (< 512).

        SOS: t = A·B; m = (t mod R)·N' mod R; out = (t + m·P) >> 8·R8.
        Inputs must have digits < 512 (values < 2p after strictification —
        callers keep the [0, 2p) lazy-reduction invariant).
        """
        R8 = self.R8
        t = _strict_normalize(self.mul_wide(A, B, 2 * R8))
        m = _strict_normalize(self.mul_wide_const(t[:R8], self.NP, R8))
        mp = self.mul_wide_const(m, self.P, 2 * R8 + 1)
        s = _strict_normalize(t + mp[: 2 * R8])
        # fold the known-zero low half; result = high digits (+ top carry)
        hi = s[R8:]
        return hi

    def add(self, A, B):
        """Digit add + one sweep (stays < ~600, safe for one more add or a
        strictification before multiplying)."""
        return _sweep256(A + B)

    def sub(self, A, B, P_planes=None):
        """A - B + p for canonical A, B — result in [0, 2p), digits made
        nonnegative by signed sweeps (floor handles negative carries).

        `P_planes` is the modulus in plane form, passed in as a kernel input
        (Pallas forbids captured array constants)."""
        Pp = self.P if P_planes is None else P_planes
        z = A + Pp - B  # digits in (-255, 766)
        z = self._signed_sweep(z)
        z = self._signed_sweep(z)
        return z

    @staticmethod
    def _signed_sweep(z):
        """Carry sweep correct for negative digits (floor handles sign)."""
        c = jnp.floor(z * INV256)
        return (z - 256.0 * c) + _shift_rows(c, 1)

    def cond_sub_p(self, A, RMP_planes=None):
        """Subtract p if A >= p — strict compare via borrow/carry chain."""
        rmp = self.R_MINUS_P if RMP_planes is None else RMP_planes
        A = _strict_normalize(A)
        ext = jnp.concatenate([A + rmp, jnp.zeros((1, A.shape[1]), F32)], axis=0)
        t = _strict_normalize(ext)
        ge = t[-1:] > 0  # carry out => A >= p
        return jnp.where(ge, t[:-1], A)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def get_plane_spec(params: FieldParams) -> PlaneSpec:
    return PlaneSpec(params)


def make_mont_mul(params: FieldParams, tile: int = 256, interpret: bool = False):
    """Batched Montgomery multiply: (N, L) x (N, L) u32 -> (N, L) u32.

    Canonical in, canonical out (strict reduction at the end).
    """
    spec = get_plane_spec(params)
    L = spec.L
    R8 = spec.R8
    consts = jnp.asarray(
        np.concatenate([spec.P, spec.R_MINUS_P], axis=1).T  # (2, R8)
    )

    def kernel(consts_ref, a_ref, b_ref, o_ref):
        Pp = consts_ref[0, :][:, None]
        RMPp = consts_ref[1, :][:, None]
        A = a_ref[...].astype(F32)  # (R8, tile) digit planes
        B = b_ref[...].astype(F32)
        Z = spec.mont_mul(A, B)
        Z = spec.cond_sub_p(Z, RMPp)
        o_ref[...] = Z.astype(jnp.int32)

    @jax.jit
    def run(a, b):
        n = a.shape[0]
        n_pad = ((n + tile - 1) // tile) * tile
        if n_pad != n:
            a = jnp.pad(a, ((0, n_pad - n), (0, 0)))
            b = jnp.pad(b, ((0, n_pad - n), (0, 0)))
        a8 = digits8_from_limbs(a, L)  # (R8, n_pad)
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
            interpret=interpret,
        )(consts, a8, b8)
        return limbs_from_digits8(out, L)[:n]

    return run
