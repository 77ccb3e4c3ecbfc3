"""XLA emulation of the fused plane kernels for CPU backends.

Pallas `interpret=True` re-executes the kernel body per grid step inside
the trace, which makes the fused curve/NTT kernels catastrophically slow
on CPU (the round-2 multichip dryrun timed out at >10 min even at 2^10).
But every kernel body in this repo is pure jnp over (rows, lanes) f32
planes with statically-sliced Ref access — so on CPU we can run the SAME
body once over the full un-tiled arrays as ordinary jitted XLA: identical
arithmetic (exact f32/int ops, no reassociation of our digit sums —
element-wise ops and static slices lower 1:1), ~100-1000x faster.

`EmuRef` mimics the subset of the pallas Ref protocol the kernel bodies
use: `ref[...]` / `ref[a:b]` / `ref[a:b, :]` reads, the same-shaped
writes, and `+=` accumulation. All indices in the kernel bodies are
static Python slices, so functional `.at[].set()` updates trace to
static dynamic-update-slices.

Used by pallas_curve / ntt_plane / pallas_field_v3 whenever the backend
cannot run Mosaic (interpret=True call sites); set
SNARK_TPU_PALLAS_INTERPRET=1 to force genuine pallas interpret mode for
debugging divergences.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .pallas_field_v3 import F32, PlaneFieldV3


def use_real_interpret() -> bool:
    return os.environ.get("SNARK_TPU_PALLAS_INTERPRET") == "1"


class EmuPlaneField(PlaneFieldV3):
    """PlaneFieldV3 whose wide-product helpers lower to single XLA conv
    ops instead of per-row RMW scratch loops.

    The RMW loops are the right shape for Mosaic (VPU FMAs into VMEM
    scratch) but emit ~500 jaxpr eqns per Montgomery mul; the MSM scan
    inlines the madd body at ~25 call sites and TRACING alone exceeded
    the multichip-dryrun budget. A digit-plane product is a per-lane
    polynomial multiply = one grouped 1-D convolution (all partial sums
    are exact integers < 2^24 in f32, so any accumulation order is
    bit-identical).
    """

    # -- conv primitives -------------------------------------------------
    # Padded-shift formulation, NOT lax.conv: XLA:CPU compiles grouped
    # convolutions (feature_group_count = lane count) pathologically
    # slowly — the G2 MSM graph alone took > 5 min on the 2-vCPU box.
    # A sum of row-shifted elementwise products traces to ~3 eqns per
    # filter row and fuses into one loop nest.
    @staticmethod
    def _conv_lanes(A, B):
        """Per-lane full convolution along rows: out[k,t] = Σ_i A[i,t]·B[k-i,t].
        A (rA, T), B (rB, T) -> (rA+rB-1, T)."""
        rA, T = A.shape
        rB = B.shape[0]
        rout = rA + rB - 1
        acc = None
        for i in range(rA):
            term = jnp.pad(A[i : i + 1, :] * B, ((i, rout - rB - i), (0, 0)))
            acc = term if acc is None else acc + term
        return acc

    @staticmethod
    def _conv_const(digits, x):
        """Shared-filter convolution: out[k,t] = Σ_i digits[i]·x[k-i,t].
        x (rx, T) -> (rx + len(digits) - 1, T)."""
        rd = len(digits)
        rx = x.shape[0]
        rout = rx + rd - 1
        acc = None
        for i, d in enumerate(digits):
            if d == 0.0:
                continue
            term = jnp.pad(F32(d) * x, ((i, rout - rx - i), (0, 0)))
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros((rout, x.shape[1]), F32)
        return acc

    # -- PlaneFieldV3 hot-helper overrides -------------------------------
    def conv_into(self, t_ref, digits, x, rows_out, scale=1.0, zero=True):
        c = self._conv_const(digits, x)[:rows_out]
        pad = rows_out - c.shape[0]
        if pad > 0:
            c = jnp.pad(c, ((0, pad), (0, 0)))
        if scale != 1.0:
            c = c * F32(scale)
        t_ref[0:rows_out, :] = c if zero else t_ref[0:rows_out, :] + c

    def _wide(self, A, B):
        t = self._conv_lanes(A, B)
        return jnp.pad(t, ((0, 2 * self.R8 - t.shape[0]), (0, 0)))

    # -- reduce / mul_const on f32 BLAS dots ------------------------------
    # The constant multiplies of Montgomery reduction are banded-matrix
    # products; on CPU a single f32 GEMM beats 100+ strided elementwise
    # passes and shrinks the traced graph further. All dot partial sums
    # are exact integers < 2^24 (entries <= 255, operand digits <= 1900,
    # 34 terms), so any accumulation order is bit-identical.
    # numpy-side constants; jnp.asarray at the use site embeds them as
    # trace-local constants (a cached device array created inside one
    # trace would leak a tracer into the next)
    def _band_for(self, c_digits):
        import numpy as np

        cache = self.__dict__.setdefault("_band_np_cache", {})
        band = cache.get(c_digits)
        if band is None:
            rows, cols = 2 * self.R8, self.R8
            band = np.zeros((rows, cols), dtype=np.float32)
            for k in range(rows):
                for i in range(cols):
                    if 0 <= k - i < len(c_digits):
                        band[k, i] = c_digits[k - i]
            cache[c_digits] = band
        return jnp.asarray(band)

    def reduce(self, t, t_ref, carry_scale, plus_p=None, m_np=None, m_p=None):
        from .pallas_field_v3 import sweep3

        R8 = self.R8
        tlo = sweep3(t[:R8])
        m = sweep3(jnp.dot(jnp.asarray(self.M_NP), tlo))
        mp = jnp.dot(jnp.asarray(self.M_P), m)
        s = t + mp
        carry = jnp.round(
            jnp.sum(s[:R8] * carry_scale, axis=0, keepdims=True)
        )
        hi = s[R8:]
        out = jnp.concatenate([hi[:1] + carry, hi[1:]], axis=0)
        if plus_p is not None:
            out = out + plus_p
        return sweep3(out)

    def mul_const(
        self, X, c_digits, t_ref, carry_scale, plus_p=None,
        m_c=None, m_np=None, m_p=None,
    ):
        t = jnp.dot(self._band_for(c_digits), X)
        return self.reduce(t, t_ref, carry_scale, plus_p)

    def mul_acc(self, A, B, t_ref):
        t_ref[...] = self._wide(A, B)

    def mont_mul_pair(
        self, A1, B1, A2, B2, t_ref, carry_scale, plus_p=None, scale2=1.0,
        m_np=None, m_p=None,
    ):
        t = self._wide(A1, B1)
        t2 = self._wide(A2, B2)
        t_ref[...] = t + (t2 if scale2 == 1.0 else t2 * F32(scale2))
        return self.reduce(t_ref[...], t_ref, carry_scale, plus_p, m_np, m_p)

    def mont_mul_x2(
        self, A, B, t_ref, carry_scale, plus_p=None, m_np=None, m_p=None
    ):
        t_ref[...] = self._wide(A + A, B)
        return self.reduce(t_ref[...], t_ref, carry_scale, plus_p, m_np, m_p)


@functools.lru_cache(maxsize=None)
def get_emu_field(params, extra_digits: int = 0) -> EmuPlaneField:
    return EmuPlaneField(params, extra_digits)


class EmuRef:
    """Minimal mutable-Ref shim over a functional jnp array."""

    __slots__ = ("a",)

    def __init__(self, arr):
        self.a = arr

    @property
    def shape(self):
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    def __getitem__(self, idx):
        return self.a[idx]

    def __setitem__(self, idx, val):
        if idx is Ellipsis or idx == slice(None):
            self.a = val
        else:
            self.a = self.a.at[idx].set(val)


def emu_call(kernel, n_in, out_shapes, scratch_shape, consts, arrs,
             n_scratch: int = 1):
    """Run `kernel(*refs)` once, full-width, as plain XLA.

    Ref order mirrors pallas_call: consts ‖ data inputs ‖ outputs ‖
    scratch (n_scratch buffers of `scratch_shape`). `out_shapes` are
    jax.ShapeDtypeStructs. Returns the output arrays (tuple, matching
    out_shapes).
    """
    assert len(arrs) == n_in, (len(arrs), n_in)
    refs = [EmuRef(c) for c in consts]
    refs += [EmuRef(a) for a in arrs]
    outs = [EmuRef(jnp.zeros(s.shape, s.dtype)) for s in out_shapes]
    refs += outs
    if isinstance(scratch_shape, list):
        for s in scratch_shape:  # heterogeneous scratch widths
            refs.append(EmuRef(jnp.zeros(s, jnp.float32)))
    else:
        for _ in range(n_scratch):
            refs.append(EmuRef(jnp.zeros(scratch_shape, jnp.float32)))
    kernel(*refs)
    return tuple(o.a for o in outs)
