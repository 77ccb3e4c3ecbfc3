"""Pallas Montgomery multiply, v3 — lazy bounds + MXU-reduced pipeline.

Builds arkworks-ff's Montgomery multiply capability (SURVEY.md §2.3,
ark-ff usage at constraint_system.rs:21, sr1cs/mod.rs:166) the TPU way.

Why v3 beats v2 (~20M muls/s sync-forced on v5e):

  * v2 spends most of its vector slots in *strict* normalization (4 carry
    sweeps + a Kogge-Stone lookahead after every stage). v3 drops
    canonicality as an internal invariant entirely: every stage only
    normalizes far enough that the NEXT stage's f32 arithmetic stays exact
    (3 sweeps bound digits by 256 from any <=2^23 lazy state; no lookahead
    anywhere in the hot path).
  * The two constant multiplications of Montgomery reduction
    (m = t·N' mod R and m·P) are banded-constant convolutions — i.e.
    matmuls by a fixed (digits x digits) matrix. v3 runs them on the MXU
    as bf16 x bf16 -> f32 matmuls (both factors are integers <= 256, so
    bf16 is exact and f32 accumulation of <= 2^21-bounded sums is exact).
    Only the variable x variable product remains on the VPU.
  * The final "divide by R" uses an exact float trick instead of proving
    the low half zero digit-by-digit: value(s_lo) is divisible by R, and
    carry = value(s_lo)/R <= 2^15 can be summed as s_lo[i]·2^{8(i-32)} in
    f32 with total rounding error < 0.05, then rounded to the exact
    integer. 12 rows suffice (lower terms < 2^-73).

Value/digit invariants (per-field, p/R <= 0.23 for all four fields):

  * mul inputs:  digits |d| <= 724 (so 32-term digit-product sums < 2^24,
    exact in f32), value in [0, 2.7p].
  * mul output:  digits in [0, 256], value <= 0.23·2.7²·p + 1.01p < 2.7p.
    (For canonical-ish inputs <= 1.3p the output value is <= 1.4p.)
  * add = plain digit add (no sweep): safe as a mul input for one level
    (256+256 = 512 <= 724). Deeper adder trees insert single sweeps.
  * sub(A, B) = A + (k·p - B) with k·p >= value(B) baked as a constant:
    digits in (-256, 512), still mul-safe; value stays nonnegative.

All in-kernel routines are pure jnp on (R8, T) f32 digit planes
("plane-major": base-256 digits on sublanes, batch on lanes) so they run
under interpret=True for CPU tests and compose into larger fused kernels
(curve adds, NTT butterflies) without HBM round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import FieldParams
from .pallas_field import digits8_from_limbs, limbs_from_digits8

F32 = jnp.float32
BF16 = jnp.bfloat16
INV256 = np.float32(1.0 / 256.0)

# rows of s_lo that contribute >= 2^-73 to the carry (see module doc)
_CARRY_ROWS = 12


def _sweep(z):
    """One base-256 carry sweep via static row slices (sign-correct)."""
    c = jnp.floor(z * INV256)
    r = z - 256.0 * c
    return jnp.concatenate([r[:1], r[1:] + c[:-1]], axis=0)


def _sweep_n(z, n):
    for _ in range(n):
        z = _sweep(z)
    return z


def sweep3(z):
    """Digits <=2^23 lazy -> digits in [0,256] (or (-256,256) if signed).

    Three sweeps: 2^23 -> 255+2^15 -> 255+129 -> 255+1. Carry out of the
    top row is DROPPED (callers rely on this only where value is known
    < 256^rows, or where mod-R truncation is wanted).
    """
    return _sweep_n(z, 3)


class PlaneFieldV3:
    """Per-field constants + pure-jnp plane ops for fused kernels.

    `extra_digits` widens Montgomery R beyond the minimal 2L base-256
    digits. With extra=2, p/R <= 2^-17, so a Montgomery product of ANY two
    lazily-bounded inputs (values <= ~16p) lands in [0, ~2p] — curve
    formulas never need conditional subtractions, only digit-bound sweeps.
    The cost is (34/32)² ≈ 13% more multiply work; the savings are every
    cond-sub/canonicalization in the point-add hot loop.
    """

    def __init__(self, params: FieldParams, extra_digits: int = 0):
        self.params = params
        self.L = params.num_limbs
        self.extra = extra_digits
        R8 = self.R8 = 2 * self.L + extra_digits
        p = params.modulus
        self.r_eff = 1 << (8 * R8)
        self.n_prime_eff = (-pow(p, -1, self.r_eff)) % self.r_eff
        self.r2_eff = self.r_eff * self.r_eff % p
        self.one_mont_val = self.r_eff % p

        def digits_col(v: int, rows: int) -> np.ndarray:
            return np.array(
                [(v >> (8 * i)) & 0xFF for i in range(rows)], dtype=np.float32
            )[:, None]

        def band(v: int, rows: int, cols: int) -> np.ndarray:
            """Banded lower-triangular conv matrix: M[k, i] = digit_{k-i}(v)."""
            d = [(v >> (8 * i)) & 0xFF for i in range(rows)]
            m = np.zeros((rows, cols), dtype=np.float32)
            for k in range(rows):
                for i in range(cols):
                    if 0 <= k - i < rows:
                        m[k, i] = d[k - i]
            return m

        self._digits_col = digits_col
        self._band = band
        self.P_COL = digits_col(p, R8)
        self.P2_COL = digits_col(2 * p, R8)
        self.P4_COL = digits_col(4 * p, R8)
        class _KpCols(dict):
            """k -> digit column of k·p, computed on demand (any k with
            k·p < 256^R8 is valid; digits are always <= 255)."""

            def __missing__(self, k):
                col = digits_col(k * p, R8)
                self[k] = col
                return col

        self.KP_COLS = _KpCols()
        for k in range(1, 33):
            _ = self.KP_COLS[k]
        self.RMP_COL = digits_col(self.r_eff - p, R8)
        self.ONE_MONT_COL = digits_col(self.one_mont_val, R8)
        self.R2_COL = digits_col(self.r2_eff, R8)
        # MXU band matrices (all entries <= 255, bf16-exact) — kept for
        # tests/tools; the hot path now uses the scalar digit lists below
        self.M_NP = band(self.n_prime_eff, R8, R8)  # (R8, R8): x -> x·N' mod R
        self.M_P = band(p, 2 * R8, R8)  # (2R8, R8): x -> x·P
        # compile-time scalar digit lists: the banded-constant "matmuls" of
        # Montgomery reduction are convolutions by these FIXED byte
        # sequences. Emitting them as Python-float scalar FMAs keeps the
        # whole reduce on the VPU — measured ~25x faster than the bf16 MXU
        # path, whose per-call cast/relayout overhead (~2.5 us per reduce
        # per grid step) dwarfed the actual arithmetic.
        self.NP_DIGITS = self.digits_list(self.n_prime_eff)
        self.P_DIGITS = self.digits_list(p)
        # carry-extraction scales: 2^{8(i-R8)} for the top _CARRY_ROWS rows
        sc = np.zeros((R8, 1), dtype=np.float32)
        for i in range(R8 - _CARRY_ROWS, R8):
            sc[i, 0] = 2.0 ** (8 * (i - R8))
        self.CARRY_SCALE = sc

    # ------------------------------------------------------------------
    # in-kernel ops ((R8, T) f32 planes; also valid as plain XLA ops)
    # ------------------------------------------------------------------
    def digits_list(self, v: int, rows: int | None = None) -> tuple:
        """Base-256 digits of v as compile-time Python floats."""
        rows = rows or self.R8
        return tuple(float((v >> (8 * i)) & 0xFF) for i in range(rows))

    @staticmethod
    def conv_into(t_ref, digits, x, rows_out: int, scale=1.0, zero=True):
        """t_ref[:rows_out] (+)= scale·conv(digits, x), rows truncated at
        rows_out: out[k] = Σ_i digits[i]·x[k-i].

        Scalar-constant VPU FMAs accumulated into scratch rows (the same
        RMW pattern as mul_acc — Mosaic compiles and schedules it well,
        unlike value-level pad chains). Zero digits are skipped. Exact
        while every partial sum stays < 2^24 (terms <= 255·|x| with <= R8
        of them — the caller's digit-bound ledger covers this).
        """
        rx = x.shape[0]
        if zero:
            t_ref[0:rows_out, :] = jnp.zeros((rows_out, x.shape[1]), F32)
        for i, d in enumerate(digits):
            if d == 0.0 or i >= rows_out:
                continue
            hi = min(rows_out - i, rx)
            t_ref[i : i + hi, :] += (d * scale) * x[:hi]

    def mul_acc(self, A, B, t_ref):
        """t_ref[0:2R8] = A * B (lazy digit conv, digits < 2^24)."""
        R8 = self.R8
        t_ref[...] = jnp.zeros(t_ref.shape, F32)
        for i in range(R8):
            t_ref[i : i + R8, :] += A[i, :][None, :] * B

    def reduce(self, t, t_ref, carry_scale, plus_p=None, m_np=None, m_p=None):
        """Montgomery-reduce a lazy (2R8, T) product value t -> (R8, T).

        t_ref is clobbered as scratch (t must already be a loaded VALUE).
        Signed digit inputs (|d| <= 2^22) are fine: sweeps are sign-correct.
        With signed digits value(m) may be negative, making the result land
        in (-p, V²/R + 1.01p); pass `plus_p` (the P_COL constant, as an
        input ref slice) to fold a +p and keep values nonnegative —
        required when composing in fused kernels. Output digits in
        [-1, 256] (nonneg inputs: [0, 256]).

        Two bit-identical backends for the constant multiplies
        (m = t·N' mod R, m·P) — all terms are exact integers < 2^24:

        * m_np/m_p None: scalar-constant VPU convolutions (conv_into).
          Fastest when the kernel has little mul-level parallelism (NTT
          butterflies, serial mul chains: 5.5 vs 24.7 ns/mul measured) —
          the MXU path's cast+relayout cannot overlap anything there.
        * m_np/m_p given (bf16 band-matrix refs): MXU matmuls. Fastest
          inside kernels with many independent muls (the fused curve
          adds), where the matmuls of one reduce overlap the VPU conv and
          sweep work of the others and the constant multiplies become
          ~free.
        """
        R8 = self.R8
        tlo = sweep3(t[:R8])  # mod-R truncation: top carry dropped
        if m_np is None:
            self.conv_into(t_ref, self.NP_DIGITS, tlo, R8)
            m = sweep3(t_ref[0:R8, :])  # digits [-1,256]; ≡ t·N' (mod R)
            self.conv_into(t_ref, self.P_DIGITS, m, 2 * R8)
            mp = t_ref[...]
        else:
            m = jnp.dot(m_np, tlo.astype(BF16), preferred_element_type=F32)
            m = sweep3(m)
            mp = jnp.dot(m_p, m.astype(BF16), preferred_element_type=F32)
        s = t + mp  # digits <= 2^22.6, low half value ≡ 0 mod R
        carry = jnp.round(jnp.sum(s[:R8] * carry_scale, axis=0, keepdims=True))
        hi = s[R8:]
        out = jnp.concatenate([hi[:1] + carry, hi[1:]], axis=0)
        if plus_p is not None:
            out = out + plus_p
        return sweep3(out)

    def mont_mul(self, A, B, t_ref, carry_scale, plus_p=None, m_np=None, m_p=None):
        """Full Montgomery product on planes (see class invariants)."""
        self.mul_acc(A, B, t_ref)
        return self.reduce(t_ref[...], t_ref, carry_scale, plus_p, m_np, m_p)

    def mont_mul_pair(
        self, A1, B1, A2, B2, t_ref, carry_scale, plus_p=None, scale2=1.0,
        m_np=None, m_p=None,
    ):
        """(A1·B1 + scale2·A2·B2)·R^-1 — two products, ONE reduction.

        The wide accumulations share t_ref; with input digits |d| <= 513
        the paired lazy digits stay < 2^23.8 (exact). scale2 = -1.0 gives
        a fused multiply-subtract (values can go negative; reduce handles
        signed digits, and plus_p restores nonnegativity since each
        product's reduced value is < 1.03p in magnitude).
        """
        R8 = self.R8
        t_ref[...] = jnp.zeros(t_ref.shape, F32)
        for i in range(R8):
            t_ref[i : i + R8, :] += A1[i, :][None, :] * B1
        A2s = A2 if scale2 == 1.0 else A2 * F32(scale2)
        for i in range(R8):
            t_ref[i : i + R8, :] += A2s[i, :][None, :] * B2
        return self.reduce(t_ref[...], t_ref, carry_scale, plus_p, m_np, m_p)

    def mont_mul_x2(
        self, A, B, t_ref, carry_scale, plus_p=None, m_np=None, m_p=None
    ):
        """(2·A·B)·R^-1 — doubled product, one reduction (digits must give
        2·conv < 2^24: |dA·dB|·R8 <= 2^23)."""
        R8 = self.R8
        t_ref[...] = jnp.zeros(t_ref.shape, F32)
        A2 = A + A
        for i in range(R8):
            t_ref[i : i + R8, :] += A2[i, :][None, :] * B
        return self.reduce(t_ref[...], t_ref, carry_scale, plus_p, m_np, m_p)

    def const_band(self, c_mont: int) -> np.ndarray:
        """(2R8, R8) band matrix for multiply-by-constant (c in Mont form):
        conv(x, c) == M_C @ x. Legacy/tests only — hot kernels use
        mul_const with a digits_list."""
        return self._band(c_mont, 2 * self.R8, self.R8)

    def mul_const(
        self, X, c_digits, t_ref, carry_scale, plus_p=None,
        m_c=None, m_np=None, m_p=None,
    ):
        """X·c with c given as digits_list(c_mont). X digits must satisfy
        255·|X|·R8 < 2^24 (i.e. |X| <= ~1900); sweep3 first if lazier.

        With m_c (a bf16 const_band ref) the constant conv runs on the MXU
        instead (X must then be bf16-exact, [-256, 256]); see reduce() for
        when each backend wins."""
        if m_c is not None:
            t = jnp.dot(m_c, X.astype(BF16), preferred_element_type=F32)
            return self.reduce(t, t_ref, carry_scale, plus_p, m_np, m_p)
        self.conv_into(t_ref, c_digits, X, 2 * self.R8)
        return self.reduce(t_ref[...], t_ref, carry_scale, plus_p)

    # ------------------------------------------------------------------
    # host codecs (test/ingestion use; device bulk conversion via mul R2)
    # ------------------------------------------------------------------
    def pack_np(self, vals, mont: bool = True) -> np.ndarray:
        """Python ints -> (R8, N) f32 digit planes (Mont form by default)."""
        p = self.params.modulus
        r = self.r_eff
        R8 = self.R8
        buf = bytearray(R8 * len(vals))
        for j, v in enumerate(vals):
            v = v % p
            if mont:
                v = v * r % p
            buf[j * R8 : (j + 1) * R8] = v.to_bytes(R8, "little")
        arr = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(len(vals), R8)
        return arr.T.astype(np.float32)

    def pack_rows_u8_np(self, vals, mont: bool = True) -> np.ndarray:
        """Python ints -> (N, R8) uint8 rows (canonical digits)."""
        p = self.params.modulus
        r = self.r_eff
        R8 = self.R8
        buf = bytearray(R8 * len(vals))
        for j, v in enumerate(vals):
            v = v % p
            if mont:
                v = v * r % p
            buf[j * R8 : (j + 1) * R8] = v.to_bytes(R8, "little")
        return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(len(vals), R8)

    def unpack_np(self, planes, mont: bool = True) -> list[int]:
        """(R8, N) lazy/canonical digit planes -> python ints (mod p)."""
        p = self.params.modulus
        d = np.asarray(planes, dtype=np.int64)
        rinv = pow(self.r_eff, -1, p)
        out = []
        for j in range(d.shape[1]):
            v = int(sum(int(x) << (8 * i) for i, x in enumerate(d[:, j])))
            if mont:
                v = v * rinv
            out.append(v % p)
        return out

    @staticmethod
    def add(A, B):
        """Plain digit add: one vector op, no carries (track digit bounds)."""
        return A + B

    def sub(self, A, B, kp_col):
        """A - B + k·p (kp_col >= value(B) so the value stays >= 0)."""
        return (A - B) + kp_col

    @staticmethod
    def _strict(z):
        """Exact normalization to digits < 256 (4 sweeps + Kogge-Stone)."""
        z = _sweep_n(z, 4)
        R = z.shape[0]
        g = (z >= 256.0).astype(F32)
        pr = (z == 255.0).astype(F32)
        shift = 1
        G, P = g, pr
        while shift < R:
            pad = jnp.zeros((shift,) + G.shape[1:], F32)
            G = jnp.maximum(G, P * jnp.concatenate([pad, G[:-shift]], 0))
            P = P * jnp.concatenate([pad, P[:-shift]], 0)
            shift <<= 1
        z = z + jnp.concatenate([jnp.zeros((1,) + G.shape[1:], F32), G[:-1]], 0)
        return z - 256.0 * jnp.floor(z * INV256)

    def cond_sub_p(self, A, rmp_col):
        """Canonical-digit A (value < 2p) -> A mod p.

        A + (R-p) carries out of the top digit iff A >= p (strict compare
        via the extended row).
        """
        ext = jnp.concatenate(
            [A + rmp_col, jnp.zeros((1,) + A.shape[1:], F32)], 0
        )
        t = self._strict(ext)
        ge = t[-1:] > 0
        return jnp.where(ge, t[:-1], A)

    def to_canonical(self, A, rmp_col):
        """Lazy planes -> canonical digits (<256, value < p). Not hot-path."""
        z = self._strict(A)
        # canonical digits; subtract p up to twice (value < 2.7p)
        for _ in range(2):
            z = self.cond_sub_p(z, rmp_col)
        return z


@functools.lru_cache(maxsize=None)
def get_plane_field_v3(params: FieldParams, extra_digits: int = 0) -> PlaneFieldV3:
    return PlaneFieldV3(params, extra_digits)


def make_mont_mul_v3(params: FieldParams, tile: int = 512, interpret: bool = False):
    """Standalone batched Montgomery mul: (N, L) u32 limbs -> (N, L) u32.

    Canonical in, canonical out (final strict pass) — drop-in replacement
    for make_mont_mul/make_mont_mul_v2 in tests and benchmarks.
    """
    from .plane_emu import use_real_interpret

    if interpret and not use_real_interpret():
        from .plane_emu import get_emu_field

        pf = get_emu_field(params)
    else:
        pf = get_plane_field_v3(params)
    R8 = pf.R8
    L = pf.L
    cols = jnp.asarray(
        np.concatenate([pf.CARRY_SCALE, pf.RMP_COL], axis=1)  # (R8, 2)
    )

    def kernel(cols_ref, a_ref, b_ref, o_ref, t_ref):
        A = a_ref[...].astype(F32)
        B = b_ref[...].astype(F32)
        carry_scale = cols_ref[:, 0:1]
        rmp = cols_ref[:, 1:2]
        out = pf.mont_mul(A, B, t_ref, carry_scale)
        out = pf.to_canonical(out, rmp)
        o_ref[...] = out.astype(jnp.int32)

    if interpret and not use_real_interpret():
        from .plane_emu import emu_call

        @jax.jit
        def run_emu(a, b):
            n = a.shape[0]
            a8 = digits8_from_limbs(a, L)
            b8 = digits8_from_limbs(b, L)
            (out,) = emu_call(
                kernel,
                2,
                (jax.ShapeDtypeStruct((R8, n), jnp.int32),),
                (2 * R8, n),
                [cols],
                [a8, b8],
            )
            return limbs_from_digits8(out, L)[:n]

        return run_emu

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
                pl.BlockSpec((R8, 2), lambda i: (0, 0)),
                pl.BlockSpec((R8, tile), lambda i: (0, i)),
                pl.BlockSpec((R8, tile), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((R8, tile), lambda i: (0, i)),
            scratch_shapes=[pltpu.VMEM((2 * R8, tile), F32)],
            interpret=interpret,
        )(cols, a8, b8)
        return limbs_from_digits8(out, L)[:n]

    return run
