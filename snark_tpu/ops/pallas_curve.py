"""Fused Pallas curve kernels: complete point add/double on digit planes.

TPU-native replacement for ark-ec's group arithmetic (SURVEY.md §2.3): the
entire RCB15 complete-addition formula (eprint 2015/1060, Alg 7/9 for
a = 0) runs inside ONE Pallas kernel — variable Montgomery multiplies on
the VPU, constant multiplies on the MXU (banded matrices), all
temporaries in VMEM. Per point-add HBM traffic is exactly 2 points in,
1 point out. Generic over the coordinate field: G1 (Fq) and G2 (Fq2,
Karatsuba over u²+1) share the same formula bodies via field adapters.

Representation: a coordinate is a (K·R8, N) f32 digit-plane array in
*wide* Montgomery form (R = 256^R8, R8 = 2L+2; see pallas_field_v3:
p/R <= 2^-17 makes every Montgomery product land in [~p, ~3.1p] with the
folded +2p, so values stay strictly positive and no conditional
subtraction ever runs). K = 1 for G1, 2 for G2 (c0 planes ‖ c1 planes).
A point is (X, Y, Z) projective; identity = (0 : 1 : 0). The formulas are
complete: valid for ALL input pairs (doubling, identity, inverses).

Digit-bound invariants (exactness: conv terms must stay < 2^24, i.e.
multiply operands need |digits| <= 702 for R8 = 34):

    mul outputs        [-1, 256]   (reduce ends in sweep3; G2 adds its own
                                    component sweeps)
    coordinate sums    [-2, 512]
    sub outputs        [-513, 513]
    triple (3x)        [-3, 258]   (one sweep)

Value ledger (units of p, worst case = G2 where a Fq2 mul's c1 component
is m2 - m0 - m1 + 7p <= 10.2): mul inputs reach ~43p in magnitude (sum of
two outputs of the X3 = q1 - q0 + 11p shape), products <= ~2000p² — the
ε = p/R <= 2^-17 term keeps every reduced value <= 3.07p and the 2·R8
digit capacity (256^68 ~ 2^544 vs products <= 2^521) is never exceeded.
Sub constants: K1 = 21 (t3/t4/y3pre), K2 = 4 (t1'), 10 (dbl t0-3b3z²),
11 (G2 X3 = q1 - q0), G2-internal 4 (c0), 7 (c1). All folded +p are 2p
so signed-digit Montgomery outputs (value(m) can be negative) remain
strictly positive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import CurveParams
from .pallas_field_v3 import BF16, F32, PlaneFieldV3, _sweep, sweep3
from .plane_emu import use_real_interpret as _use_real_interpret

EXTRA_DIGITS = 2

# COLS column indices (f32 constant columns shipped to the kernel as one
# (R8, 7) array — column extraction is a slice, never a lane->sublane
# transpose)
_CARRY, _P2, _K4, _K7, _K10, _K11, _K21 = range(7)
_KCOL = {4: _K4, 7: _K7, 10: _K10, 11: _K11, 21: _K21}


class _G1Field:
    """Fq plane ops bound to one kernel invocation (t_ref + consts).

    mnp/mp/mb3 (bf16 band refs) select the MXU backend for the constant
    multiplies of every Montgomery reduce — inside the fused curve kernels
    the matmuls of one reduce overlap the VPU conv/sweep work of the other
    muls, so they are effectively free (measured: MXU beats the VPU
    scalar-conv backend 18.9 vs 14.2 M MSM adds/s at 2^20). Pass None to
    fall back to pure-VPU scalar convs (what serial-mul kernels want).
    """

    K = 1

    def __init__(self, pf, t_ref, b3_digits, cols, mnp=None, mp=None, mb3=None):
        self.pf = pf
        # one or several scratch buffers: with a SINGLE shared scratch all
        # Montgomery reduces serialize on its RMW chain (WAW on t_ref) —
        # rotating across independent scratches lets Mosaic overlap the
        # independent muls of a point-add formula (ILP across reduces)
        self.t_refs = list(t_ref) if isinstance(t_ref, (list, tuple)) else [t_ref]
        self._ti = 0
        self.b3_digits = b3_digits  # compile-time digit tuple of 3b·R
        self.mnp = mnp
        self.mp = mp
        self.mb3 = mb3
        self.carry = cols[:, _CARRY : _CARRY + 1]
        self.p2 = cols[:, _P2 : _P2 + 1]
        self.cols = cols

    def _t(self):
        r = self.t_refs[self._ti]
        self._ti = (self._ti + 1) % len(self.t_refs)
        return r

    def kp(self, k):
        c = _KCOL[k]
        return self.cols[:, c : c + 1]

    def neg_y(self, y, s):
        """Conditionally negate an affine y (canonical digits <= 255):
        s = 1 -> 2p - y (digits in [-255, 255], value in (p, 2p] — safe as
        a mul operand; see the module value ledger), s = 0 -> y.

        This is the signed-digit MSM's in-kernel negation: the point table
        stores only the N positive rows and the per-step sign plane flips
        the gathered Y — no 2N-row [pos ‖ neg] table (one FMA per digit
        row vs 2x table HBM).
        """
        return y + s * (self.p2 - (y + y))

    def mul(self, a, b):
        return self.pf.mont_mul(
            a, b, self._t(), self.carry, plus_p=self.p2,
            m_np=self.mnp, m_p=self.mp,
        )

    def mul_pair(self, a, b, c, d, sign2=1.0):
        return self.pf.mont_mul_pair(
            a, b, c, d, self._t(), self.carry, plus_p=self.p2, scale2=sign2,
            m_np=self.mnp, m_p=self.mp,
        )

    def mul_x2(self, a, b):
        return self.pf.mont_mul_x2(
            a, b, self._t(), self.carry, plus_p=self.p2,
            m_np=self.mnp, m_p=self.mp,
        )

    def cmul_b3(self, x):
        """x digits must be [-256, 256] on the MXU path ([-1900, 1900] on
        the VPU conv path)."""
        return self.pf.mul_const(
            x, self.b3_digits, self._t(), self.carry, plus_p=self.p2,
            m_c=self.mb3, m_np=self.mnp, m_p=self.mp,
        )

    @staticmethod
    def add(a, b):
        return a + b

    def sub(self, a, b, k):
        return (a - b) + self.kp(k)

    @staticmethod
    def triple(x):
        return _sweep(x + x + x)

    @staticmethod
    def norm(x):
        return sweep3(x)


class _G2Field:
    """Fq2 = Fq[u]/(u²+1) over stacked (2·R8, T) planes (c0 ‖ c1)."""

    K = 2

    def __init__(self, pf, t_ref, b3_digits, cols, mnp=None, mp=None, mb3=None):
        self.pf = pf
        self.R8 = pf.R8
        self.t_refs = list(t_ref) if isinstance(t_ref, (list, tuple)) else [t_ref]
        self._ti = 0
        self.b3_digits = b3_digits  # (k0_digits, k1_digits) tuple pair
        self.mnp = mnp
        self.mp = mp
        self.mb3 = mb3  # (band_k0, band_k1) bf16 refs or None
        self.carry = cols[:, _CARRY : _CARRY + 1]
        self.p2 = cols[:, _P2 : _P2 + 1]
        self.cols = cols

    def kp(self, k):
        c = _KCOL[k]
        return self.cols[:, c : c + 1]

    def neg_y(self, y, s):
        """Conditional negation of an affine Fq2 y (see _G1Field.neg_y):
        both components flip, 2p - y_i per component."""
        p22 = jnp.concatenate([self.p2, self.p2], axis=0)
        return y + s * (p22 - (y + y))

    def _split(self, x):
        return x[: self.R8], x[self.R8 :]

    @staticmethod
    def _join(c0, c1):
        return jnp.concatenate([c0, c1], axis=0)

    def _t(self):
        r = self.t_refs[self._ti]
        self._ti = (self._ti + 1) % len(self.t_refs)
        return r

    def _base_mul(self, a, b):
        return self.pf.mont_mul(
            a, b, self._t(), self.carry, plus_p=self.p2,
            m_np=self.mnp, m_p=self.mp,
        )

    def mul(self, a, b):
        """Karatsuba: 3 base muls; components re-normalized to [-1, 256].

        Karatsuba sums are swept first (operand digits can reach ~1026)."""
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        m0 = self._base_mul(a0, b0)
        m1 = self._base_mul(a1, b1)
        m2 = self._base_mul(sweep3(a0 + a1), sweep3(b0 + b1))
        c0 = sweep3((m0 - m1) + self.kp(4))
        c1 = sweep3((m2 - (m0 + m1)) + self.kp(7))
        return self._join(c0, c1)

    def mul_pair(self, a, b, c, d, sign2=1.0):
        m1 = self.mul(a, b)
        m2 = self.mul(c, d)
        if sign2 == 1.0:
            return sweep3(m1 + m2)
        return sweep3((m1 - m2) + jnp.concatenate([self.kp(11)] * 2, 0)[: 2 * self.R8])

    def mul_x2(self, a, b):
        m = self.mul(a, b)
        return sweep3(m + m)

    def cmul_b3(self, x):
        """(x0 + x1·u)·(k0 + k1·u): 4 const convs (MXU or VPU), 2 reduces.

        VPU branch (mb3 None) digit bound: the two convolutions of each
        component accumulate into ONE scratch, so the exact-f32 input
        bound is HALF the G1 VPU bound — |x| digits must stay <= ~950
        (2·255·|x|·R8 < 2^24), vs ~1900 for G1 cmul_b3. All current call
        sites feed mul outputs/sums with |digits| <= 512. The built
        kernels always pass mb3 (MXU branch); the VPU branch is kept for
        ref-free composition and covered by test_g2_cmul_b3_vpu_branch.
        """
        pf = self.pf
        t_ref = self._t()
        x0, x1 = self._split(x)
        if self.mb3 is not None:
            mk0, mk1 = self.mb3
            x0b = x0.astype(BF16)
            x1b = x1.astype(BF16)
            t0 = jnp.dot(mk0, x0b, preferred_element_type=F32) - jnp.dot(
                mk1, x1b, preferred_element_type=F32
            )
            t1 = jnp.dot(mk0, x1b, preferred_element_type=F32) + jnp.dot(
                mk1, x0b, preferred_element_type=F32
            )
            c0 = pf.reduce(
                t0, t_ref, self.carry, plus_p=self.p2, m_np=self.mnp, m_p=self.mp
            )
            c1 = pf.reduce(
                t1, t_ref, self.carry, plus_p=self.p2, m_np=self.mnp, m_p=self.mp
            )
            return self._join(c0, c1)
        k0d, k1d = self.b3_digits
        R2 = 2 * pf.R8
        pf.conv_into(t_ref, k0d, x0, R2)
        pf.conv_into(t_ref, k1d, x1, R2, scale=-1.0, zero=False)
        c0 = pf.reduce(t_ref[...], t_ref, self.carry, plus_p=self.p2)
        pf.conv_into(t_ref, k0d, x1, R2)
        pf.conv_into(t_ref, k1d, x0, R2, zero=False)
        c1 = pf.reduce(t_ref[...], t_ref, self.carry, plus_p=self.p2)
        return self._join(c0, c1)

    @staticmethod
    def add(a, b):
        return a + b

    def sub(self, a, b, k):
        kp = self.kp(k)
        return (a - b) + jnp.concatenate([kp, kp], axis=0)[: 2 * self.R8]

    @staticmethod
    def triple(x):
        return _sweep(x + x + x)

    @staticmethod
    def norm(x):
        return sweep3(x)


def _add_body(F, P, Q):
    """RCB15 Alg 7 (a = 0) complete add over a field adapter."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t2 = F.mul(Z1, Z2)
    m4 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
    m5 = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))
    m6 = F.mul(F.add(X1, Z1), F.add(X2, Z2))
    t3 = F.sub(m4, F.add(t0, t1), 21)
    t4 = F.sub(m5, F.add(t1, t2), 21)
    y3p = F.sub(m6, F.add(t0, t2), 21)
    t0p = F.triple(t0)
    t2p = F.cmul_b3(t2)
    y3 = F.cmul_b3(F.norm(y3p))
    z3p = F.add(t1, t2p)
    t1p = F.sub(t1, t2p, 4)
    X3 = F.mul_pair(t3, t1p, t4, y3, sign2=-1.0)
    Y3 = F.mul_pair(t1p, z3p, y3, t0p)
    Z3 = F.mul_pair(z3p, t4, t0p, t3)
    return X3, Y3, Z3


def _madd_mixed_body(F, P, Q):
    """RCB15 Alg 8 (a = 0) complete MIXED add: Q = (X2, Y2) affine (Z2 = 1).

    Complete for every projective P and affine Q (doubling and inverse
    included); Q = identity must be masked out by the caller (affine has
    no identity encoding) — in the MSM scan the row flag joins the bucket
    mask. One var-mul and one reduce cheaper than the projective add, and
    both Q coordinates arrive as u8-canonical digits (<= 255).

    Value/digit ledger (units of p, same envelope as _add_body): t0, t1,
    m4 <= 3.07; t4 = Y2·Z1 + Y1, y3p = X2·Z1 + X1 <= 6.14 (digits <= 512);
    t3 via K21; t1' via K4; all conv sums <= 2^23.4 (exact in f32).
    """
    X1, Y1, Z1 = P
    X2, Y2 = Q
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    m4 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
    t3 = F.sub(m4, F.add(t0, t1), 21)
    t4 = F.add(F.mul(Y2, Z1), Y1)
    y3p = F.add(F.mul(X2, Z1), X1)
    t0p = F.triple(t0)
    t2p = F.cmul_b3(Z1)
    y3 = F.cmul_b3(F.norm(y3p))
    z3p = F.add(t1, t2p)
    t1p = F.sub(t1, t2p, 4)
    X3 = F.mul_pair(t3, t1p, t4, y3, sign2=-1.0)
    Y3 = F.mul_pair(t1p, z3p, y3, t0p)
    Z3 = F.mul_pair(z3p, t4, t0p, t3)
    return X3, Y3, Z3


def _madd_mixed_body_batched_g1(F, P, Q, sa, sb, t5, t3s):
    """RCB15 Alg 8 with LATERALLY BATCHED Montgomery reductions (G1).

    Identical per-lane arithmetic to _madd_mixed_body — the independent
    multiplies of each phase are laid side by side along the LANE axis
    (staged through scratch refs sa/sb: Mosaic has no lane-concat of
    offset values, but offset STORES into a scratch are fine) and share
    ONE mul_acc loop + ONE reduce:

      phase 1 (width 5T): [X1·X2, Y1·Y2, (X1+Y1)(X2+Y2), Y2·Z1, X2·Z1]
      phase 2 (width 2T): cmul_b3 of [Z1, norm(y3p)] (pure-MXU: needs no
                          accumulation scratch)
      phase 3 (width 3T): the three mul_pairs (X3 sign folded by
                          pre-negating the t4 block of A2 — same math as
                          scale2 = -1)

    Why: the kernel is per-op-overhead-bound (measured ~40 cycles fixed
    cost per jnp op on (34, T) planes vs ~4 cycles of arithmetic at
    T=1024); batching cuts the op COUNT of the reduce pipeline ~4x while
    keeping every per-lane product bit-identical, so the digit/value
    ledger of _madd_mixed_body applies unchanged. sa/sb are (R8, 6T)
    staging scratches; t5/t3s the (2R8, 5T/3T) accumulation scratches.
    """
    pf = F.pf
    X1, Y1, Z1 = P
    X2, Y2 = Q
    T = X1.shape[1]

    def stage(ref, parts):
        for k, v in enumerate(parts):
            ref[:, k * T : (k + 1) * T] = v
        return ref[:, : len(parts) * T]

    A = stage(sa, [X1, Y1, F.add(X1, Y1), Y2, X2])
    B = stage(sb, [X2, Y2, F.add(X2, Y2), Z1, Z1])
    M = pf.mont_mul(A, B, t5, F.carry, plus_p=F.p2, m_np=F.mnp, m_p=F.mp)
    t0 = M[:, 0 * T : 1 * T]
    t1 = M[:, 1 * T : 2 * T]
    m4 = M[:, 2 * T : 3 * T]
    t4 = F.add(M[:, 3 * T : 4 * T], Y1)
    y3p = F.add(M[:, 4 * T : 5 * T], X1)

    t3 = F.sub(m4, F.add(t0, t1), 21)
    t0p = F.triple(t0)
    # phase 2: the MXU-backed mul_const never touches its t_ref argument
    # (reduce's matmul path is value-only) — t5 is passed but unused
    C2 = pf.mul_const(
        stage(sa, [Z1, F.norm(y3p)]), F.b3_digits, t5, F.carry,
        plus_p=F.p2, m_c=F.mb3, m_np=F.mnp, m_p=F.mp,
    )
    t2p = C2[:, :T]
    y3 = C2[:, T:]
    z3p = F.add(t1, t2p)
    t1p = F.sub(t1, t2p, 4)

    # phase 3: sa = A1 ‖ A2, sb = B1 ‖ B2 (3T each half)
    SA = stage(sa, [t3, t1p, z3p, -t4, y3, t0p])  # -t4: X3's sign2 = -1
    SB = stage(sb, [t1p, z3p, t4, y3, t0p, t3])
    M3 = pf.mont_mul_pair(
        SA[:, : 3 * T], SB[:, : 3 * T], SA[:, 3 * T :], SB[:, 3 * T :],
        t3s, F.carry, plus_p=F.p2, m_np=F.mnp, m_p=F.mp,
    )
    return M3[:, :T], M3[:, T : 2 * T], M3[:, 2 * T :]


def _double_body(F, P):
    """RCB15 Alg 9 (a = 0) complete double over a field adapter."""
    X, Y, Z = P
    t0 = F.mul(Y, Y)
    t1 = F.mul(Y, Z)
    t2 = F.mul(Z, Z)
    xy = F.mul(X, Y)
    e = F.add(t0, t0)
    z3a = _sweep(F.add(F.add(e, e), F.add(e, e)))  # 8·Y², digits [-8, 263]
    b3z2 = F.cmul_b3(t2)
    y3a = F.add(t0, b3z2)
    t2t = F.triple(b3z2)
    t0n = F.sub(t0, t2t, 10)
    X3 = F.mul_x2(t0n, xy)
    Y3 = F.mul_pair(b3z2, z3a, t0n, y3a)
    Z3 = F.mul(t1, z3a)
    return X3, Y3, Z3


class PlaneCurve:
    """Per-curve constants for the fused kernels (G1 and G2)."""

    def __init__(self, curve: CurveParams):
        self.curve = curve
        self.pf = pf = PlaneFieldV3(curve.fq, EXTRA_DIGITS)
        self.R8 = pf.R8
        p = curve.fq.modulus
        b3_mont = (3 * curve.b) * pf.r_eff % p
        self.B3_DIGITS = pf.digits_list(b3_mont)
        self.M_B3 = pf.const_band(b3_mont)
        b2 = getattr(curve, "b2", None)
        if b2 is not None:
            g2_monts = (
                3 * b2[0] % p * pf.r_eff % p,
                3 * b2[1] % p * pf.r_eff % p,
            )
            self.B3_DIGITS_G2 = tuple(pf.digits_list(v) for v in g2_monts)
            self.M_B3_G2 = tuple(pf.const_band(v) for v in g2_monts)
        else:
            self.B3_DIGITS_G2 = None
            self.M_B3_G2 = None
        # (R8, 7) f32: one constant COLUMN per slot (see _CARRY.._K21)
        self.COLS = np.concatenate(
            [
                pf.CARRY_SCALE,
                pf.KP_COLS[2],
                pf.KP_COLS[4],
                pf.KP_COLS[7],
                pf.KP_COLS[10],
                pf.KP_COLS[11],
                pf.KP_COLS[21],
            ],
            axis=1,
        ).astype(np.float32)

    def b3_digits(self, group):
        if group == "g1":
            return self.B3_DIGITS
        assert self.B3_DIGITS_G2 is not None, "curve has no G2 twist constants"
        return self.B3_DIGITS_G2

    def field_ctx(self, group, t_ref, cols, mnp=None, mp=None, mb3=None,
                  pf=None):
        cls = _G1Field if group == "g1" else _G2Field
        return cls(
            pf or self.pf, t_ref, self.b3_digits(group), cols, mnp, mp, mb3
        )

    # convenience wrappers used by tests (operate in plain XLA, ref-free,
    # VPU-conv backend)
    def add_body(self, P, Q, t_ref, cols):
        F = _G1Field(self.pf, t_ref, self.B3_DIGITS, cols)
        return _add_body(F, P, Q)

    def double_body(self, P, t_ref, cols):
        F = _G1Field(self.pf, t_ref, self.B3_DIGITS, cols)
        return _double_body(F, P)


@functools.lru_cache(maxsize=None)
def get_plane_curve(curve: CurveParams) -> PlaneCurve:
    return PlaneCurve(curve)


def _make_pointwise(
    pc: PlaneCurve,
    body_arity: int,
    tile: int,
    interpret: bool | None,
    masked: bool = False,
    group: str = "g1",
    mixed: bool = False,
    rows_width: int | None = None,
    k_steps: int = 1,
):
    """Build a pallas_call over (K·R8, N) coordinate planes.

    body_arity = 2 -> add(P, Q); 1 -> double(P).
    masked (add only): extra (1, N) f32 mask input; out = mask ? P+Q : P.
    mixed (masked add only): Q is affine (X2, Y2) — 5 coordinate inputs;
    the caller's mask must already include the identity-row flag.
    rows_width (mixed only): Q arrives as ONE (N, rows_width) uint8 row
    block (X digits ‖ Y digits ‖ flag ‖ pad) — the MSM gather layout —
    and the cast + transpose to digit planes happens IN-KERNEL (the
    separate XLA u8->f32 transpose of unaligned 69/137-byte rows costs
    ~1.9 ms per scan step at 81920 lanes, measured); the identity flag
    row joins the mask in-kernel.
    k_steps (rows mode only): the kernel performs k_steps sequential
    masked adds per invocation — rows arrive as (N, k_steps·rows_width)
    and the mask as (2·k_steps, N): rows [0, k) are the add masks, rows
    [k, 2k) are SIGN planes (1.0 flips the gathered affine Y in-kernel:
    signed-digit MSM with positive-only tables). Amortizes the per-call
    accumulator DMA + launch overhead over k_steps group adds (the MSM
    scan's main loop advances k_steps sorted elements per dispatch).
    interpret = None -> auto: interpret iff the default backend is CPU
    (Mosaic cannot compile there; tests and host-only runs just work).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    import os

    # independent scratch buffers for ILP across Montgomery reduces (see
    # _G1Field.__init__); 1 restores the legacy fully-serialized layout
    n_scratch = int(os.environ.get("SNARK_TPU_MSM_SCRATCH", "4"))
    emu = interpret and not _use_real_interpret()
    if emu:
        from .plane_emu import get_emu_field

        pf_k = get_emu_field(pc.curve.fq, EXTRA_DIGITS)
    else:
        pf_k = pc.pf
    pf = pc.pf
    R8 = pc.R8
    K = 1 if group == "g1" else 2
    cols_c = jnp.asarray(pc.COLS)
    mnp_c = jnp.asarray(pf.M_NP).astype(BF16)
    mp_c = jnp.asarray(pf.M_P).astype(BF16)
    if group == "g1":
        mb3_cs = [jnp.asarray(pc.M_B3).astype(BF16)]
    else:
        assert pc.M_B3_G2 is not None, "curve has no G2 twist constants"
        mb3_cs = [jnp.asarray(m).astype(BF16) for m in pc.M_B3_G2]
    n_mb3 = len(mb3_cs)

    use_rows = rows_width is not None
    if use_rows:
        assert mixed and masked and body_arity == 2
        assert rows_width >= 2 * K * R8 + 1
    assert k_steps == 1 or use_rows, "k_steps > 1 requires rows mode"
    # laterally-batched reduce pipeline for the hot G1 scan kernel (see
    # _madd_mixed_body_batched_g1); scratch widths 5T/2T/3T per phase
    batched = (
        use_rows
        and group == "g1"
        and os.environ.get("SNARK_TPU_MSM_BATCHED", "1") == "1"
    )
    n_q = (1 if use_rows else 2 if mixed else 3) if body_arity == 2 else 0
    n_coords = 3 + n_q + (1 if masked else 0) if body_arity == 2 else 3

    def kernel(*refs):
        cols = refs[0][...]
        mnp, mp = refs[1][...], refs[2][...]
        mb3_v = [refs[3 + i][...] for i in range(n_mb3)]
        mb3 = mb3_v[0] if group == "g1" else tuple(mb3_v)
        base = 3 + n_mb3
        ins = [r[...] for r in refs[base : base + n_coords]]
        outs = refs[base + n_coords : base + n_coords + 3]
        t_refs = list(refs[-(4 if batched else n_scratch):])
        F = pc.field_ctx(group, t_refs, cols, mnp, mp, mb3, pf=pf_k)
        KR = K * R8
        if body_arity == 2:
            P = tuple(ins[:3])
            m = ins[-1] if masked else None  # (1|2·k_steps, T) in {0, 1}
            if use_rows:
                for k in range(k_steps):
                    # Mosaic has no direct u8->f32 cast; hop via int32
                    blk = ins[3][:, k * rows_width : (k + 1) * rows_width]
                    rf = jnp.transpose(blk.astype(jnp.int32).astype(F32))
                    # rows [k_steps, 2·k_steps) of the mask are per-lane
                    # SIGN planes: flip the gathered affine Y in-kernel
                    # (signed-digit MSM; table holds only positive rows)
                    sk = m[k_steps + k : k_steps + k + 1, :]
                    Y2 = F.neg_y(rf[KR : 2 * KR], sk)
                    if batched:
                        X3, Y3, Z3 = _madd_mixed_body_batched_g1(
                            F, P, (rf[:KR], Y2), *t_refs
                        )
                    else:
                        X3, Y3, Z3 = _madd_mixed_body(F, P, (rf[:KR], Y2))
                    mk = m[k : k + 1, :] * rf[2 * KR : 2 * KR + 1]
                    P = (
                        mk * X3 + (1.0 - mk) * P[0],
                        mk * Y3 + (1.0 - mk) * P[1],
                        mk * Z3 + (1.0 - mk) * P[2],
                    )
                X3, Y3, Z3 = P
            elif mixed:
                X3, Y3, Z3 = _madd_mixed_body(F, P, tuple(ins[3:5]))
                if masked:
                    X3 = m * X3 + (1.0 - m) * P[0]
                    Y3 = m * Y3 + (1.0 - m) * P[1]
                    Z3 = m * Z3 + (1.0 - m) * P[2]
            else:
                X3, Y3, Z3 = _add_body(F, P, tuple(ins[3:6]))
                if masked:
                    X3 = m * X3 + (1.0 - m) * P[0]
                    Y3 = m * Y3 + (1.0 - m) * P[1]
                    Z3 = m * Z3 + (1.0 - m) * P[2]
        else:
            X3, Y3, Z3 = _double_body(F, tuple(ins))
        outs[0][...] = X3
        outs[1][...] = Y3
        outs[2][...] = Z3

    if emu:
        # CPU backend: same kernel body, full-width, plain XLA (see
        # ops/plane_emu.py — pallas interpret is orders of magnitude
        # slower and arithmetic-identical for these bodies)
        from .plane_emu import emu_call

        @jax.jit
        def run_emu(*coords):
            n = coords[0].shape[-1]
            outs = tuple(
                jax.ShapeDtypeStruct((K * R8, n), F32) for _ in range(3)
            )
            scr = (
                [(R8, 6 * n), (R8, 6 * n), (2 * R8, 5 * n), (2 * R8, 3 * n)]
                if batched
                else (2 * R8, n)
            )
            return emu_call(
                kernel,
                n_coords,
                outs,
                scr,
                [cols_c, mnp_c, mp_c, *mb3_cs],
                list(coords),
                n_scratch=1 if batched else n_scratch,
            )

        return run_emu

    @jax.jit
    def run(*coords):
        n = coords[0].shape[-1]
        assert n % tile == 0, f"lane count {n} must be a multiple of {tile}"
        const_specs = [
            pl.BlockSpec((R8, 7), lambda i: (0, 0)),
            pl.BlockSpec((R8, R8), lambda i: (0, 0)),
            pl.BlockSpec((2 * R8, R8), lambda i: (0, 0)),
        ]
        const_specs += [
            pl.BlockSpec((2 * R8, R8), lambda i: (0, 0)) for _ in range(n_mb3)
        ]
        data_specs = [
            pl.BlockSpec((K * R8, tile), lambda i: (0, i))
        ] * 3
        if use_rows:
            data_specs.append(
                pl.BlockSpec((tile, k_steps * rows_width), lambda i: (i, 0))
            )
        else:
            data_specs += [
                pl.BlockSpec((K * R8, tile), lambda i: (0, i))
            ] * n_q
        if masked:
            data_specs.append(
                pl.BlockSpec(
                    (2 * k_steps if use_rows else 1, tile), lambda i: (0, i)
                )
            )
        if body_arity == 1:
            data_specs = [pl.BlockSpec((K * R8, tile), lambda i: (0, i))] * 3
        out_spec = pl.BlockSpec((K * R8, tile), lambda i: (0, i))
        return pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((K * R8, n), F32) for _ in range(3)
            ),
            grid=(n // tile,),
            in_specs=const_specs + data_specs,
            out_specs=(out_spec,) * 3,
            scratch_shapes=(
                [
                    pltpu.VMEM((R8, 6 * tile), F32),
                    pltpu.VMEM((R8, 6 * tile), F32),
                    pltpu.VMEM((2 * R8, 5 * tile), F32),
                    pltpu.VMEM((2 * R8, 3 * tile), F32),
                ]
                if batched
                else [pltpu.VMEM((2 * R8, tile), F32)] * n_scratch
            ),
            interpret=interpret,
        )(cols_c, mnp_c, mp_c, *mb3_cs, *coords)

    return run


def make_point_add(
    curve: CurveParams, tile: int = 256, interpret: bool | None = None, group: str = "g1"
):
    """(X1,Y1,Z1,X2,Y2,Z2) (K·R8,N) planes -> (X3,Y3,Z3). Complete add."""
    return _make_pointwise(get_plane_curve(curve), 2, tile, interpret, group=group)


def make_point_double(
    curve: CurveParams, tile: int = 256, interpret: bool | None = None, group: str = "g1"
):
    """(X,Y,Z) (K·R8,N) planes -> (X3,Y3,Z3). Complete double."""
    return _make_pointwise(get_plane_curve(curve), 1, tile, interpret, group=group)


def make_masked_add(
    curve: CurveParams, tile: int = 256, interpret: bool | None = None, group: str = "g1"
):
    """(P, Q, mask) -> mask ? P+Q : P. mask is (1, N) f32 in {0, 1}.

    The predicated accumulate op of the MSM bucket scan — one kernel,
    no extra XLA select pass over the accumulators.
    """
    return _make_pointwise(
        get_plane_curve(curve), 2, tile, interpret, masked=True, group=group
    )


def make_masked_mixed_add(
    curve: CurveParams, tile: int = 256, interpret: bool | None = None, group: str = "g1"
):
    """(P, X2, Y2, mask) -> mask ? P+(X2,Y2) : P — affine Q (RCB15 Alg 8).

    The MSM bucket scan's hot step: gathered table rows are affine, so
    the Z2 product and one reduce disappear. The mask must be 0 wherever
    the gathered row is an identity (row flag) — the scan folds the flag
    into the bucket mask.
    """
    return _make_pointwise(
        get_plane_curve(curve), 2, tile, interpret, masked=True, group=group,
        mixed=True,
    )


def rows_pad_width(curve: CurveParams, group: str = "g1") -> int:
    """u8 row width padded for the in-kernel decode (multiple of 8
    sublanes >= 2·K·R8+1)."""
    pc = get_plane_curve(curve)
    K = 1 if group == "g1" else 2
    w = 2 * K * pc.R8 + 1
    return -(-w // 8) * 8


def make_masked_mixed_add_rows(
    curve: CurveParams,
    tile: int = 256,
    interpret: bool | None = None,
    group: str = "g1",
    k_steps: int = 1,
):
    """(P, rows_u8, mask) -> mask·flag ? P+(X2,Y2) : P, k_steps deep.

    rows_u8 is the (N, k_steps·rows_pad_width) gathered table block;
    u8->f32 cast, transpose to digit planes, the identity-flag masking
    and the conditional Y negation (sign rows of the mask — signed-digit
    MSM) all happen inside the kernel (VMEM), killing the per-step
    XLA transpose. The mask is (2·k_steps, N): add masks ‖ sign planes;
    the kernel chains k_steps masked adds before writing the accumulator
    back (one acc round-trip per k_steps adds).
    """
    return _make_pointwise(
        get_plane_curve(curve), 2, tile, interpret, masked=True, group=group,
        mixed=True, rows_width=rows_pad_width(curve, group), k_steps=k_steps,
    )


# ---------------------------------------------------------------------------
# host codecs (tests / ingestion)
# ---------------------------------------------------------------------------


def _coord_vals(pt, idx, K):
    """Affine coordinate -> list of K base-field ints (Fq or Fq2)."""
    if K == 1:
        return [pt[idx]]
    return list(pt[idx])


def pack_rows_u8_host(pc: PlaneCurve, points, group: str = "g1") -> np.ndarray:
    """Host affine points (None = identity) -> (N, 2·K·R8+1) uint8 row
    table (X digits ‖ Y digits ‖ z-flag), wide-Mont canonical.

    G1 points are (x, y) ints; G2 points are ((x0,x1), (y0,y1)).
    Row-major u8 is the MSM gather layout (see ops/msm_plane.py).
    """
    pf = pc.pf
    K = 1 if group == "g1" else 2
    cols = []
    for idx, default in ((0, 0), (1, 1)):
        for comp in range(K):
            vals = [
                (default if comp == 0 else 0)
                if pt is None
                else _coord_vals(pt, idx, K)[comp]
                for pt in points
            ]
            cols.append(pf.pack_np(vals).T.astype(np.uint8))  # (N, R8)
    flags = np.asarray([0 if pt is None else 1 for pt in points], np.uint8)
    return np.concatenate(cols + [flags[:, None]], axis=1)


def negate_points_host(curve: CurveParams, points, group: str = "g1"):
    """Host affine points -> their negations (y -> p - y); None -> None."""
    p = curve.fq.modulus
    if group == "g1":
        return [
            None if pt is None else (pt[0], (p - pt[1]) % p) for pt in points
        ]
    return [
        None
        if pt is None
        else (pt[0], tuple((p - y) % p for y in pt[1]))
        for pt in points
    ]


def pack_rows_u8_signed_host(
    pc: PlaneCurve, points, group: str = "g1"
) -> np.ndarray:
    """(2N, 2·K·R8+1) uint8 table: rows [0, N) = points, [N, 2N) = their
    negations — the layout signed-digit plane MSM gathers from (negative
    digits read row i + N)."""
    pos = pack_rows_u8_host(pc, points, group)
    neg = pack_rows_u8_host(
        pc, negate_points_host(pc.curve, points, group), group
    )
    return np.concatenate([pos, neg], axis=0)


def pack_points_host(pc: PlaneCurve, points, group: str = "g1") -> tuple:
    """Host affine points (None = identity) -> (X, Y, Z) (K·R8, N) planes."""
    pf = pc.pf
    K = 1 if group == "g1" else 2

    def plane(idx, default):
        comps = []
        for comp in range(K):
            vals = [
                (default if comp == 0 else 0)
                if pt is None
                else _coord_vals(pt, idx, K)[comp]
                for pt in points
            ]
            comps.append(pf.pack_np(vals))
        return jnp.asarray(np.concatenate(comps, axis=0))

    X = plane(0, 0)
    Y = plane(1, 1)
    zf = [0 if pt is None else 1 for pt in points]
    Zc = pf.pack_np(zf)
    Z = jnp.asarray(
        np.concatenate([Zc] + [np.zeros_like(Zc)] * (K - 1), axis=0)
    )
    return X, Y, Z


def unpack_points_host(pc: PlaneCurve, X, Y, Z, group: str = "g1"):
    """(X, Y, Z) lazy planes -> host affine points (None = identity)."""
    from ..fields.host import Fp

    pf = pc.pf
    R8 = pc.R8
    f = Fp(pc.curve.fq)
    if group == "g1":
        xs = pf.unpack_np(X)
        ys = pf.unpack_np(Y)
        zs = pf.unpack_np(Z)
        out = []
        for x, y, z in zip(xs, ys, zs):
            if z == 0:
                out.append(None)
            else:
                zi = f.inv(z)
                out.append((x * zi % f.p, y * zi % f.p))
        return out
    from ..fields.towers import Fq2 as HostFq2

    fq2 = HostFq2(f.p)
    comps = {}
    for name, arr in (("x", X), ("y", Y), ("z", Z)):
        comps[name] = (
            pf.unpack_np(np.asarray(arr)[:R8]),
            pf.unpack_np(np.asarray(arr)[R8:]),
        )
    out = []
    for i in range(len(comps["x"][0])):
        x = (comps["x"][0][i], comps["x"][1][i])
        y = (comps["y"][0][i], comps["y"][1][i])
        z = (comps["z"][0][i], comps["z"][1][i])
        if fq2.is_zero(z):
            out.append(None)
        else:
            zi = fq2.inv(z)
            out.append((fq2.mul(x, zi), fq2.mul(y, zi)))
    return out


def batch_to_affine_host(curve: CurveParams, xs, ys, zs, group: str = "g1"):
    """Projective host ints -> affine pairs via Montgomery batch inversion.

    One field inversion + 3N multiplications instead of N inversions —
    the setup-time path that turns fixed-base MSM outputs into the u8
    point tables (N can be 2^20+; per-point pow() would dominate setup).
    """
    from ..fields.host import Fp
    from ..fields.towers import Fq2 as HostFq2

    f = Fp(curve.fq)
    if group == "g1":
        F_mul = lambda a, b: a * b % f.p
        F_inv = f.inv
        F_is_zero = lambda a: a == 0
        F_one = 1
    else:
        fq2 = HostFq2(f.p)
        F_mul = fq2.mul
        F_inv = fq2.inv
        F_is_zero = fq2.is_zero
        F_one = fq2.one

    n = len(zs)
    prefix = [F_one] * (n + 1)
    for i, z in enumerate(zs):
        prefix[i + 1] = prefix[i] if F_is_zero(z) else F_mul(prefix[i], z)
    inv_all = F_inv(prefix[n])
    out = [None] * n
    for i in range(n - 1, -1, -1):
        z = zs[i]
        if F_is_zero(z):
            continue
        zi = F_mul(inv_all, prefix[i])
        inv_all = F_mul(inv_all, z)
        out[i] = (F_mul(xs[i], zi), F_mul(ys[i], zi))
    return out


def table_from_query_u32(
    pc: PlaneCurve, old_ops, pts_u32, group: str = "g1", perm=None,
    signed: bool = False,
) -> np.ndarray:
    """(N, 3, K) u32 projective Montgomery points (old narrow-R device
    layout, the fixed-base setup output) -> (M, 2·K·R8+1) uint8 MSM table.

    Host path: leave old Montgomery form, batch-invert Z, repack in wide
    Montgomery canonical digits. `perm` (optional, len M) reorders rows:
    table row k = point[perm[k]], with perm[k] == -1 -> identity row
    (used to store h_query in bit-reversed coefficient order, matching the
    plane NTT's permutation-free h pipeline). `signed` emits the 2M-row
    [points ‖ negations] layout the signed-digit plane MSM gathers from.
    """
    arr = np.asarray(pts_u32)
    df = old_ops.df
    n = arr.shape[0]
    K = 1 if group == "g1" else 2

    def coord_ints(idx):
        if K == 1:
            return df.to_host_ints(arr[:, idx])
        L = arr.shape[-1] // 2
        c0 = df.to_host_ints(arr[:, idx, :L])
        c1 = df.to_host_ints(arr[:, idx, L:])
        return list(zip(c0, c1))

    xs = coord_ints(0)
    ys = coord_ints(1)
    zs = coord_ints(2)
    affs = batch_to_affine_host(pc.curve, xs, ys, zs, group)
    if perm is not None:
        affs = [affs[j] if j >= 0 else None for j in perm]
    pos = pack_rows_u8_host(pc, affs, group)
    if not signed:
        return pos
    neg = pack_rows_u8_host(
        pc, negate_points_host(pc.curve, affs, group), group
    )
    return np.concatenate([pos, neg], axis=0)
