"""Batch-affine bucket accumulation for the plane MSM.

TPU-native recast of the ZPrize-style "batch-affine" Pippenger bucket
phase (target: ark-ec VariableBaseMSM, SURVEY.md §2.3): instead of a
serial masked-projective scan over each bucket's sorted elements
(ops/msm_plane.py phases 1-3, ~12 Montgomery-mul units per point-add),
bucket contents are reduced by a PAIRWISE AFFINE TREE:

  1. sorted elements are scattered once into per-bucket 2^v-aligned
     BLOCKS (B0 = 2^v slots; padding slots carry the identity flag);
     every block belongs to exactly one bucket, so
  2. v levels of pairwise affine adds run as flat SIMD passes — pair
     (2j, 2j+1) of level k feeds lane j of level k+1, a pure reshape,
     no gather — with ONE Montgomery batch inversion per level (product
     tree over all lanes: ~3 plane muls/lane amortized, single Fermat
     chain at the width-1 root);
  3. the per-block partial sums (canonical affine rows, contiguous per
     bucket) finish through the existing masked projective scan + spill
     machinery (ops/msm_plane.py), typically ~mean/B0 + skew steps.

An affine add is 4 in-kernel Montgomery muls (x1², λ = num·d⁻¹, λ²,
λ·(x1−x3)) + 3 amortized tree muls, vs ~12 mul-units for the masked
projective mixed add — the bucket phase's arithmetic roughly halves.

Completeness: the tree handles every degenerate pair exactly —
identity operands (flag byte), P + P (doubling: den = 2y₁,
num = 3x₁²), P + (−P) (→ identity) — detected by exact canonical-digit
comparison. Level-0 inputs are canonicalized at decode (the signed-digit
MSM's in-row negation y → p − y runs through a strict normalization so
all comparisons are digit-exact). y = 0 cannot occur (prime-order
groups have no 2-torsion; tables hold only curve points or flagged
identity rows).

Montgomery-form ledger: rows store wide-Mont canonical digits (≤ 255).
den = x2 − x1 + p (digits ≤ 510) or 2y₁ (≤ 510); tree products are
mont_mul outputs (digits ≤ 256, value ≤ 3.1p); λ, λ², x1² likewise.
x3 = λ² + 2p − x1 − x2: value ∈ (0, 5.1p), digits ∈ [−511, 511];
y3 = λ·(x1 − x3c) + p − y1: value ∈ (0, 4.1p). Both canonicalize via
strict + top-digit k·p estimate (k_est ∈ {k−1, k} by construction) +
one conditional subtraction. Every mul operand keeps |digits| ≤ 702
(exact-f32 conv bound of pallas_field_v3).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from .pallas_field_v3 import BF16, F32, PlaneFieldV3, _sweep, sweep3
from .pallas_curve import (
    EXTRA_DIGITS,
    get_plane_curve,
    rows_pad_width,
)
from .plane_emu import EmuRef, use_real_interpret as _use_real_interpret

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# shared in-kernel helpers (pure jnp over (rows, T) planes)
# ---------------------------------------------------------------------------


def _canon_reduce(pf, v, p_col, rmp_col, c_est):
    """Lazy plane (value ∈ [0, ~8p), digits |d| ≤ ~2^13) -> canonical
    digits [0, p). strict + k·p top-digit estimate + one cond-sub.

    c_est = (256^(R8-3) / p) · (1 − 2^-20): floor(vtop·c_est) ≤ ⌊v/p⌋
    always, and ≥ ⌊v/p⌋ − 1 because v − vtop·256^(R8-3) < 256^(R8-3)
    ≪ p/8 (the two top digits of the wide representation are reserved
    for the lazy envelope)."""
    R8 = v.shape[0]
    z = pf._strict(v)
    vtop = (
        z[R8 - 3 : R8 - 2] + 256.0 * z[R8 - 2 : R8 - 1] + 65536.0 * z[R8 - 1 : R8]
    )
    k = jnp.floor(vtop * F32(c_est))
    z2 = pf._strict(z - k * p_col)
    return pf.cond_sub_p(z2, rmp_col)


def _eq_planes(a, b):
    """(rows, T) canonical digit planes -> (1, T) f32 equality mask."""
    return (jnp.sum(jnp.abs(a - b), axis=0, keepdims=True) == 0.0).astype(F32)


class _AffineCtx:
    """Per-kernel-invocation constants + component helpers for one group.

    xcols layout (R8, 5): [P1 ‖ ONE_MONT ‖ RMP ‖ P2 ‖ P6]."""

    def __init__(self, pc, group, xcols, c_est):
        self.pf = pc.pf
        self.K = 1 if group == "g1" else 2
        self.R8 = pc.pf.R8
        self.p1 = xcols[:, 0:1]
        self.one = xcols[:, 1:2]
        self.rmp = xcols[:, 2:3]
        self.p2 = xcols[:, 3:4]
        self.p6 = xcols[:, 4:5]
        self.c_est = c_est

    def stackc(self, col):
        """(R8, 1) constant column -> (K·R8, 1) per-component stack."""
        return jnp.concatenate([col] * self.K, axis=0)

    def one_stack(self):
        """ONE in component 0, zeros elsewhere (field one for Fq/Fq2)."""
        if self.K == 1:
            return self.one
        return jnp.concatenate(
            [self.one] + [jnp.zeros_like(self.one)] * (self.K - 1), axis=0
        )

    def canon(self, v):
        """Per-component canonicalization of a (K·R8, T) lazy plane."""
        if os.environ.get("SNARK_TPU_AFFINE_FASTCANON") == "1":
            # TIMING-ONLY knob: skip canonicalization (WRONG results) to
            # measure its share of the pipeline
            return sweep3(sweep3(v))
        R8 = self.R8
        return jnp.concatenate(
            [
                _canon_reduce(
                    self.pf, v[k * R8 : (k + 1) * R8], self.p1, self.rmp, self.c_est
                )
                for k in range(self.K)
            ],
            axis=0,
        )

    def neg_canon(self, y):
        """Canonical y -> canonical p − y, per component (y value ≠ 0 for
        live rows; dead rows' content is never read)."""
        R8 = self.R8
        return jnp.concatenate(
            [
                self.pf._strict(self.p1 - y[k * R8 : (k + 1) * R8])
                for k in range(self.K)
            ],
            axis=0,
        )


def _decode_pair(ctx, blk, rows_w, sgn_l, sgn_r, signed):
    """(T, 2·rows_w) u8 block -> canonical (x, y, flag) per side.

    Level-0 signed mode applies the digit-sort sign in canonical form:
    y ← p − y when the element's digit was negative. The two sides'
    negations run through ONE lane-batched strict pass (per-op Mosaic
    overhead, not arithmetic, dominates these kernels)."""
    KR = ctx.K * ctx.R8
    rf = jnp.transpose(blk.astype(jnp.int32).astype(F32))  # (2·rows_w, T)
    sides = []
    for side in (0, 1):
        base = side * rows_w
        sides.append(
            (
                rf[base : base + KR],
                rf[base + KR : base + 2 * KR],
                rf[base + 2 * KR : base + 2 * KR + 1],
            )
        )
    if signed:
        (x1, y1, f1), (x2, y2, f2) = sides
        yn = ctx.neg_canon(jnp.concatenate([y1, y2], axis=1))
        T = y1.shape[1]
        y1 = sgn_l * yn[:, :T] + (1.0 - sgn_l) * y1
        y2 = sgn_r * yn[:, T:] + (1.0 - sgn_r) * y2
        sides = [(x1, y1, f1), (x2, y2, f2)]
    return sides


def _preds_from_sides(l, r):
    """Degenerate-case masks from decoded canonical sides.

    Returns (dead, copy_l, copy_r, dbl): disjoint; the computed-add mask
    is 1 − dead − copy_l − copy_r (dbl ⊂ computed selects the doubling
    numerator/denominator)."""
    x1, y1, f1 = l
    x2, y2, f2 = r
    eq_x = _eq_planes(x1, x2)
    eq_y = _eq_planes(y1, y2)
    live = f1 * f2
    dbl = live * eq_x * eq_y
    inv = live * eq_x * (1.0 - eq_y)
    dead = (1.0 - f1) * (1.0 - f2) + inv
    copy_l = f1 * (1.0 - f2)
    copy_r = (1.0 - f1) * f2
    return dead, copy_l, copy_r, dbl


def _phase1_body(ctx, F, blk, sgn, rows_w, signed):
    """-> (den (K·R8, T), preds (4, T)). den is ONE for non-computed
    lanes so the batch-inversion product stays invertible."""
    l, r = _decode_pair(ctx, blk, rows_w, sgn[0:1], sgn[1:2], signed)
    x1, y1, _ = l
    x2, _, _ = r
    dead, copy_l, copy_r, dbl = _preds_from_sides(l, r)
    comp_add = 1.0 - dead - copy_l - copy_r - dbl
    p1s = ctx.stackc(ctx.p1)
    den_add = (x2 - x1) + p1s
    den_dbl = y1 + y1
    den = (
        comp_add * den_add
        + dbl * den_dbl
        + (dead + copy_l + copy_r) * ctx.one_stack()
    )
    preds = jnp.concatenate([dead, copy_l, copy_r, dbl], axis=0)
    return den, preds


def _phase3_body(ctx, F, blk, sgn, dinv, preds, rows_w, signed):
    """Pair affine add -> output row planes (out_x, out_y, out_f)."""
    KR = ctx.K * ctx.R8
    l, r = _decode_pair(ctx, blk, rows_w, sgn[0:1], sgn[1:2], signed)
    x1, y1, _ = l
    x2, y2, _ = r
    dead = preds[0:1]
    copy_l = preds[1:2]
    copy_r = preds[2:3]
    dbl = preds[3:4]
    comp = 1.0 - dead - copy_l - copy_r  # computed add (incl. doubling)

    p1s = ctx.stackc(ctx.p1)
    p2s = ctx.stackc(ctx.p2)
    num_add = (y2 - y1) + p1s
    x1sq = F.mul(x1, x1)
    num_dbl = F.triple(x1sq)
    num = dbl * num_dbl + (1.0 - dbl) * num_add
    lam = F.mul(num, dinv)
    lam2 = F.mul(lam, lam)
    x3l = (lam2 + p2s) - (x1 + x2)
    # y3 uses the LAZY x3 (≡ x3 mod p; the +6p guard keeps the value
    # positive, one sweep restores the ≤702 digit bound) so x3 and y3
    # canonicalize in ONE lane-batched pass — these kernels are bound by
    # Mosaic per-op overhead, not arithmetic
    w3 = sweep3((x1 - x3l) + ctx.stackc(ctx.p6))
    y3l = (F.mul(lam, w3) + p1s) - y1
    T = x3l.shape[1]
    xy = ctx.canon(jnp.concatenate([x3l, y3l], axis=1))
    x3 = xy[:, :T]
    y3 = xy[:, T:]

    out_x = comp * x3 + copy_l * x1 + copy_r * x2
    out_y = comp * y3 + copy_l * y1 + copy_r * y2 + dead * jnp.broadcast_to(
        ctx.one_stack(), (KR, x3.shape[1])
    )
    out_f = 1.0 - dead
    return out_x, out_y, out_f


# ---------------------------------------------------------------------------
# kernel factories
# ---------------------------------------------------------------------------


def _curve_consts(pc):
    pf = pc.pf
    p = pf.params.modulus
    xcols = np.concatenate(
        [pf.KP_COLS[1], pf.ONE_MONT_COL, pf.RMP_COL, pf.P2_COL, pf.KP_COLS[6]],
        axis=1,
    ).astype(np.float32)
    c_est = (float(256 ** (pf.R8 - 3)) / float(p)) * (1.0 - 2.0**-20)
    return xcols, c_est


@functools.lru_cache(maxsize=None)
def _get_kernels(curve: CurveParams, tile: int, interpret: bool | None,
                 group: str, signed: bool):
    """Build (phase1, phase3, tree_mul) callables for one config.

    interpret = None -> auto (CPU backend runs the emu path; see
    ops/plane_emu.py)."""
    pc = get_plane_curve(curve)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    emu = interpret and not _use_real_interpret()
    if emu:
        from .plane_emu import get_emu_field

        pf_k = get_emu_field(curve.fq, EXTRA_DIGITS)
    else:
        pf_k = pc.pf
    pf = pc.pf
    R8 = pf.R8
    K = 1 if group == "g1" else 2
    KR = K * R8
    rows_w = rows_pad_width(curve, group)
    xcols_np, c_est = _curve_consts(pc)
    # constants kept as NUMPY and converted per call inside the jitted
    # runners: a jnp array created while a caller's trace is active would
    # leak that trace's constant tracer into later traces (the factory is
    # lru_cached and may first run inside _window_sums_impl's jit)
    cols_np = np.asarray(pc.COLS, np.float32)
    mnp_np = np.asarray(pf.M_NP, np.float32)
    mp_np = np.asarray(pf.M_P, np.float32)
    if group == "g1":
        mb3_np = [np.asarray(pc.M_B3, np.float32)]
    else:
        assert pc.M_B3_G2 is not None
        mb3_np = [np.asarray(m, np.float32) for m in pc.M_B3_G2]
    n_mb3 = len(mb3_np)
    n_scratch = 2

    def mk_ctx(refs):
        cols = refs[0][...]
        xcols = refs[1][...]
        mnp, mp = refs[2][...], refs[3][...]
        mb3_v = [refs[4 + i][...] for i in range(n_mb3)]
        mb3 = mb3_v[0] if group == "g1" else tuple(mb3_v)
        t_refs = list(refs[-n_scratch:])
        F = pc.field_ctx(group, t_refs, cols, mnp, mp, mb3, pf=pf_k)
        ctx = _AffineCtx(pc, group, xcols, c_est)
        ctx.pf = pf_k
        return ctx, F

    n_const = 4 + n_mb3

    # ---- phase 1: den + preds -------------------------------------------
    def phase1_kernel(*refs):
        ctx, F = mk_ctx(refs)
        blk = refs[n_const][...]
        sgn = refs[n_const + 1][...]
        den_ref = refs[n_const + 2]
        preds_ref = refs[n_const + 3]
        den, preds = _phase1_body(ctx, F, blk, sgn, rows_w, signed)
        den_ref[...] = den
        preds_ref[...] = preds

    # ---- phase 3: pair add ----------------------------------------------
    def phase3_kernel(*refs):
        ctx, F = mk_ctx(refs)
        blk = refs[n_const][...]
        sgn = refs[n_const + 1][...]
        dinv = refs[n_const + 2][...]
        preds = refs[n_const + 3][...]
        out_ref = refs[n_const + 4]
        ox, oy, of = _phase3_body(
            ctx, F, blk, sgn, dinv, preds, rows_w, signed
        )
        T = ox.shape[1]
        pad = rows_w - (2 * KR + 1)
        planes = jnp.concatenate(
            [ox, oy, of, jnp.zeros((pad, T), F32)], axis=0
        )
        out_ref[...] = jnp.transpose(planes).astype(jnp.int32)

    # ---- tree mul: field multiply on (K·R8, T) planes -------------------
    def tree_kernel(*refs):
        ctx, F = mk_ctx(refs)
        a = refs[n_const][...]
        b = refs[n_const + 1][...]
        out_ref = refs[n_const + 2]
        out_ref[...] = F.mul(a, b)

    def consts():
        return [
            jnp.asarray(cols_np),
            jnp.asarray(xcols_np),
            jnp.asarray(mnp_np).astype(BF16),
            jnp.asarray(mp_np).astype(BF16),
            *[jnp.asarray(m).astype(BF16) for m in mb3_np],
        ]

    if emu:
        from .plane_emu import emu_call

        def run_phase1(blk, sgn):
            M = blk.shape[0]
            outs = (
                jax.ShapeDtypeStruct((KR, M), F32),
                jax.ShapeDtypeStruct((4, M), F32),
            )
            return emu_call(
                phase1_kernel, 2, outs, [(2 * R8, M)] * n_scratch,
                consts(), [blk, sgn],
            )

        def run_phase3(blk, sgn, dinv, preds):
            M = blk.shape[0]
            outs = (jax.ShapeDtypeStruct((M, rows_w), jnp.int32),)
            return emu_call(
                phase3_kernel, 4, outs, [(2 * R8, M)] * n_scratch,
                consts(), [blk, sgn, dinv, preds],
            )[0]

        def run_tree(a, b):
            M = a.shape[1]
            outs = (jax.ShapeDtypeStruct((KR, M), F32),)
            return emu_call(
                tree_kernel, 2, outs, [(2 * R8, M)] * n_scratch,
                consts(), [a, b],
            )[0]

        return (
            jax.jit(run_phase1),
            jax.jit(run_phase3),
            jax.jit(run_tree),
        )

    const_specs = [
        pl.BlockSpec((R8, 7), lambda i: (0, 0)),
        pl.BlockSpec((R8, 5), lambda i: (0, 0)),
        pl.BlockSpec((R8, R8), lambda i: (0, 0)),
        pl.BlockSpec((2 * R8, R8), lambda i: (0, 0)),
    ] + [pl.BlockSpec((2 * R8, R8), lambda i: (0, 0)) for _ in range(n_mb3)]
    scratch = [pltpu.VMEM((2 * R8, tile), F32)] * n_scratch

    @jax.jit
    def run_phase1(blk, sgn):
        M = blk.shape[0]
        assert M % tile == 0, (M, tile)
        return pl.pallas_call(
            phase1_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((KR, M), F32),
                jax.ShapeDtypeStruct((4, M), F32),
            ),
            grid=(M // tile,),
            in_specs=const_specs
            + [
                pl.BlockSpec((tile, 2 * rows_w), lambda i: (i, 0)),
                pl.BlockSpec((2, tile), lambda i: (0, i)),
            ],
            out_specs=(
                pl.BlockSpec((KR, tile), lambda i: (0, i)),
                pl.BlockSpec((4, tile), lambda i: (0, i)),
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*consts(), blk, sgn)

    @jax.jit
    def run_phase3(blk, sgn, dinv, preds):
        M = blk.shape[0]
        assert M % tile == 0, (M, tile)
        return pl.pallas_call(
            phase3_kernel,
            out_shape=jax.ShapeDtypeStruct((M, rows_w), jnp.int32),
            grid=(M // tile,),
            in_specs=const_specs
            + [
                pl.BlockSpec((tile, 2 * rows_w), lambda i: (i, 0)),
                pl.BlockSpec((2, tile), lambda i: (0, i)),
                pl.BlockSpec((KR, tile), lambda i: (0, i)),
                pl.BlockSpec((4, tile), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((tile, rows_w), lambda i: (i, 0)),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*consts(), blk, sgn, dinv, preds)

    @jax.jit
    def run_tree(a, b):
        M = a.shape[1]
        assert M % tile == 0, (M, tile)
        return pl.pallas_call(
            tree_kernel,
            out_shape=jax.ShapeDtypeStruct((KR, M), F32),
            grid=(M // tile,),
            in_specs=const_specs
            + [
                pl.BlockSpec((KR, tile), lambda i: (0, i)),
                pl.BlockSpec((KR, tile), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((KR, tile), lambda i: (0, i)),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*consts(), a, b)

    return run_phase1, run_phase3, run_tree


# ---------------------------------------------------------------------------
# batch inversion (device, mixed pallas/value-level product tree)
# ---------------------------------------------------------------------------


def _value_mul(pf, A, B, carry, p2):
    """Value-level wide-Mont multiply (plain XLA; tree tail only)."""
    t = EmuRef(jnp.zeros((2 * pf.R8,) + A.shape[1:], F32))
    pf.mul_acc(A, B, t)
    return pf.reduce(t[...], t, carry, plus_p=p2)


def _value_mul2(pf, A, B, carry, p2, kp4, kp7):
    """Fq2 Karatsuba at value level on stacked (2·R8, M) planes."""
    R8 = pf.R8
    a0, a1 = A[:R8], A[R8:]
    b0, b1 = B[:R8], B[R8:]
    m0 = _value_mul(pf, a0, b0, carry, p2)
    m1 = _value_mul(pf, a1, b1, carry, p2)
    m2 = _value_mul(pf, sweep3(a0 + a1), sweep3(b0 + b1), carry, p2)
    c0 = sweep3((m0 - m1) + kp4)
    c1 = sweep3((m2 - (m0 + m1)) + kp7)
    return jnp.concatenate([c0, c1], axis=0)


def batch_inverse_planes(pc, group, den, tree_mul, tile):
    """Montgomery batch inversion of (K·R8, M) nonzero wide-Mont planes.

    Product tree: pallas `tree_mul` while the width is a multiple of
    2·tile (the bulk of the volume), value-level XLA below that, one
    Fermat chain at the width-1 root (Fq; Fq2 via the norm trick).
    Down-sweep steps fuse each level's two muls into ONE dispatch
    (mul(inv‖inv, right‖left))."""
    from .plane_affine import _batch_inv_tree, _fermat_inv
    from .plane_emu import get_emu_field

    # value-level tail ops use the compact conv/GEMM formulation
    # (bit-identical; the RMW scratch form traces ~500 eqns per mul and
    # blew up the MSM program's trace/compile time)
    pf = get_emu_field(pc.curve.fq, EXTRA_DIGITS)
    R8 = pf.R8
    K = 1 if group == "g1" else 2
    carry = jnp.asarray(pf.CARRY_SCALE)
    p2 = jnp.asarray(pf.P2_COL)
    kp4 = jnp.asarray(pf.KP_COLS[4])
    kp7 = jnp.asarray(pf.KP_COLS[7])

    def vmul(a, b):
        if K == 1:
            return _value_mul(pf, a, b, carry, p2)
        return _value_mul2(pf, a, b, carry, p2, kp4, kp7)

    def pair(x):
        # pair lane i with lane i + M/2: contiguous half-slices. A
        # stride-2 lane slice costs a full relayout pass on TPU
        # (~40 ns/lane measured — more than the mul it feeds); halves
        # are free and the down-sweep mirrors with one concat.
        m = x.shape[1] // 2
        return x[:, :m], x[:, m:]

    levels = []
    x = den
    # pallas levels need tile-divisible pair widths (x/2 % tile == 0);
    # the remaining tail (< ~2·tile·odd-factor lanes) runs value-level
    while x.shape[1] % (2 * tile) == 0 and x.shape[1] >= 2 * tile:
        a, b = pair(x)
        levels.append((a, b))
        x = tree_mul(a, b)
    vlevels = []
    while x.shape[1] > 1:
        orig_w = x.shape[1]
        if x.shape[1] % 2:
            one = jnp.broadcast_to(
                jnp.asarray(
                    np.concatenate(
                        [pf.ONE_MONT_COL.astype(np.float32)]
                        + [np.zeros((R8, 1), np.float32)] * (K - 1),
                        axis=0,
                    )
                ),
                (K * R8, 1),
            )
            x = jnp.concatenate([x, one], axis=1)
        a, b = pair(x)
        vlevels.append((a, b, orig_w))
        x = vmul(a, b)

    # width-1 root inverse
    if K == 1:
        inv = _fermat_inv(pf, x, carry, p2)
    else:
        z0, z1 = x[:R8], x[R8:]
        n0 = _value_mul(pf, z0, z0, carry, p2)
        n1 = _value_mul(pf, z1, z1, carry, p2)
        ninv = _fermat_inv(pf, sweep3(n0 + n1), carry, p2)
        i0 = _value_mul(pf, z0, ninv, carry, p2)
        i1 = sweep3(kp4 - _value_mul(pf, z1, ninv, carry, p2))
        inv = jnp.concatenate([i0, i1], axis=0)

    for a, b, orig_w in reversed(vlevels):
        il = vmul(inv, b)
        ir = vmul(inv, a)
        # halves-pairing: child i sits at lane i (left half) / i + m
        # (right half); drop the ONE-padded tail lane of odd levels
        inv = jnp.concatenate([il, ir], axis=1)[:, :orig_w]
    for a, b in reversed(levels):
        m = a.shape[1]
        both = tree_mul(
            jnp.concatenate([inv, inv], axis=1),
            jnp.concatenate([b, a], axis=1),
        )
        inv = both  # already [inv·b ‖ inv·a] = halves order
    return inv[:, : den.shape[1]]


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


def pick_block_size(mean_len: int) -> int:
    """Per-bucket block alignment B0 = 2^v: ~mean/8 keeps level-0 slot
    utilization ≈ mean/(mean+B0) ≥ 88% while leaving ~8 blocks/bucket
    for the (cheap) projective block scan."""
    import math

    v = int(round(math.log2(max(mean_len, 1)))) - 3
    return 1 << max(2, min(5, v))


class AffineAccum:
    """Affine-tree bucket accumulation bound to one PlaneMsm plan."""

    def __init__(self, plan):
        self.plan = plan
        self.pc = plan.pc
        # big tiles amortize Mosaic's ~40-cycle-per-op overhead (the
        # phase kernels are op-count-bound); G2 halves to fit VMEM
        self.tile = plan.tile if plan.K == 1 else min(plan.tile, 512)
        self.kernels = _get_kernels(
            plan.curve, self.tile, None, plan.group, plan.signed
        )

    def accumulate(self, table_p, perm_flat, start, length, n, mean_len):
        """-> (X, Y, Z) bucket accumulators over all W·2^cb lanes, plus
        identity-contribution blocks already folded.

        table_p: (N+1, rows_w) u8 (row N = all-zero identity sentinel);
        perm_flat: (W·n,) u32 sort payload (sign in bit 31);
        start/length: (lanes,) int32 per replica-slot bucket ranges.
        """
        plan = self.plan
        phase1, phase3, tree_mul = self.kernels
        lanes = start.shape[0]
        nb = 1 << plan.cb
        B0 = pick_block_size(mean_len)
        levels = B0.bit_length() - 1
        tile = self.tile
        W = lanes // nb
        # static block capacity: sum(ceil(len/B0)) <= total/B0 + lanes
        TB = -(-(W * n) // B0) + lanes
        TB = -(-TB // tile) * tile  # pallas grid divisibility
        slots = TB * B0

        nblk = -(-length // B0)
        boff = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(nblk).astype(jnp.int32)]
        )
        blk_ids = jnp.arange(TB, dtype=jnp.int32)
        b_of = (
            jnp.searchsorted(boff, blk_ids, side="right").astype(jnp.int32) - 1
        )
        b_of = jnp.clip(b_of, 0, lanes - 1)
        base_j = (blk_ids - jnp.take(boff, b_of)) * B0
        j = base_j[:, None] + jnp.arange(B0, dtype=jnp.int32)[None, :]
        len_b = jnp.take(length, b_of)[:, None]
        in_range = (j < len_b) & (blk_ids[:, None] < boff[lanes])
        win = (b_of // nb).astype(jnp.int32)
        pos = jnp.take(start, b_of)[:, None] + jnp.minimum(j, n - 1)
        pos = jnp.minimum(pos, n - 1)
        pay = jnp.take(perm_flat, win[:, None] * n + pos)
        idx = jnp.where(
            in_range, (pay & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32), n
        )
        sgn = jnp.where(in_range, (pay >> 31).astype(F32), 0.0)

        # gather u8 rows as uint32 WORDS (4 bytes per gathered element):
        # XLA TPU gather cost scales with element count, so the word view
        # cuts the dominant level-0 gather ~4x vs a u8 gather of the same
        # rows. Everything stays RANK-2 (a (N, w/4, 4) u8 intermediate
        # gets a T(8,128) tiling on its last two dims — a 32x padded
        # 70+ GB allocation, measured): the table's columns are
        # pre-permuted so that word i's byte k is original column
        # w4·k + i, making the unpack a plain concat of 4 shifted slices.
        if os.environ.get("SNARK_TPU_AFFINE_GATHER", "u32") == "u32":
            # word-packed gather variant (kept for A/B measurement):
            # pack word i = col_i | col_{w4+i}<<8 | ... via contiguous
            # column slices (all rank-2 — a (N, w/4, 4) u8 intermediate
            # would get a T(8,128) tiling on its last two dims, a 32x
            # padded 70+ GB allocation, measured); unpack restores the
            # original column order
            w = table_p.shape[1]
            w4 = w // 4
            t32 = sum(
                table_p[:, k * w4 : (k + 1) * w4].astype(jnp.uint32)
                << jnp.uint32(8 * k)
                for k in range(4)
            )
            r32 = jnp.take(t32, idx.reshape(-1), axis=0)
            rows = jnp.concatenate(
                [
                    (r32 >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
                    for k in range(4)
                ],
                axis=1,
            ).astype(jnp.uint8)
        else:
            rows = jnp.take(table_p, idx.reshape(-1), axis=0)
        sgn = sgn.reshape(slots)

        skip_inv = os.environ.get("SNARK_TPU_AFFINE_SKIPINV") == "1"
        skip3 = os.environ.get("SNARK_TPU_AFFINE_SKIP3") == "1"
        rows_w = rows.shape[1]
        for k in range(levels):
            M = slots >> (k + 1)
            blk2 = rows.reshape(M, 2 * rows_w)
            sg2 = sgn.reshape(M, 2).T if k == 0 else jnp.zeros((2, M), F32)
            den, preds = phase1(blk2, sg2)
            # SKIPINV / SKIP3: timing-only attribution knobs (WRONG results)
            dinv = den if skip_inv else batch_inverse_planes(
                self.pc, plan.group, den, tree_mul, tile
            )
            if skip3:
                rows = blk2[:, :rows_w] + (
                    dinv[:1, :].astype(jnp.uint8).T * 0
                )
            else:
                rows = phase3(blk2, sg2, dinv, preds).astype(jnp.uint8)
            if k == 0:
                sgn = None
        # block partial sums: (TB, rows_w) canonical rows, contiguous per
        # bucket -> existing masked projective scan (+spill) finishes
        return plan._run_scan(
            rows,
            jnp.arange(TB, dtype=jnp.uint32),
            jnp.zeros((lanes,), jnp.int32),
            boff[:-1],
            nblk,
            TB,
            mean_hint=max(1, int(mean_len) // B0 + 1),
        )
