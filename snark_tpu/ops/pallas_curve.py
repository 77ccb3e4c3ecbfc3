"""Fused Pallas curve kernels: complete point add/double on digit planes.

TPU-native replacement for ark-ec's group arithmetic (SURVEY.md §2.3): the
entire RCB15 complete-addition formula (eprint 2015/1060, Alg 7/9 for
a = 0) runs inside ONE Pallas kernel — 12 variable Montgomery multiplies
on the VPU, 2 constant multiplies on the MXU (banded matrices), all
temporaries in VMEM. Per point-add HBM traffic is exactly 2 points in,
1 point out.

Representation: each coordinate is a (R8, N) f32 base-256 digit-plane
array in *wide* Montgomery form (R = 256^R8 with R8 = 2L+2; see
pallas_field_v3: p/R <= 2^-17 makes every Montgomery product land in
[0, 2.05p] regardless of lazy inputs — no conditional subtractions
anywhere). A point is the tuple (X, Y, Z) of such arrays, projective,
identity = (0 : 1 : 0). Completeness: the formulas are valid for ALL
input pairs (doubling, identity, inverses) — branch-free SPMD.

Value/digit bound ledger for one add round (units of p; ε = p/R <= 2^-17,
so every mul output is <= 2.04 + ε·(v_a·v_b) ≈ 2.05 =: μ):

    inputs            v <= 2.05, digits [-1, 256]   (the add's own output)
    coordinate sums   <= 2v,     digits [-2, 512]
    t0,t1,t2          <= μ       [-1, 256]
    t3,t4,Y3pre       <= μ+5     [-513, 513]   (sub constant K1 = 5p)
    t0' = 3t0         <= 3μ      [-1, 258]     (one sweep)
    t2' = b3·t2       <= μ       [-1, 256]     (MXU const mul)
    Y3' = b3·Y3pre    <= μ       [-1, 256]     (sweep3 then MXU)
    Z3pre = t1+t2'    <= 2μ      [-2, 512]
    t1' = t1-t2'+3p   <= μ+3     [-257, 512]
    X3/Y3/Z3          <= μ       [-1, 256]     (fused product PAIRS: both
                      wide convs accumulate in t_ref — paired lazy digits
                      < 2^23.8, exact — then ONE Montgomery reduce, whose
                      final sweep3 is the output normalization)

Every multiply input satisfies |digits| <= 513 (exactness needs <= 702
for R8 = 34) and value <= 7.1p (R-overflow needs <= ~2^7·p). Fixpoint:
output value bound 2.05p <= assumed input bound 2.05p. Ingestion from
host or from narrow-R arrays must deliver digits <= 256 and value <= 2p.
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

EXTRA_DIGITS = 2


class PlaneCurve:
    """G1 plane-form curve ops (constants + in-kernel formula bodies)."""

    def __init__(self, curve: CurveParams):
        self.curve = curve
        self.pf = pf = PlaneFieldV3(curve.fq, EXTRA_DIGITS)
        self.R8 = pf.R8
        p = curve.fq.modulus
        b3_mont = (3 * curve.b) * pf.r_eff % p
        self.M_B3 = pf.const_band(b3_mont)
        # f32 constant columns, stacked (5, R8): carry scale, p, 3p, 5p, 7p
        self.COLS = np.concatenate(
            [
                pf.CARRY_SCALE,
                pf.P_COL,
                pf.KP_COLS[3],
                pf.KP_COLS[5],
                pf.KP_COLS[7],
            ],
            axis=1,
        ).T.astype(np.float32)

    # -- in-kernel bodies (pure jnp; refs threaded for scratch) ----------
    def add_body(self, P, Q, t_ref, mnp, mp, mb3, cols):
        """P + Q; P, Q = (X, Y, Z) triples of (R8, T) planes."""
        pf = self.pf
        carry = cols[0, :][:, None]
        p1 = cols[1, :][:, None]
        p3 = cols[2, :][:, None]
        p5 = cols[3, :][:, None]

        def mul(a, b):
            return pf.mont_mul(a, b, t_ref, mnp, mp, carry, plus_p=p1)

        def cmul_b3(x):
            return pf.mul_const(x, mb3, mnp, mp, carry, plus_p=p1)

        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        t0 = mul(X1, X2)
        t1 = mul(Y1, Y2)
        t2 = mul(Z1, Z2)
        m4 = mul(X1 + Y1, X2 + Y2)
        m5 = mul(Y1 + Z1, Y2 + Z2)
        m6 = mul(X1 + Z1, X2 + Z2)
        t3 = (m4 - (t0 + t1)) + p5
        t4 = (m5 - (t1 + t2)) + p5
        y3p = (m6 - (t0 + t2)) + p5
        t0p = _sweep(t0 + t0 + t0)  # 3·t0, one sweep: digits <= 258
        t2p = cmul_b3(t2)
        y3 = cmul_b3(sweep3(y3p))
        z3p = t1 + t2p
        t1p = (t1 - t2p) + p3
        # fused product pairs: one Montgomery reduction per output coord
        # (paired lazy digits < 2^23.8, exact; see mont_mul_pair)
        X3 = pf.mont_mul_pair(
            t3, t1p, t4, y3, t_ref, mnp, mp, carry, plus_p=p1, scale2=-1.0
        )
        Y3 = pf.mont_mul_pair(t1p, z3p, y3, t0p, t_ref, mnp, mp, carry, plus_p=p1)
        Z3 = pf.mont_mul_pair(z3p, t4, t0p, t3, t_ref, mnp, mp, carry, plus_p=p1)
        return X3, Y3, Z3

    def double_body(self, P, t_ref, mnp, mp, mb3, cols):
        """2·P, RCB15 Alg 9 (a = 0): 6M + 2S fused, same bound style.

        Ledger: t0,t1,t2,xy <= μ; Z3a = 8t0 digits <= 2048 -> sweep ->
        [-8, 263]; b3z2 <= μ; Y3a = t0+b3z2 <= 2μ [<=512]; t2t = 3·b3z2
        sweep -> 258; t0n = t0-t2t+7p <= μ+7 [-257, 512]; products <= μ;
        outputs: X3 = 2·q3 [<=512] sweep3; Y3 = q0+q2 sweep3; Z3 = q1.
        """
        pf = self.pf
        carry = cols[0, :][:, None]
        p1 = cols[1, :][:, None]
        p7 = cols[4, :][:, None]

        def mul(a, b):
            return pf.mont_mul(a, b, t_ref, mnp, mp, carry, plus_p=p1)

        def cmul_b3(x):
            return pf.mul_const(x, mb3, mnp, mp, carry, plus_p=p1)

        X, Y, Z = P
        t0 = mul(Y, Y)
        t1 = mul(Y, Z)
        t2 = mul(Z, Z)
        xy = mul(X, Y)
        z3a = _sweep(((t0 + t0) + (t0 + t0)) + ((t0 + t0) + (t0 + t0)))
        b3z2 = cmul_b3(t2)
        y3a = t0 + b3z2
        t2t = _sweep(b3z2 + b3z2 + b3z2)
        t0n = (t0 - t2t) + p7  # value(t2t) <= 3μ ≈ 6.2p, so +7p keeps it nonneg
        X3 = pf.mont_mul_x2(t0n, xy, t_ref, mnp, mp, carry, plus_p=p1)
        Y3 = pf.mont_mul_pair(
            b3z2, z3a, t0n, y3a, t_ref, mnp, mp, carry, plus_p=p1
        )
        Z3 = mul(t1, z3a)
        return X3, Y3, Z3


@functools.lru_cache(maxsize=None)
def get_plane_curve(curve: CurveParams) -> PlaneCurve:
    return PlaneCurve(curve)


def _make_pointwise(
    pc: PlaneCurve,
    body_arity: int,
    tile: int,
    interpret: bool,
    masked: bool = False,
):
    """Build a pallas_call over (R8, N) coordinate planes.

    body_arity = 2 -> add(P, Q); 1 -> double(P).
    masked (add only): extra (1, N) f32 mask input; out = mask ? P+Q : P.
    """
    pf = pc.pf
    R8 = pc.R8
    mnp_c = jnp.asarray(pf.M_NP).astype(BF16)
    mp_c = jnp.asarray(pf.M_P).astype(BF16)
    mb3_c = jnp.asarray(pc.M_B3).astype(BF16)
    cols_c = jnp.asarray(pc.COLS)

    n_coords = 3 * body_arity + (1 if masked else 0)

    def kernel(*refs):
        mnp, mp, mb3, cols = (r[...] for r in refs[:4])
        ins = [r[...] for r in refs[4 : 4 + n_coords]]
        outs = refs[4 + n_coords : 4 + n_coords + 3]
        t_ref = refs[-1]
        if body_arity == 2:
            P, Q = tuple(ins[:3]), tuple(ins[3:6])
            X3, Y3, Z3 = pc.add_body(P, Q, t_ref, mnp, mp, mb3, cols)
            if masked:
                m = ins[6]  # (1, T) in {0, 1}
                X3 = m * X3 + (1.0 - m) * P[0]
                Y3 = m * Y3 + (1.0 - m) * P[1]
                Z3 = m * Z3 + (1.0 - m) * P[2]
        else:
            X3, Y3, Z3 = pc.double_body(tuple(ins), t_ref, mnp, mp, mb3, cols)
        outs[0][...] = X3
        outs[1][...] = Y3
        outs[2][...] = Z3

    @jax.jit
    def run(*coords):
        n = coords[0].shape[-1]
        assert n % tile == 0, f"lane count {n} must be a multiple of {tile}"
        const_specs = [
            pl.BlockSpec((R8, R8), lambda i: (0, 0)),
            pl.BlockSpec((2 * R8, R8), lambda i: (0, 0)),
            pl.BlockSpec((2 * R8, R8), lambda i: (0, 0)),
            pl.BlockSpec((5, R8), lambda i: (0, 0)),
        ]
        data_specs = [pl.BlockSpec((R8, tile), lambda i: (0, i))] * (
            3 * body_arity
        )
        if masked:
            data_specs.append(pl.BlockSpec((1, tile), lambda i: (0, i)))
        out_spec = pl.BlockSpec((R8, tile), lambda i: (0, i))
        return pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((R8, n), F32) for _ in range(3)
            ),
            grid=(n // tile,),
            in_specs=const_specs + data_specs,
            out_specs=(out_spec,) * 3,
            scratch_shapes=[pltpu.VMEM((2 * R8, tile), F32)],
            interpret=interpret,
        )(mnp_c, mp_c, mb3_c, cols_c, *coords)

    return run


def make_point_add(curve: CurveParams, tile: int = 256, interpret: bool = False):
    """(X1,Y1,Z1,X2,Y2,Z2) (R8,N) planes -> (X3,Y3,Z3). Complete add."""
    return _make_pointwise(get_plane_curve(curve), 2, tile, interpret)


def make_point_double(curve: CurveParams, tile: int = 256, interpret: bool = False):
    """(X,Y,Z) (R8,N) planes -> (X3,Y3,Z3). Complete double."""
    return _make_pointwise(get_plane_curve(curve), 1, tile, interpret)


def make_masked_add(curve: CurveParams, tile: int = 256, interpret: bool = False):
    """(P, Q, mask) -> mask ? P+Q : P. mask is (1, N) f32 in {0, 1}.

    The predicated accumulate op of the MSM bucket scan — one kernel,
    no extra XLA select pass over the accumulators.
    """
    return _make_pointwise(get_plane_curve(curve), 2, tile, interpret, masked=True)


# ---------------------------------------------------------------------------
# host codecs (tests / ingestion)
# ---------------------------------------------------------------------------


def pack_rows_u8_host(pc: PlaneCurve, points) -> np.ndarray:
    """Host affine (x, y) int pairs (None = identity) -> (N, 2R8+1) uint8
    row table (X digits ‖ Y digits ‖ z-flag), wide-Mont canonical.

    Row-major u8 is the MSM gather layout (see ops/msm_plane.py).
    """
    pf = pc.pf
    xs = [0 if pt is None else pt[0] for pt in points]
    ys = [1 if pt is None else pt[1] for pt in points]
    flags = [0 if pt is None else 1 for pt in points]
    X = pf.pack_np(xs).T.astype(np.uint8)  # (N, R8)
    Y = pf.pack_np(ys).T.astype(np.uint8)
    F = np.asarray(flags, np.uint8)[:, None]
    return np.concatenate([X, Y, F], axis=1)


def pack_points_host(pc: PlaneCurve, points) -> tuple:
    """Host affine (x, y) int pairs (None = identity) -> (X, Y, Z) planes."""
    xs = [0 if pt is None else pt[0] for pt in points]
    ys = [1 if pt is None else pt[1] for pt in points]
    zs = [0 if pt is None else 1 for pt in points]
    pf = pc.pf
    return (
        jnp.asarray(pf.pack_np(xs)),
        jnp.asarray(pf.pack_np(ys)),
        jnp.asarray(pf.pack_np(zs)),
    )


def unpack_points_host(pc: PlaneCurve, X, Y, Z):
    """(X, Y, Z) lazy planes -> host affine int pairs (None = identity)."""
    from ..fields.host import Fp

    pf = pc.pf
    f = Fp(pc.curve.fq)
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
