"""Batched short-Weierstrass curve arithmetic on device (G1 over Fq, G2 over
Fq2), using *complete* projective addition formulas.

TPU-native replacement for ark-ec's Jacobian arithmetic (SURVEY.md §2.3).
Instead of Jacobian add with data-dependent branches (identity, equal-point,
negation cases), we use the Renes–Costello–Batina complete addition formulas
for a = 0 curves (eprint 2015/1060, Algorithm 7): a single branch-free
12-multiplication sequence that is correct for ALL input pairs, including
doubling and the identity (0 : 1 : 0). Branch-free means perfectly batched
SPMD over the VPU — the right trade for TPU even though a branchy Jacobian
add costs fewer muls on a scalar CPU.

Point layout: (..., 3, K) stacked homogeneous projective (X : Y : Z)
coordinates, where K = L limbs for G1 and 2L for G2 (Fq2 elements are
flattened (c0 ‖ c1) so G1/G2 share all code paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import get_compute_field
from ..fields.device import DeviceField
from ..fields.host import Fp
from ..fields.params import CurveParams


class DeviceFq2:
    """Fq2 = Fq[u]/(u^2+1) over flattened (..., 2K) coordinate arrays
    (generic over the base device-field implementation)."""

    def __init__(self, base):
        self.base = base
        self.L = base.L
        self.K = 2 * base.L
        self.ZERO = jnp.concatenate([base.ZERO, base.ZERO])
        self.ONE_MONT = jnp.concatenate([base.ONE_MONT, base.ZERO])

    def _split(self, a):
        return a[..., : self.L], a[..., self.L :]

    def _join(self, c0, c1):
        return jnp.concatenate([c0, c1], axis=-1)

    def add_impl(self, a, b):
        f = self.base
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return self._join(f.add_impl(a0, b0), f.add_impl(a1, b1))

    def sub_impl(self, a, b):
        f = self.base
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return self._join(f.sub_impl(a0, b0), f.sub_impl(a1, b1))

    def neg_impl(self, a):
        f = self.base
        a0, a1 = self._split(a)
        return self._join(f.neg_impl(a0), f.neg_impl(a1))

    def double_impl(self, a):
        return self.add_impl(a, a)

    def mul_impl(self, a, b):
        # Karatsuba over u^2 = -1: 3 base muls
        f = self.base
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        t0 = f.mul_impl(a0, b0)
        t1 = f.mul_impl(a1, b1)
        t2 = f.mul_impl(f.add_impl(a0, a1), f.add_impl(b0, b1))
        c0 = f.sub_impl(t0, t1)
        c1 = f.sub_impl(t2, f.add_impl(t0, t1))
        return self._join(c0, c1)

    def square_impl(self, a):
        f = self.base
        a0, a1 = self._split(a)
        c0 = f.mul_impl(f.add_impl(a0, a1), f.sub_impl(a0, a1))
        c1 = f.double_impl(f.mul_impl(a0, a1))
        return self._join(c0, c1)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, mask, a, b):
        return jnp.where(mask[..., None], a, b)

    def inv_impl(self, a):
        f = self.base
        a0, a1 = self._split(a)
        norm = f.add_impl(f.mul_impl(a0, a0), f.mul_impl(a1, a1))
        ninv = f.inv(norm)
        return self._join(f.mul_impl(a0, ninv), f.neg_impl(f.mul_impl(a1, ninv)))

    def const(self, c0: int, c1: int, params) -> jnp.ndarray:
        base = self.base
        return jnp.concatenate([base.const(c0), base.const(c1)])


class _CurveOpsBase:
    """Complete-addition curve ops over an abstract device field `F`."""

    def __init__(self, F, b3_const: jnp.ndarray):
        self.F = F
        self.B3 = b3_const  # 3*b in Montgomery form, shape (K,)
        K = b3_const.shape[-1]
        self.K = K
        # identity (0 : 1 : 0)
        self.IDENTITY = jnp.stack(
            [jnp.zeros((K,), jnp.uint32), F.ONE_MONT, jnp.zeros((K,), jnp.uint32)]
        )
        self.add = jax.jit(self.add_impl)
        self.double = jax.jit(self.double_impl)

    def identity_like(self, batch_shape) -> jnp.ndarray:
        return jnp.broadcast_to(self.IDENTITY, tuple(batch_shape) + (3, self.K))

    def add_impl(self, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        """Complete addition, RCB15 Algorithm 7 (a = 0), 12M. Valid for every
        input pair: doubling, identity, inverses — no branches.

        The 12 multiplies are grouped by dependency level and executed as
        three *stacked* multiplies (6 + 2 + 6 along a fresh leading axis):
        ~4x fewer XLA ops per point-add (each field multiply is hundreds of
        HLO ops — per-op overhead dominated small-batch adds) and 6x the
        lanes per multiply.
        """
        F = self.F
        X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
        b3 = self.B3

        A = jnp.stack(
            [X1, Y1, Z1, F.add_impl(X1, Y1), F.add_impl(Y1, Z1), F.add_impl(X1, Z1)]
        )
        Bv = jnp.stack(
            [X2, Y2, Z2, F.add_impl(X2, Y2), F.add_impl(Y2, Z2), F.add_impl(X2, Z2)]
        )
        M = F.mul_impl(A, Bv)
        t0, t1, t2, m4, m5, m6 = (M[i] for i in range(6))

        t3 = F.sub_impl(m4, F.add_impl(t0, t1))
        t4 = F.sub_impl(m5, F.add_impl(t1, t2))
        Y3 = F.sub_impl(m6, F.add_impl(t0, t2))
        X3 = F.add_impl(t0, t0)
        t0 = F.add_impl(X3, t0)

        C = F.mul_impl(jnp.stack([t2, Y3]), b3)
        t2, Y3 = C[0], C[1]
        Z3 = F.add_impl(t1, t2)
        t1 = F.sub_impl(t1, t2)

        Q = F.mul_impl(
            jnp.stack([t4, t3, Y3, t1, t0, Z3]),
            jnp.stack([Y3, t1, t0, Z3, t3, t4]),
        )
        X3 = F.sub_impl(Q[1], Q[0])
        Y3 = F.add_impl(Q[3], Q[2])
        Z3 = F.add_impl(Q[5], Q[4])
        return jnp.stack([X3, Y3, Z3], axis=-2)

    def double_impl(self, p: jnp.ndarray) -> jnp.ndarray:
        """Complete doubling, RCB15 Algorithm 9 (a = 0), 6M + 2S, with the
        multiplies stacked by dependency level (4 + 1 + 4)."""
        F = self.F
        X, Y, Z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        b3 = self.B3
        M = F.mul_impl(jnp.stack([Y, Y, Z, X]), jnp.stack([Y, Z, Z, Y]))
        t0, t1, t2, xy = (M[i] for i in range(4))
        Z3 = F.add_impl(t0, t0)
        Z3 = F.add_impl(Z3, Z3)
        Z3 = F.add_impl(Z3, Z3)  # 8·Y^2
        b3z2 = F.mul_impl(t2, b3)
        Y3 = F.add_impl(t0, b3z2)
        tt = F.add_impl(b3z2, b3z2)
        t2 = F.add_impl(tt, b3z2)  # 3·b3·Z^2
        t0 = F.sub_impl(t0, t2)
        Q = F.mul_impl(
            jnp.stack([b3z2, t1, t0, t0]), jnp.stack([Z3, Z3, Y3, xy])
        )
        Y3_out = F.add_impl(Q[0], Q[2])  # t2·Z3 + t0·Y3
        Z3_out = Q[1]  # t1·Z3
        X3_out = F.add_impl(Q[3], Q[3])  # 2·t0·(X·Y)
        return jnp.stack([X3_out, Y3_out, Z3_out], axis=-2)

    def neg_impl(self, p: jnp.ndarray) -> jnp.ndarray:
        X, Y, Z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        return jnp.stack([X, self.F.neg_impl(Y), Z], axis=-2)

    def select(self, mask, p, q):
        """mask (...,) -> where(mask, p, q) over (..., 3, K) points."""
        return jnp.where(mask[..., None, None], p, q)

    def is_identity(self, p) -> jnp.ndarray:
        return self.F.is_zero(p[..., 2, :])

    def scalar_mul_const(self, p: jnp.ndarray, e: int) -> jnp.ndarray:
        """[e]P for a host-known scalar (double-and-add, unrolled). For test
        and setup-time use; bulk scalar work goes through MSM kernels."""
        if e == 0:
            return self.identity_like(p.shape[:-2])
        bits = bin(e)[2:]
        r = p
        for bit in bits[1:]:
            r = self.double_impl(r)
            if bit == "1":
                r = self.add_impl(r, p)
        return r


class CurveOps(_CurveOpsBase):
    """G1 ops over the base field."""

    def __init__(self, curve: CurveParams):
        self.curve = curve
        df = get_compute_field(curve.fq)
        self.df = df
        super().__init__(df, df.const(3 * curve.b))

    def pack_affine_host(self, points: list[tuple[int, int] | None]) -> jnp.ndarray:
        """Host affine (x, y) ints (None = identity) -> (N, 3, K) device
        projective Montgomery points."""
        df = self.df
        xs = [0 if pt is None else pt[0] for pt in points]
        ys = [1 if pt is None else pt[1] for pt in points]
        zs = [0 if pt is None else 1 for pt in points]
        X = np.asarray(df.array(xs))
        Y = np.asarray(df.array(ys))
        Z = np.asarray(df.array(zs))
        return jnp.asarray(np.stack([X, Y, Z], axis=1))

    def to_affine_host(self, pts: jnp.ndarray) -> list[tuple[int, int] | None]:
        """(N, 3, K) device points -> host affine ints (None = identity)."""
        f = Fp(self.curve.fq)
        df = self.df
        arr = np.asarray(pts).reshape(-1, 3, self.K)
        Xs = df.to_host_ints(arr[:, 0])
        Ys = df.to_host_ints(arr[:, 1])
        Zs = df.to_host_ints(arr[:, 2])
        out = []
        for x, y, z in zip(Xs, Ys, Zs):
            if z == 0:
                out.append(None)
            else:
                zi = f.inv(z)
                out.append((x * zi % f.p, y * zi % f.p))
        return out


class G2CurveOps(_CurveOpsBase):
    """G2 ops over Fq2 (flattened coordinate pairs)."""

    def __init__(self, curve: CurveParams):
        self.curve = curve
        df = get_compute_field(curve.fq)
        self.df = df
        self.fq2 = DeviceFq2(df)
        b3c0 = 3 * curve.b2[0] % curve.fq.modulus
        b3c1 = 3 * curve.b2[1] % curve.fq.modulus
        super().__init__(self.fq2, self.fq2.const(b3c0, b3c1, curve))

    def pack_affine_host(self, points) -> jnp.ndarray:
        """Host affine ((x0,x1),(y0,y1)) (None = identity) -> (N, 3, 2K)."""
        df = self.df
        x0 = [0 if pt is None else pt[0][0] for pt in points]
        x1 = [0 if pt is None else pt[0][1] for pt in points]
        y0 = [1 if pt is None else pt[1][0] for pt in points]
        y1 = [0 if pt is None else pt[1][1] for pt in points]
        z0 = [0 if pt is None else 1 for pt in points]
        z1 = [0] * len(points)

        def pair(a, b):
            return np.concatenate(
                [np.asarray(df.array(a)), np.asarray(df.array(b))], 1
            )

        X, Y, Z = pair(x0, x1), pair(y0, y1), pair(z0, z1)
        return jnp.asarray(np.stack([X, Y, Z], axis=1))

    def to_affine_host(self, pts: jnp.ndarray):
        f = Fp(self.curve.fq)
        df = self.df
        Kb = df.L  # base-field coordinate width
        arr = np.asarray(pts).reshape(-1, 3, 2 * Kb)
        from ..fields.towers import Fq2 as HostFq2

        fq2 = HostFq2(f.p)
        coords = {}
        for ci in range(3):
            coords[(ci, 0)] = df.to_host_ints(arr[:, ci, :Kb])
            coords[(ci, 1)] = df.to_host_ints(arr[:, ci, Kb:])
        out = []
        for i in range(arr.shape[0]):
            x = (coords[(0, 0)][i], coords[(0, 1)][i])
            y = (coords[(1, 0)][i], coords[(1, 1)][i])
            z = (coords[(2, 0)][i], coords[(2, 1)][i])
            if fq2.is_zero(z):
                out.append(None)
            else:
                zi = fq2.inv(z)
                out.append((fq2.mul(x, zi), fq2.mul(y, zi)))
        return out


@functools.lru_cache(maxsize=None)
def get_g1_ops(curve: CurveParams) -> CurveOps:
    return CurveOps(curve)


@functools.lru_cache(maxsize=None)
def get_g2_ops(curve: CurveParams) -> G2CurveOps:
    return G2CurveOps(curve)
