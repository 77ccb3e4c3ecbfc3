"""Pairings for BN254 (optimal ate) and BLS12-381 (ate), host-side.

Replaces ark-ec's pairing engines (SURVEY.md §2.3 "pairing (Miller loop +
final exp, host or device)"). Verification is O(1) pairings per proof, so
this stays host-side Python (SURVEY.md §7 stage 5); the prover never pairs.

Design: instead of twist-specialized sparse line arithmetic, G2 points are
*untwisted* into E(Fq12) and a generic affine Miller loop runs over Fq12.
This is slower than a production pairing but transparently correct, and the
pairing value is identical no matter the addition chain — bit-exactness is
preserved. The untwist embeddings (X, Y) -> (x·w^±2, y·w^±3) follow from
solving c_y^2 = c_x^3 = b/b' in Fq12 (D-type: BN254, b' = b/xi; M-type:
BLS12-381, b' = b·xi).

Final exponentiation: easy part ((p^6-1)(p^2+1)) via conjugation/Frobenius,
hard part (p^4 - p^2 + 1)/r by plain square-and-multiply — same value as
the curve-specific chains arkworks uses.
"""

from __future__ import annotations

import functools

from ..fields.params import BLS12_381, BN254, CurveParams
from ..fields.towers import make_tower


class _Fq12Field:
    """Adapter: Fq12 tower -> the generic field-ops interface of HostCurve."""

    def __init__(self, fq12):
        self.f = fq12
        self.zero = fq12.zero
        self.one = fq12.one

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def mul(self, a, b):
        return self.f.mul(a, b)

    def square(self, a):
        return self.f.square(a)

    def neg(self, a):
        return self.f.neg(a)

    def inv(self, a):
        return self.f.inv(a)

    def is_zero(self, a):
        return a == self.f.zero

    def eq(self, a, b):
        return a == b


class Pairing:
    def __init__(self, curve: CurveParams):
        self.curve = curve
        self.fq2, self.fq6, self.fq12 = make_tower(curve)
        self.p = curve.fq.modulus
        self.r = curve.fr.modulus
        self.F = _Fq12Field(self.fq12)
        self.is_bn = curve.name == "bn254"
        if self.is_bn:
            self.loop_count = 6 * curve.x + 2
        else:
            self.loop_count = abs(curve.x)
        # untwist constants: D-type (BN254) uses w^2, w^3; M-type (BLS12-381)
        # uses w^-2, w^-3.
        w = (self.fq6.zero, self.fq6.one)  # the Fq12 generator w
        w2 = self.fq12.square(w)
        w3 = self.fq12.mul(w2, w)
        if self.is_bn:
            self.cx, self.cy = w2, w3
        else:
            self.cx, self.cy = self.fq12.inv(w2), self.fq12.inv(w3)

    # ----- embeddings ---------------------------------------------------
    def embed_fq(self, a: int):
        """Fq -> Fq12 (constant coefficient)."""
        z2 = (a % self.p, 0)
        c0 = (z2, self.fq2.zero, self.fq2.zero)
        return (c0, self.fq6.zero)

    def embed_fq2(self, a):
        c0 = (a, self.fq2.zero, self.fq2.zero)
        return (c0, self.fq6.zero)

    def embed_g1(self, pt):
        """Affine G1 (ints) -> E(Fq12) affine."""
        if pt is None:
            return None
        return (self.embed_fq(pt[0]), self.embed_fq(pt[1]))

    def untwist_g2(self, pt):
        """Affine G2 on the twist (Fq2 coords) -> E(Fq12) affine."""
        if pt is None:
            return None
        x = self.fq12.mul(self.embed_fq2(pt[0]), self.cx)
        y = self.fq12.mul(self.embed_fq2(pt[1]), self.cy)
        return (x, y)

    def frobenius_point(self, pt):
        """π(X, Y) = (X^p, Y^p) on E(Fq12)."""
        if pt is None:
            return None
        return (self.fq12.frobenius(pt[0], 1), self.fq12.frobenius(pt[1], 1))

    # ----- Miller loop ---------------------------------------------------
    def _line(self, T, Q, P):
        """Evaluate at P the line through T and Q (tangent if T == Q).

        Returns (line_value, T + Q). All points affine in E(Fq12).
        """
        f = self.fq12
        xT, yT = T
        xP, yP = P
        if T == Q:
            # tangent: lam = 3 xT^2 / (2 yT)
            x2 = f.square(xT)
            num = f.add(f.add(x2, x2), x2)
            den = f.add(yT, yT)
        else:
            xQ, yQ = Q
            if xT == xQ:
                # vertical line: x - xT
                return f.sub(xP, xT), None
            num = f.sub(Q[1], yT)
            den = f.sub(Q[0], xT)
        lam = f.mul(num, f.inv(den))
        # l(P) = yP - yT - lam (xP - xT)
        val = f.sub(f.sub(yP, yT), f.mul(lam, f.sub(xP, xT)))
        # sum point
        if T == Q:
            xR = f.sub(f.square(lam), f.add(xT, xT))
        else:
            xR = f.sub(f.sub(f.square(lam), xT), Q[0])
        yR = f.sub(f.mul(lam, f.sub(xT, xR)), yT)
        return val, (xR, yR)

    def miller_loop(self, p_g1, q_g2):
        """f_{loop,Q}(P) with BN extra Frobenius lines. Inputs affine:
        p_g1 = (x, y) ints, q_g2 = ((x0,x1),(y0,y1)) Fq2 pairs."""
        if p_g1 is None or q_g2 is None:
            return self.fq12.one
        f12 = self.fq12
        P = self.embed_g1(p_g1)
        Q = self.untwist_g2(q_g2)
        f = f12.one
        T = Q
        bits = bin(self.loop_count)[3:]  # skip leading 1
        for bit in bits:
            val, T = self._line(T, T, P)
            f = f12.mul(f12.square(f), val)
            if T is None:
                T = None  # cannot happen mid-loop for prime-order inputs
            if bit == "1":
                val, T = self._line(T, Q, P)
                f = f12.mul(f, val)
        if self.is_bn:
            # optimal ate extra lines: Q1 = π(Q), Q2 = -π^2(Q)
            Q1 = self.frobenius_point(Q)
            Q2 = self.frobenius_point(Q1)
            Q2 = (Q2[0], f12.neg(Q2[1]))
            val, T = self._line(T, Q1, P)
            f = f12.mul(f, val)
            val, T = self._line(T, Q2, P)
            f = f12.mul(f, val)
        else:
            if self.curve.x < 0:
                f = f12.conj(f)  # unitary inverse; exact after final exp
        return f

    # ----- final exponentiation ------------------------------------------
    def final_exponentiation(self, f):
        f12 = self.fq12
        p = self.p
        # easy part: f^(p^6 - 1) then ^(p^2 + 1)
        f = f12.mul(f12.conj(f), f12.inv(f))
        f = f12.mul(f12.frobenius(f, 2), f)
        # hard part: (p^4 - p^2 + 1) / r
        e = (p**4 - p**2 + 1) // self.r
        return f12.pow(f, e)

    def pairing(self, p_g1, q_g2):
        return self.final_exponentiation(self.miller_loop(p_g1, q_g2))

    def multi_pairing(self, pairs):
        """Π e(P_i, Q_i) with a single shared final exponentiation."""
        f = self.fq12.one
        for p_g1, q_g2 in pairs:
            f = self.fq12.mul(f, self.miller_loop(p_g1, q_g2))
        return self.final_exponentiation(f)


@functools.lru_cache(maxsize=None)
def get_pairing(curve: CurveParams) -> Pairing:
    return Pairing(curve)
