"""Host-side extension-field towers Fq2 / Fq6 / Fq12 for pairing computation.

Tower shape (both BN254 and BLS12-381, matching arkworks' `ark-ec` tower):
    Fq2  = Fq [u] / (u^2 + 1)
    Fq6  = Fq2[v] / (v^3 - xi)         (xi = 9+u for BN254, 1+u for BLS12-381)
    Fq12 = Fq6[w] / (w^2 - v)

Elements are nested tuples of ints: Fq2 = (c0, c1), Fq6 = (Fq2, Fq2, Fq2),
Fq12 = (Fq6, Fq6). Pure-Python: the pairing is O(1) work per verification and
runs host-side (SURVEY.md §7 stage 5). The reference consumes this surface from
`ark-ff` tower fields (SURVEY.md §2.3).
"""

from __future__ import annotations

from .params import CurveParams


class Fq2:
    __slots__ = ("p", "zero", "one")

    def __init__(self, p: int):
        self.p = p
        self.zero = (0, 0)
        self.one = (1, 0)

    def add(self, a, b):
        p = self.p
        return ((a[0] + b[0]) % p, (a[1] + b[1]) % p)

    def sub(self, a, b):
        p = self.p
        return ((a[0] - b[0]) % p, (a[1] - b[1]) % p)

    def neg(self, a):
        p = self.p
        return ((-a[0]) % p, (-a[1]) % p)

    def mul(self, a, b):
        # (a0 + a1 u)(b0 + b1 u) with u^2 = -1 (Karatsuba)
        p = self.p
        t0 = a[0] * b[0] % p
        t1 = a[1] * b[1] % p
        t2 = (a[0] + a[1]) * (b[0] + b[1]) % p
        return ((t0 - t1) % p, (t2 - t0 - t1) % p)

    def square(self, a):
        p = self.p
        t0 = (a[0] + a[1]) * (a[0] - a[1]) % p  # a0^2 - a1^2
        t1 = 2 * a[0] * a[1] % p
        return (t0, t1)

    def mul_scalar(self, a, k: int):
        p = self.p
        return (a[0] * k % p, a[1] * k % p)

    def conj(self, a):
        return (a[0], (-a[1]) % self.p)

    def inv(self, a):
        p = self.p
        norm = (a[0] * a[0] + a[1] * a[1]) % p
        ninv = pow(norm, -1, p)
        return (a[0] * ninv % p, (-a[1]) * ninv % p)

    def pow(self, a, e: int):
        r = self.one
        b = a
        while e:
            if e & 1:
                r = self.mul(r, b)
            b = self.square(b)
            e >>= 1
        return r

    def is_zero(self, a):
        return a[0] == 0 and a[1] == 0

    def frobenius(self, a):
        """a^p = conj(a) since u^p = -u (p = 3 mod 4)."""
        return self.conj(a)


class Fq6:
    """Fq6 = Fq2[v]/(v^3 - xi)."""

    __slots__ = ("fq2", "xi", "zero", "one", "frob_c1", "frob_c2")

    def __init__(self, fq2: Fq2, xi):
        self.fq2 = fq2
        self.xi = xi
        self.zero = (fq2.zero, fq2.zero, fq2.zero)
        self.one = (fq2.one, fq2.zero, fq2.zero)
        # Frobenius coefficients: v^(p^k) = frob_c1[k] * v; (v^2)^(p^k) = frob_c2[k] v^2
        p = fq2.p
        self.frob_c1 = [fq2.pow(xi, (p**k - 1) // 3) for k in range(6)]
        self.frob_c2 = [fq2.pow(xi, (2 * (p**k - 1)) // 3) for k in range(6)]

    def mul_by_xi(self, a):
        return self.fq2.mul(a, self.xi)

    def add(self, a, b):
        f = self.fq2
        return (f.add(a[0], b[0]), f.add(a[1], b[1]), f.add(a[2], b[2]))

    def sub(self, a, b):
        f = self.fq2
        return (f.sub(a[0], b[0]), f.sub(a[1], b[1]), f.sub(a[2], b[2]))

    def neg(self, a):
        f = self.fq2
        return (f.neg(a[0]), f.neg(a[1]), f.neg(a[2]))

    def mul(self, a, b):
        # Toom/Karatsuba-style (CH-SQR3 variant), v^3 = xi
        f = self.fq2
        a0, a1, a2 = a
        b0, b1, b2 = b
        t0 = f.mul(a0, b0)
        t1 = f.mul(a1, b1)
        t2 = f.mul(a2, b2)
        c0 = f.add(t0, self.mul_by_xi(f.sub(f.mul(f.add(a1, a2), f.add(b1, b2)), f.add(t1, t2))))
        c1 = f.add(f.sub(f.mul(f.add(a0, a1), f.add(b0, b1)), f.add(t0, t1)), self.mul_by_xi(t2))
        c2 = f.add(f.sub(f.mul(f.add(a0, a2), f.add(b0, b2)), f.add(t0, t2)), t1)
        return (c0, c1, c2)

    def square(self, a):
        return self.mul(a, a)

    def mul_by_v(self, a):
        """Multiply by v: (a0, a1, a2) -> (xi*a2, a0, a1)."""
        return (self.mul_by_xi(a[2]), a[0], a[1])

    def mul_scalar_fq2(self, a, k):
        f = self.fq2
        return (f.mul(a[0], k), f.mul(a[1], k), f.mul(a[2], k))

    def inv(self, a):
        f = self.fq2
        a0, a1, a2 = a
        t0 = f.sub(f.square(a0), self.mul_by_xi(f.mul(a1, a2)))
        t1 = f.sub(self.mul_by_xi(f.square(a2)), f.mul(a0, a1))
        t2 = f.sub(f.square(a1), f.mul(a0, a2))
        norm = f.add(f.mul(a0, t0), self.mul_by_xi(f.add(f.mul(a2, t1), f.mul(a1, t2))))
        ninv = f.inv(norm)
        return (f.mul(t0, ninv), f.mul(t1, ninv), f.mul(t2, ninv))

    def frobenius(self, a, power: int = 1):
        f = self.fq2
        k = power % 6
        c0 = a[0]
        c1, c2 = a[1], a[2]
        for _ in range(k):
            c0 = f.frobenius(c0)
            c1 = f.frobenius(c1)
            c2 = f.frobenius(c2)
        return (c0, f.mul(c1, self.frob_c1[k]), f.mul(c2, self.frob_c2[k]))

    def is_zero(self, a):
        return all(self.fq2.is_zero(c) for c in a)


class Fq12:
    """Fq12 = Fq6[w]/(w^2 - v)."""

    __slots__ = ("fq6", "fq2", "zero", "one", "frob_c1")

    def __init__(self, fq6: Fq6):
        self.fq6 = fq6
        self.fq2 = fq6.fq2
        self.zero = (fq6.zero, fq6.zero)
        self.one = (fq6.one, fq6.zero)
        # w^(p^k) = frob_c1[k] * w  with frob_c1[k] = xi^((p^k - 1)/6) in Fq2
        p = self.fq2.p
        self.frob_c1 = [self.fq2.pow(fq6.xi, (p**k - 1) // 6) for k in range(12)]

    def add(self, a, b):
        s = self.fq6
        return (s.add(a[0], b[0]), s.add(a[1], b[1]))

    def sub(self, a, b):
        s = self.fq6
        return (s.sub(a[0], b[0]), s.sub(a[1], b[1]))

    def neg(self, a):
        s = self.fq6
        return (s.neg(a[0]), s.neg(a[1]))

    def mul(self, a, b):
        s = self.fq6
        t0 = s.mul(a[0], b[0])
        t1 = s.mul(a[1], b[1])
        c0 = s.add(t0, s.mul_by_v(t1))
        c1 = s.sub(s.mul(s.add(a[0], a[1]), s.add(b[0], b[1])), s.add(t0, t1))
        return (c0, c1)

    def square(self, a):
        # Complex squaring: c0 = (a0+a1)(a0+v*a1) - a0a1 - v*a0a1; c1 = 2a0a1
        s = self.fq6
        t = s.mul(a[0], a[1])
        c0 = s.sub(
            s.mul(s.add(a[0], a[1]), s.add(a[0], s.mul_by_v(a[1]))),
            s.add(t, s.mul_by_v(t)),
        )
        c1 = s.add(t, t)
        return (c0, c1)

    def inv(self, a):
        s = self.fq6
        norm = s.sub(s.square(a[0]), s.mul_by_v(s.square(a[1])))
        ninv = s.inv(norm)
        return (s.mul(a[0], ninv), s.neg(s.mul(a[1], ninv)))

    def conj(self, a):
        """Conjugation a0 - a1 w = a^(p^6); inverse for cyclotomic elements."""
        return (a[0], self.fq6.neg(a[1]))

    def pow(self, a, e: int):
        if e < 0:
            return self.pow(self.inv(a), -e)
        r = self.one
        b = a
        while e:
            if e & 1:
                r = self.mul(r, b)
            b = self.square(b)
            e >>= 1
        return r

    def frobenius(self, a, power: int = 1):
        k = power % 12
        s = self.fq6
        c0 = s.frobenius(a[0], k)
        c1 = s.frobenius(a[1], k)
        # scale c1's Fq2 coefficients by frob_c1[k]
        c1 = s.mul_scalar_fq2(c1, self.frob_c1[k])
        return (c0, c1)

    def is_one(self, a):
        return a[0] == self.fq6.one and self.fq6.is_zero(a[1])


def make_tower(curve: CurveParams):
    fq2 = Fq2(curve.fq.modulus)
    fq6 = Fq6(fq2, curve.xi)
    fq12 = Fq12(fq6)
    return fq2, fq6, fq12
