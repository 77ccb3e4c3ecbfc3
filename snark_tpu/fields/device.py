"""Device (JAX) prime-field arithmetic: batched multi-limb Montgomery.

TPU-native replacement for ark-ff's Montgomery backend (SURVEY.md §2.3).
Representation: field elements are `(..., L)` uint32 arrays of little-endian
base-2^16 limbs (L = params.num_limbs), kept in **Montgomery form** (value
x·R mod p with R = 2^(16L)) and canonically reduced (< p, limbs < 2^16)
between ops.

Design notes (why this maps well to TPU):
  * All ops are elementwise over the batch — pure VPU work, no gathers.
  * Products of 16-bit limbs are exact in uint32; partial products are split
    into 16-bit halves *before* accumulation so column sums stay < 2^22.
  * Carry normalization is branch-free and log-depth: two shift-add sweeps
    bring digits to <= 2^16, then a Kogge-Stone carry-lookahead (on
    generate/propagate bits) resolves ripples in ceil(log2 L) steps — no
    data-dependent loops, everything jit/vmap/shard_map friendly.
  * Montgomery reduction is SOS (separated operand scanning): T = a·b,
    m = T_lo · n' mod R, t = (T + m·p) / R, one conditional subtract.

A Pallas kernel path (ops/pallas_field.py) fuses the same algorithm in VMEM
for the hot call sites; this module is the reference implementation and the
fallback on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .params import LIMB_BITS, LIMB_MASK, FieldParams

MASK = jnp.uint32(LIMB_MASK)


def _shift_limbs(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift limbs towards higher indices by k (zero fill), last axis.

    Single lax.pad (negative high padding drops the tail) — binds one
    primitive, keeping trace time down on the hot path."""
    if k == 0:
        return x
    cfg = [(0, 0, 0)] * (x.ndim - 1) + [(k, -k, 0)]
    return jax.lax.pad(x, jnp.uint32(0), cfg)


def _sweep(x: jnp.ndarray) -> jnp.ndarray:
    """One carry sweep: keep low 16 bits, push carries up one limb."""
    return (x & MASK) + _shift_limbs(x >> LIMB_BITS, 1)


def _kogge_stone_carry(d: jnp.ndarray) -> jnp.ndarray:
    """Resolve carries for digits d <= 2^16 via carry-lookahead.

    Returns normalized digits < 2^16. The carry out of the top limb is
    dropped (callers widen by one limb when they need it).
    """
    L = d.shape[-1]
    g = (d >> LIMB_BITS).astype(jnp.uint32)  # generate: digit == 2^16
    p = (d == MASK).astype(jnp.uint32)  # propagate: digit == 2^16 - 1
    shift = 1
    G, P = g, p
    while shift < L:
        Gs = _shift_limbs(G, shift)
        Ps = _shift_limbs(P, shift)
        G = G | (P & Gs)
        P = P & Ps
        shift <<= 1
    carry_in = _shift_limbs(G, 1)
    return (d + carry_in) & MASK


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Exact base-2^16 normalization for limbs < 2^22."""
    return _kogge_stone_carry(_sweep(_sweep(x)))


def _mul_wide(a: jnp.ndarray, b: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Lazy full product of limb vectors: (..., La) x (..., Lb) -> (..., out).

    All partial products at once: an (La, Lb) outer product per element
    (exact in uint32 for 16-bit limbs), split into 16-bit halves, then the
    antidiagonal sums are taken with the pad/flatten/reshape *shear* trick —
    row i of the padded product lands shifted by i columns, so a plain sum
    over rows yields the base-2^16 convolution. ~8 XLA ops total, no Python
    loops, fully fusable. Result limbs < La·2^17 <= 2^22 (not normalized).
    """
    if a.shape[:-1] != b.shape[:-1]:
        batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, batch + a.shape[-1:])
        b = jnp.broadcast_to(b, batch + b.shape[-1:])
    La = a.shape[-1]
    Lb = b.shape[-1]
    zero = jnp.uint32(0)
    P = a[..., :, None] * b[..., None, :]  # (..., La, Lb) exact in uint32
    lo = P & MASK
    hi = P >> LIMB_BITS
    # row i contributes lo at offset i and hi at offset i+1 -> width Lb+1
    nb = [(0, 0, 0)] * (P.ndim - 1)
    row = jax.lax.pad(lo, zero, nb + [(0, 1, 0)]) + jax.lax.pad(
        hi, zero, nb + [(1, 0, 0)]
    )
    canvas = La + Lb  # every shifted row fits in [0, canvas)
    row = jax.lax.pad(row, zero, nb + [(0, canvas - Lb, 0)])
    flat = row.reshape(row.shape[:-2] + (La * (canvas + 1),))
    sheared = flat[..., : La * canvas].reshape(row.shape[:-2] + (La, canvas))
    z = jnp.sum(sheared, axis=-2, dtype=jnp.uint32)
    if out_limbs <= canvas:
        return z[..., :out_limbs]
    return jax.lax.pad(z, zero, nb + [(0, out_limbs - canvas, 0)])


class DeviceField:
    """Batched Montgomery arithmetic over one prime field.

    Public ops (`add`, `sub`, `neg`, `double`, `mul`, `square`, `to_mont`,
    `from_mont`, `inv`) are jit-wrapped with persistent caches; the `_impl`
    variants are the raw traceable bodies for composition inside larger
    jitted programs (NTT, MSM, curve ops call those directly).
    """

    def __init__(self, params: FieldParams):
        self.params = params
        self.L = params.num_limbs
        p = params.modulus
        self.P = jnp.asarray(params.to_limbs(p), dtype=jnp.uint32)
        self.NP = jnp.asarray(params.to_limbs(params.n_prime), dtype=jnp.uint32)
        self.R2 = jnp.asarray(params.to_limbs(params.r2), dtype=jnp.uint32)
        # R - p, for the conditional subtraction trick
        self.R_MINUS_P = jnp.asarray(
            params.to_limbs(params.r - p), dtype=jnp.uint32
        )
        self.ZERO = jnp.zeros(self.L, dtype=jnp.uint32)
        self.ONE_MONT = jnp.asarray(
            params.to_limbs(params.r % p), dtype=jnp.uint32
        )
        self.ONE_STD = jnp.asarray(params.to_limbs(1), dtype=jnp.uint32)

        # jit-wrapped public entry points (persistent per-field caches).
        # The raw traceable bodies stay reachable as `<name>_impl` for
        # composition inside larger jitted programs.
        self._pow_cache: dict[int, object] = {}
        for name in (
            "add",
            "sub",
            "neg",
            "double",
            "mul",
            "square",
            "to_mont",
            "from_mont",
        ):
            impl = getattr(self, name)
            setattr(self, name + "_impl", impl)
            setattr(self, name, jax.jit(impl))

    # ----- constructors ------------------------------------------------
    def const(self, value: int, mont: bool = True) -> jnp.ndarray:
        """Embed a host int as a (L,) device constant."""
        p = self.params.modulus
        v = value % p
        if mont:
            v = v * self.params.r % p
        return jnp.asarray(self.params.to_limbs(v), dtype=jnp.uint32)

    def array(self, values, mont: bool = True) -> jnp.ndarray:
        """Embed a list of host ints as an (N, L) device array."""
        from .host import Fp

        f = Fp(self.params)
        if mont:
            return jnp.asarray(f.to_mont_limbs_array(values))
        return jnp.asarray(f.to_limbs_array(values))

    # ----- reduction helpers -------------------------------------------
    def _cond_sub_p(self, x: jnp.ndarray) -> jnp.ndarray:
        """x in [0, 2p) -> x mod p. Branch-free: t = x + (R - p); if that
        addition carries out of limb L (i.e. x >= p), take t else x."""
        ext = jnp.zeros(x.shape[:-1] + (1,), dtype=jnp.uint32)
        wide = jnp.concatenate([x, ext], axis=-1)
        t = _normalize(wide + jnp.pad(self.R_MINUS_P, (0, 1)))
        ge_p = t[..., -1:] > 0
        return jnp.where(ge_p, t[..., :-1], x)

    # ----- ring ops ----------------------------------------------------
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        s = _normalize_addition(a + b)
        return self._cond_sub_p(s)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        # a - b = a + (R-1 - b) + 1 (mod R); add p back on borrow.
        L = a.shape[-1]
        not_b = MASK - b
        ext = jnp.zeros(a.shape[:-1] + (1,), dtype=jnp.uint32)
        wide = jnp.concatenate([a + not_b, ext], axis=-1)
        one = jnp.zeros((L + 1,), dtype=jnp.uint32).at[0].set(1)
        u = _normalize(wide + one)
        carry = u[..., -1:] > 0  # carry out => a >= b
        diff = u[..., :-1]
        wrapped = _normalize_addition(diff + self.P)  # drop carry: adds p mod R
        return jnp.where(carry, diff, wrapped)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        z = jnp.zeros_like(a)
        return self.sub(z, a)

    def double(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product: a·b·R^{-1} mod p."""
        L = self.L
        if a.shape != b.shape:
            a, b = jnp.broadcast_arrays(a, b)
        t = _normalize(_mul_wide(a, b, 2 * L))  # full product, exact
        m = _normalize(_mul_wide(t[..., :L], self.NP, L))  # low half only
        mp = _normalize(_mul_wide(m, self.P, 2 * L))
        # s = t + m*p; low L limbs are 0 by construction; result = s >> 16L
        ext = jnp.zeros(t.shape[:-1] + (1,), dtype=jnp.uint32)
        s = _normalize(jnp.concatenate([t + mp, ext], axis=-1))
        hi = s[..., L : 2 * L + 1]
        # hi < 2p and fits L+1 limbs; fold the top carry then subtract p
        res = self._cond_sub_p_wide(hi)
        return res

    def _cond_sub_p_wide(self, x: jnp.ndarray) -> jnp.ndarray:
        """x (L+1 limbs) in [0, 2p) -> canonical L limbs."""
        t = _normalize(x + jnp.pad(self.R_MINUS_P, (0, 1)))
        ge_p = t[..., -1:] > 0
        return jnp.where(ge_p, t[..., :-1], x[..., :-1])

    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    def mul_const(self, a: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        """Multiply by a precomputed Montgomery-form (L,) constant."""
        return self.mul(a, c)

    # ----- Montgomery domain conversion --------------------------------
    def to_mont(self, a_std: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a_std, self.R2)

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, self.ONE_STD)

    # ----- host / MSM codecs -------------------------------------------
    def to_host_ints(self, arr, mont: bool = True) -> list[int]:
        """(..., L) device array -> canonical host ints."""
        from .host import Fp

        f = Fp(self.params)
        a = np.asarray(arr)
        return (
            f.from_mont_limbs_array(a) if mont else f.from_limbs_array(a)
        )

    def window_digits(self, std_arr: jnp.ndarray, c: int, num_bits: int):
        """Device windowed-digit extraction from standard-form limbs.

        (N, L) uint32 16-bit limbs -> (N, W) uint32 digits; needs c | 16.
        """
        assert 16 % c == 0
        per = 16 // c
        n = std_arr.shape[0]
        mask = jnp.uint32((1 << c) - 1)
        parts = [(std_arr >> (c * k)) & mask for k in range(per)]
        digits = jnp.stack(parts, axis=-1).reshape(n, self.L * per)
        W = -(-num_bits // c)
        return digits[:, :W]

    # ----- predicates / select -----------------------------------------
    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        """(...,) bool."""
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    def select(self, mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
        """mask (...,) bool -> where(mask, a, b) broadcast over limbs."""
        return jnp.where(mask[..., None], a, b)

    # ----- exponentiation / inversion ----------------------------------
    def pow_const(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a host-known exponent (jitted, cached per exponent)."""
        fn = self._pow_cache.get(e)
        if fn is None:
            fn = jax.jit(functools.partial(self._pow_impl, e=e))
            self._pow_cache[e] = fn
        return fn(a)

    def _pow_impl(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """Left-to-right ladder; small exponents unroll, large ones run a
        fori_loop over a baked bit array so the Montgomery multiply is
        traced once, not bits-many times."""
        if e == 0:
            return jnp.broadcast_to(self.ONE_MONT, a.shape)
        bits = bin(e)[2:]
        if len(bits) <= 16:
            r = a
            for bit in bits[1:]:
                r = self.mul(r, r)
                if bit == "1":
                    r = self.mul(r, a)
            return r
        bit_arr = jnp.asarray([int(b) for b in bits], dtype=jnp.uint32)

        def body(i, r):
            r = self.mul(r, r)
            r2 = self.mul(r, a)
            return jnp.where(bit_arr[i] > 0, r2, r)

        return jax.lax.fori_loop(1, len(bits), body, a)

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Batch inversion via Fermat: a^(p-2). inv(0) = 0."""
        return self.pow_const(a, self.params.modulus - 2)


def _normalize_addition(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize limbs after a plain addition (limbs < 2^17), dropping any
    carry out of the top limb (i.e. reduce mod R)."""
    return _kogge_stone_carry(_sweep(x))


@functools.lru_cache(maxsize=None)
def get_device_field(params: FieldParams) -> DeviceField:
    return DeviceField(params)
