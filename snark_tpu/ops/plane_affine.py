"""Device-side projective->affine conversion + ProvingKey packing.

The setup fixed-base path (ops/fixed_base_plane.py) emits projective
wide-Mont digit planes; the ProvingKey needs two packings of the affine
points (SURVEY.md §2.3 "groth16" generator role):

  * (N, 2·K·R8+1) uint8 MSM row tables (pack_rows_u8_host layout), and
  * (N, 3, K·L) uint32 legacy-Montgomery query arrays (pack_affine_host
    layout, base-2^16 limbs, R_n = 2^(16·L)).

Round 3 did this on host: vectorized bigint unpack + Montgomery batch
inversion + per-int repacking — the declared residual (~600+ s) of the
1145 s config-3 setup (VERDICT r3 item 6). This module keeps the whole
tail on device:

  1. Z^-1 by a Montgomery batch-inversion product tree (~3 plane muls
     per lane: one pairing up-sweep, two expansion down-sweeps) with a
     SINGLE width-1 Fermat chain (z^(p-2), 4-bit windows) at the root —
     replacing the r4 per-lane Fermat (~317 plane muls per lane), which
     at 2^16-lane chunks moved ~16 GB of XLA scratch per chunk and was
     the dominant cost of the whole setup (measured 2.7 s/chunk warm at
     BLS12-381 2^18, vs ~0.1 s with the tree);
  2. x·Z^-1, y·Z^-1 (Fq or Karatsuba Fq2) in wide-Mont planes;
  3. exact canonicalization (PlaneFieldV3.to_canonical) -> u8 digits,
     byte-identical to pack_rows_u8_host;
  4. one const-mul by R_n·R_w^-1 converts wide-Mont to legacy-Mont, and
     digit pairs regroup into the u32 limb arrays.

All arithmetic is the plain-jnp form of the plane field ops (the same
bodies the Pallas kernels trace; EmuRef provides the scratch) — XLA
compiles them fine for both CPU tests and the TPU setup path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from .pallas_field_v3 import F32, sweep3
from .pallas_curve import EXTRA_DIGITS, get_plane_curve
from .plane_emu import EmuRef


def _vmul(pf, A, B, carry, p2):
    """Value-level wide-Mont multiply on (R8, N) planes (VPU-conv reduce).

    Inputs |digits| <= 724 (mul outputs / single sweeps qualify); output
    digits [-1, 256], value <= ~2.7p (the pallas_field_v3 envelope)."""
    t = EmuRef(jnp.zeros((2 * pf.R8,) + A.shape[1:], F32))
    pf.mul_acc(A, B, t)
    return pf.reduce(t[...], t, carry, plus_p=p2)


def _fermat_inv(pf, z, carry, p2):
    """z^(p-2) on (R8, N) planes — 4-bit windowed square-and-multiply.

    ~254 squares + ~63 table muls, rolled into a lax.scan over the
    exponent nibbles (compile stays ~20 traced muls, not 330); identity
    lanes (z = 0) map to 0 (0^(p-2) = 0), which downstream flags as
    identity."""
    p = pf.params.modulus
    e = p - 2
    nibbles = []
    while e:
        nibbles.append(e & 0xF)
        e >>= 4
    nibbles.reverse()  # most-significant first; top nibble is nonzero
    # stacked table[d-1] = z^d for d in 1..15
    powers = [z]
    for _ in range(14):
        powers.append(_vmul(pf, powers[-1], z, carry, p2))
    tblS = jnp.stack(powers)  # (15, R8, N)

    acc0 = powers[nibbles[0] - 1]
    nib_arr = jnp.asarray(nibbles[1:], dtype=jnp.int32)

    def body(acc, nib):
        for _ in range(4):
            acc = _vmul(pf, acc, acc, carry, p2)
        g = jax.lax.dynamic_index_in_dim(
            tblS, jnp.maximum(nib - 1, 0), 0, keepdims=False
        )
        m = _vmul(pf, acc, g, carry, p2)
        return jnp.where(nib > 0, m, acc), None

    acc, _ = jax.lax.scan(body, acc0, nib_arr)
    return acc


def _batch_inv_tree(pf, z, carry, p2):
    """Montgomery batch inversion of (R8, N) planes via a product tree.

    Up-sweep pairs lanes (node j of level k+1 = lane 2j · lane 2j+1 of
    level k), ONE Fermat chain inverts the width-1 root, and the
    down-sweep expands each node inverse to its children
    (inv_left = inv_parent · right, inv_right = inv_parent · left).
    ~3 plane muls per lane total vs ~317 for per-lane Fermat — the
    sequential part (the root chain) runs at width 1.

    Every lane must be nonzero mod p: callers select ONE_MONT into dead
    lanes first (the codec's identity flag covers this). Odd widths are
    padded with ONE_MONT. Digit bounds: inputs |digits| <= 724 (mul
    outputs / sweep3 results qualify), outputs are _vmul outputs.
    """
    R8 = pf.R8
    one = jnp.broadcast_to(jnp.asarray(pf.ONE_MONT_COL.astype(np.float32)), (R8, 1))
    levels = [z]
    x = z
    while x.shape[1] > 1:
        if x.shape[1] % 2:
            x = jnp.concatenate([x, one], axis=1)
            levels[-1] = x
        x = _vmul(pf, x[:, 0::2], x[:, 1::2], carry, p2)
        levels.append(x)
    inv = _fermat_inv(pf, x, carry, p2)  # (R8, 1)
    for lev in reversed(levels[:-1]):
        left, right = lev[:, 0::2], lev[:, 1::2]
        inv_l = _vmul(pf, inv, right, carry, p2)
        inv_r = _vmul(pf, inv, left, carry, p2)
        w = lev.shape[1]
        inv = jnp.stack([inv_l, inv_r], axis=2).reshape(R8, w)
    return inv[:, : z.shape[1]]


class PlaneAffineCodec:
    """Jitted projective-planes -> (u8 rows, u32 query) for one group."""

    def __init__(self, curve: CurveParams, group: str = "g1"):
        self.curve = curve
        self.group = group
        self.K = 1 if group == "g1" else 2
        self.pc = get_plane_curve(curve)
        # EmuPlaneField: bit-identical value-level ops with ~5x smaller
        # traced graphs than the RMW scratch formulation (conv = padded
        # shifts, reduce = f32 GEMM) — the codec's jaxpr was the dominant
        # trace/compile/cache-read cost of the whole setup (r5 profile:
        # ~100 s tracing + ~60 s cache read per fresh process at 2^17)
        from .plane_emu import get_emu_field

        self.pf = pf = get_emu_field(curve.fq, EXTRA_DIGITS)
        p = curve.fq.modulus
        self.carry = jnp.asarray(pf.CARRY_SCALE)
        self.p2 = jnp.asarray(pf.P2_COL)
        self.rmp = jnp.asarray(pf.RMP_COL)
        # R - k·p columns for the binary cond-sub chain: Fq2 mul outputs
        # reach ~10.2p (c1 = m2 - m0 - m1 + 7p envelope), beyond
        # to_canonical's 2-subtraction budget
        self.rmp_k = {
            k: jnp.asarray(pf._digits_col(pf.r_eff - k * p, pf.R8))
            for k in (1, 2, 4, 8)
        }
        self.kp4 = jnp.asarray(pf.KP_COLS[4])
        self.kp7 = jnp.asarray(pf.KP_COLS[7])
        # legacy-Mont conversion constant: PLAIN digits of R_n (not its
        # wide-Mont rep) — wide mont_mul(x·R_w, R_n) = x·R_n, i.e. the
        # literal value whose base-2^16 digits are the legacy limb array
        from ..fields import get_compute_field

        self.df = get_compute_field(curve.fq)
        r_n = self.df.params.r
        self.c_leg = jnp.asarray(
            pf.pack_np([r_n % p], mont=False)
        )  # (R8, 1) digits
        self.one_mont_u8 = jnp.asarray(
            pf.ONE_MONT_COL.astype(np.uint8)
        )  # (R8, 1) canonical digits of wide-Mont ONE
        one_leg = self.df.params.to_limbs(r_n % p)
        self.one_leg = jnp.asarray(np.asarray(one_leg, np.uint32))  # (L,)
        self._run = jax.jit(self._impl)
        # rows-only variant: large setups skip the legacy u32 query
        # arrays entirely (halves codec compute + host transfer)
        self._run_rows = jax.jit(lambda X, Y, Z: self._impl(X, Y, Z)[0])

    # -- Fq2 helpers (stacked (2R8, N) planes) ---------------------------
    def _mul2(self, a, b):
        pf, carry, p2 = self.pf, self.carry, self.p2
        R8 = pf.R8
        a0, a1 = a[:R8], a[R8:]
        b0, b1 = b[:R8], b[R8:]
        m0 = _vmul(pf, a0, b0, carry, p2)
        m1 = _vmul(pf, a1, b1, carry, p2)
        m2 = _vmul(pf, sweep3(a0 + a1), sweep3(b0 + b1), carry, p2)
        c0 = sweep3((m0 - m1) + self.kp4)
        c1 = sweep3((m2 - (m0 + m1)) + self.kp7)
        return jnp.concatenate([c0, c1], axis=0)

    def _inv(self, Z, flagf):
        """Coordinate-field inverse of (K·R8, N) planes via the batch
        tree. flagf (1, N) f32 marks live lanes; dead (identity) lanes
        get ONE substituted so the product tree stays invertible — their
        output is garbage-but-finite and every downstream consumer
        selects by the same flag."""
        pf, carry, p2 = self.pf, self.carry, self.p2
        R8 = pf.R8
        one = jnp.asarray(pf.ONE_MONT_COL.astype(np.float32))

        def live(x):
            return x * flagf + one * (1.0 - flagf)

        if self.K == 1:
            return _batch_inv_tree(pf, live(Z), carry, p2)
        z0, z1 = Z[:R8], Z[R8:]
        n0 = _vmul(pf, z0, z0, carry, p2)
        n1 = _vmul(pf, z1, z1, carry, p2)
        norm = sweep3(n0 + n1)
        ninv = _batch_inv_tree(pf, live(norm), carry, p2)
        i0 = _vmul(pf, z0, ninv, carry, p2)
        m1 = _vmul(pf, z1, ninv, carry, p2)
        # -m1: 4p - m1 keeps the value positive, digits in (-256, 512)
        i1 = sweep3(self.kp4 - m1)
        return jnp.concatenate([i0, i1], axis=0)

    def _canon(self, X):
        """Lazy planes (value < 17p) -> exact canonical digits [0, p),
        per component: strict digit normalization + binary conditional
        subtraction chain (8p, 4p, 2p, p, p)."""
        pf = self.pf
        R8 = pf.R8

        def canon1(a):
            z = pf._strict(a)
            for k in (8, 4, 2, 1, 1):
                z = pf.cond_sub_p(z, self.rmp_k[k])
            return z

        parts = [
            canon1(X[k * R8 : (k + 1) * R8]) for k in range(self.K)
        ]
        return jnp.concatenate(parts, axis=0)

    def _cmul(self, X, C):
        """Component-wise wide mont_mul by an Fq constant column."""
        pf, carry, p2 = self.pf, self.carry, self.p2
        R8 = pf.R8
        parts = [
            _vmul(pf, X[k * R8 : (k + 1) * R8], jnp.broadcast_to(C, (R8, 1)), carry, p2)
            for k in range(self.K)
        ]
        return jnp.concatenate(parts, axis=0)

    def _impl(self, X, Y, Z):
        """(K·R8, N) projective lazy planes -> (u8 rows (N, 2KR8+1),
        query digits u32 (N, 3, K·L))."""
        pf = self.pf
        R8 = pf.R8
        K = self.K
        L = self.df.L
        N = X.shape[1]
        mul = self._mul2 if K == 2 else (
            lambda a, b: _vmul(pf, a, b, self.carry, self.p2)
        )
        zc = self._canon(Z)
        flag = (jnp.max(jnp.abs(zc), axis=0) > 0).astype(jnp.uint8)  # (N,)
        flagf = flag.astype(F32)[None, :]
        zinv = self._inv(Z, flagf)
        xa = mul(X, zinv)
        ya = mul(Y, zinv)
        xc = self._canon(xa)
        yc = self._canon(ya)
        # identity rows: x = 0, y = ONE (wide-Mont), matching
        # pack_rows_u8_host's (0, 1) defaults
        one_wide = jnp.concatenate(
            [self.one_mont_u8.astype(F32)]
            + [jnp.zeros((R8, 1), F32)] * (K - 1),
            axis=0,
        )
        xc = xc * flagf
        yc = yc * flagf + one_wide * (1.0 - flagf)
        rows = jnp.concatenate(
            [
                xc.astype(jnp.uint8).T,
                yc.astype(jnp.uint8).T,
                flag[:, None],
            ],
            axis=1,
        )  # (N, 2·K·R8+1)

        # legacy-Mont u32 limb arrays: one const-mul to R_n form, then
        # canonical digit pairs -> base-2^16 limbs
        def legacy(Xw, ident_col):
            w = self._canon(self._cmul(Xw, self.c_leg[:, :1]))
            comps = []
            for k in range(K):
                d = w[k * R8 : (k + 1) * R8].astype(jnp.uint32)
                limbs = (d[0 : 2 * L : 2] + (d[1 : 2 * L : 2] << 8)).T  # (N, L)
                comps.append(limbs)
            v = jnp.concatenate(comps, axis=1)  # (N, K·L)
            iden = jnp.concatenate(
                [ident_col] + [jnp.zeros((L,), jnp.uint32)] * (K - 1)
            )[None, :]
            return jnp.where(flag[:, None] > 0, v, iden)

        zeros_l = jnp.zeros((K * L,), jnp.uint32)
        qx = legacy(xa, jnp.zeros((L,), jnp.uint32))
        qy = legacy(ya, self.one_leg)
        qz = jnp.where(
            flag[:, None] > 0,
            jnp.concatenate(
                [self.one_leg] + [jnp.zeros((L,), jnp.uint32)] * (K - 1)
            )[None, :],
            zeros_l[None, :],
        )
        query = jnp.stack([qx, qy, qz], axis=1)  # (N, 3, K·L)
        return rows, query

    def convert(self, X, Y, Z):
        """-> (np u8 rows, np u32 query) for one chunk of planes."""
        rows, query = self._run(X, Y, Z)
        return np.asarray(rows), np.asarray(query)

    def convert_async(self, X, Y, Z, want_query: bool = True):
        """Dispatch-only variant: returns device handles so callers can
        queue every chunk's work before the first blocking readback."""
        if want_query:
            return self._run(X, Y, Z)
        return self._run_rows(X, Y, Z), None


@functools.lru_cache(maxsize=None)
def get_plane_affine_codec(curve: CurveParams, group: str = "g1"):
    return PlaneAffineCodec(curve, group)
