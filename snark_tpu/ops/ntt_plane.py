"""Radix-2 NTT on digit planes with fused Pallas butterfly kernels.

Replaces ark-poly's `Radix2EvaluationDomain` on the prover's hot path
(SURVEY.md §2.3): same root conventions as ops/ntt.py (group_gen =
two_adic_root^(2^(s-log n)), natural-order evaluations), bit-exact with
arkworks, but every butterfly stage is ONE fused Pallas pass over
(R8, n/2) wide-Montgomery digit planes (see pallas_field_v3).

Bit-reversal elimination: the h-polynomial pipeline pairs DIF (natural in,
bit-reversed out) inverse transforms with DIT (bit-reversed in, natural
out) forward transforms, so no permutation of point data ever happens on
device. The per-coefficient scale vectors (coset g^i, n^{-1}) are
pre-permuted on host, and the Groth16 h_query table is stored in
bit-reversed coefficient order (groth16.py setup).

Value ledger (units of p; every Montgomery mul clamps to <= 3.1p with the
folded +2p). Two different growth modes, bounded deterministically for
ANY domain size:

  * DIT: values grow LINEARLY, +~3.1p/stage (o0 = lo + t, o1 = lo - t
    + 4p with t a mul output <= 3.1p; the K=4 fold is always sufficient
    since t < 4p). Final values <= 3.1p·(log2(n) + 1).
  * DIF: the sum side o0 = lo + hi DOUBLES values every stage (no mul
    reduces it). Unbounded doubling underflows the K84 fold on the
    difference side — (lo - hi) + 84p wraps mod R once partial sums
    exceed 84p, silently adding +tw to the lane (the round-2 on-chip
    config-2 corruption: probabilistic at domains >= 2^14). Fix: every
    4th DIF stage runs the NORMALIZING butterfly (dif_norm), whose sum
    output is Montgomery-multiplied by one_mont (value(x·R)·1·R^{-1} ≡
    same element, value re-clamped <= 3.1p). Between norms values stay
    <= 2^3·3.1p = 24.8p, so |lo - hi| <= 24.8p << 84p, deterministically.
  * Hadamard (A·B - C): C arrives DIT-fresh with value <=
    3.1p·(log2(n)+1), which exceeds 84p for n >= 2^26 — its fold uses
    K192 (safe through n = 2^60).

Digit bounds follow pallas_curve.py's invariants (mul outputs [-1,256],
sums <= 512, subs <= |513|, all conv terms < 2^24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.host import Fp
from ..fields.params import FieldParams
from .pallas_field_v3 import F32, PlaneFieldV3, sweep3
from .plane_emu import use_real_interpret as _use_real_interpret

EXTRA_DIGITS = 2

_CARRY, _P2, _K4, _K84, _K192, _RMP = range(6)


def _bit_reverse_indices(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


class _Kernels:
    """Per-(field, tile) fused NTT kernels."""

    def __init__(self, params: FieldParams, tile: int, interpret: bool | None):
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        if interpret and not _use_real_interpret():
            # CPU: conv-based emu field (same values, tiny jaxprs) — the
            # run() wrappers below skip pallas_call entirely
            from .plane_emu import get_emu_field

            self.pf = pf = get_emu_field(params, EXTRA_DIGITS)
        else:
            self.pf = pf = PlaneFieldV3(params, EXTRA_DIGITS)
        R8 = pf.R8
        self.R8 = R8
        self.tile = tile
        p = params.modulus
        # (R8, 5) constant columns; all band "matmuls" are compile-time
        # scalar-digit convolutions (see pallas_field_v3.conv_const)
        cols = np.concatenate(
            [
                pf.CARRY_SCALE,
                pf.KP_COLS[2],
                pf.KP_COLS[4],
                pf.KP_COLS[84],
                pf.KP_COLS[192],
                pf.RMP_COL,
            ],
            axis=1,
        ).astype(np.float32)
        cols_c = jnp.asarray(cols)

        const_specs = [pl.BlockSpec((R8, 6), lambda i: (0, 0))]

        def build(kernel, n_in, n_out):
            if interpret and not _use_real_interpret():
                # CPU backend: full-width XLA emulation of the same body
                # (see ops/plane_emu.py)
                from .plane_emu import emu_call

                @jax.jit
                def run_emu(*arrs):
                    n = arrs[0].shape[-1]
                    outs = tuple(
                        jax.ShapeDtypeStruct((R8, n), F32)
                        for _ in range(n_out)
                    )
                    return emu_call(
                        kernel, n_in, outs, (2 * R8, n), [cols_c], list(arrs)
                    )

                return run_emu

            @jax.jit
            def run(*arrs):
                n = arrs[0].shape[-1]
                assert n % tile == 0, (n, tile)
                ds = pl.BlockSpec((R8, tile), lambda i: (0, i))
                return pl.pallas_call(
                    kernel,
                    out_shape=tuple(
                        jax.ShapeDtypeStruct((R8, n), F32)
                        for _ in range(n_out)
                    ),
                    grid=(n // tile,),
                    in_specs=const_specs + [ds] * n_in,
                    out_specs=tuple([pl.BlockSpec((R8, tile), lambda i: (0, i))] * n_out),
                    scratch_shapes=[pltpu.VMEM((2 * R8, tile), F32)],
                    interpret=interpret,
                )(cols_c, *arrs)

            return run

        def ctx(refs):
            cols = refs[0][...]
            t_ref = refs[-1]
            carry = cols[:, _CARRY : _CARRY + 1]
            p2 = cols[:, _P2 : _P2 + 1]
            k4 = cols[:, _K4 : _K4 + 1]
            k84 = cols[:, _K84 : _K84 + 1]
            k192 = cols[:, _K192 : _K192 + 1]

            def mul(a, b):
                return pf.mont_mul(a, b, t_ref, carry, plus_p=p2)

            return cols, t_ref, carry, p2, k4, k84, k192, mul

        # --- DIT butterfly: (lo, hi, tw) -> (lo + hi·tw, lo - hi·tw) ----
        def dit_kernel(*refs):
            *_, k4, _k84, _k192, mul = ctx(refs)
            lo, hi, tw = (r[...] for r in refs[1:4])
            o = refs[4:6]
            t = mul(hi, tw)
            o[0][...] = sweep3(lo + t)
            o[1][...] = sweep3((lo - t) + k4)

        self.dit = build(dit_kernel, 3, 2)

        # --- DIF butterfly: (lo, hi, tw) -> (lo + hi, (lo - hi)·tw) -----
        def dif_kernel(*refs):
            *_, _k4, k84, _k192, mul = ctx(refs)
            lo, hi, tw = (r[...] for r in refs[1:4])
            o = refs[4:6]
            o[0][...] = sweep3(lo + hi)
            o[1][...] = mul(sweep3((lo - hi) + k84), tw)

        self.dif = build(dif_kernel, 3, 2)

        # --- normalizing DIF butterfly: sum side re-clamped to <= 3.1p --
        # (value(lo + hi)·one_mont·R^{-1} ≡ lo + hi with value < 3.1p;
        # run every 4th stage so the doubling sum chain never exceeds
        # ~25p and the K84 difference fold stays sound for ANY n — see
        # the module value ledger)
        norm_d = pf.digits_list(pf.one_mont_val)

        def dif_norm_kernel(*refs):
            _cols, t_ref, carry, p2, _k4, k84, _k192, mul = ctx(refs)
            lo, hi, tw = (r[...] for r in refs[1:4])
            o = refs[4:6]
            o[1][...] = mul(sweep3((lo - hi) + k84), tw)
            o[0][...] = pf.mul_const(
                sweep3(lo + hi), norm_d, t_ref, carry, plus_p=p2
            )

        self.dif_norm = build(dif_norm_kernel, 3, 2)

        # --- vector Montgomery mul: (x, y) -> x·y ------------------------
        def vmul_kernel(*refs):
            *_, mul = ctx(refs)
            x, y = refs[1][...], refs[2][...]
            refs[3][...] = mul(x, y)

        self.vmul = build(vmul_kernel, 2, 1)

        # --- Hadamard + 1/Z_H: (a, b, c) -> (a·b - c)·zinv ---------------
        def make_hadamard(z_inv_mont: int):
            zd = pf.digits_list(z_inv_mont)

            def hadamard_kernel(*refs):
                _cols, t_ref, carry, p2, _k4, _k84, k192, mul = ctx(refs)
                a, b, c = (r[...] for r in refs[1:4])
                ab = mul(a, b)
                num = sweep3((ab - c) + k192)
                refs[4][...] = pf.mul_const(num, zd, t_ref, carry, plus_p=p2)

            return build(hadamard_kernel, 3, 1)

        self._hadamard_build = make_hadamard

        # --- re-Montgomery: std digit planes of v = x·R_old -> x·R' planes
        # (ingestion from the legacy narrow-R device field)
        c_remont = pf.r_eff * pf.r_eff % p * pow(params.r, -1, p) % p
        remont_d = pf.digits_list(c_remont)

        def remont_kernel(*refs):
            _cols, t_ref, carry, p2, _k4, _k84, _k192, mul = ctx(refs)
            x = refs[1][...]
            refs[2][...] = pf.mul_const(x, remont_d, t_ref, carry, plus_p=p2)

        self.remont = build(remont_kernel, 1, 1)

        # --- to-standard canonical: x (wide mont) -> canonical std digits
        one_d = pf.digits_list(1)

        def tostd_kernel2(*refs):
            cols, t_ref, carry, p2, _k4, _k84, _k192, mul = ctx(refs)
            rmp_col = cols[:, _RMP : _RMP + 1]
            x = refs[1][...]
            std = pf.mul_const(x, one_d, t_ref, carry, plus_p=p2)
            out = pf._strict(std)
            for _ in range(3):
                out = pf.cond_sub_p(out, rmp_col)
            refs[2][...] = out

        self.tostd = build(tostd_kernel2, 1, 1)


@functools.lru_cache(maxsize=None)
def get_ntt_kernels(
    params: FieldParams, tile: int = 512, interpret: bool | None = None
) -> _Kernels:
    return _Kernels(params, tile, interpret)


class PlaneNtt:
    """Precomputed plane transform for one (field, n).

    Twiddle/scale tables are stored as uint8 digit rows (canonical wide-
    Mont) and cast to f32 planes per stage — 4x less HBM than f32.
    """

    def __init__(
        self,
        params: FieldParams,
        n: int,
        tile: int = 512,
        interpret: bool | None = None,
    ):
        assert n & (n - 1) == 0 and n >= 2
        self.params = params
        self.n = n
        self.log_n = n.bit_length() - 1
        self.k = get_ntt_kernels(params, min(tile, n // 2), interpret)
        pf = self.k.pf
        self.pf = pf
        f = Fp(params)
        p = params.modulus
        omega = params.root_of_unity(n)
        omega_inv = pow(omega, -1, p)
        g = params.generator
        g_inv = pow(g, -1, p)
        n_inv = pow(n, -1, p)

        self.bitrev = _bit_reverse_indices(n)

        def stage_tables(w_root: int):
            tables = []
            for s in range(self.log_n):
                half = 1 << s
                w = pow(w_root, n >> (s + 1), p)
                vals, pw = [], 1
                for _ in range(half):
                    vals.append(pw)
                    pw = pw * w % p
                tables.append(
                    jnp.asarray(pf.pack_rows_u8_np(vals).T)  # (R8, half) u8
                )
            return tables

        self.fwd_tw = stage_tables(omega)
        self.inv_tw = stage_tables(omega_inv)

        # pre-permuted scale vectors (coefficient i sits at bitrev(i) after
        # a DIF inverse transform): scale = g^i·n^{-1}, unscale = g^{-i}·n^{-1}
        pows, ipows, x, y = [], [], n_inv, n_inv
        for _ in range(n):
            pows.append(x)
            ipows.append(y)
            x = x * g % p
            y = y * g_inv % p
        rev = self.bitrev
        self.coset_scale_rev = jnp.asarray(
            pf.pack_rows_u8_np([pows[rev[i]] for i in range(n)]).T
        )
        self.coset_unscale_rev = jnp.asarray(
            pf.pack_rows_u8_np([ipows[rev[i]] for i in range(n)]).T
        )
        # natural-order variants (public coset_fft/ifft API)
        self.coset_scale_nat = jnp.asarray(pf.pack_rows_u8_np(pows).T)
        self.coset_unscale_nat = jnp.asarray(pf.pack_rows_u8_np(ipows).T)

        z_coset = (pow(g, n, p) - 1) % p
        z_inv_mont = pow(z_coset, -1, p) * pf.r_eff % p
        self.hadamard = self.k._hadamard_build(z_inv_mont)
        self._h_jit = jax.jit(self._h_impl)
        self._fft_jit = jax.jit(functools.partial(self._fft_natural, inv=False))
        self._ifft_jit = jax.jit(functools.partial(self._fft_natural, inv=True))

    # ----- stage plumbing -------------------------------------------------
    def _stage_split(self, x, half):
        R8 = self.pf.R8
        n = self.n
        blocks = n // (2 * half)
        xr = x.reshape(R8, blocks, 2, half)
        lo = xr[:, :, 0, :].reshape(R8, n // 2)
        hi = xr[:, :, 1, :].reshape(R8, n // 2)
        return lo, hi

    def _stage_join(self, o0, o1, half):
        R8 = self.pf.R8
        n = self.n
        blocks = n // (2 * half)
        a = o0.reshape(R8, blocks, 1, half)
        b = o1.reshape(R8, blocks, 1, half)
        return jnp.concatenate([a, b], axis=2).reshape(R8, n)

    def _tw_full(self, table_u8, half):
        R8 = self.pf.R8
        tw = table_u8.astype(F32)  # (R8, half)
        blocks = self.n // (2 * half)
        return jnp.tile(tw, (1, blocks))  # block-major lanes match _stage_split

    def _dit(self, x, tables):
        """Bit-reversed input -> natural output."""
        for s in range(self.log_n):
            half = 1 << s
            lo, hi = self._stage_split(x, half)
            tw = self._tw_full(tables[s], half)
            o0, o1 = self.k.dit(lo, hi, tw)
            x = self._stage_join(o0, o1, half)
        return x

    def _dif(self, x, tables):
        """Natural input -> bit-reversed output.

        Every 4th stage runs the normalizing butterfly so the sum-side
        value doubling never outruns the K84 difference fold (see the
        module value ledger — this is load-bearing for correctness at
        domains >= 2^14, not an optimization)."""
        for j, s in enumerate(range(self.log_n - 1, -1, -1)):
            half = 1 << s
            lo, hi = self._stage_split(x, half)
            tw = self._tw_full(tables[s], half)
            kern = self.k.dif_norm if j % 4 == 3 else self.k.dif
            o0, o1 = kern(lo, hi, tw)
            x = self._stage_join(o0, o1, half)
        return x

    # ----- the Groth16 h pipeline (no bit-reversals) -----------------------
    def _h_impl(self, a_ev, b_ev, c_ev):
        """(R8, n) wide-mont natural-order domain evals -> h coefficients
        in BIT-REVERSED order (pair with a bit-rev-permuted h_query)."""
        scale = self.coset_scale_rev.astype(F32)
        unscale = self.coset_unscale_rev.astype(F32)

        def to_coset(x):
            x = self._dif(x, self.inv_tw)  # iNTT, bitrev coeffs (missing /n)
            x = self.k.vmul(x, scale)[0]  # · g^i/n at bitrev positions
            return self._dit(x, self.fwd_tw)  # coset evals, natural

        a_c = to_coset(a_ev)
        b_c = to_coset(b_ev)
        c_c = to_coset(c_ev)
        h_ev = self.hadamard(a_c, b_c, c_c)[0]
        h = self._dif(h_ev, self.inv_tw)
        return self.k.vmul(h, unscale)[0]  # h coeffs, bitrev order

    def h_from_evals(self, a_ev, b_ev, c_ev):
        return self._h_jit(a_ev, b_ev, c_ev)

    def to_std_canonical(self, x):
        """Wide-mont planes -> canonical standard-form digit planes."""
        return self.k.tostd(x)[0]

    # ----- natural-order API (tests / parity with ops/ntt.py) -------------
    def _fft_natural(self, x, inv: bool):
        rev = jnp.asarray(self.bitrev)
        x = jnp.take(x, rev, axis=1)
        x = self._dit(x, self.inv_tw if inv else self.fwd_tw)
        if inv:
            pf = self.pf
            n_inv_mont = pow(self.n, -1, self.params.modulus)
            col = jnp.asarray(pf.pack_rows_u8_np([n_inv_mont]).T).astype(F32)
            x = self.k.vmul(x, jnp.broadcast_to(col, x.shape))[0]
        return x

    def fft(self, x):
        return self._fft_jit(x)

    def ifft(self, x):
        return self._ifft_jit(x)


@functools.lru_cache(maxsize=None)
def get_plane_ntt(
    params: FieldParams, n: int, tile: int = 512, interpret: bool | None = None
) -> PlaneNtt:
    return PlaneNtt(params, n, tile, interpret)
