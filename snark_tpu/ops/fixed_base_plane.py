"""Fixed-base MSM on the fused-Pallas plane kernels (setup-time path).

Computes [s_i]·G for a fixed generator G over N scalars — the Groth16
setup workload (five query vectors per key; ark-groth16's generator.rs
uses `FixedBase::msm` from ark-ec, SURVEY.md §2.3 "ark-ec"). The legacy
u32 path (ops/msm.py FixedBasePlan) materializes (6, N, L, L) limb
products per add and runs ~10 min per 2^20-scalar query; this path runs
the same windowed-table algorithm through the fused mixed-add row kernel
(ops/pallas_curve.py) at the plane MSM's per-add cost: one u8 row gather
+ one in-VMEM complete add per (lane, window), ~2-3 s per 2^20 query.

Algorithm: precompute table[w][d] = d·2^{cw}·G for W = ceil(bits/c)
windows of 2^c entries (host, one-time per curve/group, cached). Then
[s]G = Σ_w table[w][digit_w(s)] — W gathered mixed adds per scalar, no
doublings, all N lanes in parallel. d = 0 rows are identity-flagged so
the kernel's flag-fold skips them (no mask bookkeeping).

Output is converted host-side via one vectorized lazy-digit unpack
(numpy object Horner) + Montgomery batch inversion to affine ints, the
form both ProvingKey products need (u32 query arrays via
pack_affine_host, u8 MSM row tables via pack_rows_u8_host).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from ..fields.host import Fp
from .pallas_field_v3 import F32
from .pallas_curve import (
    batch_to_affine_host,
    get_plane_curve,
    make_masked_mixed_add_rows,
    pack_rows_u8_host,
    rows_pad_width,
)
from .curve_host import host_g1, host_g2
from .msm import scalars_to_digits


def unpack_ints_np(pf, planes, mont: bool = True) -> list[int]:
    """(R8, N) lazy digit planes -> python ints mod p, vectorized.

    Same semantics as PlaneFieldV3.unpack_np but ~50x faster at N = 2^20:
    pairs of int64 digits are first combined into base-2^16 superdigits
    with numpy, then a Horner fold over numpy object arrays does
    ceil(R8/2) vectorized bigint steps instead of N·R8 Python-loop steps.
    """
    d = np.asarray(planes, dtype=np.int64)
    R8, N = d.shape
    if R8 % 2:
        d = np.concatenate([d, np.zeros((1, N), np.int64)], axis=0)
    sup = (d[0::2] + (d[1::2] << 8)).astype(object)  # (ceil(R8/2), N) base 2^16
    val = sup[-1]
    for i in range(sup.shape[0] - 2, -1, -1):
        val = val * 65536 + sup[i]
    p = pf.params.modulus
    rinv = pow(pf.r_eff, -1, p) if mont else 1
    return [int(v) * rinv % p for v in val]


class PlaneFixedBase:
    """Jitted fixed-base executor for one (curve, group, c, chunk)."""

    def __init__(
        self,
        curve: CurveParams,
        group: str = "g1",
        c: int = 8,
        chunk: int = 1 << 16,
        tile: int = 256,
        interpret: bool | None = None,
    ):
        assert c == 8, "table rows are byte-indexed"
        self.curve = curve
        self.group = group
        self.c = c
        self.chunk = chunk
        self.pc = get_plane_curve(curve)
        self.K = 1 if group == "g1" else 2
        self.num_bits = curve.fr.num_bits
        self.W = -(-self.num_bits // c)
        self.rows_w = rows_pad_width(curve, group)
        self.madd = make_masked_mixed_add_rows(
            curve, tile, interpret, group=group, k_steps=1
        )
        self._table = None
        self._run = jax.jit(self._impl)

    # -- host table (one-time per curve/group, generator-fixed) -----------
    def table(self) -> jnp.ndarray:
        if self._table is None:
            hc = host_g1(self.curve) if self.group == "g1" else host_g2(self.curve)
            rows = []
            g = hc.generator
            for _ in range(self.W):
                row = [None]
                acc = None
                for _ in range((1 << self.c) - 1):
                    acc = hc.add(acc, g)
                    row.append(acc)
                rows.append(pack_rows_u8_host(self.pc, row, self.group))
                for _ in range(self.c):
                    g = hc.double(g)
            tbl = np.concatenate(rows, axis=0)  # (W·256, 2·K·R8+1)
            tbl = np.pad(tbl, ((0, 0), (0, self.rows_w - tbl.shape[1])))
            self._table = jnp.asarray(tbl)
        return self._table

    # -- device core ------------------------------------------------------
    def _impl(self, table, digits):
        """table (W·256, rows_w) u8; digits (chunk, W) uint32 ->
        (X, Y, Z) (K·R8, chunk) lazy wide-Mont planes."""
        n = digits.shape[0]
        pf = self.pc.pf
        KR = self.K * pf.R8
        one = np.concatenate(
            [pf.ONE_MONT_COL] + [np.zeros_like(pf.ONE_MONT_COL)] * (self.K - 1),
            axis=0,
        )
        acc0 = (
            jnp.zeros((KR, n), F32),
            jnp.broadcast_to(jnp.asarray(one), (KR, n)),
            jnp.zeros((KR, n), F32),
        )
        # (2, n): add mask ‖ sign plane (no negation in the fixed-base walk)
        ones_mask = jnp.concatenate(
            [jnp.ones((1, n), F32), jnp.zeros((1, n), F32)], axis=0
        )

        def body(w, acc3):
            idx = jnp.take(digits, w, axis=1).astype(jnp.int32) + w * 256
            rows = jnp.take(table, idx, axis=0)
            return self.madd(*acc3, rows, ones_mask)

        return jax.lax.fori_loop(0, self.W, body, acc0)

    def _digits_padded(self, scalars):
        """scalars: list of host ints OR an (N, L) uint32 standard-form
        limbs array (the device-QAP setup path hands limbs straight
        through — no Python-int round trip at 2^20+)."""
        n = len(scalars)
        chunk = self.chunk
        n_pad = -(-max(n, 1) // chunk) * chunk
        if isinstance(scalars, np.ndarray):
            limbs = np.zeros((n_pad, scalars.shape[1]), scalars.dtype)
            limbs[:n] = scalars
        else:
            fr = Fp(self.curve.fr)
            limbs = fr.to_limbs_array(list(scalars) + [0] * (n_pad - n))
        return scalars_to_digits(limbs, self.c, self.num_bits), n, n_pad

    # -- public API -------------------------------------------------------
    def affine(self, scalars: list[int]):
        """[s_i]·G for all scalars -> host affine list (None = identity)."""
        digits, n, n_pad = self._digits_padded(scalars)
        chunk = self.chunk
        tbl = self.table()
        outs = []
        for i in range(0, n_pad, chunk):
            X, Y, Z = self._run(tbl, jnp.asarray(digits[i : i + chunk]))
            outs.append((np.asarray(X), np.asarray(Y), np.asarray(Z)))
        X = np.concatenate([o[0] for o in outs], axis=1)[:, :n]
        Y = np.concatenate([o[1] for o in outs], axis=1)[:, :n]
        Z = np.concatenate([o[2] for o in outs], axis=1)[:, :n]
        pf = self.pc.pf
        R8 = pf.R8
        if self.group == "g1":
            xs = unpack_ints_np(pf, X)
            ys = unpack_ints_np(pf, Y)
            zs = unpack_ints_np(pf, Z)
        else:
            xs = list(zip(unpack_ints_np(pf, X[:R8]), unpack_ints_np(pf, X[R8:])))
            ys = list(zip(unpack_ints_np(pf, Y[:R8]), unpack_ints_np(pf, Y[R8:])))
            zs = list(zip(unpack_ints_np(pf, Z[:R8]), unpack_ints_np(pf, Z[R8:])))
        return batch_to_affine_host(self.curve, xs, ys, zs, self.group)

    def rows_and_query(self, scalars, want_query: bool = True):
        """[s_i]·G -> (np u8 MSM row table (N, 2·K·R8+1), np u32
        legacy-Mont query (N, 3, K·L) or None) with the whole affine
        conversion + packing ON DEVICE (ops/plane_affine.py): Fermat
        Z-inverse, canonical digit packing, legacy limb regroup.
        Byte-identical to pack_rows_u8_host/pack_affine_host over the
        host affine list (tests/test_plane_affine.py).

        All chunks are DISPATCHED before the first blocking readback so
        chunk k+1's device work overlaps chunk k's host transfer;
        want_query=False skips the legacy u32 arrays (large setups)."""
        from .plane_affine import get_plane_affine_codec

        codec = get_plane_affine_codec(self.curve, self.group)
        digits, n, n_pad = self._digits_padded(scalars)
        chunk = self.chunk
        tbl = self.table()
        handles = []
        for i in range(0, n_pad, chunk):
            X, Y, Z = self._run(tbl, jnp.asarray(digits[i : i + chunk]))
            handles.append(codec.convert_async(X, Y, Z, want_query))
        rows_out = [np.asarray(h[0]) for h in handles]
        rows = np.concatenate(rows_out, axis=0)[:n]
        if not want_query:
            return rows, None
        q_out = [np.asarray(h[1]) for h in handles]
        return rows, np.concatenate(q_out, axis=0)[:n]


_PLANS: dict = {}


def get_plane_fixed_base(
    curve: CurveParams, group: str = "g1", chunk: int = 1 << 16
) -> PlaneFixedBase:
    key = (curve.name, group, chunk)
    plan = _PLANS.get(key)
    if plan is None:
        plan = PlaneFixedBase(curve, group, chunk=chunk)
        _PLANS[key] = plan
    return plan
