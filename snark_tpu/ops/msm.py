"""Pippenger multi-scalar multiplication on device.

TPU-native replacement for ark-ec's `VariableBaseMSM` (SURVEY.md §2.3, §7
stage 4c). GPU MSMs scatter points into buckets; scatters are the worst op
on TPU, so the bucket phase is recast as *sort + bucket-parallel serial
scan* (SURVEY.md §7 "recast as sort-by-bucket + segmented scan"):

  1. per window: sort point indices by digit (XLA sort — efficient on TPU);
  2. each bucket's points are now contiguous; `searchsorted` finds bucket
     boundaries;
  3. a while-loop walks the buckets **in parallel** (one lane per bucket,
     2^c lanes), accumulating one point per lane per step with the complete
     addition formula — total work N adds per window, no scatter, and the
     loop body is traced once (small XLA graph);
  4. bucket reduction Σ b·B_b via a stride-doubling suffix scan (c steps) +
     a stride-doubling total sum (c steps), both fixed-shape fori_loops;
  5. windows combine with c doublings per window (Horner).

Zero digits are skipped (bucket 0 length is forced to 0), so sparse scalar
vectors cost nothing in the scan phase.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .curve import _CurveOpsBase


def pick_window(n: int) -> int:
    """Pippenger window size: ~log2(n) - 6, clamped to [4, 16].

    SNARK_TPU_MSM_WINDOW caps the choice (some large window shapes
    currently fault the axon TPU worker; see ROADMAP.md)."""
    import os

    if n <= 32:
        c = 4
    else:
        c = int(max(4, min(16, math.floor(math.log2(n)) - 6)))
    cap = int(os.environ.get("SNARK_TPU_MSM_WINDOW", "0"))
    if cap:
        c = min(c, cap)
    return c


def scalars_to_digits(scalars: np.ndarray, c: int, num_bits: int) -> np.ndarray:
    """(N, L) uint16-limb scalars -> (N, W) uint32 window digits (host).

    `scalars` is the standard-form little-endian 16-bit-limb array (uint32
    lanes); W = ceil(num_bits / c).
    """
    arr = np.asarray(scalars, dtype=np.uint32)
    n, L = arr.shape
    # bits, little-endian within the full scalar
    bytes_le = arr.astype("<u2").view(np.uint8).reshape(n, 2 * L)
    bits = np.unpackbits(bytes_le, axis=1, bitorder="little")  # (N, 16L)
    W = -(-num_bits // c)
    digits = np.zeros((n, W), dtype=np.uint32)
    for w in range(W):
        seg = bits[:, w * c : min((w + 1) * c, bits.shape[1])]
        weights = (1 << np.arange(seg.shape[1], dtype=np.uint32)).astype(np.uint32)
        digits[:, w] = seg @ weights
    return digits


def scalars_to_digits_signed(
    scalars: np.ndarray, c: int, num_bits: int
) -> np.ndarray:
    """(N, L) uint16-limb scalars -> (N, W) int32 balanced window digits.

    Balanced (signed) Pippenger decomposition: every window except the last
    is balanced into (-2^(c-1), 2^(c-1)] by borrowing from the next window,
    so |digit| <= 2^(c-1) and the bucket space halves vs unsigned digits
    (ark-ec's VariableBaseMSM uses the same trick). The last window absorbs
    the final carry and stays non-negative; if the top unsigned window
    already spans the full c bits, an extra carry window is appended (its
    digit is 0/1). Zero digits stay zero.
    """
    d = np.asarray(scalars_to_digits(scalars, c, num_bits), dtype=np.int64)
    n, w_u = d.shape
    b_top = num_bits - (w_u - 1) * c
    if b_top >= c:
        d = np.concatenate([d, np.zeros((n, 1), np.int64)], axis=1)
    W = d.shape[1]
    half = 1 << (c - 1)
    carry = np.zeros(n, np.int64)
    for w in range(W - 1):
        v = d[:, w] + carry
        carry = (v > half).astype(np.int64)
        d[:, w] = v - (carry << c)
    d[:, W - 1] += carry
    return d.astype(np.int32)


def digits_from_limbs_device(limbs: jnp.ndarray, c: int, num_bits: int) -> jnp.ndarray:
    """Device-side window-digit extraction for c dividing 16.

    limbs (N, L) uint32 standard-form 16-bit limbs -> (N, W) uint32 digits.
    Keeps the whole prove pipeline on device (no host round trip between
    the NTT stage and the MSM stage).
    """
    assert 16 % c == 0, "device digit extraction needs c | 16"
    per = 16 // c
    n, L = limbs.shape
    mask = jnp.uint32((1 << c) - 1)
    parts = [(limbs >> (c * k)) & mask for k in range(per)]  # each (N, L)
    digits = jnp.stack(parts, axis=-1).reshape(n, L * per)  # (N, W_full)
    W = -(-num_bits // c)
    return digits[:, :W]


def signed_digits_from_u8_planes(
    planes, c: int, num_bits: int
):
    """Device-side balanced window extraction from base-256 digit planes.

    planes (R8, N) f32/int canonical u8 digits (standard form, value < p,
    any row order) -> (N, W) int32 balanced digits, bit-identical to
    scalars_to_digits_signed on the same values. This is the prover's h
    path: the plane NTT emits h as canonical u8 digit planes, and signed
    c-bit digits (c=13: 20 windows vs 32 at unsigned c=8) come straight
    off the planes without a host round trip.
    """
    d = jnp.asarray(planes).astype(jnp.int32)  # (R8, N)
    R8 = d.shape[0]
    w_u = -(-num_bits // c)
    b_top = num_bits - (w_u - 1) * c
    W = w_u + 1 if b_top >= c else w_u
    mask = jnp.int32((1 << c) - 1)
    rows = []
    for j in range(w_u):
        a, r = divmod(c * j, 8)
        acc = d[a] >> r
        bits = 8 - r
        k = 1
        while bits < c and a + k < R8:
            acc = acc | (d[a + k] << bits)
            bits += 8
            k += 1
        rows.append(acc & mask)
    if W > w_u:
        rows.append(jnp.zeros_like(rows[0]))
    # balance: borrow from the next window so |digit| <= 2^(c-1); the
    # last window absorbs the final carry (mirrors scalars_to_digits_signed)
    half = jnp.int32(1 << (c - 1))
    carry = jnp.zeros_like(rows[0])
    out = []
    for j in range(W - 1):
        v = rows[j] + carry
        carry = (v > half).astype(jnp.int32)
        out.append(v - (carry << c))
    out.append(rows[W - 1] + carry)
    return jnp.stack(out, axis=1)  # (N, W) int32


class MsmPlan:
    """Jitted MSM executor for one (curve-ops, c) pair.

    All W windows are processed together (batched sort, batched bucket scan,
    batched reduction); the only sequential tail is the unavoidable
    ~num_bits Horner doubling chain that combines window sums.
    """

    def __init__(self, ops: _CurveOpsBase, c: int, window_chunk: int | None = None):
        self.ops = ops
        self.c = c
        # cap peak memory: the sorted-points gather materializes
        # (window_chunk, N, 3, K) at once
        self.window_chunk = window_chunk
        self._run = jax.jit(self._msm_impl)
        self._sums_run = jax.jit(self._sums_impl)

    def _window_sums(self, points, digits_t):
        """points (N, 3, K); digits_t (W, N) -> per-window sums (W, 3, K)."""
        ops = self.ops
        c = self.c
        nb = 1 << c
        W, n = digits_t.shape

        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32), (W, n))
        d_sorted, perm = jax.lax.sort_key_val(digits_t, iota, dimension=-1)
        pts_sorted = jnp.take(points, perm, axis=0)  # (W, N, 3, K)

        # bucket boundaries per window
        targets = jnp.broadcast_to(jnp.arange(nb + 1, dtype=jnp.uint32), (W, nb + 1))
        boundaries = jax.vmap(jnp.searchsorted)(d_sorted, targets)  # (W, nb+1)
        start = boundaries[:, :-1]
        length = boundaries[:, 1:] - start
        length = length.at[:, 0].set(0)  # bucket 0 contributes nothing
        max_len = jnp.max(length)

        # seed the carry from the (possibly shard_map-varying) operand so the
        # while carry's varying-manual-axes match the body output
        buckets0 = ops.identity_like((W, nb)) + pts_sorted[:, :1] * 0

        def cond(state):
            i, _ = state
            return i < max_len

        def body(state):
            i, acc = state
            idx = jnp.minimum(start + i, n - 1)  # (W, nb)
            gathered = jnp.take_along_axis(
                pts_sorted, idx[:, :, None, None], axis=1
            )  # (W, nb, 3, K)
            summed = ops.add_impl(acc, gathered)
            acc = ops.select(i < length, summed, acc)
            return i + 1, acc

        _, buckets = jax.lax.while_loop(cond, body, (jnp.uint32(0), buckets0))

        # Σ_b b·B_b per window: suffix scan then total, stride-doubling,
        # batched over windows. (Σ_{b>=1} S_b with S_b = Σ_{j>=b} B_j.)
        def scan_step(s, acc):
            stride = (jnp.int32(1) << s).astype(jnp.int32)
            shifted = jnp.roll(acc, -stride, axis=1)
            valid = jnp.arange(nb, dtype=jnp.int32) + stride < nb
            summed = ops.add_impl(acc, shifted)
            return ops.select(jnp.broadcast_to(valid, (W, nb)), summed, acc)

        suffix = jax.lax.fori_loop(0, c, scan_step, buckets)
        suffix = suffix.at[:, 0].set(
            jnp.broadcast_to(ops.IDENTITY, (W, 3, ops.K))
        )
        totals = jax.lax.fori_loop(0, c, scan_step, suffix)[:, 0]  # (W, 3, K)
        return totals

    def _sums_impl(self, points, digits):
        """points (N, 3, K); digits (N, W) -> per-window sums (W, 3, K)."""
        W = digits.shape[1]
        wc = self.window_chunk or W
        if wc >= W:
            return self._window_sums(points, digits.T)
        dt = digits.T
        parts = [
            self._window_sums(points, dt[i : i + wc]) for i in range(0, W, wc)
        ]
        return jnp.concatenate(parts, axis=0)

    def window_sums(self, points, digits):
        return self._sums_run(points, digits)

    def _msm_impl(self, points, digits):
        """points (N, 3, K); digits (N, W) uint32 -> (3, K) point."""
        ops = self.ops
        c = self.c
        W = digits.shape[1]
        sums = self._sums_impl(points, digits)

        # Horner over windows, most significant first
        def window_body(w, acc):
            def dbl(_, a):
                return ops.double_impl(a)

            acc = jax.lax.fori_loop(0, c, dbl, acc)
            return ops.add_impl(acc, sums[W - 1 - w])

        acc0 = ops.IDENTITY + sums[0] * 0  # match shard_map varying axes
        return jax.lax.fori_loop(0, W, window_body, acc0)

    def __call__(self, points: jnp.ndarray, digits: jnp.ndarray) -> jnp.ndarray:
        return self._run(points, digits)


_PLANS: dict = {}


def get_msm_plan(
    ops: _CurveOpsBase, c: int, window_chunk: int | None = None
) -> MsmPlan:
    key = (id(ops), c, window_chunk)
    plan = _PLANS.get(key)
    if plan is None:
        plan = MsmPlan(ops, c, window_chunk)
        _PLANS[key] = plan
    return plan


def memory_aware_window_chunk(n: int, k_limbs: int, budget_bytes: float = 1.2e9):
    """Cap the (wc, N, 3, K) sorted-points gather at ~budget_bytes.

    Budget chosen empirically: a 1.6 GB gather compiles and runs on the v5e
    tunnel; a 3.2 GB one crashes the remote compile helper."""
    per_window = n * 3 * k_limbs * 4
    return max(1, int(budget_bytes // max(per_window, 1)))


def _pad_inputs(ops, points, digits):
    n = points.shape[0]
    n_pad = 1 << max(2, (n - 1).bit_length())
    if n_pad != n:
        points = jnp.concatenate(
            [points, ops.identity_like((n_pad - n,))], axis=0
        )
        digits = (
            np.pad(np.asarray(digits), ((0, n_pad - n), (0, 0)))
            if isinstance(digits, np.ndarray)
            else jnp.pad(digits, ((0, n_pad - n), (0, 0)))
        )
    return points, jnp.asarray(digits), n_pad


def msm_host_combine(
    ops: _CurveOpsBase,
    host_curve,
    points: jnp.ndarray,
    digits,
    c: int,
):
    """MSM with the Horner window combine on host -> host affine point.

    The device computes per-window bucket sums (the O(N·W) work); the
    ~num_bits sequential doubling tail — pure latency on a batch-1 device
    op — runs as ~254 host point doubles on the W affine window sums.
    """
    points, digits, n_pad = _pad_inputs(ops, points, digits)
    wc = memory_aware_window_chunk(n_pad, points.shape[-1])
    W = digits.shape[1]
    if wc >= W:
        wc = None
    plan = get_msm_plan(ops, c, wc)
    sums = plan.window_sums(points, digits)  # (W, 3, K)
    affs = ops.to_affine_host(sums)
    acc = None
    for w in range(W - 1, -1, -1):
        for _ in range(c):
            acc = host_curve.double(acc)
        acc = host_curve.add(acc, affs[w])
    return acc


def msm_device_digits(
    ops: _CurveOpsBase, points: jnp.ndarray, digits: jnp.ndarray, c: int
) -> jnp.ndarray:
    """MSM where the window digits are already on device (N, W) uint32.

    Same power-of-two padding policy as `msm` so executables are shared.
    """
    n = points.shape[0]
    n_pad = 1 << max(2, (n - 1).bit_length())
    if n_pad != n:
        points = jnp.concatenate(
            [points, ops.identity_like((n_pad - n,))], axis=0
        )
        digits = jnp.pad(digits, ((0, n_pad - n), (0, 0)))
    wc = memory_aware_window_chunk(n_pad, points.shape[-1])
    W = digits.shape[1]
    if wc >= W:
        wc = None
    return get_msm_plan(ops, c, wc)(points, digits)


def msm(
    ops: _CurveOpsBase,
    points: jnp.ndarray,
    scalars_limbs: np.ndarray,
    num_bits: int,
    c: int | None = None,
) -> jnp.ndarray:
    """Variable-base MSM: Σ scalars[i] · points[i] -> one (3, K) point.

    Inputs are padded to the next power of two (identity points, zero
    digits) so differently-sized queries share one compiled executable —
    compile cache hits matter more than the <2x padding work.
    """
    n = points.shape[0]
    n_pad = 1 << max(2, (n - 1).bit_length())
    c = c or pick_window(n_pad)
    digits = np.asarray(scalars_to_digits(scalars_limbs, c, num_bits))
    if n_pad != n:
        points = jnp.concatenate(
            [points, ops.identity_like((n_pad - n,))], axis=0
        )
        digits = np.pad(digits, ((0, n_pad - n), (0, 0)))
    wc = memory_aware_window_chunk(n_pad, points.shape[-1])
    W = digits.shape[1]
    if wc >= W:
        wc = None
    return get_msm_plan(ops, c, wc)(points, jnp.asarray(digits))


# ---------------------------------------------------------------------------
# fixed-base MSM (same base, many scalars) — the key-generation workload
# ---------------------------------------------------------------------------


class FixedBasePlan:
    """[s_i]·G for a fixed G: windowed lookup tables + batched adds.

    Table: (W, 2^c, 3, K) with table[w][d] = d · 2^{cw} · G. Each output is
    W-1 batched complete additions after W gathers — no doublings at all.
    """

    def __init__(self, ops: _CurveOpsBase, c: int = 8):
        self.ops = ops
        self.c = c
        self._run = jax.jit(self._impl)

    def make_table(self, base_affine, host_curve, num_bits: int, pack) -> jnp.ndarray:
        """Host-side table build (python ints), packed to device form."""
        c = self.c
        W = -(-num_bits // c)
        rows = []
        g = base_affine
        for w in range(W):
            row = [None]
            acc = None
            for _ in range((1 << c) - 1):
                acc = host_curve.add(acc, g)
                row.append(acc)
            rows.append(pack(row))
            for _ in range(c):
                g = host_curve.double(g)
        return jnp.stack(rows)  # (W, 2^c, 3, K)

    def _impl(self, table, digits):
        """table (W, 2^c, 3, K); digits (N, W) -> (N, 3, K)."""
        ops = self.ops
        N, W = digits.shape

        def body(w, acc):
            sel = jnp.take(table[w], digits[:, w], axis=0)  # (N, 3, K)
            return ops.add_impl(acc, sel)

        acc0 = ops.identity_like((N,))
        return jax.lax.fori_loop(0, W, body, acc0)

    def __call__(self, table, digits):
        return self._run(table, jnp.asarray(digits))
