"""Device-side QAP instance map (setup-time Lagrange evaluation).

Replaces qap.py's pure-Python big-int loops (`lagrange_coeffs_at`,
`evaluate_variable_polys_at_tau`) and groth16.py's gamma_abc/l/h scalar
loops with DeviceField (fields/device.py) programs — the declared
residual of the r4 897 s config-3 setup (VERDICT r4 item 3, missing #2's
2^24-pk blocker). Mirrors ark-groth16's generator role (SURVEY.md §2.3
"groth16"); bit-exact vs the host path (tests/test_qap_device.py —
field ops are exact mod-p arithmetic, so the reassociated parallel scans
below produce identical values).

Shape discipline (hard-learned, twice): every public entry is ONE jitted
program per shape, and every log-depth pass inside is a
`lax.fori_loop` whose body contains ONE traced Montgomery mul operating
at FULL width with masks (Hillis-Steele scans):

  * the first (eager) formulation compiled one XLA program per op per
    width through the ~25 ms dispatch tunnel — 100+ tiny compiles and a
    multi-minute stall at 2^20;
  * the second (jitted but width-halving trees) inlined ~40 Montgomery
    muls per program — 30k+ eqn jaxprs whose TPU AOT compiles took
    minutes per shape.

Masked full-width scans do ~log n× more multiplies (n·log n instead of
~3n), but a full-width device mul pass is milliseconds while the
compile/trace cost was minutes: at setup scale the scans win outright.

  * `powers_device`  — g^j by binary decomposition: log n masked muls;
  * `batch_inverse_device` — exclusive prefix × exclusive suffix
    product scans + one Fermat ladder on the total;
  * `lagrange_coeffs_device` — L_j(τ) = (Z(τ)/n)·ω^j/(τ−ω^j);
  * `evaluate_uvw_device` — u_i(τ) = Σ_j A[j][i]·L_j(τ) (and v, w) as
    gather + Montgomery mul + a segmented pairwise-add doubling scan
    over column-sorted COO entries, consuming
    ConstraintSystem.to_coo_arrays;
  * `combine_uvw_device` — β·u + α·v + w and the γ⁻¹/δ⁻¹ splits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.device import get_device_field
from ..fields.params import FieldParams


def _ceil_log2(n: int) -> int:
    return max(1, (n - 1).bit_length()) if n > 1 else 0


# DeviceField.mul materializes the (N, L, 2L) limb outer product; at
# 2^24 rows that is a 35 GB intermediate (OOM'd the 2^24 setup compile).
# All full-width multiplies here run through this chunked wrapper: a
# fori_loop over row blocks keeps the intermediate at block width while
# still tracing ONE mul.
_MUL_CHUNK = 1 << 19


def _cmul(df, a, b):
    n = a.shape[0]
    if n <= _MUL_CHUNK:
        return df.mul_impl(a, b)
    chunk = _MUL_CHUNK
    nchunks = -(-n // chunk)
    pad = nchunks * chunk - n
    a_p = jnp.pad(a, ((0, pad), (0, 0)))
    b_p = jnp.broadcast_to(b, a.shape)
    b_p = jnp.pad(b_p, ((0, pad), (0, 0)))

    def body(i, out):
        sa = jax.lax.dynamic_slice_in_dim(a_p, i * chunk, chunk)
        sb = jax.lax.dynamic_slice_in_dim(b_p, i * chunk, chunk)
        return jax.lax.dynamic_update_slice_in_dim(
            out, df.mul_impl(sa, sb), i * chunk, axis=0
        )

    out = jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros_like(a_p)
    )
    return out[:n]


# ---------------------------------------------------------------------------
# powers
# ---------------------------------------------------------------------------


def powers_device(df, base: int, n: int, scale: int = 1):
    """(scale·base^j) for j = 0..n-1 -> (n, L) Montgomery limbs."""
    p = df.params.modulus
    nbits = max(1, (n - 1).bit_length())
    steps = [pow(base, 1 << i, p) for i in range(nbits)]
    return _powers_jit(df, n, nbits)(df.array(steps), df.const(scale))


@functools.lru_cache(maxsize=None)
def _powers_jit(df, n: int, nbits: int):
    @jax.jit
    def run(steps_m, scale_c):
        return _powers_body(df, steps_m, scale_c, n, nbits)

    return run


# ---------------------------------------------------------------------------
# batch inversion (prefix/suffix product scans)
# ---------------------------------------------------------------------------


def _inclusive_prefix_mul(df, x):
    """Hillis-Steele inclusive prefix product along axis 0 (one traced
    mul; log n fori steps with traced roll strides)."""
    n = x.shape[0]
    steps = _ceil_log2(n)
    lanes = jnp.arange(n)

    def body(k, arr):
        stride = jnp.left_shift(1, k)
        shifted = jnp.roll(arr, stride, axis=0)
        prod = _cmul(df, arr, shifted)
        return jnp.where((lanes >= stride)[:, None], prod, arr)

    return jax.lax.fori_loop(0, steps, body, x)


def _batch_inverse_body(df, x):
    n = x.shape[0]
    one = jnp.broadcast_to(df.ONE_MONT, (1, df.L))
    pre_inc = _inclusive_prefix_mul(df, x)
    suf_inc = _inclusive_prefix_mul(df, x[::-1])[::-1]
    pre_ex = jnp.concatenate([one, pre_inc[:-1]], axis=0)
    suf_ex = jnp.concatenate([suf_inc[1:], one], axis=0)
    total = pre_inc[-1]
    t_inv = df._pow_impl(total[None, :], df.params.modulus - 2)
    return _cmul(
        df, _cmul(df, pre_ex, suf_ex), jnp.broadcast_to(t_inv, (n, df.L))
    )


def batch_inverse_device(df, x):
    """Elementwise inverse of (N, L) nonzero Montgomery limbs."""
    return _batch_inv_jit(df, x.shape[0])(x)


@functools.lru_cache(maxsize=None)
def _batch_inv_jit(df, n: int):
    return jax.jit(lambda x: _batch_inverse_body(df, x))


# ---------------------------------------------------------------------------
# Lagrange coefficients
# ---------------------------------------------------------------------------


def _powers_body(df, steps_m, scale_c, n: int, nbits: int):
    lanes = jnp.arange(n, dtype=jnp.uint32)
    x0 = jnp.broadcast_to(scale_c, (n, df.L))

    def body(i, x):
        use = ((lanes >> i.astype(jnp.uint32)) & 1) > 0
        stepped = _cmul(df, x, steps_m[i][None, :])
        return jnp.where(use[:, None], stepped, x)

    return jax.lax.fori_loop(0, nbits, body, x0)


def lagrange_coeffs_device(params: FieldParams, n: int, tau: int):
    """L_j(τ) for the radix-2 domain of size n -> (n, L) Montgomery
    limbs on device, or None if τ lands on the domain (host fallback —
    probability ~n/p).

    Split into FOUR bounded programs (powers; diffs+flag; batch
    inversion; final scaling) above 2^22: the fused single-program form
    held ~10 live (n, L) buffers plus fori double-buffers and
    kernel-faulted the TPU worker at 2^23/2^24 on the 16 GB chip.
    Below that the fused program (fewer AOT compiles) is kept."""
    df = get_device_field(params)
    p = params.modulus
    omega = params.root_of_unity(n)
    nbits = max(1, (n - 1).bit_length())
    steps = [pow(omega, 1 << i, p) for i in range(nbits)]
    z_tau = (pow(tau, n, p) - 1) % p
    zn = z_tau * pow(n, -1, p) % p
    if n <= (1 << 22):
        lag, on_domain = _lagrange_jit(df, n, nbits)(
            df.array(steps), df.const(tau), df.const(zn)
        )
        if bool(on_domain):
            return None
        return lag
    pows = _powers_jit(df, n, nbits)(df.array(steps), df.const(1))
    diffs, on_domain = _diffs_jit(df, n)(pows, df.const(tau))
    if bool(on_domain):
        return None
    inv_d = batch_inverse_device(df, diffs)
    del diffs
    return _lag_final_jit(df, n)(pows, inv_d, df.const(zn))


@functools.lru_cache(maxsize=None)
def _diffs_jit(df, n: int):
    @jax.jit
    def run(pows, tau_c):
        diffs = df.sub_impl(jnp.broadcast_to(tau_c, pows.shape), pows)
        return diffs, jnp.any(~diffs.any(axis=1))

    return run


@functools.lru_cache(maxsize=None)
def _lag_final_jit(df, n: int):
    @jax.jit
    def run(pows, inv_d, zn_c):
        return _cmul(df, _cmul(df, pows, zn_c[None, :]), inv_d)

    return run


@functools.lru_cache(maxsize=None)
def _lagrange_jit(df, n: int, nbits: int):
    @jax.jit
    def run(steps_m, tau_c, zn_c):
        pows = _powers_body(df, steps_m, df.ONE_MONT, n, nbits)
        tau_m = jnp.broadcast_to(tau_c, pows.shape)
        diffs = df.sub_impl(tau_m, pows)
        on_domain = jnp.any(~diffs.any(axis=1))
        inv_d = _batch_inverse_body(df, diffs)
        lag = _cmul(df, _cmul(df, pows, zn_c[None, :]), inv_d)
        return lag, on_domain

    return run


# ---------------------------------------------------------------------------
# segmented field sums (column accumulation)
# ---------------------------------------------------------------------------


def segment_sum_field(df, contrib, seg_sorted, num_segments: int):
    """Per-segment field sums of (nnz, L) Montgomery limbs, segments
    given by the SORTED (nnz,) int array seg_sorted -> (num_segments, L).

    Pairwise doubling scan with exact field adds: element at in-segment
    offset o absorbs its o+2^k partner when o ≡ 0 (mod 2^{k+1}) and the
    partner is in the same segment; after ceil(log2(nnz)) steps the
    segment total sits at the segment's first entry."""
    nnz = contrib.shape[0]
    if nnz == 0:
        return jnp.zeros((num_segments, df.L), jnp.uint32)
    seg_np = np.asarray(seg_sorted)
    first = np.searchsorted(seg_np, seg_np, side="left")
    off = np.arange(nnz, dtype=np.int64) - first
    pos = np.searchsorted(seg_np, np.arange(num_segments))
    present = (pos < nnz) & (
        seg_np[np.minimum(pos, nnz - 1)] == np.arange(num_segments)
    )
    return _segsum_jit(df, nnz, num_segments)(
        contrib,
        jnp.asarray(seg_np.astype(np.int32)),
        jnp.asarray(off.astype(np.int32)),
        jnp.asarray(np.minimum(pos, nnz - 1).astype(np.int32)),
        jnp.asarray(present),
    )


@functools.lru_cache(maxsize=None)
def _segsum_jit(df, nnz: int, num_segments: int):
    steps = _ceil_log2(nnz)

    @jax.jit
    def run(contrib, seg_d, off_d, pos_d, present_d):
        lanes = jnp.arange(nnz, dtype=jnp.int32)

        def body(k, x):
            stride = jnp.left_shift(1, k)
            partner_seg = jnp.roll(seg_d, -stride)
            valid = (
                (lanes + stride < nnz)
                & (partner_seg == seg_d)
                & (off_d % (2 * stride) == 0)
            )
            rolled = jnp.roll(x, -stride, axis=0)
            return jnp.where(valid[:, None], df.add_impl(x, rolled), x)

        x = jax.lax.fori_loop(0, steps, body, contrib)
        totals = jnp.take(x, pos_d, axis=0)
        return jnp.where(present_d[:, None], totals, 0)

    return run


def _coo_eval(df, values_m, indptr, col, cid, lag, num_vars: int):
    """Σ over entries: values[cid]·lag[row] accumulated per column —
    contrib mul + segmented sum as ONE program per (nnz, m) shape."""
    nnz = len(col)
    if nnz == 0:
        return jnp.zeros((num_vars, df.L), jnp.uint32)
    rows = np.repeat(
        np.arange(len(indptr) - 1, dtype=np.int64), np.diff(indptr)
    )
    order = np.argsort(col, kind="stable")
    col_s = col[order]
    seg_np = np.asarray(col_s)
    first = np.searchsorted(seg_np, seg_np, side="left")
    off = np.arange(nnz, dtype=np.int64) - first
    pos = np.searchsorted(seg_np, np.arange(num_vars))
    present = (pos < nnz) & (
        seg_np[np.minimum(pos, nnz - 1)] == np.arange(num_vars)
    )
    return _coo_eval_jit(df, nnz, num_vars)(
        values_m,
        jnp.asarray(cid[order]),
        lag,
        jnp.asarray(rows[order]),
        jnp.asarray(seg_np.astype(np.int32)),
        jnp.asarray(off.astype(np.int32)),
        jnp.asarray(np.minimum(pos, nnz - 1).astype(np.int32)),
        jnp.asarray(present),
    )


@functools.lru_cache(maxsize=None)
def _coo_eval_jit(df, nnz: int, num_segments: int):
    steps = _ceil_log2(nnz)

    @jax.jit
    def run(values_m, ids, lag, rows, seg_d, off_d, pos_d, present_d):
        contrib = _cmul(
            df, jnp.take(values_m, ids, axis=0), jnp.take(lag, rows, axis=0)
        )
        lanes = jnp.arange(nnz, dtype=jnp.int32)

        def body(k, x):
            stride = jnp.left_shift(1, k)
            partner_seg = jnp.roll(seg_d, -stride)
            valid = (
                (lanes + stride < nnz)
                & (partner_seg == seg_d)
                & (off_d % (2 * stride) == 0)
            )
            rolled = jnp.roll(x, -stride, axis=0)
            return jnp.where(valid[:, None], df.add_impl(x, rolled), x)

        x = jax.lax.fori_loop(0, steps, body, contrib)
        totals = jnp.take(x, pos_d, axis=0)
        return jnp.where(present_d[:, None], totals, 0)

    return run


# ---------------------------------------------------------------------------
# the instance map
# ---------------------------------------------------------------------------


def combine_uvw_device(df, u_m, v_m, w_m, beta, alpha, gamma_inv, delta_inv, ni):
    """s = β·u + α·v + w; -> (gamma_abc = s[:ni]·γ⁻¹, l = s[ni:]·δ⁻¹)."""
    return _combine_jit(df, u_m.shape[0], ni)(
        u_m, v_m, w_m,
        df.const(beta), df.const(alpha),
        df.const(gamma_inv), df.const(delta_inv),
    )


@functools.lru_cache(maxsize=None)
def _combine_jit(df, m: int, ni: int):
    @jax.jit
    def run(u_m, v_m, w_m, beta_c, alpha_c, ginv_c, dinv_c):
        s_m = df.add_impl(
            df.add_impl(
                _cmul(df, u_m, beta_c[None, :]),
                _cmul(df, v_m, alpha_c[None, :]),
            ),
            w_m,
        )
        gabc = _cmul(df, s_m[:ni], ginv_c[None, :])
        l_m = _cmul(df, s_m[ni:], dinv_c[None, :])
        return gabc, l_m

    return run


def evaluate_uvw_device(
    params: FieldParams,
    coo_abc,  # [(indptr, col, cid)] * 3 from cs.to_coo_arrays
    interner_values: list[int],
    num_constraints: int,
    num_instance: int,
    num_variables: int,
    tau: int,
):
    """(u_i(τ), v_i(τ), w_i(τ)) per column as (m, L) device Montgomery
    limbs + Z_H(τ) host int, or None for the on-domain τ fallback.

    Includes the libsnark input-consistency rows in u (A gets an extra
    row num_constraints+i with a 1 at column i)."""
    from .qap import domain_size_for

    df = get_device_field(params)
    p = params.modulus
    n = domain_size_for(num_constraints, num_instance)
    lag = lagrange_coeffs_device(params, n, tau)
    if lag is None:
        return None
    # value table: interned coefficients + literal zero at id len(values)
    values_m = jnp.concatenate(
        [df.array(list(interner_values)), jnp.zeros((1, df.L), jnp.uint32)],
        axis=0,
    )
    uvw = []
    for mi, (indptr, col, cid) in enumerate(coo_abc):
        if mi == 0:
            # consistency rows: A[nc + i][i] = 1
            indptr = np.concatenate(
                [indptr, indptr[-1] + 1 + np.arange(num_instance)]
            )
            col = np.concatenate(
                [col, np.arange(num_instance, dtype=np.int32)]
            )
            cid = np.concatenate(
                [cid, np.zeros(num_instance, np.int32)]  # ONE_ID
            )
        uvw.append(
            _coo_eval(df, values_m, indptr, col, cid, lag, num_variables)
        )
    z_tau = (pow(tau, n, p) - 1) % p
    return uvw[0], uvw[1], uvw[2], z_tau


def from_mont_chunked(df, x):
    """Standard-form limbs of (N, L) Montgomery limbs, chunk-bounded
    (df.from_mont is a mul by ONE and shares the outer-product blowup)."""
    return _from_mont_jit(df, x.shape[0])(x)


@functools.lru_cache(maxsize=None)
def _from_mont_jit(df, n: int):
    @jax.jit
    def run(x):
        return _cmul(df, x, df.ONE_STD[None, :])

    return run
