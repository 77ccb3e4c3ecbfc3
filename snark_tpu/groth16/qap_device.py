"""Device-side QAP instance map (setup-time Lagrange evaluation).

Replaces qap.py's pure-Python big-int loops (`lagrange_coeffs_at`,
`evaluate_variable_polys_at_tau`) and groth16.py's gamma_abc/l/h scalar
loops with DeviceField (fields/device.py) programs — the declared
residual of the r4 897 s config-3 setup (VERDICT r4 item 3, missing #2's
2^24-pk blocker). Mirrors ark-groth16's generator role (SURVEY.md §2.3
"groth16"); bit-exact vs the host path (tests/test_qap_device.py).

Building blocks (all O(n) device work, O(log n) traced ops):
  * `powers_device`  — g^0..g^{n-1} by log-doubling (level k appends
    P·g^{2^k});
  * `batch_inverse_device` — Montgomery batch inversion as a product
    tree (one Fermat ladder at the width-1 root);
  * `lagrange_coeffs_device` — L_j(τ) = (Z(τ)/n)·ω^j/(τ−ω^j);
  * `evaluate_uvw_device` — u_i(τ) = Σ_j A[j][i]·L_j(τ) (and v, w) as
    gather + Montgomery mul + a segmented pairwise-add tree over the
    column-sorted COO entries (exact field adds — no limb-overflow
    bookkeeping), consuming ConstraintSystem.to_coo_arrays.

Each public entry wraps its whole device computation in ONE jit per
shape: the first (eager) formulation compiled one XLA program per op
per width through the ~25 ms dispatch tunnel — 100+ tiny compiles and
tens of minutes of setup stall at 2^20 (measured).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.device import get_device_field
from ..fields.params import FieldParams


def powers_device(df, base: int, n: int, scale: int = 1):
    """(scale·base^j) for j = 0..n-1 -> (n, L) Montgomery limbs.

    One jitted program per (field, n); the per-level step constants are
    baked in (they depend on base, which is fresh per setup — the
    program is shape-cached, the constants ride as inputs)."""
    p = df.params.modulus
    steps = []
    k = 1
    while k < n:
        steps.append(pow(base, k, p))
        k <<= 1
    steps_m = (
        df.array(steps) if steps else jnp.zeros((0, df.L), jnp.uint32)
    )
    start = df.array([scale % p])
    return _powers_jit(df, n)(start, steps_m)


@functools.lru_cache(maxsize=None)
def _powers_jit(df, n: int):
    @jax.jit
    def run(start, steps_m):
        x = start
        k = 1
        i = 0
        while k < n:
            x = jnp.concatenate(
                [x, df.mul_impl(x, steps_m[i][None, :])], axis=0
            )
            k <<= 1
            i += 1
        return x[:n]

    return run


def _batch_inverse_body(df, x):
    levels = []
    while x.shape[0] > 1:
        ow = x.shape[0]
        if ow % 2:
            x = jnp.concatenate([x, df.ONE_MONT[None, :]], axis=0)
        a, b = x[0::2], x[1::2]
        levels.append((a, b, ow))
        x = df.mul_impl(a, b)
    inv = df._pow_impl(x, df.params.modulus - 2)
    for a, b, ow in reversed(levels):
        il = df.mul_impl(inv, b)
        ir = df.mul_impl(inv, a)
        inv = jnp.stack([il, ir], axis=1).reshape(-1, df.L)[:ow]
    return inv


def batch_inverse_device(df, x):
    """Elementwise inverse of (N, L) nonzero Montgomery limbs: product
    tree up, one Fermat ladder at the root, expansion down. One jit per
    (field, N)."""
    return _batch_inv_jit(df, x.shape[0])(x)


@functools.lru_cache(maxsize=None)
def _batch_inv_jit(df, n: int):
    return jax.jit(lambda x: _batch_inverse_body(df, x))


def lagrange_coeffs_device(params: FieldParams, n: int, tau: int):
    """L_j(τ) for the radix-2 domain of size n -> (n, L) Montgomery
    limbs on device, or None if τ lands on the domain (host fallback —
    probability ~n/p)."""
    df = get_device_field(params)
    p = params.modulus
    omega = params.root_of_unity(n)
    pows = powers_device(df, omega, n)
    z_tau = (pow(tau, n, p) - 1) % p
    zn = z_tau * pow(n, -1, p) % p
    lag, on_domain = _lagrange_jit(df, n)(
        pows, df.const(tau), df.const(zn)
    )
    if bool(on_domain):
        return None
    return lag


@functools.lru_cache(maxsize=None)
def _lagrange_jit(df, n: int):
    @jax.jit
    def run(pows, tau_c, zn_c):
        tau_m = jnp.broadcast_to(tau_c, pows.shape)
        diffs = df.sub_impl(tau_m, pows)
        on_domain = jnp.any(~diffs.any(axis=1))
        inv_d = _batch_inverse_body(df, diffs)
        lag = df.mul_impl(df.mul_impl(pows, zn_c[None, :]), inv_d)
        return lag, on_domain

    return run


def segment_sum_field(df, contrib, seg_sorted, num_segments: int):
    """Per-segment field sums of (nnz, L) Montgomery limbs, segments
    given by the SORTED (nnz,) int array seg_sorted -> (num_segments, L).

    Pairwise doubling tree with exact field adds: element at in-segment
    offset o absorbs its o+2^k partner when o ≡ 0 (mod 2^{k+1}) and the
    partner is in the same segment; after ceil(log2(nnz)) levels the
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
        jnp.asarray(seg_np),
        jnp.asarray(off),
        jnp.asarray(np.minimum(pos, nnz - 1)),
        jnp.asarray(present),
    )


@functools.lru_cache(maxsize=None)
def _segsum_jit(df, nnz: int, num_segments: int):
    @jax.jit
    def run(contrib, seg_d, off_d, pos_d, present_d):
        x = contrib
        k = 0
        while (1 << k) < nnz:
            stride = 1 << k
            partner_seg = jnp.roll(seg_d, -stride)
            valid = (
                (jnp.arange(nnz) + stride < nnz)
                & (partner_seg == seg_d)
                & (off_d % (2 * stride) == 0)
            )
            rolled = jnp.roll(x, -stride, axis=0)
            x = jnp.where(valid[:, None], df.add_impl(x, rolled), x)
            k += 1
        totals = jnp.take(x, pos_d, axis=0)
        return jnp.where(present_d[:, None], totals, 0)

    return run


def _coo_eval(df, values_m, indptr, col, cid, lag, num_vars: int):
    """Σ over entries: values[cid]·lag[row] accumulated per column."""
    rows = np.repeat(
        np.arange(len(indptr) - 1, dtype=np.int64), np.diff(indptr)
    )
    order = np.argsort(col, kind="stable")
    col_s = col[order]
    contrib = _contrib_jit(df, len(col))(
        values_m, jnp.asarray(cid[order]), lag, jnp.asarray(rows[order])
    )
    return segment_sum_field(df, contrib, col_s, num_vars)


@functools.lru_cache(maxsize=None)
def _contrib_jit(df, nnz: int):
    @jax.jit
    def run(values_m, ids, lag, rows):
        return df.mul_impl(
            jnp.take(values_m, ids, axis=0), jnp.take(lag, rows, axis=0)
        )

    return run


def combine_uvw_device(df, u_m, v_m, w_m, beta, alpha, gamma_inv, delta_inv, ni):
    """s = β·u + α·v + w; -> (gamma_abc = s[:ni]·γ⁻¹, l = s[ni:]·δ⁻¹),
    one jit per shape."""
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
                df.mul_impl(u_m, beta_c[None, :]),
                df.mul_impl(v_m, alpha_c[None, :]),
            ),
            w_m,
        )
        gabc = df.mul_impl(s_m[:ni], ginv_c[None, :])
        l_m = df.mul_impl(s_m[ni:], dinv_c[None, :])
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
