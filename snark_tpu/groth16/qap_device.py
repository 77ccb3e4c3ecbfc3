"""Device-side QAP instance map (setup-time Lagrange evaluation).

Replaces qap.py's pure-Python big-int loops (`lagrange_coeffs_at`,
`evaluate_variable_polys_at_tau`) and groth16.py's gamma_abc/l/h scalar
loops with DeviceField (fields/device.py) programs — the declared
residual of the r4 897 s config-3 setup (VERDICT r4 item 3, missing #2's
2^24-pk blocker). Mirrors ark-groth16's generator role (SURVEY.md §2.3
"groth16"); bit-exact vs the host path (tests/test_qap_device.py).

Building blocks (all O(n) device work, O(log n) dispatch):
  * `powers_device`  — g^0..g^{n-1} by log-doubling (level k appends
    P·g^{2^k});
  * `batch_inverse_device` — Montgomery batch inversion as a product
    tree (one Fermat ladder at the width-1 root);
  * `lagrange_coeffs_device` — L_j(τ) = (Z(τ)/n)·ω^j/(τ−ω^j);
  * `evaluate_uvw_device` — u_i(τ) = Σ_j A[j][i]·L_j(τ) (and v, w) as
    gather + Montgomery mul + a segmented pairwise-add tree over the
    column-sorted COO entries (exact field adds — no limb-overflow
    bookkeeping), consuming ConstraintSystem.to_coo_arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.device import get_device_field
from ..fields.params import FieldParams


def powers_device(df, base: int, n: int, scale: int = 1):
    """(scale·base^j) for j = 0..n-1 -> (n, L) Montgomery limbs."""
    p = df.params.modulus
    x = df.array([scale % p])
    k = 1
    while k < n:
        step = df.const(pow(base, k, p))
        x = jnp.concatenate([x, df.mul_impl(x, step[None, :])], axis=0)
        k <<= 1
    return x[:n]


def batch_inverse_device(df, x):
    """Elementwise inverse of (N, L) nonzero Montgomery limbs: product
    tree up, one Fermat ladder at the root, expansion down."""
    levels = []
    while x.shape[0] > 1:
        ow = x.shape[0]
        if ow % 2:
            x = jnp.concatenate([x, df.ONE_MONT[None, :]], axis=0)
        a, b = x[0::2], x[1::2]
        levels.append((a, b, ow))
        x = df.mul_impl(a, b)
    inv = df.inv(x)
    for a, b, ow in reversed(levels):
        il = df.mul_impl(inv, b)
        ir = df.mul_impl(inv, a)
        inv = jnp.stack([il, ir], axis=1).reshape(-1, df.L)[:ow]
    return inv


def lagrange_coeffs_device(params: FieldParams, n: int, tau: int):
    """L_j(τ) for the radix-2 domain of size n -> (n, L) Montgomery
    limbs on device, or None if τ lands on the domain (host fallback —
    probability ~n/p)."""
    df = get_device_field(params)
    p = params.modulus
    omega = params.root_of_unity(n)
    pows = powers_device(df, omega, n)
    tau_m = jnp.broadcast_to(df.const(tau), pows.shape)
    diffs = df.sub_impl(tau_m, pows)
    if bool(np.any(~np.asarray(diffs).any(axis=1))):
        return None
    inv_d = batch_inverse_device(df, diffs)
    z_tau = (pow(tau, n, p) - 1) % p
    zn = z_tau * pow(n, -1, p) % p
    return df.mul_impl(df.mul_impl(pows, df.const(zn)[None, :]), inv_d)


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
    seg_d = jnp.asarray(seg_np)
    off_d = jnp.asarray(off)
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
    pos = np.searchsorted(seg_np, np.arange(num_segments))
    present = (pos < nnz) & (seg_np[np.minimum(pos, nnz - 1)] == np.arange(num_segments))
    totals = jnp.take(x, jnp.asarray(np.minimum(pos, nnz - 1)), axis=0)
    return jnp.where(jnp.asarray(present)[:, None], totals, 0)


def _coo_eval(df, values_m, indptr, col, cid, lag, num_vars: int):
    """Σ over entries: values[cid]·lag[row] accumulated per column."""
    nnz = len(col)
    rows = np.repeat(
        np.arange(len(indptr) - 1, dtype=np.int64), np.diff(indptr)
    )
    order = np.argsort(col, kind="stable")
    col_s = col[order]
    contrib = df.mul_impl(
        jnp.take(values_m, jnp.asarray(cid[order]), axis=0),
        jnp.take(lag, jnp.asarray(rows[order]), axis=0),
    )
    return segment_sum_field(df, contrib, col_s, num_vars)


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
