"""Distributed proving on the fused-Pallas plane kernels.

Round-1 shipped dist_msm/dist_ntt/batch on the legacy u32-limb XLA
kernels; this module ports the distribution strategies (SURVEY.md §2.2)
to the production plane stack (ops/pallas_curve, ops/msm_plane,
ops/ntt_plane):

* DistPlaneMsm — "tp" analogue: points + digits sharded over a mesh
  axis; every chip runs the fused bucket pipeline on its shard; the
  per-window TOTALS (three (K·R8, Wpad) digit planes — a few KB) ride
  ICI via all_gather and are folded with W-lane-parallel fused adds.
  This replaces round 1's all_gather of fully-folded single points +
  serial host-style fold (VERDICT r1 "What's missing" #1).

* DistPlaneNtt — "sp/cp" analogue: six-step NTT (n = n1·n2, three
  all_to_all lane exchanges) whose local transforms are the fused
  Pallas DIF/DIT butterfly kernels, batched over the rows each chip
  owns (block-major lanes).

* DistPlaneProver — the full Groth16 prove on a mesh: replicated
  witness planes, distributed h pipeline (six-step plane NTTs),
  all five MSMs point-sharded, host assembly -> a verifying Proof.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..fields.host import Fp
from ..fields.params import CurveParams, FieldParams
from ..ops.msm import scalars_to_digits_signed
from ..ops.msm_plane import PlaneMsm, get_plane_msm
from ..ops.ntt_plane import _bit_reverse_indices, get_ntt_kernels
from ..ops.pallas_field_v3 import F32


# ---------------------------------------------------------------------------
# distributed MSM
# ---------------------------------------------------------------------------


class DistPlaneMsm:
    """Point-sharded plane MSM over one mesh axis.

    The table is the plain (N, w) positive-row layout for both digit
    modes: signed digits carry their sign in the gather payload and the
    add kernel negates the gathered Y in-kernel (pallas_curve neg_y), so
    each chip's shard is just its contiguous row block.
    """

    def __init__(
        self,
        curve: CurveParams,
        c: int,
        mesh: Mesh,
        axis: str,
        num_bits: int | None = None,
        tile: int = 256,
        group: str = "g1",
        signed: bool = True,
    ):
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]
        self.plan = get_plane_msm(
            curve, c, num_bits, tile, None, group, signed
        )
        self.signed = signed
        self._sums_dist = jax.jit(self._sums_dist_impl)

    # -- host-side data prep ------------------------------------------------
    def shard_table(self, pos_rows: np.ndarray, neg_rows=None):
        """(N, w) u8 positive row table -> device array (row-sharded by
        the in_spec). neg_rows is accepted and ignored for backward
        compatibility — negation happens in-kernel now."""
        return jnp.asarray(pos_rows)

    # -- device pipeline ----------------------------------------------------
    def _sums_dist_impl(self, table, digits_t):
        """table (N, w) u8 positive rows; digits_t (W, N).
        Returns replicated (K·R8, Wpad) window-total planes.

        Two-phase layout: every chip bucket-accumulates its point shard
        (phases 1-3), then the bucket accumulators are exchanged
        window-block-wise (all_to_all) so each chip SUMS and FOLDS only
        W/ndev windows — the collapse + double-suffix-scan work is
        sharded instead of replicated per shard, and only the tiny
        (K·R8, W/ndev) window totals ride the final all_gather. Falls
        back to totals-gather when ndev does not divide W.
        """
        plan = self.plan
        axis = self.axis
        ndev = self.ndev
        W = plan.W
        nb = 1 << plan.cb
        shard_folds = W % ndev == 0 and ndev > 1
        wpd = W // ndev if shard_folds else W

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(axis), P(None, axis)),
            out_specs=(P(), P(), P()),
            check_vma=False,  # replicated by construction after the fold
        )
        def run(tbl_local, dt_local):
            if not shard_folds:
                tX, tY, tZ = plan._window_sums_impl(tbl_local, dt_local)
                g = jax.lax.all_gather(jnp.stack([tX, tY, tZ]), axis)

                def body(i, acc3):
                    aX, aY, aZ = acc3
                    return plan.add(aX, aY, aZ, g[i, 0], g[i, 1], g[i, 2])

                return jax.lax.fori_loop(1, ndev, body, (g[0, 0], g[0, 1], g[0, 2]))

            acc3 = plan._bucket_accum(tbl_local, dt_local)
            KR = acc3[0].shape[0]
            B = wpd * nb  # lanes per window block
            st = jnp.stack(acc3).reshape(3, KR, ndev, B)
            # device d keeps its own window block of every shard's partial
            ex = jax.lax.all_to_all(
                st, axis, split_axis=2, concat_axis=0
            )  # (ndev, 3, KR, B): leading axis = source shard

            def sum_body(s, a3):
                p = jax.lax.dynamic_index_in_dim(ex, s, 0, keepdims=False)
                return plan.add(*a3, p[0], p[1], p[2])

            p0 = ex[0]
            acc3 = jax.lax.fori_loop(
                1, ndev, sum_body, (p0[0], p0[1], p0[2])
            )
            win0 = jax.lax.axis_index(axis).astype(jnp.int32) * wpd
            tX, tY, tZ = plan._fold_block(acc3, win0, wpd)
            g = jax.lax.all_gather(
                jnp.stack([tX, tY, tZ]), axis, axis=2, tiled=True
            )  # (3, KR, W)
            pad = plan.tile - W % plan.tile if W % plan.tile else 0
            if pad:
                g = jnp.pad(g, ((0, 0), (0, 0), (0, pad)))
            return g[0], g[1], g[2]

        return run(table, digits_t)

    def window_sums(self, table, digits):
        """digits (N, W) -> replicated window totals (lanes [0, W))."""
        return self._sums_dist(table, jnp.asarray(digits).T)

    def combine_host(self, sums3, W: int, host_curve):
        """Host Horner combine from (replicated) window-total planes —
        split from msm_host so the prover can dispatch all five MSMs'
        distributed window sums before the first device->host sync."""
        from ..ops.pallas_curve import unpack_points_host

        tX, tY, tZ = sums3
        affs = unpack_points_host(
            self.plan.pc,
            np.asarray(tX[:, :W]),
            np.asarray(tY[:, :W]),
            np.asarray(tZ[:, :W]),
            group=self.plan.group,
        )
        acc = None
        for w in range(W - 1, -1, -1):
            for _ in range(self.plan.c):
                acc = host_curve.double(acc)
            acc = host_curve.add(acc, affs[w])
        return acc

    def msm_host(self, table, digits, host_curve):
        """Distributed window sums + host Horner combine -> affine point."""
        W = int(digits.shape[1])
        return self.combine_host(
            self.window_sums(table, digits), W, host_curve
        )


# ---------------------------------------------------------------------------
# distributed NTT (six-step on plane kernels)
# ---------------------------------------------------------------------------


class DistPlaneNtt:
    """Six-step NTT of n = n1·n2 on (R8, n) wide-Mont digit planes.

    Identical math to parallel/dist_ntt.py (cited there; SURVEY.md §2.2
    "SP/CP analogue") but the local batched transforms are the fused
    Pallas butterfly kernels. Lane layouts:

      input  shard: (R8, n/ndev) — global vector natural order, viewed
                    as (n2, n1) row-major, row-sharded (rows j2)
      output shard: natural order, same sharding (rows k1 of (n1, n2))

    All three lane exchanges are all_to_all over `axis`.
    """

    def __init__(
        self, params: FieldParams, n1: int, n2: int, mesh: Mesh, axis: str,
        tile: int | None = None,
    ):
        self.params = params
        self.n1, self.n2 = n1, n2
        self.n = n1 * n2
        self.mesh = mesh
        self.axis = axis
        self.ndev = ndev = mesh.shape[axis]
        assert n1 % ndev == 0 and n2 % ndev == 0
        p = params.modulus
        # local batched stage kernels; tile must divide every stage's lane
        # count (B·half for the smallest half=1 batch row count)
        min_lanes = min((n1 // ndev) * n2, (n2 // ndev) * n1) // 2
        tile = tile or min(512, min_lanes)
        self.k = get_ntt_kernels(params, tile)
        self.pf = pf = self.k.pf

        f = Fp(params)
        w = params.root_of_unity(self.n)
        w_inv = pow(w, -1, p)

        def local_tables(m: int, root_m: int):
            """Per-stage (R8, half) u8 twiddles for a length-m transform."""
            tabs = []
            for s in range(m.bit_length() - 1):
                half = 1 << s
                ws = pow(root_m, m >> (s + 1), p)
                vals, pw = [], 1
                for _ in range(half):
                    vals.append(pw)
                    pw = pw * ws % p
                tabs.append(jnp.asarray(pf.pack_rows_u8_np(vals).T))
            return tabs

        w1 = pow(w, n2, p)  # n1-th root
        w2 = pow(w, n1, p)  # n2-th root
        self.tw1_f = local_tables(n1, w1)
        self.tw1_i = local_tables(n1, pow(w1, -1, p))
        self.tw2_f = local_tables(n2, w2)
        self.tw2_i = local_tables(n2, pow(w2, -1, p))
        self.rev1 = jnp.asarray(_bit_reverse_indices(n1))
        self.rev2 = jnp.asarray(_bit_reverse_indices(n2))
        self.n1_inv_col = jnp.asarray(
            pf.pack_rows_u8_np([pow(n1, -1, p)]).T
        ).astype(F32)
        self.n2_inv_col = jnp.asarray(
            pf.pack_rows_u8_np([pow(n2, -1, p)]).T
        ).astype(F32)

        # step-3 twiddle matrix T[j1, k2] = root^(j1·k2), stored per chip
        # shard (rows j1) as u8 digit rows; (n, R8) u8 -> shard on axis 0
        def tw_matrix(root: int):
            rows = []
            for j1 in range(n1):
                base = pow(root, j1, p)
                val = 1
                vals = []
                for _ in range(n2):
                    vals.append(val)
                    val = val * base % p
                rows.append(pf.pack_rows_u8_np(vals))  # (n2, R8)
            return jnp.asarray(np.concatenate(rows, axis=0))  # (n1·n2, R8)

        self.twmat_f = tw_matrix(w)
        self.twmat_i = tw_matrix(w_inv)

        # coset scale vectors in natural order, sharded like the data
        g = params.generator
        g_inv = pow(g, -1, p)
        pows, ipows, x, y = [], [], 1, 1
        for _ in range(self.n):
            pows.append(x)
            ipows.append(y)
            x = x * g % p
            y = y * g_inv % p
        self.coset_scale = jnp.asarray(pf.pack_rows_u8_np(pows))  # (n, R8) u8
        self.coset_unscale = jnp.asarray(pf.pack_rows_u8_np(ipows))
        z_coset = (pow(g, self.n, p) - 1) % p
        self.hadamard = self.k._hadamard_build(
            pow(z_coset, -1, p) * pf.r_eff % p
        )

        self._fft = jax.jit(functools.partial(self._run, inverse=False))
        self._ifft = jax.jit(functools.partial(self._run, inverse=True))
        self._h = jax.jit(self._h_impl)

    # -- local batched transform (B rows × length m, block-major lanes) ----
    def _local_fft_batched(self, x, B: int, m: int, tables, rev, inv_col):
        """x (R8, B·m) lanes = b·m + j — natural-order in/out DIT NTT per
        row; `inv_col` scales by 1/m when this is an inverse transform."""
        R8 = self.pf.R8
        log_m = m.bit_length() - 1
        # bit-reverse each row's lanes (lane gather; base cost, see
        # scripts/bench_gather.py — fine off the innermost hot path)
        idx = (
            jnp.arange(B * m, dtype=jnp.int32) // m * m
            + rev[jnp.arange(B * m, dtype=jnp.int32) % m].astype(jnp.int32)
        )
        x = jnp.take(x, idx, axis=1)
        for s in range(log_m):
            half = 1 << s
            blocks = m // (2 * half)
            xr = x.reshape(R8, B * blocks, 2, half)
            lo = xr[:, :, 0, :].reshape(R8, B * m // 2)
            hi = xr[:, :, 1, :].reshape(R8, B * m // 2)
            tw = jnp.tile(tables[s].astype(F32), (1, B * blocks))
            o0, o1 = self.k.dit(lo, hi, tw)
            x = jnp.concatenate(
                [
                    o0.reshape(R8, B * blocks, 1, half),
                    o1.reshape(R8, B * blocks, 1, half),
                ],
                axis=2,
            ).reshape(R8, B * m)
        if inv_col is not None:
            x = self.k.vmul(x, jnp.broadcast_to(inv_col, x.shape))[0]
        return x

    # -- the six steps ------------------------------------------------------
    def _transpose_sharded(self, x, rows, cols):
        """(R8, rows/ndev · cols) lanes (r, c) row-major, sharded on rows
        -> (R8, cols/ndev · rows) lanes (c, r), sharded on cols."""
        R8 = self.pf.R8
        ndev = self.ndev
        axis = self.axis
        x = x.reshape(R8, rows // ndev, ndev, cols // ndev)
        x = jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1)
        # now (R8, rows, cols/ndev) for this chip's column block
        x = x.reshape(R8, rows, cols // ndev)
        return jnp.swapaxes(x, 1, 2).reshape(R8, cols // ndev * rows)

    def _run_local(self, x, inverse: bool):
        """Body inside shard_map: x (R8, n/ndev) natural shard."""
        n1, n2, ndev = self.n1, self.n2, self.ndev
        tw1 = self.tw1_i if inverse else self.tw1_f
        tw2 = self.tw2_i if inverse else self.tw2_f
        twm = self.twmat_i if inverse else self.twmat_f
        # step 1: (n2, n1) -> (n1, n2) transpose
        x = self._transpose_sharded(x, n2, n1)
        # step 2: local length-n2 NTTs over B = n1/ndev rows
        x = self._local_fft_batched(
            x, n1 // ndev, n2, tw2, self.rev2,
            self.n2_inv_col if inverse else None,
        )
        # step 3: twiddle by root^(j1·k2) — this chip's row block of T
        idx = jax.lax.axis_index(self.axis)
        tw = jax.lax.dynamic_slice(
            twm, (idx * (n1 // ndev) * n2, 0), ((n1 // ndev) * n2, self.pf.R8)
        )
        x = self.k.vmul(x, tw.astype(F32).T)[0]
        # step 4: (n1, n2) -> (n2, n1)
        x = self._transpose_sharded(x, n1, n2)
        # step 5: local length-n1 NTTs over B = n2/ndev rows
        x = self._local_fft_batched(
            x, n2 // ndev, n1, tw1, self.rev1,
            self.n1_inv_col if inverse else None,
        )
        # step 6: (n2, n1) -> (n1, n2): flatten = k1·n2 + k2 = natural ✓
        return self._transpose_sharded(x, n2, n1)

    def _run(self, x, inverse: bool):
        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(None, self.axis),),
            out_specs=P(None, self.axis),
            check_vma=False,  # pallas_call inside shard_map needs vma off
        )
        def go(x_shard):
            return self._run_local(x_shard, inverse)

        return go(x)

    def fft(self, x):
        """(R8, n) wide-Mont planes, natural coeffs -> natural evals."""
        return self._fft(x)

    def ifft(self, x):
        return self._ifft(x)

    # -- Groth16 h pipeline -------------------------------------------------
    def _h_impl(self, a_ev, b_ev, c_ev):
        """Natural-order (R8, n) domain evals -> h coefficient planes in
        NATURAL order (pair with a natural-order h table)."""

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(None, self.axis),) * 3,
            out_specs=P(None, self.axis),
            check_vma=False,  # pallas_call inside shard_map needs vma off
        )
        def go(a, b, c):
            idx = jax.lax.axis_index(self.axis)
            nl = self.n // self.ndev

            def shard_vec(tbl):
                sl = jax.lax.dynamic_slice(tbl, (idx * nl, 0), (nl, self.pf.R8))
                return sl.astype(F32).T

            scale = shard_vec(self.coset_scale)
            unscale = shard_vec(self.coset_unscale)

            def to_coset(x):
                x = self._run_local(x, inverse=True)
                x = self.k.vmul(x, scale)[0]
                return self._run_local(x, inverse=False)

            a_c = to_coset(a)
            b_c = to_coset(b)
            c_c = to_coset(c)
            h_ev = self.hadamard(a_c, b_c, c_c)[0]
            h = self._run_local(h_ev, inverse=True)
            return self.k.vmul(h, unscale)[0]

        return go(a_ev, b_ev, c_ev)

    def h_from_evals(self, a_ev, b_ev, c_ev):
        return self._h(a_ev, b_ev, c_ev)


# ---------------------------------------------------------------------------
# full distributed prover
# ---------------------------------------------------------------------------


class DistPlaneProver:
    """Groth16 prove with every heavy stage distributed over one mesh axis.

    Stage map (the "tp/sp" production layout; SURVEY.md §2.2):
      matvec            CSR rows sharded over the axis (z replicated)
      h pipeline        DistPlaneNtt six-step (3 all_to_all per transform)
      five MSMs         DistPlaneMsm, point-sharded, window-sum all_gather
      assembly/verify   host (O(1) point ops)

    Signed (balanced) digits for all five MSMs, like the single-chip
    prover: h digits come off the canonical digit planes via the device
    balanced-window extraction (ops/msm.signed_digits_from_u8_planes);
    tables stay N positive rows, signs ride the gather payload.
    """

    def __init__(self, g16, pk, mesh: Mesh, axis: str = "tp",
                 c: int | None = None):
        from ..ops.pallas_curve import (
            get_plane_curve,
            pack_rows_u8_host,
            table_from_query_u32,
        )
        from ..ops.pallas_field import digits8_from_limbs

        from ..ops.msm_plane import pick_window_plane_signed

        self.g16 = g16
        self.pk = pk
        self.mesh = mesh
        self.axis = axis
        self.ndev = ndev = mesh.shape[axis]
        if c is None:
            c = pick_window_plane_signed(pk.num_instance + pk.num_witness)
        self.c = c
        curve = g16.curve
        fr_params = curve.fr
        n = pk.domain_size
        assert n % ndev == 0

        # six-step split: n1·n2 = n, both divisible by ndev, near-square
        n1 = 1 << ((n.bit_length() - 1) // 2)
        while n1 % ndev or (n // n1) % ndev:
            n1 *= 2
        assert n1 < n, (n, ndev, "domain too small for this mesh")
        self.dntt = DistPlaneNtt(fr_params, n1, n // n1, mesh, axis)
        self.pf = self.dntt.pf

        self.msm_g1 = DistPlaneMsm(curve, c, mesh, axis, tile=256, signed=True)
        self.msm_g2 = DistPlaneMsm(
            curve, c, mesh, axis, tile=256, group="g2", signed=True
        )
        self.W = self.msm_g1.plan.W

        # shard-padded unsigned tables: rows padded to a multiple of ndev
        # with identity rows (their digits are forced to 0)
        pc1 = get_plane_curve(curve)
        ident_row = pack_rows_u8_host(pc1, [None])
        ident_row_g2 = pack_rows_u8_host(pc1, [None], "g2")

        def pad_tbl(tbl, row):
            m = tbl.shape[0]
            mp = -(-m // ndev) * ndev
            if mp == m:
                return jnp.asarray(tbl), m
            return (
                jnp.asarray(
                    np.concatenate(
                        [np.asarray(tbl), np.tile(row, (mp - m, 1))], axis=0
                    )
                ),
                m,
            )

        self.a_tbl, self.m = pad_tbl(pk.a_tbl, ident_row)
        self.b1_tbl, _ = pad_tbl(pk.b_g1_tbl, ident_row)
        self.b2_tbl, _ = pad_tbl(pk.b_g2_tbl, ident_row_g2)
        self.l_tbl, self.nw = pad_tbl(pk.l_tbl, ident_row)

        # row-sharded CSR matvec: constraint rows are independent, so the
        # three matrices shard over the mesh axis (rows padded to a
        # multiple of ndev with zero-coefficient rows — their products are
        # zero and the pad rows are discarded after the matvec). Per-chip
        # CSR memory drops from full-matrix to 1/ndev (SURVEY.md §2.2
        # "constraint/witness matrices sharded"; VERDICT r3 item 9).
        def pad_csr(mat):
            R = mat.cols.shape[0]
            Rp = -(-R // ndev) * ndev
            if Rp == R:
                return mat.cols, mat.coeffs
            return (
                jnp.pad(mat.cols, ((0, Rp - R), (0, 0))),
                jnp.pad(mat.coeffs, ((0, Rp - R), (0, 0), (0, 0))),
            )

        self._csr = {name: pad_csr(getattr(pk, "mat_" + name))
                     for name in ("a", "b", "c")}
        # natural-order h table (the dist h pipeline emits natural-order
        # coefficients, unlike the single-chip bitrev path): coefficient n-1
        # is structurally zero -> identity row
        h_nat = table_from_query_u32(
            pc1, g16.g1_ops, pk.h_query, perm=list(range(n - 1)) + [-1]
        )
        self.h_tbl = jnp.asarray(h_nat)

        self._digits8 = digits8_from_limbs
        self._prep = jax.jit(self._prep_impl)

    # -- device pipeline up to the h digits ---------------------------------
    def _prep_impl(self, z_mont):
        """z (M, L) legacy-Montgomery limbs -> natural-order signed h
        digits (n, W) int32 via matvec + distributed six-step h pipeline."""
        pk = self.pk
        g16 = self.g16
        plan = g16._witness_plan(pk.domain_size)
        df = plan.df
        n, ni, nc = pk.domain_size, pk.num_instance, pk.num_constraints

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis), P()),
            out_specs=P(self.axis),
            check_vma=False,
        )
        def mv(cols, coeffs, zm):
            return plan._matvec_impl(cols, coeffs, zm)

        a_rows = mv(*self._csr["a"], z_mont)[:nc]
        b_rows = mv(*self._csr["b"], z_mont)[:nc]
        c_rows = mv(*self._csr["c"], z_mont)[:nc]
        pad = n - nc - ni
        zeros_pad = jnp.zeros((pad, df.L), dtype=z_mont.dtype)
        zeros_inst = jnp.zeros((ni, df.L), dtype=z_mont.dtype)
        a_evals = jnp.concatenate([a_rows, z_mont[:ni], zeros_pad], axis=0)
        b_evals = jnp.concatenate([b_rows, zeros_inst, zeros_pad], axis=0)
        c_evals = jnp.concatenate([c_rows, zeros_inst, zeros_pad], axis=0)

        def to_planes(evals_u32):
            d = self._digits8(evals_u32, df.L).astype(F32)
            d = jnp.pad(d, ((0, self.pf.R8 - d.shape[0]), (0, 0)))
            return self.dntt.k.remont(d)[0]

        h = self.dntt.h_from_evals(
            to_planes(a_evals), to_planes(b_evals), to_planes(c_evals)
        )
        h_std = self.dntt.k.tostd(h)[0]  # canonical std digit planes
        from ..ops.msm import signed_digits_from_u8_planes

        nbits = g16.curve.fr.num_bits
        return signed_digits_from_u8_planes(h_std, self.c, nbits)

    # -- public API ----------------------------------------------------------
    def prove(self, circuit, rng=None, r: int | None = None,
              s: int | None = None, deterministic: bool = False):
        from ..groth16.groth16 import assemble_proof
        from ..relations import SynthesisMode, new_ref

        g16 = self.g16
        pk = self.pk
        fr = g16.fr
        if rng is None and r is None and s is None and not deterministic:
            raise ValueError(
                "prove() needs rng=, explicit r/s, or deterministic=True "
                "(see Groth16.prove)"
            )
        r = fr.rand(rng) if r is None and rng is not None else (r or 0)
        s = fr.rand(rng) if s is None and rng is not None else (s or 0)

        cs = new_ref(fr)
        cs.set_mode(SynthesisMode.prove(construct_matrices=False,
                                        generate_lc_assignments=False))
        circuit.generate_constraints(cs)
        z = cs.full_assignment()
        assert len(z) == pk.num_instance + pk.num_witness

        plan = g16._witness_plan(pk.domain_size)
        z_mont = plan.df.array(z)
        h_digits = self._prep(z_mont)

        nbits = g16.curve.fr.num_bits
        mp = self.a_tbl.shape[0]
        z_digits = np.zeros((mp, self.W), dtype=np.int32)
        z_digits[: len(z)] = np.asarray(
            scalars_to_digits_signed(fr.to_limbs_array(z), self.c, nbits)
        )
        nwp = self.l_tbl.shape[0]
        l_digits = np.zeros((nwp, self.W), dtype=np.int32)
        ni = pk.num_instance
        l_digits[: len(z) - ni] = z_digits[ni : len(z)]

        hg1, hg2 = g16.hg1, g16.hg2
        # dispatch all five distributed window-sum pipelines before the
        # first host sync (overlap host Horner with device compute)
        sA = self.msm_g1.window_sums(self.a_tbl, z_digits)
        sB = self.msm_g2.window_sums(self.b2_tbl, z_digits)
        sB1 = self.msm_g1.window_sums(self.b1_tbl, z_digits)
        sL = self.msm_g1.window_sums(self.l_tbl, l_digits)
        sH = self.msm_g1.window_sums(self.h_tbl, h_digits)
        W = self.W
        A_sum = self.msm_g1.combine_host(sA, W, hg1)
        B_sum = self.msm_g2.combine_host(sB, W, hg2)
        B1_sum = self.msm_g1.combine_host(sB1, W, hg1)
        L_sum = self.msm_g1.combine_host(sL, W, hg1)
        H_sum = self.msm_g1.combine_host(sH, int(h_digits.shape[1]), hg1)
        return assemble_proof(g16, pk, A_sum, B_sum, B1_sum, L_sum, H_sum, r, s)
