"""Pippenger MSM over fused Pallas curve kernels (plane layout).

Same algorithm shape as ops/msm.py (sort + bucket-parallel scan — the
TPU-native recast of ark-ec's VariableBaseMSM, SURVEY.md §2.3/§7), but the
group arithmetic is the fused Pallas complete-add kernel on digit planes
(ops/pallas_curve.py), and the sorted-points array is never materialized:
each scan step double-gathers (perm, then points) only the (W·2^c)-lane
frontier, so peak memory is O(W·2^c) points instead of O(W·N).

Phases (all device, inside one jit):
  1. per-window sort of digits with index payload (XLA sort);
  2. searchsorted -> per-bucket [start, length);
  3. while-loop: one masked fused add per step, W·2^c lanes in parallel;
  4. bucket reduction Σ b·B_b: stride-doubling suffix scan + total sum
     (2c masked-add steps over the same lanes);
  5. window combine: Horner with the fused double kernel (or host).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import CurveParams
from .pallas_field_v3 import F32
from .pallas_curve import (
    get_plane_curve,
    make_masked_add,
    make_masked_mixed_add_rows,
    make_point_add,
    make_point_double,
    rows_pad_width,
    unpack_points_host,
)


class PlaneMsm:
    """Jitted plane-MSM executor for one (curve, c, num_bits, tile).

    Replica keys: a window with only b < c digit bits (the top window of a
    254-bit scalar at c=10 has 4) would produce 2^b huge buckets and blow
    up the data-dependent scan length (max bucket size drives the while
    loop for ALL windows). Instead every window gets exactly 2^c slots:
    slot = digit·2^r | (i & (2^r - 1)) with r = c - b, i.e. each real
    bucket is split across 2^r replica slots of uniform expected size.
    Replicas are collapsed with r static masked folds before the bucket
    reduction; the suffix scans then run on the 2^r-strided coarse grid
    (masks precomputed per window — all static).
    """

    def __init__(
        self,
        curve: CurveParams,
        c: int,
        num_bits: int | None = None,
        tile: int | None = None,
        interpret: bool | None = None,
        group: str = "g1",
        signed: bool = False,
        k_steps: int | None = None,
    ):
        self.curve = curve
        self.pc = get_plane_curve(curve)
        self.c = c
        self.group = group
        self.K = 1 if group == "g1" else 2
        self.num_bits = num_bits or curve.fr.num_bits
        self.signed = signed

        # window/bucket geometry first (the auto tile pick needs lanes):
        # signed (balanced) digits use bucket index = |digit| - 1, so only
        # 2^(c-1) bucket slots per window (cb bucket bits); signs ride the
        # gather payload and the kernel negates Y in-kernel. Weighting
        # shifts from b to b+1, absorbed by keeping S_0 in the second
        # suffix scan (see _window_sums_impl).
        cb = self.cb = c - 1 if signed else c
        nb = 1 << cb
        if signed:
            w_u = -(-self.num_bits // c)
            b_top = self.num_bits - (w_u - 1) * c
            if b_top >= c:
                W = w_u + 1
                bits_w = [cb] * w_u + [0]
            else:
                W = w_u
                bits_w = [cb] * (W - 1) + [min(b_top, cb)]
        else:
            W = -(-self.num_bits // c)
            bits_w = [min(c, self.num_bits - w * c) for w in range(W)]
        self.W = W

        if tile is None:
            # bigger tiles amortize per-op scheduling/latency (measured:
            # 19.6 -> 20.3 M adds/s at 2^20 going 256 -> 1024), but the
            # kernels' scoped VMEM scales with K·R8·tile: measured OOMs at
            # 16M — BN254 G2 (K·R8 = 68) 20.01M and BLS12-381 G1
            # (R8 = 50) 18.05M, both at tile 1024, while BN254 G1
            # (K·R8 = 34) fits. Cap K·R8·tile <= 36864 (BN254-G1@1024
            # scale) and require tile | bucket-lane count.
            KR = (2 if group == "g2" else 1) * self.pc.R8
            tile = next(
                (
                    t
                    for t in (1024, 512, 256)
                    if KR * t <= 36864 and (W * nb) % t == 0
                ),
                256,
            )
        self.tile = tile
        self.madd = make_masked_add(curve, tile, interpret, group=group)
        import os

        # scan depth per kernel dispatch: each while-loop step gathers
        # k_steps rows per lane and the kernel chains k_steps masked adds
        # before the accumulator round-trips (amortizes acc DMA + launch).
        # Measured on v5e at c=13: k=4 wins for short scans (2^16: 0.26 ->
        # 0.20 s) where per-dispatch overhead dominates, k=1 wins at 2^20
        # (18.8 vs 17.2 M adds/s) where the kernel is compute-bound and
        # batching only adds trip-count round-up waste.
        if k_steps is None:
            k_steps = int(os.environ.get("SNARK_TPU_MSM_K", "1"))
        self.k_steps = k_steps
        self.mixed_madd_rows = make_masked_mixed_add_rows(
            curve, tile, interpret, group=group, k_steps=self.k_steps
        )
        self.rows_w = rows_pad_width(curve, group)
        self.add = make_point_add(curve, tile, interpret, group=group)
        self.dbl = make_point_double(curve, tile, interpret, group=group)

        r_w = np.array([cb - b for b in bits_w], dtype=np.int64)
        mult_w = (1 << r_w).astype(np.uint32)  # replicas per bucket
        self.MULT = mult_w.reshape(W, 1)
        slot = np.arange(nb, dtype=np.int64)[None, :]  # (1, nb)
        rw = r_w[:, None]
        mult = mult_w.astype(np.int64)[:, None]
        # collapse fold masks, step j: fold slot += slot+2^j where
        # r_w > j and slot % 2^{j+1} == 0
        self.max_r = int(r_w.max())
        self.COLLAPSE = [
            ((rw > j) & (slot % (1 << (j + 1)) == 0)).reshape(1, W * nb)
            for j in range(self.max_r)
        ]
        # suffix-scan masks, step k (stride 2^k): valid where the stride is
        # on this window's coarse grid, the slot is a bucket slot, and the
        # rolled-in neighbour exists
        self.SCAN = [
            (
                ((1 << k) >= mult)
                & (slot % mult == 0)
                & (slot + (1 << k) < nb)
            ).reshape(1, W * nb)
            for k in range(cb)
        ]
        # bucket-0 suppression (digit == 0 <=> slot < mult); also used to
        # zero S_0 between the two scans
        self.BUCKET0 = (slot < mult).reshape(1, W * nb)
        # spill lanes (load balancing; see _window_sums_impl): a multiple of
        # tile, ~10% of the main lanes, 0 disables
        sl = os.environ.get("SNARK_TPU_MSM_SPILL")
        if sl is not None:
            self.spill_lanes = int(sl)
        else:
            lanes = W * nb
            self.spill_lanes = (
                max(1, (lanes // 10) // tile) * tile if lanes >= 8 * tile else 0
            )
        # max spilled buckets per call (top-k size); lanes are allocated
        # to them proportionally to overflow (see _bucket_accum_impl)
        self.spill_buckets = int(
            os.environ.get("SNARK_TPU_MSM_SPILL_BUCKETS", "2048")
        )
        # batch-affine bucket accumulation (ops/msm_affine.py): pairwise
        # affine tree + per-level batch inversion; needs a few elements
        # per bucket on average to beat the projective scan's setup.
        # Default OFF: measured 0.86x of the projective scan at 2^20
        # uniform AND clustered (r5 A/B, scripts/bench_affine_msm.py) —
        # the phase-split HBM round-trips + per-kernel overheads offset
        # the ~2x arithmetic win; see ROADMAP.md for the measured
        # breakdown and what would close the gap.
        # G2 affine is TPU-only: XLA:CPU deterministically SEGFAULTS
        # compiling the full-width emu form of the G2 phase kernels
        # (fresh-process repro, r5).
        self.use_affine = os.environ.get(
            "SNARK_TPU_MSM_AFFINE", "0"
        ) == "1" and not (group == "g2" and jax.default_backend() == "cpu")
        self._affine = None
        self._sums = jax.jit(self._window_sums_impl)
        self._combine = jax.jit(self._combine_impl)

    # -- helpers ----------------------------------------------------------
    def identity_planes(self, n: int):
        pf = self.pc.pf
        KR = self.K * pf.R8
        X = jnp.zeros((KR, n), F32)
        one = np.concatenate(
            [pf.ONE_MONT_COL] + [np.zeros_like(pf.ONE_MONT_COL)] * (self.K - 1),
            axis=0,
        )
        Y = jnp.broadcast_to(jnp.asarray(one), (KR, n))
        Z = jnp.zeros((KR, n), F32)
        return X, Y, Z

    def _masked_step(self, acc, gathered, mask):
        aX, aY, aZ = acc
        gX, gY, gZ = gathered
        return self.madd(aX, aY, aZ, gX, gY, gZ, mask)

    def sort_keys(self, digits_t):
        """Replica-slot sort keys + gather payload for (W, N) digits.

        Single source of truth for the keying scheme (used by the scan and
        by scripts/profile_msm.py): key = bucket·2^r | (i mod 2^r); signed
        mode maps |digit|-1 to the bucket, drops zeros past the last
        searchsorted boundary via key = nb, and carries the digit SIGN in
        the payload's high bit (bit 31) — the table stays N positive rows
        and the add kernel flips the gathered Y in-kernel (neg_y).
        """
        W, n = digits_t.shape
        nb = 1 << self.cb
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32), (W, n))
        mult = jnp.asarray(self.MULT)  # (W, 1) uint32
        if self.signed:
            mag = jnp.abs(digits_t).astype(jnp.uint32)
            keys = jnp.where(
                mag == 0,
                jnp.uint32(nb),
                (mag - 1) * mult + (iota & (mult - 1)),
            )
            payload = iota | jnp.where(
                digits_t < 0, jnp.uint32(0x80000000), jnp.uint32(0)
            )
        else:
            keys = digits_t * mult + (iota & (mult - 1))
            payload = iota
        return keys, payload

    # -- phase 1-4: per-window bucket sums ---------------------------------
    def _window_sums_impl(self, table, digits_t):
        """table (N, 2·R8+1) uint8 rows (X digits ‖ Y digits ‖ z-flag, in
        wide-Mont canonical form); digits_t (W, N) uint32 -> (R8, W·pad)
        triple of window totals in lanes [0, W).

        Row-major u8 storage because XLA TPU gathers cost ~18 ns/row
        regardless of width (measured): one u8 row gather per step beats
        three f32 plane gathers 3x. The f32 cast + transpose back to plane
        layout is bandwidth-cheap.
        """
        acc3 = self._bucket_accum(table, digits_t)
        tX, tY, tZ = self._fold_block(acc3, jnp.int32(0), self.W)
        pad = self.tile - self.W % self.tile if self.W % self.tile else 0
        if pad:
            tX = jnp.pad(tX, ((0, 0), (0, pad)))
            tY = jnp.pad(tY, ((0, 0), (0, pad)))
            tZ = jnp.pad(tZ, ((0, 0), (0, pad)))
        return tX, tY, tZ

    def _sorted_buckets(self, table, digits_t):
        """Phases 1-2 (sort + searchsorted): -> (table_p, perm_flat,
        start_f, length_f, n) shared by the projective scan and the
        affine-tree accumulator (ops/msm_affine.py)."""
        nb = 1 << self.cb
        W, n = digits_t.shape
        lanes = W * nb
        assert W == self.W, (W, self.W)
        assert lanes % self.tile == 0, (W, nb, self.tile)
        # signed and unsigned plans share the same N-row positive table:
        # digit signs ride the payload high bit and the kernel negates the
        # gathered Y in-kernel (pallas_curve neg_y)
        assert table.shape[0] == n, (
            f"table has {table.shape[0]} rows; plan with N={n} digits"
            f" requires {n}"
        )
        keys, payload = self.sort_keys(digits_t)
        d_sorted, perm = jax.lax.sort_key_val(keys, payload, dimension=-1)

        targets = jnp.broadcast_to(
            jnp.arange(nb + 1, dtype=jnp.uint32), (W, nb + 1)
        )
        boundaries = jax.vmap(jnp.searchsorted)(d_sorted, targets)  # (W, nb+1)
        start = boundaries[:, :-1].astype(jnp.int32)
        length = (boundaries[:, 1:] - boundaries[:, :-1]).astype(jnp.int32)
        if not self.signed:
            # digit-0 slots contribute nothing (signed mode drops them via
            # the out-of-range sort key instead)
            length = jnp.where(
                jnp.asarray(self.BUCKET0).reshape(W, nb), 0, length
            )
        length_f = length.reshape(lanes)
        start_f = start.reshape(lanes)

        # width-pad once per call (in-jit; ~bandwidth-free) so gathered
        # blocks feed the in-kernel decode directly
        table_p = jnp.pad(table, ((0, 0), (0, self.rows_w - table.shape[1])))
        return table_p, perm.reshape(W * n), start_f, length_f, n

    def _bucket_accum(self, table, digits_t):
        """Bucket accumulation dispatch: the batch-affine tree when the
        mean bucket length (n / 2^cb) is >= ~8 (it needs a few elements
        per bucket to amortize its block padding), the masked projective
        scan otherwise. Both produce identical (X, Y, Z) accumulator
        lanes (group-element-equal; digit representations differ)."""
        n = digits_t.shape[1]
        if self.use_affine and n >= (8 << self.cb):
            return self._bucket_accum_affine(table, digits_t)
        return self._bucket_accum_impl(table, digits_t)

    def _bucket_accum_impl(self, table, digits_t):
        """Phases 1-3 (sort, searchsorted, masked scan + spill fold):
        -> (X, Y, Z) bucket accumulators over all W·2^cb replica lanes."""
        nb = 1 << self.cb
        W, n = digits_t.shape
        table_p, perm_flat, start_f, length_f, _ = self._sorted_buckets(
            table, digits_t
        )
        lanes = W * nb
        lane_base = (jnp.arange(lanes, dtype=jnp.int32) // nb) * n
        return self._run_scan(
            table_p, perm_flat, lane_base, start_f, length_f, n,
            mean_hint=max(1, n // nb),
        )

    def _bucket_accum_affine(self, table, digits_t):
        """Affine-tree bucket accumulation (ops/msm_affine.py): pairwise
        batch-affine adds over per-bucket aligned blocks, then the masked
        projective scan over the per-block partials."""
        from .msm_affine import AffineAccum

        nb = 1 << self.cb
        W, n = digits_t.shape
        table_p, perm_flat, start_f, length_f, _ = self._sorted_buckets(
            table, digits_t
        )
        if self._affine is None:
            self._affine = AffineAccum(self)
        # sentinel identity row at index n (all-zero: flag byte 0) for
        # out-of-range padded slots
        table_s = jnp.concatenate(
            [table_p, jnp.zeros((1, table_p.shape[1]), table_p.dtype)],
            axis=0,
        )
        return self._affine.accumulate(
            table_s, perm_flat, start_f, length_f, n,
            mean_len=max(1, n // nb),
        )

    def _run_scan(
        self, table_p, perm_flat, lane_base, start_f, length_f, n,
        mean_hint: int,
    ):
        """Phase 3: masked-add scan (+ rank-split spill) over per-lane
        element runs. Generic over the element source: lane l scans
        perm_flat[lane_base[l] + start_f[l] + i] for i < length_f[l],
        gathering u8 rows from table_p. Used by the per-bucket sorted-run
        scan (lane_base = window offsets, perm = sort payload) and by the
        affine path's per-block partial scan (lane_base = 0, perm =
        identity)."""
        lanes = start_f.shape[0]

        # ---- spill scheduling (scatter-free load balancing) --------------
        # The while-loop trip count is the MAX bucket length; the mean is
        # n_eff/nb, so the Poisson tail wastes ~(max-mean)/max of every
        # masked step. Cap the main scan at T1 = mean + 1.5σ and run the
        # overflow of the ≤S2 longest buckets on the spill lanes, with
        # each spilled bucket's overflow RANK-SPLIT evenly across ksp
        # lanes (lane (b, j) scans [start_b + T1 + j·q_b, +q_b)). The
        # even split is what keeps pathological inputs bounded: real
        # witnesses cluster (e.g. ~44-bit values put ~5% of N into single
        # boundary-window buckets — measured on the 2^16 MulChain; a
        # single-lane spill serialized 6.6k steps, 3.5x the whole MSM).
        # Safety without scatter: with kth = S2-th largest length and
        # t* = max(T1, kth), the spilled set {length > t*} always has
        # < S2 members, and non-spilled buckets keep their full length in
        # the main scan — correct even if > S2 buckets exceed T1.
        S = self.spill_lanes
        S2 = min(self.spill_buckets, max(1, S // 4))
        # S2 trades main-scan length against spill granularity: t* is the
        # S2-th largest bucket length, so larger S2 keeps the main scan
        # shorter on uniform inputs while skewed inputs still spread over
        # all S lanes proportionally
        use_spill = S > 0 and lanes > S
        if use_spill:
            mean = mean_hint
            T1 = int(mean + max(2, int(1.5 * mean**0.5)))
            top_vals, top_idx = jax.lax.top_k(length_f, S2)
            kth = top_vals[S2 - 1]
            t_star = jnp.maximum(jnp.int32(T1), kth)
            spilled_k = top_vals > t_star  # (S2,) among the top-k
            eff_len = jnp.where(
                length_f > t_star, jnp.minimum(length_f, T1), length_f
            )
        else:
            eff_len = length_f
        max_len = jnp.max(eff_len)

        acc = self.identity_planes(lanes)

        KS = self.k_steps
        offs = jnp.arange(KS, dtype=jnp.int32)

        def gather_rows(pay2):
            # payload (lanes, KS) -> ((lanes, KS·rows_w) u8 rows,
            # (KS, lanes) f32 sign planes). Bit 31 of the payload is the
            # digit sign (signed mode; always 0 unsigned) — the table has
            # only the N positive rows and the kernel flips Y in-kernel.
            idx2 = (pay2 & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
            flat = jnp.take(table_p, idx2.reshape(-1), axis=0)
            rows = flat.reshape(idx2.shape[0], KS * self.rows_w)
            sgn = (pay2 >> 31).astype(F32).T
            return rows, sgn

        # flat 1-D perm gather: take_along_axis on (W, N) lowers to a
        # minor-axis lane gather (~42 ns/idx measured — 3.4 ms/step at
        # 81920 lanes); the flat row-style gather is ~10x cheaper
        def step_idx(i):
            pos = jnp.minimum(start_f[:, None] + (i + offs)[None, :], n - 1)
            return jnp.take(perm_flat, lane_base[:, None] + pos)

        # software-pipelined scan: the gather for the NEXT k_steps block is
        # issued before the fused adds consume the previous gather, so
        # XLA's latency-hiding scheduler overlaps the row gather with the
        # Pallas kernel (scripts/bench_scan_overlap.py)
        def cond(state):
            return state[0] < max_len

        def body(state):
            i, aX, aY, aZ, rows, sgn = state
            rows_next, sgn_next = gather_rows(step_idx(i + KS))
            # the row flag joins the bucket mask IN-KERNEL: identity rows
            # (padding or genuinely-zero query points) are skipped, which
            # IS adding the identity — required because the mixed add has
            # no affine encoding for it
            mask = ((i + offs)[:, None] < eff_len[None, :]).astype(F32)
            aX, aY, aZ = self.mixed_madd_rows(
                aX, aY, aZ, rows, jnp.concatenate([mask, sgn], axis=0)
            )
            return i + KS, aX, aY, aZ, rows_next, sgn_next

        rf0, sg0 = gather_rows(step_idx(jnp.int32(0)))
        _, bX, bY, bZ, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), *acc, rf0, sg0)
        )
        acc3 = (bX, bY, bZ)

        if use_spill:
            # fully-balanced spill: the S lanes are allocated to spilled
            # buckets PROPORTIONALLY to their overflow. Each bucket's
            # overflow is padded to a multiple of `chunk` in a virtual
            # concatenation (cum_pad), so every lane's fixed-size range
            # lies in exactly one bucket; worst-case spill trip count is
            # chunk = ceil(total_overflow / (S - S2)) regardless of skew
            # (a single monster bucket spreads over ~S lanes).
            ov = jnp.where(spilled_k, top_vals - T1, 0)  # (S2,)
            total_ov = jnp.sum(ov)
            chunk = jnp.maximum(
                jnp.int32(1), -(-total_ov // jnp.int32(S - S2))
            )
            lanes_b = -(-ov // chunk)  # lanes per bucket
            cum_pad = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(lanes_b * chunk)]
            )  # (S2+1,) padded-offset prefix
            g = jnp.arange(S, dtype=jnp.int32) * chunk
            b_of = (
                jnp.searchsorted(cum_pad, g, side="right").astype(jnp.int32)
                - 1
            )
            b_of = jnp.clip(b_of, 0, S2 - 1)
            o_l = g - jnp.take(cum_pad, b_of)  # in-bucket overflow offset
            ov_l = jnp.take(ov, b_of)
            bidx_l = jnp.take(top_idx, b_of)  # bucket lane index per spill lane
            sp_start = jnp.take(start_f, bidx_l) + T1 + o_l
            sp_len = jnp.clip(ov_l - o_l, 0, chunk)
            # element-source base of each spilled bucket's lane
            sp_base = jnp.take(lane_base, bidx_l).astype(jnp.uint32)
            sp_max = jnp.max(sp_len)
            sacc = self.identity_planes(S)

            def sp_idx(j):
                pos = jnp.minimum(sp_start[:, None] + (j + offs)[None, :], n - 1)
                return jnp.take(
                    perm_flat,
                    sp_base[:, None] + pos.astype(jnp.uint32),
                )

            def sp_cond(state):
                return state[0] < sp_max

            def sp_body(state):
                j, aX, aY, aZ, rows, sgn = state
                rows_next, sgn_next = gather_rows(sp_idx(j + KS))
                mask = ((j + offs)[:, None] < sp_len[None, :]).astype(F32)
                aX, aY, aZ = self.mixed_madd_rows(
                    aX, aY, aZ, rows, jnp.concatenate([mask, sgn], axis=0)
                )
                return j + KS, aX, aY, aZ, rows_next, sgn_next

            _, sX, sY, sZ, _, _ = jax.lax.while_loop(
                sp_cond, sp_body,
                (jnp.int32(0), *sacc, *gather_rows(sp_idx(jnp.int32(0)))),
            )
            # collapse each bucket's chunk partials into its FIRST spill
            # lane: segmented suffix-sum over the lane axis — masked adds
            # where the rolled-in lane still belongs to the same bucket.
            # lax.while_loop with the TRACED bound max(lanes per bucket):
            # uniform inputs need ~2-4 doubling steps, not log2(S)=14
            # (a static full chain cost -18% on the uniform 2^20 bench)
            max_lpb = jnp.max(lanes_b)
            lane_ids = jnp.arange(S, dtype=jnp.int32)

            def sf_cond(state):
                return state[0] < max_lpb

            def sf_body(state):
                st, aX, aY, aZ = state
                rolled = tuple(
                    jnp.roll(a, -st, axis=1) for a in (aX, aY, aZ)
                )
                same = (
                    (b_of == jnp.roll(b_of, -st)) & (lane_ids + st < S)
                )
                aX, aY, aZ = self.madd(
                    aX, aY, aZ, *rolled, same.reshape(1, S).astype(F32)
                )
                return st * 2, aX, aY, aZ

            _, sX, sY, sZ = jax.lax.while_loop(
                sf_cond, sf_body, (jnp.int32(1), sX, sY, sZ)
            )
            # fold spill partials back: inverse map lane -> spill slot
            # (bucket b's total sits at its first lane, cum_pad[b]/chunk)
            first_lane = (jnp.take(cum_pad, jnp.arange(S2)) // chunk).astype(
                jnp.int32
            )
            inv = (
                jnp.full((lanes,), -1, jnp.int32)
                .at[top_idx]
                .set(jnp.where(spilled_k, first_lane, -1))
            )
            safe = jnp.maximum(inv, 0)
            g_sp = (
                jnp.take(sX, safe, axis=1),
                jnp.take(sY, safe, axis=1),
                jnp.take(sZ, safe, axis=1),
            )
            mask_sp = (inv >= 0).reshape(1, lanes).astype(F32)
            acc3 = self._masked_step(acc3, g_sp, mask_sp)

        return acc3

    def _fold_block(self, acc3, win0, num_win: int):
        """Phases 4: collapse replica slots + double suffix scan, on a
        block of `num_win` whole windows starting at (traced) window index
        `win0` -> window totals (K·R8, num_win).

        Block-parametrized so the distributed MSM can shard the fold
        phases by window after exchanging bucket accumulators (each chip
        folds W/ndev windows instead of all W — see DistPlaneMsm).
        """
        nb = 1 << self.cb
        blanes = num_win * nb

        def rolled(a3, stride):
            def roll3(A):
                return jnp.roll(
                    A.reshape(A.shape[0], num_win, nb), -stride, axis=2
                ).reshape(A.shape[0], blanes)

            return tuple(roll3(a) for a in a3)

        def slice_masks(masks):
            """(steps, W·nb) np -> (steps, blanes) at window offset win0."""
            m = jnp.asarray(np.concatenate(masks, axis=0).astype(np.float32))
            return jax.lax.dynamic_slice(
                m, (0, win0 * nb), (m.shape[0], blanes)
            )

        # fori_loops with traced strides (2^j) + mask tables indexed by
        # the counter: ONE traced instance of the fused-add body per
        # phase instead of one per step (the unrolled form inlined the
        # madd body ~20x and blew the CPU-emu trace/compile budget).
        def fold_loop(a3, masks_f, n_steps):
            def body(j, a3):
                g = rolled(a3, 1 << j)
                return self._masked_step(a3, g, masks_f[j][None, :])

            return jax.lax.fori_loop(0, n_steps, body, a3)

        # collapse replica slots: bucket b of window w lands at slot b·2^r
        if self.max_r:
            acc3 = fold_loop(acc3, slice_masks(self.COLLAPSE), self.max_r)

        # Σ_b w(b)·B_b per window == double suffix scan on the coarse grid:
        # S_b = Σ_{j>=b} B_j, then Σ_{b>=1} S_b gives weight w(b) = b
        # (unsigned). Signed buckets carry weight w(b) = b+1 (bucket b holds
        # |digit| = b+1): keep S_0 in the second scan, Σ_{b>=0} S_b.
        scan_masks = slice_masks(self.SCAN)

        def scan(a3):
            return fold_loop(a3, scan_masks, self.cb)

        suffix = scan(acc3)
        if self.signed:
            seeded = suffix
        else:
            # zero out slot 0 (S_0 = Σ all; we want Σ_{b>=1} S_b)
            idp = self.identity_planes(blanes)
            slot_ids = jnp.arange(nb, dtype=jnp.int32)
            is_s0 = (slot_ids == 0)[None, :]
            mask0 = (
                jnp.broadcast_to(is_s0, (num_win, nb))
                .reshape(1, blanes)
                .astype(F32)
            )
            seeded = tuple(
                mask0 * i + (1 - mask0) * s for i, s in zip(idp, suffix)
            )
        totals = scan(seeded)
        # window totals live at slot 0 of each window
        tX = totals[0].reshape(-1, num_win, nb)[:, :, 0]
        tY = totals[1].reshape(-1, num_win, nb)[:, :, 0]
        tZ = totals[2].reshape(-1, num_win, nb)[:, :, 0]
        return tX, tY, tZ

    # -- phase 5: Horner window combine on device --------------------------
    def _combine_impl(self, tX, tY, tZ, W: int):
        c = self.c
        tile = self.tile
        acc = self.identity_planes(tile)

        def window_body(w, acc3):
            def dbl_step(_, a3):
                return self.dbl(*a3)

            acc3 = jax.lax.fori_loop(0, c, dbl_step, acc3)
            wi = W - 1 - w
            q = tuple(
                jnp.pad(
                    jax.lax.dynamic_slice_in_dim(t, wi, 1, axis=1),
                    ((0, 0), (0, tile - 1)),
                )
                for t in (tX, tY, tZ)
            )
            return self.add(*acc3, *q)

        aX, aY, aZ = jax.lax.fori_loop(0, W, window_body, acc)
        return aX[:, :1], aY[:, :1], aZ[:, :1]

    # -- public API ---------------------------------------------------------
    def window_sums(self, table, digits):
        """table (N, 2R8+1) uint8 point rows; digits (N, W) uint32."""
        return self._sums(table, jnp.asarray(digits).T)

    def msm(self, table, digits):
        """Full MSM on device -> (X, Y, Z) single-lane planes."""
        W = int(digits.shape[1])
        tX, tY, tZ = self.window_sums(table, digits)
        return self._combine(tX, tY, tZ, W)

    def combine_host(self, sums3, W: int, host_curve):
        """Horner window combine on host from device window-total planes.

        Split from msm_host so callers can DISPATCH several MSMs' window
        sums before the first device->host sync: the np.asarray readback
        here is the only blocking point, and host Horner of MSM k then
        overlaps the device compute of MSM k+1 (the prover's five-MSM
        overlap — VERDICT r3 item 5)."""
        tX, tY, tZ = sums3
        affs = unpack_points_host(
            self.pc,
            np.asarray(tX[:, :W]),
            np.asarray(tY[:, :W]),
            np.asarray(tZ[:, :W]),
            group=self.group,
        )
        acc = None
        for w in range(W - 1, -1, -1):
            for _ in range(self.c):
                acc = host_curve.double(acc)
            acc = host_curve.add(acc, affs[w])
        return acc

    def msm_host(self, table, digits, host_curve):
        """Window sums on device, Horner combine on host (robust path)."""
        W = int(digits.shape[1])
        return self.combine_host(
            self.window_sums(table, digits), W, host_curve
        )


_PLANS: dict = {}


def get_plane_msm(
    curve: CurveParams,
    c: int,
    num_bits: int | None = None,
    tile: int | None = None,
    interpret: bool | None = None,
    group: str = "g1",
    signed: bool = False,
    k_steps: int | None = None,
) -> PlaneMsm:
    import os

    # resolve the env default BEFORE the cache key: otherwise changing
    # SNARK_TPU_MSM_K mid-process silently returns a plan built with the
    # old k, and k_steps=None vs an equal explicit k compile twice
    if k_steps is None:
        k_steps = int(os.environ.get("SNARK_TPU_MSM_K", "1"))
    key = (
        curve.name, c, num_bits, tile, interpret, group, signed, k_steps,
        os.environ.get("SNARK_TPU_MSM_AFFINE", "0"),
    )
    plan = _PLANS.get(key)
    if plan is None:
        plan = PlaneMsm(
            curve, c, num_bits, tile, interpret, group, signed, k_steps
        )
        _PLANS[key] = plan
    return plan


def pick_window_plane(n: int, budget_bytes: float = 2e9) -> int:
    """Pippenger window for the plane MSM: ~log2(n)-6 clamped to [8, 16],
    further capped so W·2^c bucket accumulators fit the memory budget."""
    import math

    c = int(max(8, min(16, math.floor(math.log2(max(n, 256))) - 6)))
    while c > 8:
        W = -(-256 // c)
        if W * (1 << c) * 3 * 40 * 4 <= budget_bytes:
            break
        c -= 1
    return c


def pick_window_plane_signed(n: int, budget_bytes: float = 2e9) -> int:
    """Signed (balanced) window pick: one extra window bit at the same
    bucket-lane budget as the unsigned pick (2^(c-1) slots per window)."""
    return min(16, pick_window_plane(n, budget_bytes) + 1)
