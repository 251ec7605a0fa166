"""Pallas TPU kernel: the ENTIRE greedy cross-view association in ONE launch.

The association (reference skeleton_3d_triang_mult_node.cpp:562-674, rebuilt
as a fixed-shape scan in fusion.associate) is a C-step sequential fold: each
camera's detections are matched against the hypothesis set accumulated from
the previous cameras. As an XLA `lax.scan` every step costs a serialized
round of small kernels plus a separate Pallas JV launch whose latency cannot
be hidden (each step depends on the previous one) — at 64 cameras that chain
dominates the scaled frame budget.

Here the whole fold runs inside one kernel: grid = (frame groups, cameras)
with sequential ("arbitrary") semantics, the hypothesis state lives in the
output block (resident in VMEM across the camera steps), the per-step
hypothesis x detection cost assembly is one MXU matmul against the
hypotheses' one-hot observation identities, and the assignment solve reuses
the sublane-batched JV core (ops.hungarian_pallas.jv_core_batched) with all
eight frames of a group packed into the sublanes of its state tiles. The
JV runs only on steps where some frame has an ambiguous pairing (the
reference's :628 gate); unambiguous steps take the mask-derived assignment.

Orientation note: everything is computed with hypotheses in LANES and
detections in SUBLANES (the transpose of fusion._associate_camera's
[H, D] layout), because the cost assembly's natural MXU product is
[4*Dp, Xp] x [Xp, H]. The JV therefore solves the TRANSPOSED assignment
problem (rows = detections); its `roc` output — row matched to each
column — is then exactly the per-hypothesis assigned detection. On tied
optima the transposed row-insertion order can pick a different equal-total
assignment than ops.hungarian's hypothesis-major order (the same
acknowledged boundary as vs the reference's Munkres, see
tests/test_reference_parity.py::test_hungarian_tie_break_divergence_boundary);
on continuous costs the optimum is unique and the paths agree exactly.

Falls back to interpreter mode off-TPU (the CPU test suite runs the same
code path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smartedgesensor3dhumanpose_tpu.ops import hungarian_pallas

_LANES = 128
_SUBS = 8
_CLIP = 1.0e3  # fusion._ASSIGN_COST_CLIP
_TIE_EPS = 1.0e-3  # fusion._SOLVER_TIE_EPS (keep in sync)


def _r8(x: int) -> int:
    return max(8, -(-x // 8) * 8)


def _flip_row_to_col(row, m: int):
    """[1, m] lane vector -> [m, 1] sublane vector (masked-reduce transpose).

    dtypes pinned: under x64 (CPU interpret tests) jnp.sum would promote."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    return jnp.sum(
        jnp.where(sub == lane, row, 0), axis=1, keepdims=True,
        dtype=row.dtype,
    )


def _flip_col_to_row(col, m: int):
    """[m, 1] sublane vector -> [1, m] lane vector."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    return jnp.sum(
        jnp.where(sub == lane, col, 0), axis=0, keepdims=True,
        dtype=col.dtype,
    )


def _assoc_kernel(
    # static
    cams: int,
    h_cap: int,
    d_real: int,
    dp: int,
    n_live: int,
    gate: float,
    max_cost: float,
    # refs
    ctab_ref,       # [8, 1, Dp, Xp] f32 in
    conf_ref,       # [8, Xp] f32 in
    dok_ref,        # [8, C, Dp] i32 in (full block; row c selected in-kernel
                    # — a (1, Dp) camera block would violate the TPU tiling
                    # rule that block minors divide (8, 128))
    ds_out_ref,     # [8, C, 128] i32 out (hypothesis state, resident)
    counts_out_ref,  # [8, 128] i32 out (lane 0 n_hyp, lane 1 n_dropped)
    nh_smem,        # (8,) i32 scratch
    nd_smem,        # (8,) i32 scratch
    *jv_scratch,    # 8 x (8, 128) JV scratch refs
):
    c = pl.program_id(1)
    xp = cams * dp
    n_jv = max(h_cap, dp)
    r_pad = _r8(dp)
    f32 = jnp.float32

    h_lane_d = jax.lax.broadcasted_iota(jnp.int32, (dp, _LANES), 1)
    d_sub = jax.lax.broadcasted_iota(jnp.int32, (dp, _LANES), 0)
    h_row = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    hyp_live_lane = h_row < h_cap  # [1, 128]

    @pl.when(c == 0)
    def _init():
        ds_out_ref[:] = jnp.full(ds_out_ref.shape, -1, jnp.int32)
        counts_out_ref[:] = jnp.zeros(counts_out_ref.shape, jnp.int32)
        for b in range(_SUBS):
            nh_smem[b] = jnp.int32(0)
            nd_smem[b] = jnp.int32(0)

    # ---- per-frame fold of camera c ------------------------------------
    conf_all = conf_ref[:]  # [8, Xp]
    dok_all = dok_ref[:]    # [8, C, Dp]
    cam_sel = (
        jax.lax.broadcasted_iota(jnp.int32, (cams, dp), 0) == c
    )  # [C, Dp] one-hot row of the current camera
    # Only the first n_live sublanes carry real frames (the batch is padded
    # up to a multiple of 8); padded sublanes skip the whole per-frame
    # pipeline — their ds_out rows stay -1 and their counts stay 0, which is
    # exactly what the host-side [:b] slice expects. The JV still solves all
    # 8 sublanes (its state tiles are [8, 128]); padded sublanes get the
    # trivially-solvable matrix with an all-zero row-activity mask.
    jv_inputs = []
    frame_ctx = []
    need_any = jnp.int32(0)
    for b in range(n_live):
        ds = ds_out_ref[b]  # [C, 128] det_slot, -1 where unobserved
        ct = ctab_ref[b, 0]  # [Dp, Xp] cost, -1 sentinel where unusable

        # One-hot observation identities [Xp, H-lanes]: entry (c1*Dp+d1, h)
        # is 1 iff hypothesis h observes detection d1 in camera c1 (future
        # cameras hold -1 and contribute nothing; ctab is sentinel there
        # anyway).
        d1 = jax.lax.broadcasted_iota(jnp.int32, (cams, dp, _LANES), 1)
        oh = (ds[:, None, :] == d1).astype(f32).reshape(xp, _LANES)

        # Four per-observation tables derived from the sentinel block and
        # contracted in one [4*Dp, Xp] x [Xp, H] MXU product:
        # rows [0:Dp) cost*usable, [Dp:2Dp) usable, [2Dp:3Dp) vote-confident,
        # [3Dp:4Dp) vote-any (cost > gate implies usable: gate > 0 > -1).
        usable = (ct >= 0.0).astype(f32)
        big = (ct > gate).astype(f32)
        conf_b = conf_all[b:b + 1, :]  # [1, Xp]
        # Precision split — correctness-critical, not a nicety: at the MXU
        # default (one bf16 pass) a real-valued row is rounded to 8
        # mantissa bits before the multiply (~0.4% relative error), which
        # flips near-gate veto/feasibility decisions vs the XLA scan path
        # (observed on the adversarial bench scene: 3 person-validity flips
        # over 64 frames). Only the COST row is real-valued, so it alone
        # runs at HIGHEST (the 3-way f32 split makes the product against
        # the exact {0,1} one-hot reconstruct each value exactly, like
        # linalg.heinsum in fusion._associate_camera). The other three rows
        # are strictly {0,1} — usable/big by construction, and the
        # vote-confident row big*conf_b because conf_obs is a 0/1 flag
        # ((det_score > 0.5), fusion.py:363, zero-padded in _pack_inputs) —
        # so they are exact in a single bf16 pass with f32 accumulation
        # (counts <= Xp << 2^24) and skip the multi-pass cost.
        rhs_real = jnp.maximum(ct, 0.0)  # [Dp, Xp]
        rhs_bool = jnp.concatenate(
            [usable, big, big * conf_b], axis=0
        )  # [3Dp, Xp]
        sums_real = jax.lax.dot(
            rhs_real, oh, preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Dp, H-lanes]
        sums_bool = jax.lax.dot(
            rhs_bool, oh, preferred_element_type=f32
        )  # [3Dp, H-lanes]
        total = sums_real
        n_obs_used = sums_bool[0:dp]
        votes_all = sums_bool[dp:2 * dp]
        votes_conf = sums_bool[2 * dp:3 * dp]

        # Veto accumulation (:344-381) — identical arithmetic to
        # fusion._associate_camera, transposed to [Dp, H].
        n_obs_in_hyp = jnp.sum(
            (ds >= 0).astype(f32), axis=0, keepdims=True
        )  # [1, H]
        cost = total / jnp.maximum(n_obs_used, 1.0)
        n_votes = jnp.where(n_obs_in_hyp == 1.0, votes_all, votes_conf)
        n_obs_f = jnp.maximum(n_obs_in_hyp, 1.0)
        veto = n_votes / n_obs_f > 1.0 - 1.0 / (2.0 * n_obs_f)
        unusable = (n_obs_used < 0.5) | (n_obs_in_hyp == 0.0)
        cost = jnp.where(unusable, max_cost, cost)
        veto = veto | unusable

        # Detection usability [Dp, 1] (sublane orientation; camera row c
        # selected with a masked reduce — no dynamic sublane index).
        dok_row = jnp.sum(
            jnp.where(cam_sel, dok_all[b], 0), axis=0, keepdims=True,
            dtype=jnp.int32,
        )  # [1, Dp]
        dok = _flip_row_to_col(dok_row, dp) > 0  # [Dp, 1]
        cost = jnp.where(dok, cost, max_cost)
        veto = veto | ~dok

        mask = ~veto & (cost < gate)  # [Dp, H] feasible pairings

        # Solver needed when some detection or hypothesis has more than one
        # feasible pairing (:628).
        per_det = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)
        per_hyp = jnp.sum(mask.astype(jnp.int32), axis=0, keepdims=True)
        need_b = (
            jnp.sum((per_det > 1).astype(jnp.int32))
            + jnp.sum((per_hyp > 1).astype(jnp.int32))
        ) > 0
        need_any = need_any + need_b.astype(jnp.int32)

        # JV input: the clipped cost where a solve is needed, else a
        # trivially-solvable matrix (the early-exit makes it nearly free).
        # Lanes [h_cap, n_jv) are dummy hypothesis columns (zero, like the
        # XLA path's square padding). Clipped (infeasible) entries carry the
        # fusion._SOLVER_TIE_EPS deterministic tie-break — the product term
        # is transpose-symmetric, so this kernel's detection-major solve
        # picks the same assignment as fusion._associate_camera's
        # hypothesis-major one even on tied clipped optima. Invalid
        # detection rows (incl. the [d_real, dp) padding) sit on the
        # strictly higher fusion._INVALID_DET_COST tier, mirroring the XLA
        # path: a hopeless hypothesis column absorbs a VALID infeasible
        # detection in preference to an invalid one on both sides.
        trivial = jnp.where(d_sub == h_lane_d, 0.0, 1.0)
        clipped = jnp.minimum(cost, _CLIP)
        tie = _TIE_EPS * (d_sub + 1).astype(f32) * (h_lane_d + 1).astype(f32)
        tiered = jnp.where(clipped >= _CLIP, _CLIP + tie, clipped)
        tiered = jnp.where(dok, tiered, 2.0 * _CLIP)
        jv_cost = jnp.where(need_b, tiered, trivial)
        jv_cost = jnp.where(hyp_live_lane, jv_cost, 0.0)
        jv_cost = jnp.where(h_lane_d < n_jv, jv_cost, 0.0)
        if r_pad > dp:
            jv_cost = jnp.concatenate(
                [jv_cost, jnp.zeros((r_pad - dp, _LANES), f32)], axis=0
            )
        jv_inputs.append(jv_cost)
        frame_ctx.append((ds, mask, dok, need_b))

    if n_live < _SUBS:
        # Padded sublanes: the trivially-solvable diagonal matrix (pure
        # iota — Mosaic folds it at compile time).
        pad_cost = jnp.where(d_sub == h_lane_d, 0.0, 1.0)
        pad_cost = jnp.where(hyp_live_lane, pad_cost, 0.0)
        pad_cost = jnp.where(h_lane_d < n_jv, pad_cost, 0.0)
        if r_pad > dp:
            pad_cost = jnp.concatenate(
                [pad_cost, jnp.zeros((r_pad - dp, _LANES), f32)], axis=0
            )
        jv_inputs.extend([pad_cost] * (_SUBS - n_live))

    # ---- one sublane-batched JV for the whole frame group ---------------
    roc_ref = jv_scratch[2]

    # Lane-of-row activity mask [8, 128]: only THIS camera's valid
    # detections are matched. An invalid row's matching is filtered by the
    # consumer below (roc < d_real and dok gates), and — because its
    # 2*_CLIP tier is strictly worse than any valid row's entries — an
    # invalid row never displaces a valid one, so skipping its augmenting
    # search changes nothing; on crowded 64-camera frames invalid rows are
    # a third of the rows and most of the solver's sequential work. The
    # skip is ONLY sound without dummy zero columns (h_cap >= dp): with
    # dummy columns present, unmatched-row slack would let a feasible
    # detection escape to a free zero column instead of extending its
    # hypothesis (the square problem's row/column completeness is what
    # forces feasible pairs to be used).
    if h_cap >= dp:
        dok_cam = jnp.sum(
            jnp.where(cam_sel[None], dok_all, 0), axis=1, dtype=jnp.int32
        )  # [8, Dp]
        row_act = jnp.concatenate(
            [dok_cam, jnp.zeros((_SUBS, _LANES - dp), jnp.int32)], axis=1
        )
    else:
        row_act = None

    @pl.when(need_any > 0)
    def _solve():
        hungarian_pallas.jv_core_batched(
            max(h_cap, dp), jnp.stack(jv_inputs, axis=0), *jv_scratch,
            n_rows=dp, row_active=row_act, invert=False,
        )

    roc_all = roc_ref[:]  # [8, 128]: row (detection) matched to each column

    # ---- interpret assignments + update state ---------------------------
    for b in range(n_live):
        ds, mask, dok, need_b = frame_ctx[b]
        # Solver assignment per hypothesis lane: the matched detection row
        # (columns ARE hypotheses in the transposed problem), -1 where the
        # match is a dummy/invalid row or the lane is beyond the capacity.
        roc_b = roc_all[b:b + 1, :]  # [1, 128]
        solver_assign = jnp.where(
            (roc_b >= 0) & (roc_b < d_real) & hyp_live_lane, roc_b, -1
        )
        # Mask-derived assignment: the first feasible detection (unique when
        # no solve was needed; matches the XLA path's argmax tie-break).
        first_det = jnp.min(
            jnp.where(mask, d_sub, dp), axis=0, keepdims=True
        )  # [1, H]
        mask_assign = jnp.where(first_det < dp, first_det, -1)
        assignment = jnp.where(need_b, solver_assign, mask_assign)

        # One-hot interpretation (:636-673), transposed from
        # fusion._associate_camera: A[d, h] = hypothesis h assigned det d.
        A = d_sub == assignment  # [Dp, H]; -1 matches nothing
        assigned_valid = jnp.any(A & dok, axis=0, keepdims=True)  # [1, H]
        pair_ok = jnp.any(A & mask, axis=0, keepdims=True)
        extend = assigned_valid & pair_ok
        spawn_from_hyp = assigned_valid & ~pair_ok
        det_of_hyp = jnp.sum(
            jnp.where(A, d_sub, 0), axis=0, keepdims=True, dtype=jnp.int32
        )

        handled = jnp.any(A & assigned_valid, axis=1, keepdims=True)
        spawn_unh = dok & ~handled  # [Dp, 1]

        # Spawn slots: solver-assigned-but-infeasible in hypothesis order
        # first (:641-650), then unhandled detections in detection order
        # (:662-673). Cumulative sums run on the MXU (triangular-ones
        # products); `n0` is the live count carried in SMEM.
        n0 = nh_smem[b]
        spawn_f = (spawn_from_hyp & hyp_live_lane).astype(f32)
        tri_h = (
            jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
        ).astype(f32)
        cum1 = jax.lax.dot(spawn_f, tri_h, preferred_element_type=f32)
        slot1 = n0 + cum1.astype(jnp.int32) - 1  # [1, H]
        n1 = n0 + jnp.sum(spawn_f).astype(jnp.int32)

        su_row = _flip_col_to_row(spawn_unh.astype(jnp.int32), dp)  # [1, Dp]
        tri_d = (
            jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 1)
        ).astype(f32)
        cum2 = jax.lax.dot(
            su_row.astype(f32), tri_d, preferred_element_type=f32
        )
        slot2_row = n1 + cum2.astype(jnp.int32) - 1  # [1, Dp]
        n2 = n1 + jnp.sum(su_row).astype(jnp.int32)

        # det_to_slot [Dp, 1]: the slot each spawning detection lands in.
        dts1 = jnp.max(
            jnp.where(A & spawn_from_hyp & hyp_live_lane, slot1, -1),
            axis=1,
            keepdims=True,
        )
        slot2 = _flip_row_to_col(slot2_row, dp)
        dts = jnp.where(spawn_unh, slot2, dts1)  # [Dp, 1]

        # S[d, h]: detection d spawns INTO slot h (overflow >= h_cap is
        # dropped and counted).
        S = (dts == h_lane_d) & (h_lane_d < h_cap)
        spawn_on = jnp.any(S, axis=0, keepdims=True)  # [1, H]
        spawn_det = jnp.sum(
            jnp.where(S, d_sub, 0), axis=0, keepdims=True, dtype=jnp.int32
        )

        new_col = jnp.where(
            extend, det_of_hyp, jnp.where(spawn_on, spawn_det, -1)
        )  # [1, H] (camera c is never revisited, so the old column is -1)

        c_sub = jax.lax.broadcasted_iota(jnp.int32, (cams, _LANES), 0)
        ds_out_ref[b] = jnp.where(c_sub == c, new_col, ds)

        nh_smem[b] = jnp.minimum(n2, h_cap)
        nd_smem[b] = nd_smem[b] + jnp.maximum(n2 - h_cap, 0)

    # ---- publish the counts on the last camera --------------------------
    @pl.when(c == cams - 1)
    def _publish():
        row = jax.lax.broadcasted_iota(jnp.int32, (_SUBS, _LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (_SUBS, _LANES), 1)
        out = jnp.zeros((_SUBS, _LANES), jnp.int32)
        for b in range(n_live):
            out = jnp.where((row == b) & (lane == 0), nh_smem[b], out)
            out = jnp.where((row == b) & (lane == 1), nd_smem[b], out)
        counts_out_ref[:] = out


@functools.partial(
    jax.jit,
    static_argnames=(
        "cams", "h_cap", "d_real", "dp", "n_live", "gate", "max_cost",
        "interpret",
    ),
)
def _assoc_call(
    ctab, conf, dok, *, cams, h_cap, d_real, dp, n_live, gate, max_cost,
    interpret
):
    """ctab [Bp, C, Dp, Xp] f32, conf [Bp, Xp] f32, dok [Bp, C, Dp] i32."""
    bp = ctab.shape[0]
    g = bp // _SUBS
    xp = cams * dp
    kernel = functools.partial(
        _assoc_kernel, cams, h_cap, d_real, dp, n_live, float(gate),
        float(max_cost)
    )
    scratch = [
        pltpu.SMEM((_SUBS,), jnp.int32),
        pltpu.SMEM((_SUBS,), jnp.int32),
    ] + [
        pltpu.VMEM((_SUBS, _LANES), jnp.float32),  # u
        pltpu.VMEM((_SUBS, _LANES), jnp.float32),  # v
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # roc
        pltpu.VMEM((_SUBS, _LANES), jnp.float32),  # minv
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # way
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # used
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # tree
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # j0
    ]
    ds_out, counts = pl.pallas_call(
        kernel,
        grid=(g, cams),
        in_specs=[
            pl.BlockSpec(
                (_SUBS, 1, dp, xp),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_SUBS, xp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_SUBS, cams, dp),
                lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (_SUBS, cams, _LANES),
                lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_SUBS, _LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, cams, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((bp, _LANES), jnp.int32),
        ],
        scratch_shapes=scratch,
        # No dimension_semantics: the TPU default iterates the grid
        # sequentially, which the cross-camera carried state requires.
        interpret=interpret,
    )(ctab, conf, dok)
    return ds_out, counts


def _pack_inputs(ctab, conf_obs, det_ok, dp: int):
    """Pad the per-frame scan tables into the kernel layout.

    ctab [B, C, X=C*D, D] -> [B, C, Dp, C*Dp] (transposed, -1 padded);
    conf_obs [B, C*D] -> [B, C*Dp]; det_ok [B, C, D] -> [B, C, Dp] i32.
    """
    b, c, x, d = ctab.shape
    ct = ctab.reshape(b, c, c, d, d)  # [B, C2, C1, D1, D2]
    ct = jnp.transpose(ct, (0, 1, 4, 2, 3))  # [B, C2, D2, C1, D1]
    pad_d = dp - d
    if pad_d:
        ct = jnp.pad(
            ct,
            ((0, 0), (0, 0), (0, pad_d), (0, 0), (0, pad_d)),
            constant_values=-1.0,
        )
        conf_obs = jnp.pad(
            conf_obs.reshape(b, c, d), ((0, 0), (0, 0), (0, pad_d))
        ).reshape(b, c * dp)
        det_ok = jnp.pad(det_ok, ((0, 0), (0, 0), (0, pad_d)))
    else:
        conf_obs = conf_obs.reshape(b, c * dp)
    ct = ct.reshape(b, c, dp, c * dp)
    return (
        ct.astype(jnp.float32),
        conf_obs.astype(jnp.float32),
        det_ok.astype(jnp.int32),
    )


def associate_scan_batched(
    ctab, conf_obs, det_ok, *, h_cap, gate, max_cost, interpret=None
):
    """Batched fused association: see `associate_scan`.

    Args:
      ctab: [B, C, C*D, D] sentinel cost tables (fusion.associate layout).
      conf_obs: [B, C*D] confident-voter flags.
      det_ok: [B, C, D] bool.

    Returns:
      (det_slot [B, H, C] i32, n_hyp [B] i32, n_dropped [B] i32).
    """
    b, c, _, d = ctab.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dp = _r8(d)
    ct, conf, dok = _pack_inputs(ctab, conf_obs, det_ok, dp)
    bp = _r8(b)
    if bp > b:
        ct = jnp.pad(ct, ((0, bp - b), (0, 0), (0, 0), (0, 0)),
                     constant_values=-1.0)
        conf = jnp.pad(conf, ((0, bp - b), (0, 0)))
        dok = jnp.pad(dok, ((0, bp - b), (0, 0), (0, 0)))
    ds_out, counts = _assoc_call(
        ct, conf, dok,
        cams=c, h_cap=h_cap, d_real=d, dp=dp,
        # Single-group batches skip the padded sublanes' per-frame work
        # entirely (static loop bound); multi-group batches keep the full
        # unroll — only their (possibly partial) last group would benefit,
        # and a dynamic bound would force the guard into every group.
        n_live=(b if bp <= _SUBS else _SUBS),
        gate=float(gate), max_cost=float(max_cost),
        interpret=bool(interpret),
    )
    det_slot = jnp.transpose(ds_out[:b, :, :h_cap], (0, 2, 1))  # [B, H, C]
    return det_slot, counts[:b, 0], counts[:b, 1]


def make_associate_scan(h_cap: int, gate: float, max_cost: float):
    """A single-frame fused association that dispatches to the batched
    kernel under vmap (the frame-batched offline fusion path)."""

    @jax.custom_batching.custom_vmap
    def associate_scan(ctab, conf_obs, det_ok):
        ds, nh, nd = associate_scan_batched(
            ctab[None], conf_obs[None], det_ok[None],
            h_cap=h_cap, gate=gate, max_cost=max_cost,
        )
        return ds[0], nh[0], nd[0]

    @associate_scan.def_vmap
    def _vmap_rule(axis_size, in_batched, ctab, conf_obs, det_ok):
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(
                x, (axis_size,) + x.shape
            )

        out = associate_scan_batched(
            bcast(ctab, in_batched[0]),
            bcast(conf_obs, in_batched[1]),
            bcast(det_ok, in_batched[2]),
            h_cap=h_cap, gate=gate, max_cost=max_cost,
        )
        return out, (True, True, True)

    return associate_scan
