"""Pallas TPU kernel: the ENTIRE offline tracker scan in ONE launch.

The tracker (tracking.step, the stateful half of the reference's pose_prior
node, pose_prior_mult_node.cpp:505-921) is inherently sequential across
frames: association costs, spawn bookkeeping, velocity ring buffers and the
merge sweep all read the previous frame's track state. As an XLA `lax.scan`
each frame costs a serialized round of ~50 small kernels (the 25x64 cost
matrix, a Pallas JV launch, one-hot gathers/scatters, ring updates, the
merge fixpoint) — after the LM smoothing was hoisted out (tracking.
smooth_cold), that launch chain became the dominant sequential cost of the
offline pipeline on both the 16-cam demo and the 64-cam scaled config.

Here the whole scan runs inside one kernel: grid = (frames,) with the TPU's
default sequential grid semantics, the full TrackerState resident in VMEM
scratch across grid steps, and every per-frame stage expressed as tile ops:

* association costs as an unrolled per-joint loop of [P, T] tiles
  (persons on sublanes, track slots on lanes),
* the assignment solve via the sublane-batched JV core
  (ops.hungarian_pallas.jv_core_batched — the same algorithm the XLA scan
  path dispatches to on TPU, so assignments agree even on clipped-cost
  ties up to float reassociation of the cost assembly),
* spawn-rank cumulative sums as triangular-ones MXU products,
* track-state gathers/scatters as one-hot dot_general contractions
  (exact: at most one nonzero per row),
* the track-merge fixpoint (tracking._merge_tracks) as [T, T] tile rounds
  with live/dead masks in VMEM scratch and a scalar loop carry.

Frame-LOCAL quantities are precomputed OUTSIDE the kernel in vectorized
form (`_frame_local_chain`): the feedback-delay moving average and
prediction horizon, the velocity-ring slot indices, and the inter-frame
time deltas depend only on per-frame inputs plus trivially-vectorizable
counters, so the kernel never carries them.

The kernel's numerical results match tracking.step's XLA scan to float32
rounding of identical-order reductions (integer outputs — publish masks,
ids, spawn/drop counts, alive flags — are pinned EXACTLY equal in
tests/test_tracker_pallas.py; float state to ~1e-5). Falls back to
interpreter mode off-TPU (the CPU suite runs the same code path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smartedgesensor3dhumanpose_tpu import skeleton
from smartedgesensor3dhumanpose_tpu.ops import hungarian_pallas
from smartedgesensor3dhumanpose_tpu.types import Persons3D, TrackerState

_LANES = 128
_SUBS = 8
_CLIP = 1.0e3  # tracking._COST_CLIP


def _r8(x: int) -> int:
    return max(8, -(-x // 8) * 8)


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _flip_row_to_col(row, m: int, dtype=None):
    """[1, L] lane vector -> [m, 1] sublane vector (masked-reduce transpose)."""
    sub = _iota2((m, row.shape[1]), 0)
    lane = _iota2((m, row.shape[1]), 1)
    return jnp.sum(
        jnp.where(sub == lane, row, 0), axis=1, keepdims=True,
        dtype=dtype or row.dtype,
    )


def _flip_col_to_row(col, l: int):
    """[m, 1] sublane vector -> [1, l] lane vector."""
    sub = _iota2((col.shape[0], l), 0)
    lane = _iota2((col.shape[0], l), 1)
    return jnp.sum(
        jnp.where(sub == lane, col, 0), axis=0, keepdims=True,
        dtype=col.dtype,
    )


# Every dot in this kernel contracts one-hot/0-1 selectors against track or
# person VALUES. Precision.HIGHEST is load-bearing: the TPU MXU's default
# f32 strategy rounds operands through bfloat16 passes, which would corrupt
# the selected positions by ~1e-2 relative (the selections must be EXACT —
# one nonzero per contracted row).
_PREC = jax.lax.Precision.HIGHEST


def _dot_nt(a, b):
    """a [M, K] x b [N, K] -> [M, N] (contract lane dims)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_PREC,
    )


def _dot_tn(a, b):
    """a [K, M] x b [K, N] -> [M, N] (contract sublane dims)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_PREC,
    )


def _tracker_kernel(
    # static
    p: int,
    t_slots: int,
    k_j: int,
    w: int,
    n_frames: int,
    vel_sig: tuple,
    max_dist: float,
    dist_threshold: float,
    min_num_obs: int,
    max_unobserved: float,
    merge_thresh: float,
    # per-frame inputs
    meas_ref,   # [1, PF, 64] f32 persons.xyz (fusion layout, lane k*3+x)
    okpk_ref,   # [1, PF, 24] f32 (score > min_score) per joint
    valid_ref,  # [1, PF, 1] i32
    rx_ref,     # [1, PF, 64] f32 LM result (normalized coords)
    act_ref,    # [1, PF, 24] f32 g_in.active
    hm_ref,     # [1, PF, 1] i32 g_in.num_meas > 0
    hgt_ref,    # [1, PF, 1] f32 g_in.height
    root_ref,   # [1, PF, 4] f32 g_in.root_xyz (lane 3 zero)
    sf_ref,     # [1, 1, 8] f32 SMEM: pivot, pred_delta_t, dt_glob
    si_ref,     # [1, 1, 8] i32 SMEM: slot_w, has_dets
    # initial state
    est0_ref,   # [64, 128] f32 (row k*3+x, lane t)
    ex0_ref,    # [24, 128] f32
    vel0_ref,   # [192, 128] f32 (row w*64 + k*3+x)
    stf0_ref,   # [8, 128] f32: 0 t_prev, 1 height_prev, 2-4 root_prev
    sti0_ref,   # [8, 128] i32: 0 alive, 1 track_id, 2 num_obs, 3@0 next_id
    # per-frame outputs
    off_ref,    # [1, PF, 64] f32 pred_offset
    io_ref,     # [1, 8, 128] i32: 0 publish, 1 ids, 2@0 n_dropped
    # final-state outputs
    estf_ref, exf_ref, velf_ref, stff_ref, stif_ref,
    # scratch
    est_s, ex_s, vel_s, stf_s, sti_s, mrg_s, nid_smem,
    *jv_scratch,
):
    f32 = jnp.float32
    pf = meas_ref.shape[1]
    n_jv = max(p, t_slots)
    r_pad = _r8(n_jv)
    k3 = 3 * k_j

    frame = pl.program_id(0)
    lt = _iota2((1, _LANES), 1)           # track-lane ids
    t_on = (lt < t_slots).astype(f32)
    p_sub = _iota2((pf, 1), 0)
    p_on = p_sub < p

    pivot = sf_ref[0, 0, 0]
    pred_dt = sf_ref[0, 0, 1]
    dt_glob = sf_ref[0, 0, 2]
    slot_w = si_ref[0, 0, 0]
    has_dets = si_ref[0, 0, 1] > 0

    @pl.when(frame == 0)
    def _init():
        est_s[:] = est0_ref[:]
        ex_s[:] = ex0_ref[:]
        vel_s[:] = vel0_ref[:]
        stf_s[:] = stf0_ref[:]
        sti_s[:] = sti0_ref[:]
        nid_smem[0] = sti0_ref[3, 0]

    alive_row = sti_s[0:1, :]      # [1, 128] i32 0/1
    tid_row = sti_s[1:2, :]
    nobs_row = sti_s[2:3, :]
    tprev_row = stf_s[0:1, :]
    hprev_row = stf_s[1:2, :]
    root_rows = stf_s[2:5, :]      # [3, 128]

    meas = meas_ref[0]
    okpk = okpk_ref[0]
    valid_col = valid_ref[0] > 0   # [PF, 1]
    rx = rx_ref[0]
    act = act_ref[0]
    hm_col = hm_ref[0] > 0
    hgt_col = hgt_ref[0]
    root_p = root_ref[0]           # [PF, 4]

    # ---- association cost [PF, 128] (tracking._association_cost) --------
    delta_row = pivot - tprev_row  # [1, 128]
    acc_d = jnp.zeros((pf, _LANES), f32)
    acc_n = jnp.zeros((pf, _LANES), f32)
    for k in range(k_j):
        px = est_s[3 * k : 3 * k + 1, :] * hprev_row + root_rows[0:1, :]
        py = est_s[3 * k + 1 : 3 * k + 2, :] * hprev_row + root_rows[1:2, :]
        pz = est_s[3 * k + 2 : 3 * k + 3, :] * hprev_row + root_rows[2:3, :]
        dx = meas[:, 3 * k : 3 * k + 1] - px
        dy = meas[:, 3 * k + 1 : 3 * k + 2] - py
        dz = meas[:, 3 * k + 2 : 3 * k + 3] - pz
        nrm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        dist_k = nrm / (vel_sig[k] * delta_row)
        ok_k = okpk[:, k : k + 1] * ex_s[k : k + 1, :]
        acc_d = acc_d + jnp.where(ok_k > 0, dist_k, 0.0)
        acc_n = acc_n + ok_k
    cost = jnp.where(
        acc_n > 0, acc_d / jnp.maximum(acc_n, 1.0), max_dist
    )
    cost = jnp.where(
        valid_col & (alive_row > 0), cost, max_dist
    )  # [PF, 128]

    # ---- JV solve (mirrors hungarian._lsa_pallas_single's padding) ------
    clipped = jnp.minimum(cost, _CLIP)
    jv0 = jnp.where((lt < n_jv) & (p_sub < min(p, r_pad)), clipped, 0.0)
    if r_pad > pf:
        jv0 = jnp.concatenate(
            [jv0, jnp.zeros((r_pad - pf, _LANES), f32)], axis=0
        )
    else:
        jv0 = jv0[:r_pad]
    sub_r = _iota2((r_pad, _LANES), 0)
    lane_r = _iota2((r_pad, _LANES), 1)
    trivial = jnp.where(sub_r == lane_r, 0.0, 1.0)
    jv_cost = jnp.stack([jv0] + [trivial] * (_SUBS - 1), axis=0)

    valid_row = _flip_col_to_row(valid_col.astype(jnp.int32), _LANES)
    row_act = jnp.concatenate(
        [
            jnp.where(lt < p, valid_row, 0),
            jnp.broadcast_to(
                (lt < n_jv).astype(jnp.int32), (_SUBS - 1, _LANES)
            ),
        ],
        axis=0,
    )  # [8, 128]

    col_of_row = hungarian_pallas.jv_core_batched(
        n_jv, jv_cost, *jv_scratch, n_rows=n_jv, row_active=row_act,
    )  # [8, 128]
    a_row = col_of_row[0:1, :]  # assignment per person (lane = person)
    a_col = _flip_row_to_col(a_row, pf)  # [PF, 1]

    A = (a_col == lt) & (lt < t_slots)  # [PF, 128] one-hot assignment
    assigned_cost = jnp.sum(
        jnp.where(A, cost, 0.0), axis=1, keepdims=True
    )
    gated = (
        (a_col >= 0)
        & (assigned_cost <= dist_threshold)
        & jnp.any(A & (alive_row > 0), axis=1, keepdims=True)
    )
    matched = valid_col & gated
    track_of = jnp.sum(
        jnp.where(A, lt, 0), axis=1, keepdims=True, dtype=jnp.int32
    )

    # ---- spawns (tracking.step :570-580 rebuild) -------------------------
    spawn = valid_col & ~matched  # [PF, 1]
    tri = (
        _iota2((_LANES, _LANES), 0) <= _iota2((_LANES, _LANES), 1)
    ).astype(f32)
    spawn_row = _flip_col_to_row(spawn.astype(jnp.int32), _LANES)
    rank_row = (
        jax.lax.dot(
            spawn_row.astype(f32), tri, preferred_element_type=f32,
            precision=_PREC,
        ).astype(jnp.int32)
        - 1
    )  # [1, 128] cumsum(spawn) - 1 over persons
    rank_col = _flip_row_to_col(rank_row, pf)
    dead_row = jnp.where(lt < t_slots, 1 - alive_row, 0)
    free_pos = (
        jax.lax.dot(
            dead_row.astype(f32), tri, preferred_element_type=f32,
            precision=_PREC,
        ).astype(jnp.int32)
        - 1
    )  # [1, 128]
    S_free = spawn & (dead_row > 0) & (free_pos == rank_col)  # [PF, 128]
    new_ok = jnp.any(S_free, axis=1, keepdims=True)
    slot_new = jnp.where(
        new_ok,
        jnp.sum(jnp.where(S_free, lt, 0), axis=1, keepdims=True,
                dtype=jnp.int32),
        t_slots,
    )
    n_spawn = jnp.sum(spawn.astype(jnp.int32), dtype=jnp.int32)
    n_new = jnp.sum(new_ok.astype(jnp.int32), dtype=jnp.int32)
    n_dropped = n_spawn - n_new
    track_idx = jnp.where(matched, track_of, slot_new)  # slot or T sentinel
    has_track = matched | new_ok

    # Initialize spawned slots.
    next_id = nid_smem[0]
    new_ids_col = next_id + rank_col
    S1 = (slot_new == lt) & new_ok  # [PF, 128] person spawns into lane
    spawned_row = (
        jnp.sum(S1.astype(jnp.int32), axis=0, keepdims=True) > 0
    )
    tid_new = jnp.sum(
        jnp.where(S1, new_ids_col, 0), axis=0, keepdims=True,
        dtype=jnp.int32,
    )
    alive_row = jnp.where(spawned_row, 1, alive_row)
    tid_row = jnp.where(spawned_row, tid_new, tid_row)
    spawned_f = spawned_row.astype(f32)
    est_v = est_s[:] * (1.0 - spawned_f)
    ex_v = ex_s[:] * (1.0 - spawned_f)
    vel_v = vel_s[:] * (1.0 - spawned_f)
    tprev_row = jnp.where(spawned_row, pivot, tprev_row)
    nobs_row = jnp.where(spawned_row, 0, nobs_row)
    hprev_row = jnp.where(spawned_row, -1.0, hprev_row)
    root_rows = jnp.where(spawned_row, 0.0, root_rows)
    nid_smem[0] = next_id + n_new

    # ---- previous-track gathers (one-hot dot_generals; exact) -----------
    participates = has_track & hm_col
    safe_idx = jnp.where(has_track, track_idx, 0)
    G = (safe_idx == lt) & (lt < t_slots)  # [PF, 128]
    Gf = G.astype(f32)
    prev_est_p = _dot_nt(Gf, est_v)        # [PF, 64]
    prev_ex_p = _dot_nt(Gf, ex_v)          # [PF, 24]
    prev_exists = (prev_ex_p > 0) & has_track  # [PF, 24]
    h_prev_p = jnp.sum(
        jnp.where(G, hprev_row, 0.0), axis=1, keepdims=True
    )
    root_prev_p = _dot_nt(Gf, root_rows)   # [PF, 3]
    uninit = h_prev_p < 0
    h_prev_p = jnp.where(uninit, hgt_col, h_prev_p)
    root_prev_p = jnp.where(uninit, root_p[:, :3], root_prev_p)

    use_vel = (act > 0) & prev_exists      # [PF, 24]

    # ---- velocity buffers + prediction (:818-831) ------------------------
    # Per-lane joint/coordinate selection tables, built from iota so the
    # kernel captures no constants (Mosaic folds them at compile time).
    lk = _iota2((k_j, 64), 0)
    l64 = _iota2((k_j, 64), 1)
    sel_k63 = ((lk == l64 // 3) & (l64 < k3)).astype(f32)  # [K, 64]
    lx = _iota2((3, 64), 0)
    l64x = _iota2((3, 64), 1)
    sel_x63 = ((lx == l64x % 3) & (l64x < k3)).astype(f32)  # [3, 64]
    lkw = _iota2((k_j, w * 64), 0)
    lw = _iota2((k_j, w * 64), 1)
    sel_k_w = (
        (lkw == (lw % 64) // 3) & ((lw % 64) < k3)
    ).astype(f32)  # [K, W*64]

    hgt63 = hgt_col  # [PF, 1] broadcasts over lanes
    root63 = jax.lax.dot(
        root_p[:, :3], sel_x63, preferred_element_type=f32,
        precision=_PREC,
    )  # [PF, 64]
    curr_world = rx * hgt63 + root63
    prev_world = prev_est_p * h_prev_p + jax.lax.dot(
        root_prev_p, sel_x63, preferred_element_type=f32,
        precision=_PREC,
    )
    lane_mask63 = (_iota2((1, 64), 1) < k3).astype(f32)
    vel = ((curr_world - prev_world) / dt_glob) * lane_mask63  # [PF, 64]

    vel_buf_p = _dot_nt(Gf, vel_v)  # [PF, W*64]
    removed = prev_exists & ~(act > 0)  # [PF, 24]
    rem_w = jax.lax.dot(
        removed.astype(f32)[:, :k_j], sel_k_w, preferred_element_type=f32,
        precision=_PREC,
    )  # [PF, W*64]
    vel_buf_p = jnp.where(rem_w > 0, 0.0, vel_buf_p)
    use_vel63 = jax.lax.dot(
        use_vel.astype(f32)[:, :k_j], sel_k63, preferred_element_type=f32,
        precision=_PREC,
    )  # [PF, 64]
    lane_w = _iota2((1, w * 64), 1)
    in_slot = (lane_w // 64) == slot_w
    vel_rep = jnp.concatenate([vel] * w, axis=1)
    use_rep = jnp.concatenate([use_vel63] * w, axis=1)
    vel_buf_p = jnp.where(
        in_slot & (use_rep > 0), vel_rep, vel_buf_p
    )
    mean_vel = vel_buf_p[:, 0:64]
    for wi in range(1, w):
        mean_vel = mean_vel + vel_buf_p[:, 64 * wi : 64 * (wi + 1)]
    mean_vel = mean_vel / float(w)
    pred_offset = jnp.where(use_vel63 > 0, mean_vel * pred_dt, 0.0)

    # ---- write back track state (:839-843) -------------------------------
    upd = participates & has_dets
    scatter_idx = jnp.where(upd, track_idx, t_slots)
    M2 = (scatter_idx == lt) & (lt < t_slots)  # [PF, 128]
    M2f = M2.astype(f32)
    updated_row = (
        jnp.sum(M2.astype(jnp.int32), axis=0, keepdims=True) > 0
    )
    upd_f = updated_row.astype(f32)
    est_s[:] = _dot_tn(rx, M2f) * upd_f + est_v * (1.0 - upd_f)
    ex_s[:] = _dot_tn(act, M2f) * upd_f + ex_v * (1.0 - upd_f)
    vel_s[:] = _dot_tn(vel_buf_p, M2f) * upd_f + vel_v * (1.0 - upd_f)
    tprev_row = jnp.where(updated_row, pivot, tprev_row)
    hgt_new = jnp.sum(M2f * hgt_col, axis=0, keepdims=True)
    hprev_row = jnp.where(updated_row, hgt_new, hprev_row)
    root_rows = jnp.where(
        updated_row, _dot_tn(root_p[:, :3], M2f), root_rows
    )
    nobs_row = nobs_row + updated_row.astype(jnp.int32)

    # ---- publish gate + ids (:845-852) -----------------------------------
    obs_after = jnp.sum(
        jnp.where(G, nobs_row, 0), axis=1, keepdims=True, dtype=jnp.int32
    )
    publish = upd & (obs_after > min_num_obs)
    ids = jnp.where(
        has_track,
        jnp.sum(jnp.where(G, tid_row, 0), axis=1, keepdims=True,
                dtype=jnp.int32),
        -1,
    )

    # ---- decay (:191-211) -------------------------------------------------
    alive_row = jnp.where(
        (pivot - tprev_row) <= max_unobserved, alive_row, 0
    )

    # ---- merge overlapping tracks (tracking._merge_tracks fixpoint) ------
    eye = (
        _iota2((_LANES, _LANES), 0) == _iota2((_LANES, _LANES), 1)
    ).astype(f32)
    world = est_s[:] * hprev_row + jax.lax.dot_general(
        sel_x63, root_rows, (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=_PREC,
    )  # [64, 128]
    world_T = _dot_nt(eye, world)  # [128, 64]
    ex_T = _dot_nt(eye, ex_s[:])   # [128, 24]
    md = jnp.zeros((_LANES, _LANES), f32)
    mn = jnp.zeros((_LANES, _LANES), f32)
    for k in range(k_j):
        dx = world_T[:, 3 * k : 3 * k + 1] - world[3 * k : 3 * k + 1, :]
        dy = world_T[:, 3 * k + 1 : 3 * k + 2] - world[
            3 * k + 1 : 3 * k + 2, :
        ]
        dz = world_T[:, 3 * k + 2 : 3 * k + 3] - world[
            3 * k + 2 : 3 * k + 3, :
        ]
        dk = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        okk = ex_T[:, k : k + 1] * ex_s[k : k + 1, :]
        md = md + jnp.where(okk > 0, dk, 0.0)
        mn = mn + okk
    mean_d = md / jnp.maximum(mn, 1.0)
    sub128 = _iota2((_LANES, _LANES), 0)
    lane128 = _iota2((_LANES, _LANES), 1)
    alive_col = _flip_row_to_col(alive_row, _LANES)
    close = (
        (sub128 < lane128)
        & has_dets
        & (mn > 0)
        & (mean_d < merge_thresh)
        & (alive_col > 0)
        & (alive_row > 0)
        & (lane128 < t_slots)
    )  # [128(keeper), 128(victim)]

    mrg_s[0:2, :] = jnp.zeros((2, _LANES), jnp.int32)  # live, dead

    def _unsettled():
        live = mrg_s[0:1, :]
        dead = mrg_s[1:2, :]
        return jnp.sum(
            jnp.where((alive_row > 0) & (live == 0) & (dead == 0), 1, 0),
            dtype=jnp.int32,
        )

    def m_cond(carry):
        cnt, step = carry
        return (cnt > 0) & (step <= t_slots + 1)

    def m_body(carry):
        cnt, step = carry
        live = mrg_s[0:1, :]
        dead = mrg_s[1:2, :]
        dead_col = _flip_row_to_col(dead, _LANES)
        killer = close & (dead_col == 0)
        live = jnp.where(
            (alive_row > 0)
            & (jnp.sum(killer.astype(jnp.int32), axis=0, keepdims=True)
               == 0),
            1,
            live,
        )
        live_col = _flip_row_to_col(live, _LANES)
        dead = jnp.where(
            jnp.sum(
                (close & (live_col > 0)).astype(jnp.int32), axis=0,
                keepdims=True,
            )
            > 0,
            1,
            dead,
        )
        mrg_s[0:1, :] = live
        mrg_s[1:2, :] = dead
        new_cnt = jnp.sum(
            jnp.where((alive_row > 0) & (live == 0) & (dead == 0), 1, 0),
            dtype=jnp.int32,
        )
        return new_cnt, step + 1

    jax.lax.while_loop(m_cond, m_body, (_unsettled(), jnp.int32(0)))
    live = mrg_s[0:1, :]
    dead = mrg_s[1:2, :]

    live_col = _flip_row_to_col(live, _LANES)
    kill = close & (live_col > 0)
    # First surviving keeper per victim: rows where the column-cumsum is 1.
    tri_incl = (sub128 <= lane128).astype(f32)
    cum_kill = jax.lax.dot_general(
        tri_incl, kill.astype(f32), (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=_PREC,
    )  # [128, 128] cumsum over keepers (sublanes)
    ksel = kill & (cum_kill == 1.0)
    tid_col = _flip_row_to_col(tid_row, _LANES)
    keeper_id = jnp.sum(
        jnp.where(ksel, tid_col, 0), axis=0, keepdims=True,
        dtype=jnp.int32,
    )  # [1, 128] per victim
    match = (ids == tid_row) & (dead > 0)  # [PF, 128]
    new_id = jnp.sum(
        jnp.where(match, keeper_id, 0), axis=1, keepdims=True,
        dtype=jnp.int32,
    )
    ids = jnp.where(jnp.any(match, axis=1, keepdims=True), new_id, ids)
    alive_row = jnp.where(dead > 0, 0, alive_row)

    # ---- persist scalar rows + emit per-frame outputs --------------------
    sti_s[0:1, :] = alive_row
    sti_s[1:2, :] = tid_row
    sti_s[2:3, :] = nobs_row
    stf_s[0:1, :] = tprev_row
    stf_s[1:2, :] = hprev_row
    stf_s[2:5, :] = root_rows

    off_ref[0] = pred_offset
    pub_row = _flip_col_to_row(publish.astype(jnp.int32), _LANES)
    ids_row = _flip_col_to_row(ids, _LANES)
    io_sub = _iota2((8, _LANES), 0)
    io_lane = _iota2((8, _LANES), 1)
    io = jnp.where(io_sub == 0, jnp.broadcast_to(pub_row, (8, _LANES)), 0)
    io = jnp.where(io_sub == 1, jnp.broadcast_to(ids_row, (8, _LANES)), io)
    io = jnp.where((io_sub == 2) & (io_lane == 0), n_dropped, io)
    io_ref[0] = io

    @pl.when(frame == n_frames - 1)
    def _final():
        estf_ref[:] = est_s[:]
        exf_ref[:] = ex_s[:]
        velf_ref[:] = vel_s[:]
        stff_ref[:] = stf_s[:]
        sti = sti_s[:]
        sti = jnp.where(
            (_iota2((8, _LANES), 0) == 3) & (_iota2((8, _LANES), 1) == 0),
            nid_smem[0],
            sti,
        )
        stif_ref[:] = sti


@functools.partial(
    jax.jit,
    static_argnames=(
        "p", "t_slots", "k_j", "w", "vel_sig", "max_dist", "dist_threshold",
        "min_num_obs", "max_unobserved", "merge_thresh", "interpret",
    ),
)
def _tracker_call(
    meas, okpk, valid, rx, act, hm, hgt, root, sf, si,
    est0, ex0, vel0, stf0, sti0,
    *,
    p, t_slots, k_j, w, vel_sig, max_dist, dist_threshold, min_num_obs,
    max_unobserved, merge_thresh, interpret,
):
    f = meas.shape[0]
    pf = meas.shape[1]
    kernel = functools.partial(
        _tracker_kernel, p, t_slots, k_j, w, f, vel_sig, max_dist,
        dist_threshold, min_num_obs, max_unobserved, merge_thresh,
    )

    def per_frame(width):
        return pl.BlockSpec(
            (1, pf, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def const2(shape):
        return pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )

    scratch = [
        pltpu.VMEM((64, _LANES), jnp.float32),   # est_s
        pltpu.VMEM((24, _LANES), jnp.float32),   # ex_s
        pltpu.VMEM((w * 64, _LANES), jnp.float32),  # vel_s
        pltpu.VMEM((8, _LANES), jnp.float32),    # stf_s
        pltpu.VMEM((8, _LANES), jnp.int32),      # sti_s
        pltpu.VMEM((8, _LANES), jnp.int32),      # mrg_s
        pltpu.SMEM((1,), jnp.int32),             # next_id
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
    outs = pl.pallas_call(
        kernel,
        grid=(f,),
        in_specs=[
            per_frame(64), per_frame(24), per_frame(1), per_frame(64),
            per_frame(24), per_frame(1), per_frame(1), per_frame(4),
            pl.BlockSpec(
                (1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            const2((64, _LANES)), const2((24, _LANES)),
            const2((w * 64, _LANES)), const2((8, _LANES)),
            const2((8, _LANES)),
        ],
        out_specs=[
            per_frame(64),
            pl.BlockSpec(
                (1, 8, _LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            const2((64, _LANES)), const2((24, _LANES)),
            const2((w * 64, _LANES)), const2((8, _LANES)),
            const2((8, _LANES)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, pf, 64), jnp.float32),
            jax.ShapeDtypeStruct((f, 8, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((64, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((24, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((w * 64, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((8, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((8, _LANES), jnp.int32),
        ],
        scratch_shapes=scratch,
        # No dimension_semantics: the sequential grid carries the state.
        interpret=interpret,
    )(
        meas, okpk, valid, rx, act, hm, hgt, root, sf, si,
        est0, ex0, vel0, stf0, sti0,
    )
    return outs


def _frame_local_chain(state0: TrackerState, has_dets, fb_delay, pivots, cfg):
    """Vectorized precompute of every frame-LOCAL scalar the scan carries.

    The feedback-delay moving average, prediction horizon, ring-slot
    indices, and inter-frame deltas depend only on per-frame inputs plus
    counters — so they vectorize over the whole sequence instead of riding
    in the sequential kernel (tracking.step :513-526 arithmetic, exactly).
    """
    f = pivots.shape[0]
    w = state0.fb_delay_buffer.shape[0]
    dtype = pivots.dtype

    valid_delay = fb_delay > 0  # [F, C]
    n_valid = jnp.sum(valid_delay, axis=1)
    curr_avg = jnp.where(
        n_valid > 0,
        jnp.sum(jnp.where(valid_delay, fb_delay, 0.0), axis=1)
        / jnp.maximum(n_valid, 1),
        cfg.avg_delay,
    ).astype(dtype)

    has_i = has_dets.astype(jnp.int32)
    fn = state0.frame_nr + jnp.cumsum(has_i) - has_i  # frame_nr at entry
    slot = fn % w

    idx = jnp.arange(f)
    rings = []
    for k in range(w):
        pos = jnp.where(slot == k, idx, -1)
        last = jax.lax.associative_scan(jnp.maximum, pos)
        val = jnp.where(
            last >= 0, curr_avg[jnp.maximum(last, 0)],
            state0.fb_delay_buffer[k],
        )
        rings.append(val)
    ring = jnp.stack(rings, axis=0)  # [W, F]
    pred_delta_t = jnp.mean(ring, axis=0)

    prev_pivot = jnp.concatenate(
        [state0.t_prev_global[None].astype(dtype), pivots[:-1]]
    )
    dt_glob = jnp.maximum(pivots - prev_pivot, 1e-6)

    fb_final = ring[:, -1]
    frame_nr_final = state0.frame_nr + jnp.sum(has_i)
    return pred_delta_t, slot, dt_glob, fb_final, frame_nr_final


def tracker_scan(
    state0: TrackerState,
    persons: Persons3D,
    pivots: jnp.ndarray,
    fb_delay: jnp.ndarray,
    pre,
    prior_cfg,
    cfg,
    interpret: bool | None = None,
):
    """The whole offline tracker scan as one Pallas launch.

    Drop-in for `lax.scan(tracking.step(..., precomputed=pre_t))` over a
    stacked sequence: `persons`, `pivots` [F], `fb_delay` [F, C] and `pre`
    (the stacked `tracking.smooth_cold` outputs) carry a leading frame axis.
    Returns (final TrackerState, stacked tracking.TrackStepOutput).

    Restrictions (fall back to the XLA scan otherwise): max_tracks <= 128,
    max_tracks >= people slots (the configs' invariant; the row-skip
    contract of the JV needs it), 21 fusion joints.
    """
    from smartedgesensor3dhumanpose_tpu import tracking  # cycle-free import

    g_in, result, xyz_out, cov_out = pre
    f, p, k_j, _ = persons.xyz.shape
    t_slots = state0.alive.shape[0]
    w = state0.vel_buffer.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert p <= t_slots <= _LANES and k_j == skeleton.NUM_FUSION_JOINTS

    f32 = jnp.float32
    pf = _r8(p)
    k3 = 3 * k_j

    def pad_p(a, width, fill=0.0, dtype=f32):
        out = jnp.full((f, pf, width), fill, dtype)
        return out.at[:, :p, : a.shape[-1]].set(a.astype(dtype))

    has_dets = jnp.any(persons.valid, axis=1)
    pred_delta_t, slot_w, dt_glob, fb_final, frame_nr_final = (
        _frame_local_chain(
            state0, has_dets, fb_delay.astype(f32), pivots.astype(f32), cfg
        )
    )

    meas = pad_p(persons.xyz.reshape(f, p, k3), 64)
    okpk = pad_p(
        (persons.score > prior_cfg.min_score).astype(f32), 24
    )
    valid = pad_p(persons.valid[..., None], 1, dtype=jnp.int32)
    rx = pad_p(result.x.reshape(f, p, k3), 64)
    act = pad_p(g_in.active.astype(f32), 24)
    hm = pad_p((g_in.num_meas > 0)[..., None], 1, dtype=jnp.int32)
    hgt = pad_p(g_in.height[..., None], 1)
    root = pad_p(g_in.root_xyz, 4)
    sf = jnp.stack(
        [
            pivots.astype(f32),
            pred_delta_t.astype(f32),
            dt_glob.astype(f32),
        ]
        + [jnp.zeros((f,), f32)] * 5,
        axis=1,
    )[:, None, :]
    si = jnp.stack(
        [slot_w.astype(jnp.int32), has_dets.astype(jnp.int32)]
        + [jnp.zeros((f,), jnp.int32)] * 6,
        axis=1,
    )[:, None, :]

    # Pack the initial state into kernel tiles.
    def lanes_t(a, rows, dtype=f32):
        out = jnp.zeros((rows, _LANES), dtype)
        return out.at[: a.shape[0], :t_slots].set(a.astype(dtype))

    est0 = lanes_t(
        jnp.swapaxes(state0.estimate.reshape(t_slots, k3), 0, 1), 64
    )
    ex0 = lanes_t(jnp.swapaxes(state0.est_exists, 0, 1), 24)
    # vel_buffer [T, K, W, 3] -> rows (w*64 + k*3+x).
    vel_r = jnp.moveaxis(state0.vel_buffer, 2, 0).reshape(w, t_slots, k3)
    vel0 = jnp.zeros((w * 64, _LANES), f32)
    for wi in range(w):
        vel0 = vel0.at[wi * 64 : wi * 64 + k3, :t_slots].set(
            jnp.swapaxes(vel_r[wi], 0, 1).astype(f32)
        )
    stf0 = jnp.zeros((8, _LANES), f32)
    stf0 = stf0.at[0, :t_slots].set(state0.t_prev.astype(f32))
    stf0 = stf0.at[1, :t_slots].set(state0.height_prev.astype(f32))
    stf0 = stf0.at[2:5, :t_slots].set(
        jnp.swapaxes(state0.root_prev, 0, 1).astype(f32)
    )
    sti0 = jnp.zeros((8, _LANES), jnp.int32)
    sti0 = sti0.at[0, :t_slots].set(state0.alive.astype(jnp.int32))
    sti0 = sti0.at[1, :t_slots].set(state0.track_id)
    sti0 = sti0.at[2, :t_slots].set(state0.num_obs)
    sti0 = sti0.at[3, 0].set(state0.next_id)

    vel_sig = tuple(float(x) for x in np.asarray(skeleton.FUSION_VEL_SIGMAS))
    off, io, estf, exf, velf, stff, stif = _tracker_call(
        meas, okpk, valid, rx, act, hm, hgt, root, sf, si,
        est0, ex0, vel0, stf0, sti0,
        p=p, t_slots=t_slots, k_j=k_j, w=w, vel_sig=vel_sig,
        max_dist=float(cfg.max_dist),
        dist_threshold=float(cfg.dist_threshold),
        min_num_obs=int(cfg.min_num_obs),
        max_unobserved=float(cfg.max_unobserved_time),
        merge_thresh=float(cfg.merge_dist_thresh),
        interpret=bool(interpret),
    )

    dtype = persons.xyz.dtype
    publish = io[:, 0, :p] > 0  # [F, P]
    ids = io[:, 1, :p]
    n_dropped = io[:, 2, 0]
    pred_offset = off[:, :p, :k3].reshape(f, p, k_j, 3).astype(dtype)

    # Outputs composed exactly as tracking.step does from the precomputed
    # smoothing results (frame-local; the kernel only owns the sequential
    # decisions: publish masks, ids, velocity prediction offsets).
    xyz_pred = xyz_out + pred_offset
    pred_noise = cfg.pred_noise_sigma**2 * jnp.eye(3, dtype=dtype)
    cov_pred = jnp.where(
        g_in.active[..., None, None], cov_out + pred_noise, 0.0
    )
    fused = Persons3D(
        xyz=xyz_out, score=g_in.score_out, cov=cov_out,
        valid=publish, person_id=ids,
    )
    fused_pred = Persons3D(
        xyz=xyz_pred, score=g_in.score_out, cov=cov_pred,
        valid=publish, person_id=ids,
    )
    outs = tracking.TrackStepOutput(
        fused=fused,
        fused_pred=fused_pred,
        pred_delta_t=pred_delta_t.astype(dtype),
        n_dropped_spawns=n_dropped,
    )

    state_f = TrackerState(
        alive=stif[0, :t_slots] > 0,
        track_id=stif[1, :t_slots],
        estimate=jnp.swapaxes(estf[:k3, :t_slots], 0, 1)
        .reshape(t_slots, k_j, 3).astype(dtype),
        est_exists=jnp.swapaxes(exf[:k_j, :t_slots], 0, 1) > 0,
        vel_buffer=jnp.moveaxis(
            jnp.stack(
                [
                    jnp.swapaxes(velf[wi * 64 : wi * 64 + k3, :t_slots], 0, 1)
                    .reshape(t_slots, k_j, 3)
                    for wi in range(w)
                ],
                axis=0,
            ),
            0,
            2,
        ).astype(dtype),
        t_prev=stff[0, :t_slots].astype(dtype),
        num_obs=stif[2, :t_slots],
        height_prev=stff[1, :t_slots].astype(dtype),
        root_prev=jnp.swapaxes(stff[2:5, :t_slots], 0, 1).astype(dtype),
        next_id=stif[3, 0],
        frame_nr=frame_nr_final.astype(jnp.int32),
        fb_delay_buffer=fb_final.astype(dtype),
        t_prev_global=pivots[-1].astype(dtype),
    )
    return state_f, outs
