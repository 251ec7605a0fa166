"""Pallas TPU kernel: the entire Jonker-Volgenant assignment in ONE kernel.

The pure-JAX solvers in ops.hungarian are algorithmically fine but launch
hundreds of tiny sequential XLA kernels (each augmenting-search step is a
handful of element-wise ops + an argmin); at ~2-5 us per launch that
dominates the tracker's frame budget. Inside a single Pallas kernel the same
loops become in-core instructions: the whole N<=120 problem state
(potentials, matching, search tree) lives in (8, 128) VMEM scratch tiles,
every update is a VPU op over one tile, dynamic indexing is replaced by
branch-free masked reductions, and the loops carry only scalars (Mosaic
cannot legalize loop-carried vectors with replicated sublane layouts).
One launch, ~N^2 vector steps.

Falls back to interpreter mode off-TPU (the CPU test suite runs the same
code path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBS = 8
_INF = 3.0e38


def _lane_ids():
    return jax.lax.broadcasted_iota(jnp.int32, (_SUBS, _LANES), 1)


def _row0():
    return jax.lax.broadcasted_iota(jnp.int32, (_SUBS, _LANES), 0) == 0


def _select_scalar(vec, idx):
    """vec[0, idx] via a branch-free masked reduction (no dynamic gather).

    dtype pinned to the input's: under x64 (the CPU interpret test path)
    jnp.sum would otherwise promote int32 to int64 and break while_loop
    carry typing."""
    return jnp.sum(
        jnp.where((_lane_ids() == idx) & _row0(), vec, 0), dtype=vec.dtype
    )


def _jv_kernel(
    n: int,
    n_rows: int,
    cost_ref,
    row_act_ref,
    out_ref,
    u_ref,
    v_ref,
    roc_ref,
    minv_ref,
    way_ref,
    used_ref,
    tree_ref,
):
    """cost_ref: [R, 128] padded cost; out_ref: [1, 128] int32 col_of_row.

    Scratch refs hold the solver state as (8, 128) tiles (row 0 meaningful;
    int32 0/1 instead of bools). Loops carry scalars only.

    Only rows [0, n_rows) intersected with row_act_ref (a [1, 128]
    lane-of-row int mask) are matched; see jv_core_batched for when that is
    sound (zero padding rows always; data rows only when the caller ignores
    their assignment and no dummy zero column exists).
    """
    col = _lane_ids()
    valid = col < n
    virt = jnp.int32(n)  # virtual column index

    cost = cost_ref[:]
    row_act = jnp.broadcast_to(row_act_ref[:], (_SUBS, _LANES))
    cost_row_ids = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 0)
    cost_lane_ids = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 1)

    def cost_row(i0):
        return jnp.sum(
            jnp.where(cost_row_ids == i0, cost, 0.0), axis=0, keepdims=True
        )

    # ---- row-reduction initialization (see jv_core_batched) --------------
    # u[i] = min_j cost[i, j]; each row pre-assigned to its first argmin
    # column where it is the lowest-index claimant. The augmenting loop then
    # only runs for the (few) conflicted rows. State tiles stay replicated
    # across sublanes, matching the update invariant of the loops below.
    cmask = jnp.where(cost_lane_ids < n, cost, _INF)
    rowmin = jnp.min(cmask, axis=1, keepdims=True)  # [R, 1]
    amin = jnp.min(
        jnp.where(cmask == rowmin, cost_lane_ids, n), axis=1, keepdims=True
    )  # [R, 1]
    # row_act in sublane-of-row orientation (masked-reduce transpose).
    act_col = (
        jnp.sum(
            jnp.where(
                cost_lane_ids == cost_row_ids, row_act_ref[:], 0
            ),
            axis=1,
            keepdims=True,
            dtype=jnp.int32,
        )
        > 0
    )  # [R, 1]
    claim = (amin == cost_lane_ids) & (cost_row_ids < n_rows) & act_col
    winner = jnp.min(
        jnp.where(claim, cost_row_ids, n), axis=0, keepdims=True
    )  # [1, 128]
    roc_ref[:] = jnp.where(
        (winner < n) & (col < n), winner, -1
    ).astype(jnp.int32)
    u_row = jnp.sum(
        jnp.where(
            cost_row_ids == cost_lane_ids,
            jnp.broadcast_to(rowmin, cost.shape),
            0.0,
        ),
        axis=0,
        keepdims=True,
    )  # [1, 128] lane-of-row
    u_ref[:] = jnp.broadcast_to(u_row, (_SUBS, _LANES)).astype(jnp.float32)
    v_ref[:] = jnp.zeros((_SUBS, _LANES), jnp.float32)

    def assign_row(r, _):
        taken = (
            jnp.sum(
                ((roc_ref[:] == r) & valid & _row0()).astype(jnp.int32),
                dtype=jnp.int32,
            )
            > 0
        )
        active = _select_scalar(row_act, jnp.int32(r)) > 0

        @pl.when(~taken & active)
        def _run():
            _augment_free_row(r)

        return 0

    def _augment_free_row(r):
        roc_ref[:] = jnp.where(col == virt, r, roc_ref[:])
        minv_ref[:] = jnp.full((_SUBS, _LANES), _INF, jnp.float32)
        way_ref[:] = jnp.full((_SUBS, _LANES), virt, jnp.int32)
        used_ref[:] = jnp.zeros((_SUBS, _LANES), jnp.int32)
        tree_ref[:] = jnp.zeros((_SUBS, _LANES), jnp.int32)

        # Both loops carry a step counter backstop: a JV search/augment walk
        # visits each column at most once, so > n+1 steps only happens on
        # poisoned input (a NaN cost survives jnp.minimum clipping and makes
        # every comparison false) — terminate with a garbage-but-finite
        # result like the fixed-trip formulation did.
        def search_cond(carry):
            j0, step = carry
            return (_select_scalar(roc_ref[:], j0) >= 0) & (step <= n + 1)

        def search_body(carry):
            j0, step = carry
            roc = roc_ref[:]
            i0 = _select_scalar(roc, j0)
            used = jnp.where(col == j0, 1, used_ref[:])
            tree = jnp.where(col == i0, 1, tree_ref[:])
            used_b = used > 0
            cur = cost_row(i0) - _select_scalar(u_ref[:], i0) - v_ref[:]
            minv = minv_ref[:]
            better = (cur < minv) & ~used_b & valid
            minv = jnp.where(better, cur, minv)
            way_ref[:] = jnp.where(better, j0, way_ref[:])
            masked = jnp.where(used_b | ~valid, _INF, minv)
            delta = jnp.min(masked)
            j1 = jnp.min(jnp.where(masked == delta, col, _LANES)).astype(
                jnp.int32
            )
            u_ref[:] = jnp.where(tree > 0, u_ref[:] + delta, u_ref[:])
            v_ref[:] = jnp.where(used_b, v_ref[:] - delta, v_ref[:])
            minv_ref[:] = jnp.where(~used_b & valid, minv - delta, minv)
            used_ref[:] = used
            tree_ref[:] = tree
            return j1, step + 1

        j0, _ = jax.lax.while_loop(
            search_cond, search_body, (virt, jnp.int32(0))
        )

        def aug_cond(carry):
            j, step = carry
            return (j != virt) & (step <= n + 1)

        def aug_body(carry):
            j, step = carry
            roc = roc_ref[:]
            jprev = _select_scalar(way_ref[:], j)
            roc_prev = _select_scalar(roc, jprev)
            roc_ref[:] = jnp.where(col == j, roc_prev, roc)
            return jprev, step + 1

        jax.lax.while_loop(aug_cond, aug_body, (j0, jnp.int32(0)))
        return 0

    jax.lax.fori_loop(0, n_rows, assign_row, 0)

    # Invert: out[i] = j such that roc[j] == i (masked reductions; Mosaic has
    # no general gather/transpose at this tiny size).
    roc = roc_ref[:]

    def invert_row(i, _):
        j_of_i = jnp.sum(
            jnp.where((roc == i) & valid & _row0(), col, 0),
            dtype=jnp.int32,
        )
        out_ref[:] = jnp.where(col[0:1] == i, j_of_i, out_ref[:])
        return 0

    out_ref[:] = jnp.full((1, _LANES), -1, jnp.int32)
    jax.lax.fori_loop(0, n_rows, invert_row, 0)


@functools.partial(jax.jit, static_argnames=("n", "n_rows", "interpret"))
def _solve_padded(
    cost_padded: jnp.ndarray, row_act: jnp.ndarray, n: int, n_rows: int,
    interpret: bool,
):
    kernel = functools.partial(_jv_kernel, n, n_rows)
    scratch = [
        pltpu.VMEM((_SUBS, _LANES), jnp.float32),  # u
        pltpu.VMEM((_SUBS, _LANES), jnp.float32),  # v
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # roc
        pltpu.VMEM((_SUBS, _LANES), jnp.float32),  # minv
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # way
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # used
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # tree
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, _LANES), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(cost_padded, row_act)


# ---------------------------------------------------------------------------
# Sublane-batched variant: 8 independent problems per kernel invocation.
# Under vmap (the frame-batched fusion path) the single-problem kernel would
# run one grid step per batch element (~50 us each, serial); packing 8
# problems into the 8 sublanes of every state tile cuts the grid by 8x. The
# search/augment loops stay data-dependent while_loops (scalar carries +
# VMEM scratch state, same design as the single kernel) that early-exit as
# soon as EVERY sublane's walk has finished.
# ---------------------------------------------------------------------------


def jv_core_batched(
    n: int,
    cost,
    u_ref,
    v_ref,
    roc_ref,
    minv_ref,
    way_ref,
    used_ref,
    tree_ref,
    j0_ref,
    n_rows: int | None = None,
    row_active=None,
    invert: bool = True,
):
    """The sublane-batched JV solve as a reusable in-kernel routine.

    cost: [8, R_pad, 128] VALUE (8 problems, one per leading index).
    Returns col_of_row [8, 128] int32 (-1 for rows beyond the matching) when
    `invert`, else the row-of-column matching is left in roc_ref.
    Callers provide the eight (8, 128) scratch refs; all loops carry only
    scalars (Mosaic cannot legalize loop-carried vectors with replicated
    sublane layouts) and exit as soon as EVERY sublane's walk is done —
    typical augmenting paths finish in a few steps, not the n+1 worst case,
    so the early exit cuts the sequential step count several-fold.

    n_rows: only rows [0, n_rows) are matched (static). Rows [n_rows, n) are
      treated as absent: columns they would have taken under square padding
      stay unmatched (roc -1). For the zero/constant padding rows the callers
      use, the restriction of the optimum to the real rows is unchanged
      (identical final assignment except on exactly-tied optima).
    row_active: optional [8, 128] int32 lane-of-row mask; rows with 0 are
      skipped dynamically per problem (same semantics as n_rows — intended
      for constant max-cost rows, e.g. invalid detections, whose matching
      the caller filters out anyway).
    invert: compute and return col_of_row; pass False when the caller reads
      roc_ref directly (saves the 2n-step inversion).

    The solve starts from a row-reduction initialization (the cheap phase of
    Jonker & Volgenant 1987): u[i] = min_j cost[i, j] with every row
    pre-assigned to its first argmin column where unique — all computed as
    vectorized tile ops. The Dijkstra-style augmenting search then runs ONLY
    for rows left unassigned (conflicts), which on association/track-gating
    matrices is a small minority, so the sequential while-loop work drops by
    roughly the pre-assignment rate.
    """
    r_pad = cost.shape[1]
    if n_rows is None:
        n_rows = n
    n_rows = min(n_rows, r_pad)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUBS, _LANES), 1)
    valid = lane < n
    virt = jnp.int32(n)

    row_in = jax.lax.broadcasted_iota(jnp.int32, (_SUBS, r_pad, _LANES), 1)
    lane_in = jax.lax.broadcasted_iota(jnp.int32, (_SUBS, r_pad, _LANES), 2)

    def cost_row(i0):
        # Row i0[s] of problem s: [8, 128].
        sel = row_in == i0[:, :, None]  # i0: (8, 1)
        return jnp.sum(jnp.where(sel, cost, 0.0), axis=1)

    def sel_lane(vec, idx):
        """vec[s, idx[s]] -> (8, 1). dtype pinned (x64 would promote)."""
        return jnp.sum(
            jnp.where(lane == idx, vec, 0), axis=1, keepdims=True,
            dtype=vec.dtype,
        )

    # ---- row-reduction initialization (vectorized) -----------------------
    f32 = jnp.float32
    cmask = jnp.where(lane_in < n, cost, _INF)
    rowmin = jnp.min(cmask, axis=2, keepdims=True)  # [8, R, 1]
    amin = jnp.min(
        jnp.where(cmask == rowmin, lane_in, n), axis=2, keepdims=True
    )  # [8, R, 1] first argmin column per row
    act3 = row_in < n_rows
    if row_active is not None:
        # lane-of-row mask -> sublane-of-row (masked-reduce transpose).
        ra3 = (
            jnp.sum(
                jnp.where(lane_in == row_in, row_active[:, None, :], 0),
                axis=2,
                keepdims=True,
                dtype=jnp.int32,
            )
            > 0
        )
        act3 = act3 & ra3
    claim = (amin == lane_in) & act3  # [8, R, 128]
    winner = jnp.min(
        jnp.where(claim, row_in, n), axis=1
    )  # [8, 128] lowest row claiming each column
    roc_ref[:] = jnp.where((winner < n) & valid, winner, -1).astype(jnp.int32)
    # Duals: u = row minima (lane-of-row layout), v = 0 — feasible
    # (cost - u - v >= 0) and tight on every pre-assigned pair.
    u_ref[:] = jnp.sum(
        jnp.where(
            lane_in == row_in,
            jnp.broadcast_to(rowmin, cmask.shape).astype(f32),
            0.0,
        ),
        axis=1,
        dtype=f32,
    )
    v_ref[:] = jnp.zeros((_SUBS, _LANES), jnp.float32)

    def assign_row(r, _):
        roc = roc_ref[:]
        # Row r still free in this problem? (pre-assignment or an earlier
        # augmentation may already have matched it.)
        taken = (
            jnp.sum(((roc == r) & valid).astype(jnp.int32), axis=1,
                    keepdims=True, dtype=jnp.int32)
            > 0
        )
        need = ~taken
        if row_active is not None:
            need = need & (sel_lane(row_active, jnp.int32(r)) > 0)
        any_need = jnp.sum(need.astype(jnp.int32), dtype=jnp.int32) > 0

        @pl.when(any_need)
        def _run():
            _augment_free_row(r, need)

        return 0

    def _augment_free_row(r, need):
        # Sublanes without need start inactive: their virtual column holds
        # -1, so the search condition is false for them from step 0.
        roc_ref[:] = jnp.where(
            lane == virt, jnp.where(need, r, -1), roc_ref[:]
        )
        minv_ref[:] = jnp.full((_SUBS, _LANES), _INF, jnp.float32)
        way_ref[:] = jnp.full((_SUBS, _LANES), virt, jnp.int32)
        # Masks held as int32 (Mosaic cannot truncate loop-carried i1).
        used_ref[:] = jnp.zeros((_SUBS, _LANES), jnp.int32)
        tree_ref[:] = jnp.zeros((_SUBS, _LANES), jnp.int32)
        j0_ref[:] = jnp.full((_SUBS, _LANES), virt, jnp.int32)

        # Step-counter backstop as in the single kernel: NaN costs would
        # otherwise spin these data-dependent loops forever.
        def search_cond(carry):
            go, step = carry
            return (go > 0) & (step <= n + 1)

        def search_body(carry):
            go, step = carry
            j0 = j0_ref[:, 0:1]
            roc = roc_ref[:]
            active = sel_lane(roc, j0) >= 0  # (8, 1)
            i0 = sel_lane(roc, j0)
            used = jnp.where((lane == j0) & active, 1, used_ref[:])
            tree = jnp.where((lane == i0) & active, 1, tree_ref[:])
            used_b = used > 0
            cur = cost_row(i0) - sel_lane(u_ref[:], i0) - v_ref[:]
            minv = minv_ref[:]
            better = (cur < minv) & ~used_b & valid & active
            minv = jnp.where(better, cur, minv)
            way_ref[:] = jnp.where(better, j0, way_ref[:])
            masked = jnp.where(used_b | ~valid, _INF, minv)
            delta = jnp.min(masked, axis=1, keepdims=True)
            j1 = jnp.min(
                jnp.where(masked == delta, lane, _LANES),
                axis=1,
                keepdims=True,
            ).astype(jnp.int32)
            u_ref[:] = jnp.where((tree > 0) & active, u_ref[:] + delta, u_ref[:])
            v_ref[:] = jnp.where(used_b & active, v_ref[:] - delta, v_ref[:])
            minv_ref[:] = jnp.where(
                ~used_b & valid & active, minv - delta, minv
            )
            used_ref[:] = jnp.where(active, used, used_ref[:])
            tree_ref[:] = jnp.where(active, tree, tree_ref[:])
            j0_new = jnp.where(active, j1, j0)
            j0_ref[:] = jnp.broadcast_to(j0_new, (_SUBS, _LANES))
            # Continue while any sublane's walk still sits on a taken column.
            still = sel_lane(roc_ref[:], j0_new) >= 0
            return jnp.sum(still.astype(jnp.int32)), step + 1

        init_go = jnp.sum(
            (sel_lane(roc_ref[:], j0_ref[:, 0:1]) >= 0).astype(jnp.int32)
        )
        jax.lax.while_loop(
            search_cond, search_body, (init_go, jnp.int32(0))
        )

        def aug_cond(carry):
            go, step = carry
            return (go > 0) & (step <= n + 1)

        def aug_body(carry):
            go, step = carry
            j = j0_ref[:, 0:1]
            active = j != virt
            jprev = sel_lane(way_ref[:], j)
            roc_prev = sel_lane(roc_ref[:], jprev)
            roc_ref[:] = jnp.where((lane == j) & active, roc_prev, roc_ref[:])
            j_new = jnp.where(active, jprev, j)
            j0_ref[:] = jnp.broadcast_to(j_new, (_SUBS, _LANES))
            return jnp.sum((j_new != virt).astype(jnp.int32)), step + 1

        init_aug = jnp.sum((j0_ref[:, 0:1] != virt).astype(jnp.int32))
        jax.lax.while_loop(aug_cond, aug_body, (init_aug, jnp.int32(0)))

    jax.lax.fori_loop(0, n_rows, assign_row, 0)

    if not invert:
        return None

    roc = roc_ref[:]

    def invert_row(i, out):
        j_of_i = jnp.sum(
            jnp.where((roc == i) & valid, lane, 0), axis=1, keepdims=True,
            dtype=jnp.int32,
        )
        return jnp.where(lane == i, j_of_i, out)

    return jax.lax.fori_loop(
        0, n_rows, invert_row, jnp.full((_SUBS, _LANES), -1, jnp.int32)
    )


def _jv_kernel_batched(
    n: int,
    cost_ref,
    out_ref,
    u_ref,
    v_ref,
    roc_ref,
    minv_ref,
    way_ref,
    used_ref,
    tree_ref,
    j0_ref,
):
    """cost_ref: [1, 8, R, 128] (8 problems); out_ref: [1, 8, 128]."""
    out_ref[0] = jv_core_batched(
        n, cost_ref[0], u_ref, v_ref, roc_ref, minv_ref, way_ref,
        used_ref, tree_ref, j0_ref,
    )


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _solve_padded_batched(cost4: jnp.ndarray, n: int, interpret: bool):
    """cost4: [G, 8, R, 128] -> [G, 8, 128] col_of_row."""
    g, _, r_pad, _ = cost4.shape
    kernel = functools.partial(_jv_kernel_batched, n)
    scratch = [
        pltpu.VMEM((_SUBS, _LANES), jnp.float32),  # u
        pltpu.VMEM((_SUBS, _LANES), jnp.float32),  # v
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # roc
        pltpu.VMEM((_SUBS, _LANES), jnp.float32),  # minv
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # way
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # used
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # tree
        pltpu.VMEM((_SUBS, _LANES), jnp.int32),    # j0
    ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, _SUBS, r_pad, _LANES),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, _SUBS, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, _SUBS, _LANES), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(cost4)


def linear_sum_assignment_pallas_batched(
    cost: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """Batched assignment: cost [B, R, C] -> col_of_row [B, R]."""
    b, r, c = cost.shape
    n = max(r, c)
    if n > _LANES - 8:
        raise ValueError(f"pallas JV supports up to {_LANES - 8}, got {n}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r_pad = max(8, -(-n // 8) * 8)
    g = -(-b // _SUBS)
    padded = jnp.zeros((g * _SUBS, r_pad, _LANES), jnp.float32)
    padded = padded.at[:b, :r, :c].set(cost.astype(jnp.float32))
    padded = padded.reshape(g, _SUBS, r_pad, _LANES)
    roc = _solve_padded_batched(padded, n, bool(interpret))
    col_of_row = roc.reshape(g * _SUBS, _LANES)[:b, :r]
    return jnp.where(col_of_row < c, col_of_row, -1)


@jax.custom_batching.custom_vmap
def linear_sum_assignment_pallas(cost: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ops.hungarian.linear_sum_assignment (N <= 120).

    Under vmap this dispatches to the sublane-batched kernel (8 problems per
    grid step) instead of one grid step per batch element.

    Returns col_of_row [R] int32, -1 for unassigned rows.
    """
    return _lsa_pallas_single(cost)


@linear_sum_assignment_pallas.def_vmap
def _lsa_pallas_vmap(axis_size, in_batched, cost):
    (cost_batched,) = in_batched
    if not cost_batched:
        cost = jnp.broadcast_to(cost, (axis_size,) + cost.shape)
    return linear_sum_assignment_pallas_batched(cost), True


def _lsa_pallas_single(cost: jnp.ndarray, row_active=None) -> jnp.ndarray:
    """Single-problem Pallas JV.

    row_active: optional [R] bool/int mask — rows with 0 are skipped
    (returned unassigned). ONLY sound when the caller ignores those rows'
    assignments AND they can never displace an active row's optimum, e.g.
    constant rows on a cost tier strictly above every active row's entries
    (see jv_core_batched's n_rows note).
    """
    r, c = cost.shape
    n = max(r, c)
    if n > _LANES - 8:
        raise ValueError(f"pallas JV supports up to {_LANES - 8}, got {n}")
    interpret = jax.default_backend() != "tpu"
    rows_pad = max(8, -(-n // 8) * 8)
    padded = jnp.zeros((rows_pad, _LANES), jnp.float32)
    padded = padded.at[:r, :c].set(cost.astype(jnp.float32))
    act = jnp.zeros((1, _LANES), jnp.int32)
    if row_active is None:
        act = act.at[0, :r].set(1)
    else:
        act = act.at[0, :r].set(row_active.astype(jnp.int32))
    col_of_row = _solve_padded(padded, act, n, r, bool(interpret))[0][:r]
    return jnp.where(col_of_row < c, col_of_row, -1)
