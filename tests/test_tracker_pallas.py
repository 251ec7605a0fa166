"""The single-launch Pallas tracker scan must reproduce the XLA scan of
tracking.step exactly.

ops.tracker_pallas.tracker_scan is the offline TPU dispatch for the whole
sequential tracker (pipeline._scan_impl); its integer decisions — publish
masks, person ids, spawn/drop counts, track lifecycle — are pinned EXACTLY
equal to `lax.scan(tracking.step(..., precomputed=...))` here (interpret
mode; the kernel runs the same jnp ops off-TPU), floats to float32
roundoff. Scenarios cover spawn churn, capacity overflow (dropped spawns),
decay, detection-free frames, and close-track merges with id inheritance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smartedgesensor3dhumanpose_tpu import tracking
from smartedgesensor3dhumanpose_tpu.config import PriorConfig, TrackerConfig
from smartedgesensor3dhumanpose_tpu.ops import tracker_pallas
from smartedgesensor3dhumanpose_tpu.types import Persons3D, TrackerState

F32 = jnp.float32


def _synthetic_person_seq(rng, f, p, merge_heavy=False):
    """Fabricated fusion outputs: wandering people with teleports (spawn
    churn), random dropouts, detection-free frames, and optional tight
    clusters (track merges)."""
    k = 21
    base = rng.uniform(-3, 3, size=(p, 3))
    xyz = np.zeros((f, p, k, 3))
    score = np.zeros((f, p, k))
    valid = np.zeros((f, p), bool)
    pos = base.copy()
    for t in range(f):
        pos = pos + rng.normal(scale=0.02, size=(p, 3))
        # Teleports force track loss + respawn.
        jump = rng.uniform(size=p) < 0.08
        pos[jump] = rng.uniform(-3, 3, size=(jump.sum(), 3))
        if merge_heavy and t > f // 3:
            pos[: p // 2] = pos[0] + rng.normal(scale=0.02, size=(p // 2, 3))
        offs = rng.normal(scale=0.25, size=(p, k, 3))
        xyz[t] = pos[:, None, :] + offs
        xyz[t, :, :, 2] += 0.9  # keep roughly upright
        score[t] = rng.uniform(0.3, 1.0, size=(p, k))
        score[t][rng.uniform(size=(p, k)) < 0.15] = 0.0
        valid[t] = rng.uniform(size=p) > 0.25
        if rng.uniform() < 0.1:
            valid[t] = False  # detection-free frame
    cov = np.broadcast_to(np.eye(3) * 4e-3, (f, p, k, 3, 3)).copy()
    cov += rng.uniform(0, 1e-3, size=(f, p, 1, 1, 1)) * np.eye(3)
    return Persons3D(
        xyz=jnp.asarray(xyz, F32),
        score=jnp.asarray(score, F32),
        cov=jnp.asarray(cov, F32),
        valid=jnp.asarray(valid),
        person_id=-jnp.ones((f, p), jnp.int32),
    )


def _run_both(persons, pivots, fb, prior_cfg, cfg):
    state0 = TrackerState.initial(
        cfg.max_tracks, cfg.n_mov_avg, cfg.avg_delay, dtype=F32
    )
    pre = jax.lax.map(
        lambda pp: tracking.smooth_cold(pp, prior_cfg), persons, batch_size=8
    )

    def body(carry, xs):
        person_t, pivot_t, fb_t, pre_t = xs
        return tracking.step(
            carry, person_t, pivot_t.astype(F32), fb_t, prior_cfg, cfg,
            precomputed=pre_t,
        )

    st_ref, out_ref = jax.lax.scan(
        body, state0, (persons, pivots, fb, pre)
    )
    st_k, out_k = tracker_pallas.tracker_scan(
        state0, persons, pivots, fb, pre, prior_cfg, cfg, interpret=True
    )
    return (st_ref, out_ref), (st_k, out_k)


def _assert_match(ref, ker):
    st_ref, out_ref = ref
    st_k, out_k = ker

    def exact(name, a, b):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )

    def close(name, a, b, tol):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        both_inf = np.isinf(a) & np.isinf(b) & (np.sign(a) == np.sign(b))
        np.testing.assert_allclose(
            np.where(both_inf, 0.0, a), np.where(both_inf, 0.0, b),
            atol=tol, err_msg=name,
        )

    exact("publish", out_ref.fused.valid, out_k.fused.valid)
    exact("person_id", out_ref.fused.person_id, out_k.fused.person_id)
    exact("pred ids", out_ref.fused_pred.person_id, out_k.fused_pred.person_id)
    exact("n_dropped_spawns", out_ref.n_dropped_spawns, out_k.n_dropped_spawns)
    close("pred_delta_t", out_ref.pred_delta_t, out_k.pred_delta_t, 1e-6)
    close("fused.xyz", out_ref.fused.xyz, out_k.fused.xyz, 1e-6)
    close("fused_pred.xyz", out_ref.fused_pred.xyz, out_k.fused_pred.xyz, 1e-4)
    close("fused_pred.cov", out_ref.fused_pred.cov, out_k.fused_pred.cov, 1e-6)
    exact("alive", st_ref.alive, st_k.alive)
    exact("track_id", st_ref.track_id, st_k.track_id)
    exact("num_obs", st_ref.num_obs, st_k.num_obs)
    exact("next_id", st_ref.next_id, st_k.next_id)
    exact("frame_nr", st_ref.frame_nr, st_k.frame_nr)
    exact("est_exists", st_ref.est_exists, st_k.est_exists)
    close("estimate", st_ref.estimate, st_k.estimate, 1e-6)
    close("vel_buffer", st_ref.vel_buffer, st_k.vel_buffer, 1e-3)
    close("t_prev", st_ref.t_prev, st_k.t_prev, 0.0)
    close("height_prev", st_ref.height_prev, st_k.height_prev, 1e-6)
    close("root_prev", st_ref.root_prev, st_k.root_prev, 1e-5)
    close("fb_delay_buffer", st_ref.fb_delay_buffer, st_k.fb_delay_buffer,
          1e-7)
    close("t_prev_global", st_ref.t_prev_global, st_k.t_prev_global, 0.0)


@pytest.mark.parametrize(
    "p,max_tracks,merge_heavy,seed",
    [
        (5, 8, False, 0),     # spawn churn + decay, spare capacity
        (6, 6, False, 1),     # capacity pressure -> dropped spawns
        (8, 12, True, 2),     # tight clusters -> track merges + id rewrite
    ],
)
def test_tracker_scan_matches_xla_scan(p, max_tracks, merge_heavy, seed):
    rng = np.random.default_rng(seed)
    f = 30
    prior_cfg = PriorConfig()
    cfg = TrackerConfig(max_tracks=max_tracks, min_num_obs=3)
    persons = _synthetic_person_seq(rng, f, p, merge_heavy=merge_heavy)
    pivots = jnp.asarray(
        np.arange(f) / 30.0 + rng.normal(scale=1e-3, size=f), F32
    )
    fb = jnp.asarray(
        np.where(
            rng.uniform(size=(f, 4)) < 0.8,
            rng.uniform(0.05, 0.2, size=(f, 4)),
            -1.0,
        ),
        F32,
    )
    ref, ker = _run_both(persons, pivots, fb, prior_cfg, cfg)
    _assert_match(ref, ker)
    # The fixture must be non-trivial: something published, something died.
    assert int(np.asarray(ref[1].fused.valid).sum()) > 0
    if max_tracks == p:
        assert int(np.asarray(ref[1].n_dropped_spawns).sum()) > 0


def test_tracker_scan_scaled_shapes():
    """The 64-track / 40-person scaled layout (tile-padding edge cases)."""
    rng = np.random.default_rng(7)
    f = 10
    prior_cfg = PriorConfig()
    cfg = TrackerConfig(max_tracks=64, min_num_obs=2)
    persons = _synthetic_person_seq(rng, f, 30)
    pivots = jnp.asarray(np.arange(f) / 30.0, F32)
    fb = jnp.full((f, 8), 0.1, F32)
    ref, ker = _run_both(persons, pivots, fb, prior_cfg, cfg)
    _assert_match(ref, ker)
    assert int(np.asarray(ref[1].fused.valid).sum()) > 0
