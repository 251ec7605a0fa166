import jax
import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu import skeleton, tracking
from smartedgesensor3dhumanpose_tpu.config import PriorConfig, TrackerConfig
from smartedgesensor3dhumanpose_tpu.types import Persons3D, TrackerState
from test_prior import make_person

K = skeleton.NUM_FUSION_JOINTS


def persons_at(rng, centers, noise=0.01, max_slots=4):
    """Persons3D with people at given xy centers (None = empty slot)."""
    xyz = np.zeros((max_slots, K, 3))
    score = np.zeros((max_slots, K))
    cov = np.zeros((max_slots, K, 3, 3))
    valid = np.zeros(max_slots, bool)
    for i, c in enumerate(centers):
        if c is None:
            continue
        x, s, cv = make_person(rng, noise=noise)
        offset = np.array([c[0], c[1], 0.0])
        x = np.where((s > 0)[:, None], x + offset, 0.0)
        xyz[i], score[i], cov[i] = x, s, cv
        valid[i] = True
    return Persons3D(
        xyz=jnp.asarray(xyz),
        score=jnp.asarray(score),
        cov=jnp.asarray(cov),
        valid=jnp.asarray(valid),
        person_id=-jnp.ones(max_slots, jnp.int32),
    )


def run_sequence(rng, center_fn, n_frames, tcfg=None, pcfg=None, dt=1 / 30):
    tcfg = tcfg or TrackerConfig(max_tracks=8)
    pcfg = pcfg or PriorConfig()
    state = TrackerState.initial(
        tcfg.max_tracks, tcfg.n_mov_avg, tcfg.avg_delay, dtype=jnp.float64
    )
    fb = jnp.full((4,), 0.1, jnp.float64)
    outs = []
    step = jax.jit(
        lambda s, p, t: tracking.step(s, p, t, fb, pcfg, tcfg)
    )
    for f in range(n_frames):
        persons = center_fn(f)
        state, out = step(state, persons, jnp.float64(f * dt + 1.0))
        outs.append(out)
    return state, outs


def test_track_identity_and_publish_gate(rng):
    tcfg = TrackerConfig(max_tracks=8)

    def centers(f):
        # Two people walking apart.
        return persons_at(
            rng, [(0.02 * f, 0.0), (2.0, 2.0 - 0.02 * f)], noise=0.005
        )

    state, outs = run_sequence(rng, centers, 15, tcfg=tcfg)
    # Publish gate: nothing published until obs count exceeds 10.
    for f in range(10):
        assert not np.asarray(outs[f].fused.valid).any(), f"frame {f}"
    for f in range(10, 15):
        assert np.asarray(outs[f].fused.valid).sum() == 2
    # Stable ids 0 and 1 across published frames.
    ids = np.asarray(outs[-1].fused.person_id)[np.asarray(outs[-1].fused.valid)]
    assert sorted(ids.tolist()) == [0, 1]
    assert int(state.next_id) == 2
    assert np.asarray(state.alive).sum() == 2


def test_track_decay(rng):
    tcfg = TrackerConfig(max_tracks=8)

    def centers(f):
        if f < 5:
            return persons_at(rng, [(0.0, 0.0)])
        return persons_at(rng, [None])  # person disappears

    # 1.0 s decay at 30 fps -> dead ~30 frames later.
    state, outs = run_sequence(rng, centers, 40, tcfg=tcfg)
    assert np.asarray(state.alive).sum() == 0


def test_new_track_after_decay_gets_fresh_id(rng):
    tcfg = TrackerConfig(max_tracks=8)

    def centers(f):
        if f < 3:
            return persons_at(rng, [(0.0, 0.0)])
        if f < 40:
            return persons_at(rng, [None])
        return persons_at(rng, [(3.0, 3.0)])

    state, _ = run_sequence(rng, centers, 45, tcfg=tcfg)
    assert np.asarray(state.alive).sum() == 1
    alive_slot = int(np.asarray(state.alive).argmax())
    assert int(np.asarray(state.track_id)[alive_slot]) == 1
    assert int(state.next_id) == 2


def test_prediction_leads_motion(rng):
    tcfg = TrackerConfig(max_tracks=8)
    v = 1.2  # m/s along x
    dt = 1 / 30

    def centers(f):
        return persons_at(rng, [(v * f * dt, 0.0)], noise=0.0)

    _, outs = run_sequence(rng, centers, 20, tcfg=tcfg, dt=dt)
    out = outs[-1]
    valid = np.asarray(out.fused.valid)
    assert valid.any()
    p = int(valid.argmax())
    sc = np.asarray(out.fused.score[p])
    ok = sc > 0
    lead = (
        np.asarray(out.fused_pred.xyz[p])[ok, 0]
        - np.asarray(out.fused.xyz[p])[ok, 0]
    )
    horizon = float(out.pred_delta_t)
    # Predicted skeleton leads by ~velocity * horizon along x.
    np.testing.assert_allclose(lead, v * horizon, rtol=0.25)
    # Predicted covariance inflated by the prediction noise.
    dcov = np.asarray(out.fused_pred.cov[p])[ok] - np.asarray(
        out.fused.cov[p]
    )[ok]
    want = np.tile(tcfg.pred_noise_sigma**2 * np.eye(3), (dcov.shape[0], 1, 1))
    np.testing.assert_allclose(dcov, want, atol=1e-8)


def test_track_merge_reassigns_id(rng):
    tcfg = TrackerConfig(max_tracks=8)

    def centers(f):
        if f < 12:
            # Two well-separated people -> two tracks, both published.
            return persons_at(rng, [(0.0, 0.0), (2.0, 2.0)])
        # They converge onto the same spot -> tracks merge.
        return persons_at(rng, [(0.0, 0.0), (0.0, 0.0)])

    state, outs = run_sequence(rng, centers, 14, tcfg=tcfg)
    # The freshly-spawned duplicate track at (0,0) merges into track 0 every
    # frame; the original track 1 survives until its 1 s decay.
    alive = np.asarray(state.alive)
    assert alive.sum() == 2 and alive[0] and alive[1]
    # Published persons of merged-away tracks carry the keeper's id.
    ids = np.asarray(outs[-1].fused.person_id)[np.asarray(outs[-1].fused.valid)]
    assert set(ids.tolist()) == {0}


def test_no_detection_frame_keeps_state(rng):
    tcfg = TrackerConfig(max_tracks=8)

    def centers(f):
        if f == 5:
            return persons_at(rng, [None])
        return persons_at(rng, [(0.0, 0.0)])

    state, outs = run_sequence(rng, centers, 13, tcfg=tcfg)
    # One absent frame must not kill the track or reset the id.
    assert np.asarray(state.alive).sum() == 1
    assert int(state.next_id) == 1
    assert np.asarray(outs[-1].fused.valid).sum() == 1


def test_fb_delay_moving_average(rng):
    tcfg = TrackerConfig(max_tracks=4)
    pcfg = PriorConfig()
    state = TrackerState.initial(4, 3, 0.1, dtype=jnp.float64)
    persons = persons_at(rng, [(0.0, 0.0)])
    fb = jnp.asarray([0.2, 0.2, -1.0, 0.2], jnp.float64)
    for f in range(3):
        state, out = tracking.step(
            state, persons, jnp.float64(1.0 + f / 30), fb, pcfg, tcfg
        )
    # After 3 frames the buffer is saturated with 0.2 (invalid -1 excluded).
    np.testing.assert_allclose(float(out.pred_delta_t), 0.2, rtol=1e-6)


def test_track_spawn_overflow_counted(rng):
    """4 valid persons against 2 track slots: 2 spawns must be reported
    dropped (reference grows unboundedly, pose_prior_mult_node.cpp:570-580),
    and a roomy config reports zero."""
    tcfg = TrackerConfig(max_tracks=2)
    pcfg = PriorConfig()
    state = TrackerState.initial(2, 3, 0.1, dtype=jnp.float64)
    persons = persons_at(
        rng, [(0.0, 0.0), (2.0, 0.0), (0.0, 2.0), (2.0, 2.0)]
    )
    fb = jnp.full((4,), 0.1, jnp.float64)
    state, out = tracking.step(state, persons, jnp.float64(1.0), fb, pcfg, tcfg)
    assert int(out.n_dropped_spawns) == 2
    assert int(np.asarray(state.alive).sum()) == 2

    roomy = TrackerConfig(max_tracks=8)
    state8 = TrackerState.initial(8, 3, 0.1, dtype=jnp.float64)
    _, out8 = tracking.step(
        state8, persons, jnp.float64(1.0), fb, pcfg, roomy
    )
    assert int(out8.n_dropped_spawns) == 0
