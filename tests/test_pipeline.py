import jax
import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu import cameras, pipeline, reprojection, skeleton
from smartedgesensor3dhumanpose_tpu.config import (
    FusionConfig,
    PipelineConfig,
    PriorConfig,
    TrackerConfig,
)
from smartedgesensor3dhumanpose_tpu.io import synthetic
from smartedgesensor3dhumanpose_tpu.types import Frame, Persons3D
from test_fusion import match_to_gt


def scene_frames(scene, dtype=jnp.float64):
    data = synthetic.frames_from_scene(scene)
    return Frame(
        kp2d=jnp.asarray(data["kp2d"], dtype),
        cov2d=jnp.asarray(data["cov2d"], dtype),
        det_score=jnp.asarray(data["det_score"], dtype),
        det_valid=jnp.asarray(data["det_valid"]),
        cam_stamp=jnp.asarray(data["cam_stamp"], dtype),
        fb_delay=jnp.asarray(data["fb_delay"], dtype),
    )


def small_config(num_cameras=12, people=4):
    return PipelineConfig(
        fusion=FusionConfig(
            num_cameras=num_cameras,
            max_dets_per_cam=people,
            max_hypotheses=2 * people,
        ),
        tracker=TrackerConfig(max_tracks=2 * people),
    )


def test_offline_scan_end_to_end():
    n_frames, people, cams = 20, 4, 12
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=cams,
            num_people=people,
            num_frames=n_frames,
            pixel_noise=1.0,
            seed=21,
        )
    )
    cfg = small_config(cams, people)
    pipe = pipeline.Pipeline(scene["rig"], cfg)
    frames = scene_frames(scene)
    state = pipe.init_state(dtype=jnp.float64)
    final_state, outs = pipe.run_offline(state, frames)

    to_fusion = np.asarray(skeleton.SIMPLE_MODEL.to_fusion)
    # After the publish gate (10 observations), fused output tracks GT.
    for t in range(12, n_frames):
        valid = np.asarray(outs.fused.valid[t])
        assert valid.sum() == people, f"frame {t}: {valid.sum()}"
        errs, _ = match_to_gt(
            np.asarray(outs.fused.xyz[t]),
            np.asarray(outs.fused.score[t]),
            valid,
            scene["gt_xyz"][t],
            to_fusion,
        )
        assert np.isfinite(errs).all() and errs.max() < 0.06, (
            f"frame {t}: {errs}"
        )
        # Track ids are stable and in the initial spawn range.
        ids = np.asarray(outs.fused.person_id[t])[valid]
        assert set(ids.tolist()) <= set(range(people))

    # Feedback goes out for every camera that sees a published person.
    fb_valid = np.asarray(outs.feedback.valid[-1])  # [C, P]
    assert fb_valid.any()
    # Online step agrees with scan (same program, same state threading).
    state2 = pipe.init_state(dtype=jnp.float64)
    frame0 = jax.tree.map(lambda a: a[0], frames)
    state2, out0 = pipe.step(state2, frame0)
    np.testing.assert_allclose(
        np.asarray(out0.persons_raw.xyz),
        np.asarray(outs.persons_raw.xyz[0]),
        atol=1e-9,
    )


def test_offline_cold_start_matches_online():
    """The offline scan's hoisted cold-start LM (tracking.smooth_cold) must
    agree with the online warm-start path (reference setInitialState
    semantics) to well under the 1 mm parity budget — a converged LM is
    warm-start independent."""
    n_frames, people, cams = 16, 3, 8
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=cams,
            num_people=people,
            num_frames=n_frames,
            pixel_noise=1.0,
            seed=9,
        )
    )
    cfg = small_config(cams, people)
    pipe = pipeline.Pipeline(scene["rig"], cfg)
    frames = scene_frames(scene)
    state = pipe.init_state(dtype=jnp.float64)
    _, offline = pipe.run_offline(state, frames)

    st = pipe.init_state(dtype=jnp.float64)
    online_xyz, online_valid, online_cov = [], [], []
    for t in range(n_frames):
        st, out = pipe.step(st, jax.tree.map(lambda a: a[t], frames))
        online_xyz.append(np.asarray(out.fused.xyz))
        online_valid.append(np.asarray(out.fused.valid))
        online_cov.append(np.asarray(out.fused.cov))
    online_xyz = np.stack(online_xyz)
    online_valid = np.stack(online_valid)
    online_cov = np.stack(online_cov)

    np.testing.assert_array_equal(np.asarray(offline.fused.valid), online_valid)
    dxyz = np.abs(np.asarray(offline.fused.xyz) - online_xyz).max(axis=(-1, -2))
    # Both paths stop within gtsam's 1e-5 relative error tolerance of the
    # optimum (from different directions), so they agree to ~0.2 mm; the
    # parity budget vs the reference is 1 mm (BASELINE.md).
    assert np.where(online_valid, dxyz, 0.0).max() < 5e-4  # 0.5 mm
    # Marginals are evaluated at the two (tolerance-separated) optima; the
    # difference is ~1e-5 m^2 against typical joint covariances of 1e-3.
    dcov = np.abs(np.asarray(offline.fused.cov) - online_cov).max(
        axis=(-1, -2, -3)
    )
    assert np.where(online_valid, dcov, 0.0).max() < 1e-4


def test_offline_cold_start_non_converged_boundary():
    """Pin behavior on frames where the LM does NOT converge.

    test_offline_cold_start_matches_online covers the converged regime,
    where the hoisted cold-start LM (tracking.smooth_cold) is equivalent to
    the online warm start. When lm_max_iterations truncates the
    optimization, the two paths legitimately diverge; this documents the
    boundary: frame 0 (no tracks yet -> warm start IS the measurements) is
    identical, later frames diverge by a nonzero but bounded amount while
    track structure (valid masks, ids) stays intact.
    """
    import dataclasses

    n_frames, people, cams = 16, 3, 8
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=cams,
            num_people=people,
            num_frames=n_frames,
            pixel_noise=1.0,
            seed=9,
        )
    )
    cfg = small_config(cams, people)
    cfg = dataclasses.replace(
        cfg,
        prior=dataclasses.replace(
            cfg.prior,
            lm_max_iterations=1,
            lm_absolute_error_tol=1e-12,
            lm_relative_error_tol=1e-12,
        ),
    )
    pipe = pipeline.Pipeline(scene["rig"], cfg)
    frames = scene_frames(scene)
    _, offline = pipe.run_offline(pipe.init_state(dtype=jnp.float64), frames)

    st = pipe.init_state(dtype=jnp.float64)
    online_xyz, online_valid = [], []
    for t in range(n_frames):
        st, out = pipe.step(st, jax.tree.map(lambda a: a[t], frames))
        online_xyz.append(np.asarray(out.fused.xyz))
        online_valid.append(np.asarray(out.fused.valid))
    online_xyz = np.stack(online_xyz)
    online_valid = np.stack(online_valid)

    # Track structure survives the truncation identically on both paths.
    np.testing.assert_array_equal(np.asarray(offline.fused.valid), online_valid)

    dxyz = np.abs(np.asarray(offline.fused.xyz) - online_xyz).max(axis=(-1, -2))
    dxyz = np.where(online_valid, dxyz, 0.0)
    # Frame 0: no previous estimates exist, the warm start equals the
    # measurements, so the paths are bit-identical even unconverged.
    assert dxyz[0].max() < 1e-12
    # Later frames: start-dependent outputs — nonzero divergence (the trade
    # smooth_cold makes is real on non-converged frames) ...
    if online_valid[1:].any():
        assert dxyz[1:].max() > 1e-9
        # ... but bounded: a single damped LM step from a warm start one
        # frame of motion away stays within a few cm of the cold path.
        assert dxyz[1:].max() < 0.05


def test_stale_camera_masking():
    cams = 4
    stamps = jnp.asarray([1.0, 1.0, 0.9, 0.995])
    frame = Frame(
        kp2d=jnp.zeros((cams, 2, 17, 3)),
        cov2d=jnp.zeros((cams, 2, 17, 3)),
        det_score=jnp.zeros((cams, 2)),
        det_valid=jnp.ones((cams, 2), bool),
        cam_stamp=stamps,
        fb_delay=jnp.full((cams,), 0.1),
    )
    masked, pivot = pipeline.mask_stale_cameras(frame, 0.067)
    assert float(pivot) == 1.0
    dv = np.asarray(masked.det_valid)
    assert dv[0].all() and dv[1].all() and dv[3].all()
    assert not dv[2].any()  # 100 ms behind pivot -> dropped


def test_reprojection_roundtrip(rng):
    """Feedback keypoints must land on the projections of the 3D joints."""
    rig = cameras.hall_rig(8, dtype=jnp.float64)
    k = skeleton.NUM_FUSION_JOINTS
    from test_prior import make_person

    xyz, score, cov = make_person(rng, noise=0.0)
    persons = Persons3D(
        xyz=jnp.asarray(xyz)[None],
        score=jnp.asarray(score)[None],
        cov=jnp.asarray(cov)[None],
        valid=jnp.ones((1,), bool),
        person_id=jnp.zeros((1,), jnp.int32),
    )
    out = reprojection.reproject(persons, rig, "simple", jnp.float64(0.1))
    to_fusion = np.asarray(skeleton.SIMPLE_MODEL.to_fusion)
    P = np.asarray(rig.P)
    K = np.asarray(rig.K)
    kp = np.asarray(out.kp2d)
    kv = np.asarray(out.kp_valid)
    checked = 0
    for c in range(8):
        for j in range(17):
            fj = to_fusion[j]
            if score[fj] <= 0:
                assert not kv[c, 0, j]
                continue
            cam = P[c] @ np.append(xyz[fj], 1.0)
            px = np.array(
                [
                    K[c, 0] * cam[0] / cam[2] + K[c, 2],
                    K[c, 1] * cam[1] / cam[2] + K[c, 3],
                ]
            )
            inside = (0 <= px[0] <= 640) and (0 <= px[1] <= 480) and cam[2] > 0
            if kv[c, 0, j]:
                checked += 1
                # UT mean of a (nearly) linear projection ~ projection of mean
                # (small covariances here).
                np.testing.assert_allclose(kp[c, 0, j, :2], px, atol=0.5)
                assert kp[c, 0, j, 2] == score[fj]
    assert checked > 50
    # Bboxes contain all their valid keypoints.
    bbox = np.asarray(out.bbox)
    for c in range(8):
        if not np.asarray(out.valid)[c, 0]:
            continue
        pts = kp[c, 0][kv[c, 0]][:, :2]
        assert (pts[:, 0] >= bbox[c, 0, 0] - 1e-6).all()
        assert (pts[:, 0] <= bbox[c, 0, 2] + 1e-6).all()
        assert (pts[:, 1] >= bbox[c, 0, 1] - 1e-6).all()
        assert (pts[:, 1] <= bbox[c, 0, 3] + 1e-6).all()


def test_closed_loop_feedback_latency():
    """fb_delay carried on the feedback equals the prediction horizon, the
    original per-camera stamps are echoed back, and the PersonCovList header
    fields + 3D bboxes are populated (person_msgs/PersonCovList.msg:1-4,
    PersonCov.msg:7-8, skeleton_reproj_mult_node.cpp:157-159)."""
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=8, num_people=2, num_frames=2, seed=31
        )
    )
    cfg = small_config(8, 2)
    pipe = pipeline.Pipeline(scene["rig"], cfg)
    frames = scene_frames(scene)
    state = pipe.init_state(dtype=jnp.float64)
    frame0 = jax.tree.map(lambda a: a[0], frames)
    _, out = pipe.step(state, frame0)
    np.testing.assert_allclose(
        np.asarray(out.feedback.fb_delay),
        float(out.pred_delta_t),
        rtol=1e-6,
    )
    # Wire-type completeness: original stamps echoed on the feedback and on
    # the PersonCovList header; measured delays on persons_3d; predicted
    # horizon broadcast per camera on the fused lists.
    np.testing.assert_array_equal(
        np.asarray(out.feedback.orig_stamp), np.asarray(frame0.cam_stamp)
    )
    np.testing.assert_array_equal(
        np.asarray(out.ts_per_cam), np.asarray(frame0.cam_stamp)
    )
    np.testing.assert_array_equal(
        np.asarray(out.fb_delay_per_cam_raw), np.asarray(frame0.fb_delay)
    )
    np.testing.assert_allclose(
        np.asarray(out.fb_delay_per_cam), float(out.pred_delta_t), rtol=1e-6
    )
    # 3D bboxes contain every valid fused joint.
    xyz = np.asarray(out.fused.xyz)
    score = np.asarray(out.fused.score)
    valid = np.asarray(out.fused.valid)
    ctr = np.asarray(out.bbox3d_center)
    size = np.asarray(out.bbox3d_size)
    for p in range(xyz.shape[0]):
        if not valid[p]:
            np.testing.assert_array_equal(size[p], 0.0)
            continue
        pts = xyz[p][score[p] > 0]
        lo, hi = ctr[p] - size[p] / 2, ctr[p] + size[p] / 2
        assert (pts >= lo - 1e-9).all() and (pts <= hi + 1e-9).all()
