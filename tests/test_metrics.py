"""Evaluation metrics (metrics.py) + rig persistence round trip."""

import numpy as np

from smartedgesensor3dhumanpose_tpu import cameras, metrics


def _frame(gt, preds, scores=None, valid=None):
    """Pack [P, J, 3] predictions into frame_joint_errors arguments."""
    preds = np.asarray(preds, np.float64)
    p, j, _ = preds.shape
    scores = np.ones((p, j)) if scores is None else np.asarray(scores)
    valid = np.ones((p,), bool) if valid is None else np.asarray(valid)
    return preds, scores, valid, np.asarray(gt, np.float64)


def test_frame_matching_exact_and_gated():
    gt = np.zeros((2, 17, 3))
    gt[1, :, 0] = 5.0  # second person far away
    preds = gt.copy()
    preds[..., 0] += 0.01  # 1 cm x-offset everywhere
    errs = metrics.frame_joint_errors(*_frame(gt, preds))
    assert len(errs) == 2
    np.testing.assert_allclose(
        np.concatenate(errs), 0.01, rtol=1e-6
    )
    # A prediction beyond the match gate contributes nothing.
    far = preds.copy()
    far[1] += 10.0
    errs = metrics.frame_joint_errors(*_frame(gt, far))
    assert len(errs) == 1


def test_frame_matching_greedy_used_set():
    gt = np.zeros((2, 17, 3))
    gt[1, :, 0] = 0.3
    # ONE prediction sitting between both GT people: it may match only one.
    pred = np.zeros((1, 17, 3))
    pred[0, :, 0] = 0.1
    errs = metrics.frame_joint_errors(*_frame(gt, pred))
    assert len(errs) == 1
    np.testing.assert_allclose(errs[0], 0.1, rtol=1e-6)


def test_fragments_never_match():
    gt = np.zeros((1, 17, 3))
    pred = np.zeros((1, 17, 3))
    scores = np.zeros((1, 17))
    scores[0, :4] = 1.0  # only 4 scored joints < min_joints=5
    errs = metrics.frame_joint_errors(*_frame(gt, pred, scores=scores))
    assert len(errs) == 0
    scores[0, :5] = 1.0
    errs = metrics.frame_joint_errors(*_frame(gt, pred, scores=scores))
    assert len(errs) == 1 and errs[0].shape == (5,)


def test_invalid_persons_excluded():
    gt = np.zeros((1, 17, 3))
    pred = np.zeros((1, 17, 3))
    errs = metrics.frame_joint_errors(
        *_frame(gt, pred, valid=np.array([False]))
    )
    assert len(errs) == 0


def test_sequence_with_fusion_layout_and_summaries():
    t, g, j, k = 3, 2, 5, 9
    rng = np.random.default_rng(0)
    to_fusion = np.array([0, 2, 4, 6, 8])  # 5 input joints -> 9 fusion slots
    gt = rng.normal(size=(t, g, j, 3))
    xyz = np.zeros((t, g, k, 3))
    # Pure x-offset: every matched joint error is exactly 0.02 m.
    xyz[:, :, to_fusion] = gt
    xyz[:, :, to_fusion, 0] += 0.02
    score = np.zeros((t, g, k))
    score[:, :, to_fusion] = 1.0
    valid = np.ones((t, g), bool)
    errs = metrics.sequence_joint_errors(
        xyz, score, valid, gt, to_fusion=to_fusion, start=1
    )
    assert errs.shape == ((t - 1) * g * j,)
    np.testing.assert_allclose(errs, 0.02, rtol=1e-6)
    np.testing.assert_allclose(metrics.mpjpe(errs), 0.02, rtol=1e-6)
    assert metrics.pck(errs, threshold=0.05) == 1.0
    assert metrics.pck(errs, threshold=0.01) == 0.0
    assert np.isnan(metrics.mpjpe(np.zeros((0,))))
    assert np.isnan(metrics.pck(np.zeros((0,))))


def test_evaluate_sequence_accounting():
    t, g, j = 4, 3, 17
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(t, g, j, 3))
    # Two of three GT people predicted (person 2 always missed); person 1 is
    # a half-coverage fragment (9 of 17 joints scored).
    xyz = gt[:, :2].copy()
    xyz[..., 0] += 0.03
    score = np.ones((t, 2, j))
    score[:, 1, 9:] = 0.0
    valid = np.ones((t, 2), bool)
    ev = metrics.evaluate_sequence(xyz, score, valid, gt, start=1)
    assert ev.n_gt == (t - 1) * g
    assert ev.n_matched == (t - 1) * 2
    np.testing.assert_allclose(ev.miss_rate, 1.0 / 3.0, rtol=1e-9)
    np.testing.assert_allclose(ev.coverage, (1.0 + 9.0 / 17.0) / 2, rtol=1e-9)
    np.testing.assert_allclose(ev.joint_errors, 0.03, rtol=1e-6)
    # joint_errors must equal the legacy sequence_joint_errors output.
    legacy = metrics.sequence_joint_errors(xyz, score, valid, gt, start=1)
    np.testing.assert_array_equal(ev.joint_errors, legacy)
    # Empty case: NaNs, not crashes.
    ev0 = metrics.evaluate_sequence(
        xyz, np.zeros_like(score), valid, gt, start=1
    )
    assert ev0.n_matched == 0 and np.isnan(ev0.coverage)
    assert ev0.miss_rate == 1.0


def test_evaluate_sequence_gt_validity_mask():
    """Padded GT person slots masked out by gt_valid must not count as
    misses: 3 slots, only 2 live, both matched -> miss_rate 0."""
    t, g, j = 4, 3, 17
    rng = np.random.default_rng(2)
    gt = rng.normal(size=(t, g, j, 3))
    gt[:, 2] = 0.0  # padded slot (would sit at the origin in real padding)
    gt_valid = np.ones((t, g), bool)
    gt_valid[:, 2] = False
    xyz = gt[:, :2].copy()
    xyz[..., 0] += 0.03
    score = np.ones((t, 2, j))
    valid = np.ones((t, 2), bool)
    ev = metrics.evaluate_sequence(
        xyz, score, valid, gt, start=1, gt_valid=gt_valid
    )
    assert ev.n_gt == (t - 1) * 2
    assert ev.n_matched == (t - 1) * 2
    assert ev.miss_rate == 0.0
    np.testing.assert_allclose(ev.joint_errors, 0.03, rtol=1e-6)
    # Without the mask the padded slot inflates the miss rate.
    ev_nomask = metrics.evaluate_sequence(xyz, score, valid, gt, start=1)
    np.testing.assert_allclose(ev_nomask.miss_rate, 1.0 / 3.0, rtol=1e-9)
    # Shape mismatch fails loudly.
    import pytest

    with pytest.raises(ValueError):
        metrics.evaluate_sequence(
            xyz, score, valid, gt, gt_valid=gt_valid[:, :2]
        )


def test_rig_save_load_roundtrip(tmp_path):
    rig = cameras.hall_rig(6)
    path = str(tmp_path / "rig.json")
    cameras.save_rig(rig, path)
    rig2 = cameras.load_rig(path)
    np.testing.assert_array_equal(np.asarray(rig.P), np.asarray(rig2.P))
    np.testing.assert_array_equal(np.asarray(rig.K), np.asarray(rig2.K))
    np.testing.assert_array_equal(
        np.asarray(rig.image_size), np.asarray(rig2.image_size)
    )
    # F is recomputed from the PERSISTED (float32-quantized) P, while the
    # original rig derived it from the pre-quantization float64 extrinsics
    # — close, not bit-identical.
    np.testing.assert_allclose(
        np.asarray(rig.F), np.asarray(rig2.F), atol=1e-5
    )


def test_rig_save_load_lossless_from_raw_f64(tmp_path):
    """Passing the original float64 P/K to save_rig makes the round trip
    exact: F recomputed from the persisted calibration matches the rig
    built directly from the raw arrays, bit for bit."""
    rng = np.random.default_rng(3)
    c = 4
    # Raw float64 calibration with no exact float32 representation.
    P = np.asarray(cameras.hall_rig(c).P, np.float64)
    P += rng.normal(scale=1e-9, size=P.shape)
    K = np.asarray(cameras.hall_rig(c).K, np.float64)
    K += rng.normal(scale=1e-9, size=K.shape)
    rig = cameras.build_rig(P, K)
    path = str(tmp_path / "rig64.json")
    cameras.save_rig(rig, path, P=P, K=K)
    rig2 = cameras.load_rig(path)
    np.testing.assert_array_equal(np.asarray(rig.P), np.asarray(rig2.P))
    np.testing.assert_array_equal(np.asarray(rig.K), np.asarray(rig2.K))
    np.testing.assert_array_equal(np.asarray(rig.F), np.asarray(rig2.F))
