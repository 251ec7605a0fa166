"""On-TPU 2D keypoint detector + end-to-end fused variant."""

import jax
import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu import cameras
from smartedgesensor3dhumanpose_tpu.config import (
    FusionConfig,
    PipelineConfig,
    TrackerConfig,
)
from smartedgesensor3dhumanpose_tpu.models import end_to_end, keypoint_cnn

CFG = keypoint_cnn.DetectorConfig(
    image_size=(96, 128), width=32, max_detections=3, nms_radius=6
)


def test_cnn_shapes_and_decode(rng):
    model, params = keypoint_cnn.init_detector(CFG, jax.random.PRNGKey(0))
    imgs = jnp.asarray(rng.uniform(size=(2, 96, 128, 3)), jnp.float32)
    heat = model.apply(params, imgs)
    assert heat.shape == (2, 12, 16, 17)
    assert float(heat.min()) >= 0 and float(heat.max()) <= 1
    kp2d, cov2d, det_score, det_valid = keypoint_cnn.decode_heatmaps(heat, CFG)
    assert kp2d.shape == (2, 3, 17, 3)
    assert cov2d.shape == (2, 3, 17, 3)
    assert np.isfinite(np.asarray(kp2d)).all()


def test_decoder_recovers_synthetic_peaks(rng):
    """Plant clean Gaussian peaks; the decoder must localize them."""
    gt = np.zeros((1, 2, 17, 2), np.float32)
    # Two 'people': joint grids around (30, 40) and (90, 60) pixels.
    for d, (cx, cy) in enumerate([(30, 40), (90, 60)]):
        for j in range(17):
            gt[0, d, j] = (
                cx + 3 * (j % 5) + rng.uniform(-1, 1),
                cy + 3 * (j // 5) + rng.uniform(-1, 1),
            )
    valid = np.ones((1, 2, 17), bool)
    heat = keypoint_cnn.gaussian_targets(
        jnp.asarray(gt), jnp.asarray(valid), CFG, sigma=1.0
    )
    kp2d, cov2d, det_score, det_valid = keypoint_cnn.decode_heatmaps(
        jnp.asarray(heat), CFG
    )
    kp2d = np.asarray(kp2d)
    assert np.asarray(det_valid)[0].sum() >= 2
    # Match decoded detections to GT people by mean distance.
    errs = []
    for d in range(2):
        best = min(
            np.linalg.norm(kp2d[0, s, :, :2] - gt[0, d], axis=-1).mean()
            for s in range(3)
            if np.asarray(det_valid)[0, s]
        )
        errs.append(best)
    # Sub-stride localization of clean peaks.
    assert max(errs) < CFG.heatmap_stride, errs


def test_training_step_reduces_loss(rng):
    import optax

    model, params = keypoint_cnn.init_detector(CFG, jax.random.PRNGKey(1))
    imgs = jnp.asarray(rng.uniform(size=(2, 96, 128, 3)), jnp.float32)
    gt = jnp.asarray(
        rng.uniform(low=10, high=80, size=(2, 2, 17, 2)), jnp.float32
    )
    targets = keypoint_cnn.gaussian_targets(
        gt, jnp.ones((2, 2, 17), bool), CFG
    )
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: keypoint_cnn.heatmap_loss(model, p, imgs, targets)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = train_step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_end_to_end_fused_step(rng):
    rig = cameras.hall_rig(4, image_size=(128, 96))
    config = PipelineConfig(
        fusion=FusionConfig(num_cameras=4, max_dets_per_cam=3, max_hypotheses=6),
        tracker=TrackerConfig(max_tracks=6),
    )
    step, model, params, state = end_to_end.make_end_to_end(
        rig, config, CFG, jax.random.PRNGKey(2)
    )
    imgs = jnp.asarray(rng.uniform(size=(4, 96, 128, 3)), jnp.float32)
    stamps = jnp.full((4,), 1.0, jnp.float32)
    state, out = step(state, imgs, stamps, params)
    jax.block_until_ready(out)
    # Random weights find garbage; the contract is a single fused, finite
    # program from pixels to skeletons + feedback.
    assert np.isfinite(np.asarray(out.fused.xyz)).all()
    assert np.isfinite(np.asarray(out.feedback.kp2d)).all()
    state, out = step(state, imgs, stamps + 1 / 30, params)
    assert np.isfinite(np.asarray(out.fused.xyz)).all()
