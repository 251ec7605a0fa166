"""Demo CLI, checkpoint round-trips, and the h36m pose-method path."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu import checkpoint, pipeline, skeleton
from smartedgesensor3dhumanpose_tpu.config import (
    FusionConfig,
    PipelineConfig,
    PriorConfig,
    TrackerConfig,
)
from smartedgesensor3dhumanpose_tpu.io import synthetic
from smartedgesensor3dhumanpose_tpu.types import TrackerState
from test_fusion import match_to_gt
from test_pipeline import scene_frames


def test_checkpoint_roundtrip(tmp_path):
    state = TrackerState.initial(6, 3, 0.1, dtype=jnp.float64)
    state = state._replace(
        next_id=jnp.int32(7),
        alive=state.alive.at[2].set(True),
        estimate=state.estimate.at[2].set(1.5),
    )
    path = os.path.join(tmp_path, "tracker.npz")
    checkpoint.save_tracker_state(path, state)
    loaded = checkpoint.load_tracker_state(path, dtype=jnp.float64)
    for f in TrackerState._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(loaded, f)), np.asarray(getattr(state, f)), f
        )
    fresh = checkpoint.reset(loaded)
    assert not np.asarray(fresh.alive).any()
    assert int(fresh.next_id) == 0


def test_checkpoint_resume_continues_tracks():
    """A reloaded tracker keeps ids/publish-state across the restart."""
    cams, people, n = 8, 2, 16
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=cams, num_people=people, num_frames=n, seed=3
        )
    )
    cfg = PipelineConfig(
        fusion=FusionConfig(
            num_cameras=cams, max_dets_per_cam=people, max_hypotheses=4
        ),
        tracker=TrackerConfig(max_tracks=4),
    )
    pipe = pipeline.Pipeline(scene["rig"], cfg)
    frames = scene_frames(scene)
    state = pipe.init_state(dtype=jnp.float64)
    # Run the first half, snapshot, run the second half from the snapshot.
    half = jax.tree.map(lambda a: a[: n // 2], frames)
    rest = jax.tree.map(lambda a: a[n // 2:], frames)
    state1, _ = pipe.run_offline(state, half)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        checkpoint.save_tracker_state(path, state1)
        restored = checkpoint.load_tracker_state(path, dtype=jnp.float64)
    state2, outs = pipe.run_offline(restored, rest)
    # Tracks survived the 'restart': same ids keep publishing.
    valid = np.asarray(outs.fused.valid[-1])
    assert valid.sum() == people
    assert int(state2.next_id) == int(state1.next_id)


def test_h36m_end_to_end():
    cams, people, n = 12, 3, 16
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=cams,
            num_people=people,
            num_frames=n,
            pixel_noise=1.0,
            pose_method="h36m",
            seed=29,
        )
    )
    cfg = PipelineConfig(
        fusion=FusionConfig(
            num_cameras=cams,
            max_dets_per_cam=people,
            max_hypotheses=2 * people,
            pose_method="h36m",
        ),
        prior=PriorConfig(pose_method="h36m"),
        tracker=TrackerConfig(max_tracks=2 * people),
    )
    pipe = pipeline.Pipeline(scene["rig"], cfg)
    frames = scene_frames(scene)
    state = pipe.init_state(dtype=jnp.float64)
    _, outs = pipe.run_offline(state, frames)
    to_fusion = np.asarray(skeleton.H36M_MODEL.to_fusion)
    for t in range(12, n):
        valid = np.asarray(outs.fused.valid[t])
        assert valid.sum() == people, f"frame {t}"
        errs, _ = match_to_gt(
            np.asarray(outs.fused.xyz[t]),
            np.asarray(outs.fused.score[t]),
            valid,
            scene["gt_xyz"][t],
            to_fusion,
        )
        assert np.isfinite(errs).all() and errs.max() < 0.06, f"{t}: {errs}"


def test_h36m_height_normalized():
    """norm_height mode: the reference's normalized bone tables kick in."""
    cams, people, n = 12, 2, 14
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=cams,
            num_people=people,
            num_frames=n,
            pixel_noise=1.0,
            pose_method="h36m",
            seed=31,
        )
    )
    cfg = PipelineConfig(
        fusion=FusionConfig(
            num_cameras=cams,
            max_dets_per_cam=people,
            max_hypotheses=2 * people,
            pose_method="h36m",
        ),
        prior=PriorConfig(pose_method="h36m", normalize_by_height=True),
        tracker=TrackerConfig(max_tracks=4),
    )
    pipe = pipeline.Pipeline(scene["rig"], cfg)
    frames = scene_frames(scene)
    _, outs = pipe.run_offline(pipe.init_state(dtype=jnp.float64), frames)
    to_fusion = np.asarray(skeleton.H36M_MODEL.to_fusion)
    valid = np.asarray(outs.fused.valid[-1])
    assert valid.sum() == people
    errs, _ = match_to_gt(
        np.asarray(outs.fused.xyz[-1]),
        np.asarray(outs.fused.score[-1]),
        valid,
        scene["gt_xyz"][-1],
        to_fusion,
    )
    assert np.isfinite(errs).all() and errs.max() < 0.08


def test_demo_cli_smoke(tmp_path, capsys):
    from smartedgesensor3dhumanpose_tpu import demo

    out_npz = os.path.join(tmp_path, "out.npz")
    rec = os.path.join(tmp_path, "rec.jsonl")
    viz_png = os.path.join(tmp_path, "dash.png")
    demo.main(
        [
            "--cameras", "6", "--people", "2", "--frames", "12",
            "--save", out_npz, "--record-jsonl", rec,
            "--eval", "--viz", viz_png,
        ]
    )
    captured = capsys.readouterr().out
    assert "fused frames/s" in captured
    assert "MPJPE" in captured and "PCK@0.15m" in captured
    assert os.path.exists(viz_png) and os.path.getsize(viz_png) > 0
    assert os.path.exists(out_npz)
    with np.load(out_npz) as z:
        assert z["fused_xyz"].shape[0] == 12

    # Replay the recording back through the synchronizer (rosbag play
    # equivalent); same shapes, same pipeline.
    assert os.path.getsize(rec) > 0
    demo.main(
        [
            "--cameras", "6", "--people", "2", "--frames", "12",
            "--jsonl", rec,
        ]
    )
    captured = capsys.readouterr().out
    assert "replayed" in captured and "fused frames/s" in captured

    # Missing recordings are an argparse error, not a traceback.
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        demo.main(["--jsonl", os.path.join(tmp_path, "nope.jsonl")])
