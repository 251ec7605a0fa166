import os

import numpy as np

from smartedgesensor3dhumanpose_tpu.io import replay, synthetic


def make_scene():
    return synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=6,
            num_people=3,
            num_frames=10,
            seed=9,
            stamp_jitter=0.003,
        )
    )


def test_npz_roundtrip(tmp_path):
    scene = make_scene()
    path = os.path.join(tmp_path, "scene.npz")
    replay.save_npz(path, scene)
    loaded = replay.load_npz(path)
    np.testing.assert_array_equal(loaded["kp2d"], scene["kp2d"])
    np.testing.assert_array_equal(loaded["det_valid"], scene["det_valid"])


def test_jsonl_replay_through_synchronizer(tmp_path):
    scene = make_scene()
    path = os.path.join(tmp_path, "scene.jsonl")
    replay.save_jsonl(path, scene)

    frames = list(replay.replay_jsonl(path, num_cameras=6, max_dets=3))
    # Approximate-time sync holds back the tail until optimality is provable;
    # most frames must come through.
    assert len(frames) >= 7
    t0 = scene["cam_stamp"][0].mean()
    period = 1.0 / 30
    for frame in frames:
        # All six cameras grouped from the same tick.
        ticks = np.round((frame["cam_stamp"] - t0) / period)
        assert len(set(ticks.tolist())) == 1, ticks
        assert frame["kp2d"].shape == (6, 3, 17, 3)
        # Detections must survive the round trip for the right tick.
        ti = int(ticks[0])
        # The JSONL writer compacts valid detections per camera (slots shift
        # left, like real detector messages); compare the compacted streams.
        for ci in range(6):
            want = scene["kp2d"][ti, ci][scene["det_valid"][ti, ci]]
            got = frame["kp2d"][ci][frame["det_valid"][ci]]
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=1e-3)


def test_replay_python_and_native_agree(tmp_path):
    scene = make_scene()
    path = os.path.join(tmp_path, "scene.jsonl")
    replay.save_jsonl(path, scene)
    from smartedgesensor3dhumanpose_tpu import sync

    frames_py = list(
        replay.replay_jsonl(path, 6, 3, prefer_native=False)
    )
    if sync.native_lib() is None:
        return
    frames_cc = list(replay.replay_jsonl(path, 6, 3, prefer_native=True))
    assert len(frames_py) == len(frames_cc)
    for a, b in zip(frames_py, frames_cc):
        np.testing.assert_array_equal(a["cam_stamp"], b["cam_stamp"])
        np.testing.assert_array_equal(a["kp2d"], b["kp2d"])


def test_timing_buckets():
    from smartedgesensor3dhumanpose_tpu.timing import StageTimer, TimingBuckets

    buckets = TimingBuckets("Triangulation")
    for n_det in (2, 2, 3, 0):
        with StageTimer(buckets, n_det):
            pass
    rep = buckets.report()
    assert "Triangulation: avg runtime" in rep
    assert "2 detections" in rep and "3 detections" in rep
    d = buckets.as_dict()
    assert set(d) == {"all", "2_detections", "3_detections"}
