"""Latest-wins online loop: backlog frames must be DROPPED, output stays
fresh (reference worker handoff, skeleton_3d_triang_mult_node.cpp:999-1025).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smartedgesensor3dhumanpose_tpu import online, pipeline, sync
from smartedgesensor3dhumanpose_tpu.io import synthetic
from smartedgesensor3dhumanpose_tpu.types import Frame
from test_pipeline import scene_frames, small_config


def _setup(n_frames=24):
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=4, num_people=2, num_frames=n_frames, seed=5
        )
    )
    cfg = small_config(4, 2)
    frames = scene_frames(scene, dtype=jnp.float64)
    pipe = pipeline.Pipeline(scene["rig"], cfg)
    return pipe, frames


@pytest.mark.parametrize("prefer_native", [True, False])
def test_online_drops_backlog_under_load(prefer_native):
    pipe, frames = _setup()
    state = pipe.init_state(dtype=jnp.float64)
    n = frames.kp2d.shape[0]

    # Warm the compile so the hook delay dominates the step time.
    pipe.step(state, jax.tree.map(lambda a: a[0], frames))

    feed = 0.005
    slow = 0.025  # consumer ~5x slower than the producer

    st, out, report = online.run_online(
        pipe.step,
        state,
        frames,
        feed_interval_s=feed,
        consumer_hook=lambda h: time.sleep(slow),
        prefer_native_slot=prefer_native,
    )
    # Under 5x overload most frames must be dropped, not queued.
    assert report.dropped > 0, report
    assert report.dropped + len(report.processed_handles) == n
    # Output stays fresh: handles strictly increase and the final frame is
    # the last one produced.
    h = report.processed_handles
    assert all(a < b for a, b in zip(h, h[1:])), h
    assert h[-1] == n - 1
    assert out is not None and bool(np.isfinite(np.asarray(out.fused.xyz)).all())


def test_online_no_drops_when_fast():
    pipe, frames = _setup(n_frames=10)
    state = pipe.init_state(dtype=jnp.float64)
    pipe.step(state, jax.tree.map(lambda a: a[0], frames))

    st, out, report = online.run_online(
        pipe.step, state, frames, feed_interval_s=0.05
    )
    # Consumer comfortably keeps up: every frame processed, none dropped.
    assert report.dropped == 0, report
    assert report.processed_handles == list(range(10))


def test_latest_slot_native_python_differential():
    if sync.native_lib() is None:
        pytest.skip("native runtime unavailable")
    nat = sync.NativeLatestSlot(3)
    py = sync.PyLatestSlot(3)
    rng = np.random.default_rng(0)
    for step in range(200):
        if rng.uniform() < 0.6:
            stamps = rng.integers(0, 1 << 40, size=3).tolist()
            handles = rng.integers(0, 1 << 30, size=3).tolist()
            nat.put(stamps, handles)
            py.put(stamps, handles)
        else:
            assert nat.take() == py.take(), step
        assert nat.dropped == py.dropped, step
    assert nat.dropped > 0  # fixture actually exercised overwrites
