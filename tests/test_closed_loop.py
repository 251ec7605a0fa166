"""Closed semantic-feedback loop through virtual edge sensors.

The reference's loop closes through its physical EdgeTPU sensors: feedback
echoes the camera's original stamp
(skeleton_reproj_mult_node.cpp:157-159,233-234), the sensor measures
fb_delay = receive - orig_stamp (person_msgs/Person2DList.msg:2) and that
measurement drives the tracker's prediction horizon
(pose_prior_mult_node.cpp:513-531). These tests close the same loop with
io.sensors.VirtualSensorArray: injecting a known loop latency L must make
pred_delta_t converge to exactly L within the 3-frame moving window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smartedgesensor3dhumanpose_tpu import pipeline
from smartedgesensor3dhumanpose_tpu.config import (
    FusionConfig,
    PipelineConfig,
    TrackerConfig,
)
from smartedgesensor3dhumanpose_tpu.io import sensors as sensors_lib
from smartedgesensor3dhumanpose_tpu.io import synthetic
from smartedgesensor3dhumanpose_tpu.types import Frame


def _setup(n_frames=16, num_cameras=6, num_people=2):
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=num_cameras,
            num_people=num_people,
            num_frames=n_frames,
            stamp_jitter=0.0,  # exact stamps -> exact measured latency
            seed=7,
        )
    )
    config = PipelineConfig(
        fusion=FusionConfig(
            num_cameras=num_cameras,
            max_dets_per_cam=num_people,
            max_hypotheses=2 * num_people,
            max_epipolar_error=0.045,
        ),
        tracker=TrackerConfig(max_tracks=2 * num_people),
    )
    data = synthetic.frames_from_scene(scene, dtype=np.float64)
    frames = Frame(
        kp2d=jnp.asarray(data["kp2d"]),
        cov2d=jnp.asarray(data["cov2d"]),
        det_score=jnp.asarray(data["det_score"]),
        det_valid=jnp.asarray(data["det_valid"]),
        cam_stamp=jnp.asarray(data["cam_stamp"], jnp.float64),
        fb_delay=jnp.asarray(data["fb_delay"]),
    )
    pipe = pipeline.Pipeline(scene["rig"], config)
    return pipe, frames, config


@pytest.mark.parametrize("proc,net", [(0.05, 0.03), (0.12, 0.03)])
def test_pred_delta_t_converges_to_injected_latency(proc, net):
    pipe, frames, config = _setup()
    loop_latency = proc + net
    sensors = sensors_lib.VirtualSensorArray(
        frames.kp2d.shape[1], network_latency=net
    )
    state = pipe.init_state(dtype=jnp.float64)
    _, _, report = sensors_lib.run_closed_loop(
        pipe.step, state, frames, sensors, processing_latency=proc
    )

    # Until the first feedback arrives the sensors report unmeasured (-1)
    # and the tracker stays on its configured default horizon.
    assert np.all(report.fb_delay_measured[0] == -1.0)
    np.testing.assert_allclose(
        report.pred_delta_t[0], config.tracker.avg_delay, atol=1e-9
    )

    # Once the feedback round-trips, every sensor measures exactly the
    # injected loop latency from the echoed original stamps...
    assert np.all(report.fb_delay_measured[-1] > 0)
    np.testing.assert_allclose(
        report.fb_delay_measured[-1], loop_latency, atol=1e-9
    )
    # ... and the prediction horizon converges to it within the reference's
    # 3-frame moving window after the first arrival.
    first_arrival = int(np.argmax(report.fb_delay_measured[:, 0] > 0))
    window = config.tracker.n_mov_avg
    settled = report.pred_delta_t[first_arrival + window :]
    np.testing.assert_allclose(settled, loop_latency, atol=1e-9)
    assert report.n_feedback_received == frames.kp2d.shape[0]


def test_measured_delay_rides_on_wire_fields():
    """The measured (not fabricated) fb_delay must appear on persons_3d's
    raw per-camera field, and the predicted horizon on the fused lists
    (PersonCovList.msg fb_delay_per_cam semantics)."""
    pipe, frames, _ = _setup(n_frames=10)
    net, proc = 0.02, 0.04
    sensors = sensors_lib.VirtualSensorArray(
        frames.kp2d.shape[1], network_latency=net
    )
    state = pipe.init_state(dtype=jnp.float64)
    _, last, report, outs = sensors_lib.run_closed_loop(
        pipe.step,
        state,
        frames,
        sensors,
        processing_latency=proc,
        collect_outputs=True,
    )
    np.testing.assert_allclose(
        np.asarray(outs[-1].fb_delay_per_cam_raw), net + proc, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(outs[-1].fb_delay_per_cam),
        float(outs[-1].pred_delta_t),
        atol=1e-12,
    )


def test_sensor_array_delivery_ordering():
    """Feedback is only visible after its arrival time; newest wins."""
    arr = sensors_lib.VirtualSensorArray(2, network_latency=0.01)
    # Nothing yet.
    assert np.all(arr.measured_fb_delay(np.array([0.0, 0.0])) == -1.0)
    # Feedback for stamps [1.0, 0.99] emitted at 1.05 -> arrives 1.06.
    arr.receive_feedback(np.array([1.0, 0.99]), emit_time=1.05)
    # At capture 1.055 it is still in flight.
    assert np.all(arr.measured_fb_delay(np.array([1.055, 1.055])) == -1.0)
    # At 1.07 both sensors measured their own stamp's age.
    got = arr.measured_fb_delay(np.array([1.07, 1.07]))
    np.testing.assert_allclose(got, [0.06, 0.07], atol=1e-12)
    # A newer delivery supersedes; per-camera capture times are respected.
    arr.receive_feedback(np.array([1.10, 1.10]), emit_time=1.12)
    got = arr.measured_fb_delay(np.array([1.14, 1.12]))  # cam1 not yet
    np.testing.assert_allclose(got, [0.03, 0.07], atol=1e-12)
