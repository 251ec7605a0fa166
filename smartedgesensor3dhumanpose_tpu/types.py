"""Core data types (JAX pytrees) flowing through the pipeline.

The reference moves ROS messages between nodes (person_msgs/*.msg); here each
wire type becomes a fixed-shape NamedTuple-of-arrays with explicit validity
masks, so every stage is a pure jittable function. Shape legend: C = cameras,
D = detection slots per camera, J = 17 input joints, K = 21 fusion joints,
P = person/hypothesis slots, T = track slots, W = moving-average window.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu import skeleton


class Frame(NamedTuple):
    """One synchronized multi-camera set of 2D detections.

    Mirrors a synchronized vector of person_msgs/Person2DList
    (Person2DList.msg: header, fb_delay, persons[]; Keypoint2D.msg:
    x, y, score, cov[3]).
    """

    kp2d: jnp.ndarray       # [C, D, J, 3] pixel keypoints (x, y, score)
    cov2d: jnp.ndarray      # [C, D, J, 3] pixel covariance packed (xx, xy, yy)
    det_score: jnp.ndarray  # [C, D] per-detection score
    det_valid: jnp.ndarray  # [C, D] bool: slot holds a real detection
    cam_stamp: jnp.ndarray  # [C] per-camera timestamp (seconds, f64 on host)
    fb_delay: jnp.ndarray   # [C] measured feedback delay (s), -1 = unmeasured

    @property
    def num_cameras(self) -> int:
        return self.kp2d.shape[0]

    @classmethod
    def from_arrays(cls, data) -> "Frame":
        """Device Frame from a dict of host arrays in field layout (as
        returned by `io.synthetic.frames_from_scene` / the replay loaders);
        leading axes pass through, so a [T, ...] stack works too.
        Centralizes the one dtype quirk every call site was hand-repeating:
        `cam_stamp` goes to float32 on device (host setup keeps f64; the
        device stages only ever *difference* stamps)."""
        return cls(
            kp2d=jnp.asarray(data["kp2d"]),
            cov2d=jnp.asarray(data["cov2d"]),
            det_score=jnp.asarray(data["det_score"]),
            det_valid=jnp.asarray(data["det_valid"]),
            cam_stamp=jnp.asarray(data["cam_stamp"], jnp.float32),
            fb_delay=jnp.asarray(data["fb_delay"]),
        )


class CameraRig(NamedTuple):
    """Static calibration of the camera array.

    P is the 3x4 base->camera extrinsic matrix (the reference triangulates in
    normalized image coordinates, so no intrinsics appear in the projection:
    skeleton_3d_triang_mult_node.cpp:1208-1211). F[i, j] is the fundamental
    matrix between views i and j in normalized coordinates (:1195-1204).
    """

    K: jnp.ndarray           # [C, 4] intrinsics (fx, fy, cx, cy)
    P: jnp.ndarray           # [C, 3, 4] extrinsics base->cam
    F: jnp.ndarray           # [C, C, 3, 3] fundamental matrices (i -> j)
    image_size: jnp.ndarray  # [C, 2] (width, height) in pixels

    @property
    def num_cameras(self) -> int:
        return self.P.shape[0]


class Persons3D(NamedTuple):
    """A set of 3D skeletons with per-joint Gaussian uncertainty.

    Mirrors person_msgs/PersonCovList (header, ts_per_cam[], fb_delay_per_cam[],
    persons[]) with PersonCov = id, score, 21x KeypointWithCovariance.
    """

    xyz: jnp.ndarray      # [P, K, 3] joint positions (base frame, meters)
    score: jnp.ndarray    # [P, K] per-joint scores; <= 0 means joint invalid
    cov: jnp.ndarray      # [P, K, 3, 3] per-joint covariance
    valid: jnp.ndarray    # [P] bool: person slot is populated
    person_id: jnp.ndarray  # [P] int32 track id (-1 before tracking)

    @staticmethod
    def empty(num_persons: int, dtype=jnp.float32) -> "Persons3D":
        k = skeleton.NUM_FUSION_JOINTS
        return Persons3D(
            xyz=jnp.zeros((num_persons, k, 3), dtype),
            score=jnp.zeros((num_persons, k), dtype),
            cov=jnp.zeros((num_persons, k, 3, 3), dtype),
            valid=jnp.zeros((num_persons,), bool),
            person_id=-jnp.ones((num_persons,), jnp.int32),
        )


class Reprojection2D(NamedTuple):
    """Per-camera 2D reprojections of predicted skeletons (semantic feedback).

    Mirrors the per-camera Person2DList published on cam_*/skel_pred
    (skeleton_reproj_mult_node.cpp:225-234).
    """

    kp2d: jnp.ndarray      # [C, P, J, 3] pixel keypoints (x, y, score)
    cov2d: jnp.ndarray     # [C, P, J, 3] pixel covariance packed (xx, xy, yy)
    kp_valid: jnp.ndarray  # [C, P, J] bool: projected inside the image
    bbox: jnp.ndarray      # [C, P, 4] (x0, y0, x1, y1)
    valid: jnp.ndarray     # [C, P] bool: >=1 joint lands in this camera
    fb_delay: jnp.ndarray  # [C] predicted latency carried back to the sensors
    # Each camera's ORIGINAL frame stamp, echoed back on its feedback message
    # (header.stamp = ts_per_cam[i], skeleton_reproj_mult_node.cpp:157-158);
    # the sensors measure fb_delay = now - orig_stamp from this echo.
    orig_stamp: jnp.ndarray  # [C]


def person_bbox3d(
    xyz: jnp.ndarray, score: jnp.ndarray, valid: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Axis-aligned 3D bounding box per person (PersonCov.msg bbox_center /
    bbox_size; declared in the wire type at person_msgs/PersonCov.msg:7-8 —
    the reference nodes leave it zero, here it is populated from the valid
    joints).

    Returns (center [P, 3], size [P, 3]); zeros for empty persons.
    """
    ok = (score > 0) & valid[:, None]  # [P, K]
    big = jnp.asarray(1e9, xyz.dtype)
    lo = jnp.min(jnp.where(ok[..., None], xyz, big), axis=1)
    hi = jnp.max(jnp.where(ok[..., None], xyz, -big), axis=1)
    any_ok = jnp.any(ok, axis=1)[:, None]
    center = jnp.where(any_ok, 0.5 * (lo + hi), 0.0)
    size = jnp.where(any_ok, hi - lo, 0.0)
    return center, size


class TrackerState(NamedTuple):
    """Carried state of the track manager + smoother (reference
    TrackingHypothesis fields, pose_prior_mult_node.cpp:68-82, plus node-level
    globals :54,58-60)."""

    alive: jnp.ndarray        # [T] bool
    track_id: jnp.ndarray     # [T] int32 stable published id
    estimate: jnp.ndarray     # [T, K, 3] previous optimized joints (normalized)
    est_exists: jnp.ndarray   # [T, K] bool: joint present in previous estimate
    vel_buffer: jnp.ndarray   # [T, K, W, 3] velocity ring buffers (m/s)
    t_prev: jnp.ndarray       # [T] last observation time (s)
    num_obs: jnp.ndarray      # [T] int32 observation count
    height_prev: jnp.ndarray  # [T] last height scale (-1 = uninitialized)
    root_prev: jnp.ndarray    # [T, 3] last root position (base frame)
    next_id: jnp.ndarray      # [] int32 next fresh track id
    frame_nr: jnp.ndarray     # [] int32 frame counter
    fb_delay_buffer: jnp.ndarray  # [W] feedback-delay moving-average buffer
    t_prev_global: jnp.ndarray    # [] previous frame time (s)

    @staticmethod
    def initial(max_tracks: int, n_mov_avg: int = 3, avg_delay: float = 0.10,
                dtype=jnp.float32) -> "TrackerState":
        k = skeleton.NUM_FUSION_JOINTS
        t = max_tracks
        return TrackerState(
            alive=jnp.zeros((t,), bool),
            track_id=-jnp.ones((t,), jnp.int32),
            estimate=jnp.zeros((t, k, 3), dtype),
            est_exists=jnp.zeros((t, k), bool),
            vel_buffer=jnp.zeros((t, k, n_mov_avg, 3), dtype),
            t_prev=jnp.full((t,), -np.inf, dtype),
            num_obs=jnp.zeros((t,), jnp.int32),
            height_prev=-jnp.ones((t,), dtype),
            root_prev=jnp.zeros((t, 3), dtype),
            next_id=jnp.zeros((), jnp.int32),
            frame_nr=jnp.zeros((), jnp.int32),
            fb_delay_buffer=jnp.full((n_mov_avg,), avg_delay, dtype),
            t_prev_global=jnp.zeros((), dtype),
        )
