"""Semantic feedback: reproject predicted 3D skeletons into every camera.

The reference pose_reprojection node (skeleton_reproj_mult_node.cpp:139-235):
per predicted joint, draw 7 sigma points from the 3D covariance, rigidly
transform into every camera, pinhole-project, and emit the UT pixel mean +
2x2 covariance as a Person2DList per camera — the feedback the smart edge
sensors consume. Here the whole (person x joint x sigma-point x camera)
product is one einsum-shaped program (ops.covariance.project_with_covariance).
"""

from __future__ import annotations

import jax.numpy as jnp

from smartedgesensor3dhumanpose_tpu import skeleton
from smartedgesensor3dhumanpose_tpu.ops import covariance
from smartedgesensor3dhumanpose_tpu.types import CameraRig, Persons3D, Reprojection2D


def reproject(
    persons: Persons3D,
    rig: CameraRig,
    pose_method: str,
    pred_delta_t: jnp.ndarray,
    ut_kappa: float = 0.5,
    ts_per_cam: jnp.ndarray | None = None,
) -> Reprojection2D:
    """Project predicted skeletons (with covariance) into all cameras.

    Args:
      persons: predicted fused skeletons (fusion 21-joint layout).
      rig: camera rig.
      pose_method: which 17-joint layout the sensors expect.
      pred_delta_t: [] predicted feedback latency carried back per camera
        (the reference copies fb_delay_per_cam, :159).
      ts_per_cam: [C] original per-camera frame stamps, echoed back on each
        camera's feedback message (header.stamp = ts_per_cam[i], :157-158);
        zeros when not provided.

    Returns:
      Reprojection2D with [C, P, J] layouts.
    """
    model = skeleton.input_model(pose_method)
    to_fusion = jnp.asarray(model.to_fusion)
    dtype = persons.xyz.dtype
    c = rig.P.shape[0]
    p = persons.xyz.shape[0]
    j = to_fusion.shape[0]

    xyz = persons.xyz[:, to_fusion]       # [P, J, 3]
    cov3 = persons.cov[:, to_fusion]      # [P, J, 3, 3]
    score = persons.score[:, to_fusion]   # [P, J]
    joint_ok = (score > 0) & persons.valid[:, None]  # (:181)

    mean_px, cov_px = covariance.project_with_covariance(
        xyz, cov3, rig.P, rig.K, kappa=ut_kappa
    )  # [P, J, C, 2], [P, J, C, 3]

    width = rig.image_size[:, 0]
    height = rig.image_size[:, 1]
    in_img = (
        (mean_px[..., 0] >= 0)
        & (mean_px[..., 0] <= width)
        & (mean_px[..., 1] >= 0)
        & (mean_px[..., 1] <= height)
    )  # [P, J, C] (:207)
    kp_valid = joint_ok[..., None] & in_img  # [P, J, C]

    # Reorder to [C, P, J, ...].
    kp_valid_c = jnp.transpose(kp_valid, (2, 0, 1))
    px_c = jnp.transpose(mean_px, (2, 0, 1, 3))
    cov_c = jnp.transpose(cov_px, (2, 0, 1, 3))

    kp2d = jnp.concatenate(
        [
            jnp.where(kp_valid_c[..., None], px_c, 0.0),
            jnp.where(kp_valid_c, jnp.broadcast_to(score[None], kp_valid_c.shape), 0.0)[..., None],
        ],
        axis=-1,
    )
    cov2d = jnp.where(kp_valid_c[..., None], cov_c, 0.0)

    big = jnp.asarray(1e9, dtype)
    x = jnp.where(kp_valid_c, px_c[..., 0], big)
    y = jnp.where(kp_valid_c, px_c[..., 1], big)
    x0 = jnp.min(x, axis=-1)
    y0 = jnp.min(y, axis=-1)
    x1 = jnp.max(jnp.where(kp_valid_c, px_c[..., 0], -big), axis=-1)
    y1 = jnp.max(jnp.where(kp_valid_c, px_c[..., 1], -big), axis=-1)
    person_valid = jnp.any(kp_valid_c, axis=-1)  # [C, P] (:226)
    bbox = jnp.where(
        person_valid[..., None],
        jnp.stack([x0, y0, x1, y1], axis=-1),
        0.0,
    )

    return Reprojection2D(
        kp2d=kp2d,
        cov2d=cov2d,
        kp_valid=kp_valid_c,
        bbox=bbox,
        valid=person_valid,
        fb_delay=jnp.full((c,), 1.0, dtype) * pred_delta_t,
        orig_stamp=(
            jnp.zeros((c,), dtype)
            if ts_per_cam is None
            else jnp.asarray(ts_per_cam, dtype)
        ),
    )
