"""Masked, batched confidence-weighted DLT triangulation.

TPU-native rework of the reference's per-joint scalar triangulation
(skeleton_3d_triang_mult_node.cpp:425-465, OpenPose-3D lineage :740-743).
The reference assembles a 2k x 4 design matrix A per joint and takes the
smallest right singular vector via JacobiSVD; here we form the 4x4 normal
matrix A^T A with masked rows — so the view count is a mask, not a shape —
and extract its smallest eigenvector with a batched Jacobi eigensolver.
Every batch dimension (people x joints x sigma-points x leave-one-out
variants) folds into one big elementwise program.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from smartedgesensor3dhumanpose_tpu.ops import linalg


def dlt_rows(
    P: jnp.ndarray,
    kp: jnp.ndarray,
    view_mask: jnp.ndarray,
    weight_by_conf: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the two DLT rows per view: normalized, confidence-weighted.

    r1 = x * P[2] - P[0], r2 = y * P[2] - P[1], each row L2-normalized and
    optionally scaled by the keypoint confidence (reference :443-454). Rows of
    masked-out views are zeroed.

    Args:
      P: [C, 3, 4] camera extrinsics.
      kp: [..., C, 3] normalized keypoints (x, y, conf).
      view_mask: [..., C] bool.
      weight_by_conf: scale rows by confidence.

    Returns:
      (r1, r2): each [..., C, 4].
    """
    x = kp[..., 0:1]
    y = kp[..., 1:2]
    conf = kp[..., 2:3]
    r1 = x * P[..., 2, :] - P[..., 0, :]
    r2 = y * P[..., 2, :] - P[..., 1, :]

    def norm_rows(r):
        n = jnp.linalg.norm(r, axis=-1, keepdims=True)
        r = r / jnp.where(n > 0, n, 1.0)
        if weight_by_conf:
            r = r * conf
        return jnp.where(view_mask[..., None], r, 0.0)

    return norm_rows(r1), norm_rows(r2)


def triangulate(
    P: jnp.ndarray,
    kp: jnp.ndarray,
    view_mask: jnp.ndarray,
    weight_by_conf: bool = True,
    sweeps: int = 8,
) -> jnp.ndarray:
    """Triangulate one 3D point per batch element from masked views.

    Minimizes ||A x||, ||x|| = 1 over the homogeneous point x: the smallest
    eigenvector of A^T A (equivalent to the reference's smallest-singular-
    vector solution :456), then de-homogenizes.

    Args:
      P: [C, 3, 4] camera extrinsics.
      kp: [..., C, 3] normalized keypoints (x, y, conf).
      view_mask: [..., C] bool; fewer than 2 valid views yields an
        unspecified (finite) point — callers gate on the view count.

    Returns:
      [..., 3] triangulated points.
    """
    r1, r2 = dlt_rows(P, kp, view_mask, weight_by_conf)
    m = linalg.heinsum("...ci,...cj->...ij", r1, r1) + linalg.heinsum(
        "...ci,...cj->...ij", r2, r2
    )
    # Masked-out batches have m == 0; bias with identity so Jacobi stays
    # finite (the resulting point is gated out by the caller's masks).
    deficient = jnp.sum(view_mask, axis=-1) < 2
    m = m + jnp.where(deficient[..., None, None], 1.0, 0.0) * jnp.eye(
        4, dtype=m.dtype
    )
    h = linalg.smallest_eigvec4(m, sweeps=sweeps)
    w = h[..., 3]
    w = jnp.where(jnp.abs(w) > 1e-20, w, 1e-20)
    return h[..., :3] / w[..., None]


def triangulate_refined(
    P: jnp.ndarray,
    kp: jnp.ndarray,
    view_mask: jnp.ndarray,
    weight_by_conf: bool = True,
    sweeps: int = 8,
) -> jnp.ndarray:
    """Two-pass DLT with origin recentering for float32 accuracy.

    Solving the normal equations squares the design matrix's condition
    number; in float32 on a hall-sized rig that costs a few millimeters.
    A second solve with the camera origins translated to the first estimate
    (solve for the small correction delta with P' = [R | P @ [x0; 1]])
    recovers micrometer-level accuracy — the homogeneous solution's scale
    then matches the correction's, so relative eigenvector error maps to a
    tiny absolute error. Roughly doubles the cost of a single solve; used
    for final joint positions, while sigma-point / leave-one-out solves
    (which only feed covariances and thresholds) stay single-pass.
    """
    x0 = triangulate(P, kp, view_mask, weight_by_conf, sweeps)
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    # Shifted projection: col3' = P @ [x0; 1]; rotation block unchanged.
    t_new = linalg.heinsum("cij,...j->...ci", P, x0h)  # [..., C, 3]
    p_shift = jnp.broadcast_to(P, x0.shape[:-1] + P.shape)
    p_shift = jnp.concatenate([p_shift[..., :3], t_new[..., None]], axis=-1)
    r1, r2 = dlt_rows(p_shift, kp, view_mask, weight_by_conf)
    m = linalg.heinsum("...ci,...cj->...ij", r1, r1) + linalg.heinsum(
        "...ci,...cj->...ij", r2, r2
    )
    deficient = jnp.sum(view_mask, axis=-1) < 2
    m = m + jnp.where(deficient[..., None, None], 1.0, 0.0) * jnp.eye(
        4, dtype=m.dtype
    )
    h = linalg.smallest_eigvec4(m, sweeps=sweeps)
    w = h[..., 3]
    w = jnp.where(jnp.abs(w) > 1e-20, w, 1e-20)
    return x0 + h[..., :3] / w[..., None]


def reprojection_error(
    xyz: jnp.ndarray,
    P: jnp.ndarray,
    kp: jnp.ndarray,
    view_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Confidence-weighted mean reprojection error in normalized coords.

    err = sum_i conf_i * ||proj_i(x) - kp_i|| / sum_i conf_i over valid views
    (reference calcReprojectionError, :425-438).

    Args:
      xyz: [..., 3] points.
      P: [C, 3, 4].
      kp: [..., C, 3] (x, y, conf).
      view_mask: [..., C] bool.

    Returns:
      [...] error.
    """
    xyz_h = jnp.concatenate([xyz, jnp.ones_like(xyz[..., :1])], axis=-1)
    proj = linalg.heinsum("cij,...j->...ci", P, xyz_h)
    z = proj[..., 2]
    z = jnp.where(jnp.abs(z) > 1e-20, z, 1e-20)
    px = proj[..., :2] / z[..., None]
    err = jnp.linalg.norm(px - kp[..., :2], axis=-1)
    conf = jnp.where(view_mask, kp[..., 2], 0.0)
    norm = jnp.sum(conf, axis=-1)
    total = jnp.sum(conf * jnp.where(view_mask, err, 0.0), axis=-1)
    return total / jnp.where(norm > 0, norm, 1.0)


def triangulate_with_error(
    P: jnp.ndarray,
    kp: jnp.ndarray,
    view_mask: jnp.ndarray,
    weight_by_conf: bool = True,
    sweeps: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Triangulate and compute the weighted reprojection error in one call."""
    xyz = triangulate(P, kp, view_mask, weight_by_conf, sweeps)
    return xyz, reprojection_error(xyz, P, kp, view_mask)
