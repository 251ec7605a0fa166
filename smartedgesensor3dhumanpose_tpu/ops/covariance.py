"""Unscented covariance propagation.

Two unscented transforms from the reference:

* 2D -> 3D: propagate the per-view 2x2 keypoint covariances through the DLT
  triangulation by re-triangulating 4k+1 sigma points drawn in the joint
  2k-dimensional observation space (skeleton_3d_triang_mult_node.cpp:471-523).
* 3D -> 2D: propagate a joint's 3x3 covariance through the camera projection
  with 7 sigma points (skeleton_reproj_mult_node.cpp:56-75,189-204).

Both fold the sigma-point axis into the batch, so the whole frame's UT is one
fixed-shape program.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from smartedgesensor3dhumanpose_tpu.ops import linalg, triangulation


def triangulation_covariance(
    P: jnp.ndarray,
    kp: jnp.ndarray,
    cov2d: jnp.ndarray,
    view_mask: jnp.ndarray,
    mean_xyz: jnp.ndarray,
    kappa: float = 0.5,
    sweeps: int = 8,
) -> jnp.ndarray:
    """3x3 covariance of a triangulated joint via the unscented transform.

    Per valid view c, four sigma points perturb that view's (x, y) by the
    columns of the 2x2 Cholesky factor scaled by b = sqrt(dim + kappa) with
    dim = 2k (k = valid view count); one unperturbed sample carries weight
    2*kappa / (2*(dim+kappa)), the others 1 / (2*(dim+kappa)). Each sigma
    point is re-triangulated *unweighted* (the reference's default
    weight_by_conf=false in calc_covariance, :518), and the covariance is the
    weighted scatter around the confidence-weighted mean triangulation
    (:508-523). Masked views carry zero perturbation and zero weight, so the
    padded program equals the reference's variable-k math exactly.

    Args:
      P: [C, 3, 4] extrinsics.
      kp: [..., C, 3] normalized keypoints (x, y, conf).
      cov2d: [..., C, 3] packed per-view covariance (xx, xy, yy).
      view_mask: [..., C] bool.
      mean_xyz: [..., 3] the weighted DLT triangulation.
      kappa: UT scaling (:475).

    Returns:
      [..., 3, 3] covariance.
    """
    dtype = kp.dtype
    c = kp.shape[-2]
    n_views = jnp.sum(view_mask, axis=-1)  # [...] int
    k = n_views.astype(dtype)
    dim = 2.0 * k
    b = jnp.sqrt(dim + kappa)  # [...]

    chol = linalg.chol2x2_packed(cov2d)  # [..., C, 3] = (l11, l21, l22)
    chol = jnp.where(view_mask[..., None], chol, 0.0)
    l11 = chol[..., 0]
    l21 = chol[..., 1]
    l22 = chol[..., 2]
    zero = jnp.zeros_like(l11)
    # Per-view perturbation deltas, 4 sigma points each: -L.col0, -L.col1,
    # +L.col0, +L.col1 (reference mod_samples, :471-487).
    # deltas: [..., C, 4, 2]
    deltas = jnp.stack(
        [
            jnp.stack([-l11, -l21], axis=-1),
            jnp.stack([zero, -l22], axis=-1),
            jnp.stack([l11, l21], axis=-1),
            jnp.stack([zero, l22], axis=-1),
        ],
        axis=-2,
    ) * b[..., None, None, None]

    # Sigma point s = 4*c + v perturbs ONLY view c — so its normal matrix is
    # the base matrix with view c's contribution swapped:
    #   M_s = M0 + (T(kp_c + delta_{c,v}) - T(kp_c)).
    # Built incrementally, the O(batch x 4C x C) sample keypoint / DLT
    # coefficient tensors of a from-scratch re-triangulation never
    # materialize — on the scaled 64-camera config that was hundreds of MB
    # of HBM traffic per frame for what is a [batch, C, 4, 5] update.
    batch = kp.shape[:-2]
    coeff0 = triangulation.view_coeffs(
        P, kp, view_mask, weight_by_conf=False
    )  # [..., C, 5]
    const = triangulation.coeff_constants(P, dtype)  # [C, 5, 4, 4]
    M0 = linalg.heinsum("...ck,ckij->...ij", coeff0, const)
    t_0 = triangulation.solve_normal(M0, n_views)  # [..., 3]

    # Perturbed coefficients: kp_v[..., v, c, :] perturbs EVERY view by its
    # variant-v delta at once; entry (c, v) is only read for the sample that
    # perturbs view c, so the cross terms are never used.
    kp_xy_v = kp[..., None, :, :2] + jnp.moveaxis(
        deltas, -2, -3
    )  # [..., 4, C, 2]
    kp_v = jnp.concatenate(
        [
            kp_xy_v,
            jnp.broadcast_to(
                kp[..., None, :, 2:3], kp_xy_v.shape[:-1] + (1,)
            ),
        ],
        axis=-1,
    )
    coeff_v = triangulation.view_coeffs(
        P, kp_v, view_mask[..., None, :], weight_by_conf=False
    )  # [..., 4, C, 5]
    dcoeff = coeff_v - coeff0[..., None, :, :]  # [..., 4, C, 5]
    # dM contracted over the FIVE coefficient terms as unrolled multiply-
    # adds, not a dot: the dot form materializes the [..., C, 4, 4, 4]
    # delta tensor in HBM (tens of MB per scaled frame), while the unrolled
    # form fuses with M_s assembly and the adjugate solve below into one
    # elementwise program whose traffic is just the [..., 4, C, 5] input.
    dc = jnp.swapaxes(dcoeff, -3, -2)[..., None, None]  # [..., C, 4(v), 5, 1, 1]
    dM = sum(
        dc[..., k, :, :] * const[:, k][:, None] for k in range(5)
    )  # [..., C, 4(v), 4, 4]
    M_s = (M0[..., None, None, :, :] + dM).reshape(
        batch + (4 * c, 4, 4)
    )  # sample order s = 4*c + v, matching w_s below
    t_s = triangulation.solve_normal(
        M_s, jnp.broadcast_to(n_views[..., None], batch + (4 * c,))
    )  # [..., S, 3]

    denom = 2.0 * (dim + kappa)  # [...]
    w_s = jnp.repeat(view_mask, 4, axis=-1).astype(dtype) / denom[..., None]
    w_0 = 2.0 * kappa / denom

    d_s = t_s - mean_xyz[..., None, :]  # [..., S, 3]
    d_0 = t_0 - mean_xyz  # [..., 3]
    # Weighted scatter as six unrolled reductions (the dot form is another
    # fusion barrier on the [..., S, 3] sigma deviations).
    wd = w_s[..., None] * d_s  # [..., S, 3]
    comps = [
        jnp.sum(wd[..., i] * d_s[..., j], axis=-1)
        for (i, j) in [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    ]
    xx, xy, xz, yy, yz, zz = comps
    cov = jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )
    cov = cov + w_0[..., None, None] * d_0[..., :, None] * d_0[..., None, :]
    return cov


def project_with_covariance(
    xyz: jnp.ndarray,
    cov3d: jnp.ndarray,
    P: jnp.ndarray,
    K: jnp.ndarray,
    kappa: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project 3D joints (with covariance) into every camera via a 3-dim UT.

    Seven sigma points: the mean and +-sqrt(3+kappa) * chol(cov) columns
    (skeleton_reproj_mult_node.cpp:62-75). Each is rigidly transformed into
    every camera frame and pinhole-projected; the output keypoint is the
    *weighted mean of the projections* and the 2x2 pixel covariance is their
    weighted scatter (:202-204).

    Args:
      xyz: [..., 3] joints in the base frame.
      cov3d: [..., 3, 3].
      P: [C, 3, 4] base->cam extrinsics.
      K: [C, 4] intrinsics (fx, fy, cx, cy).

    Returns:
      (mean_px [..., C, 2], cov_px [..., C, 3] packed (xx, xy, yy)).
    """
    dtype = xyz.dtype
    dim = 3.0
    b = jnp.sqrt(dim + kappa)
    l = linalg.chol3x3(cov3d)  # [..., 3, 3]
    cols = jnp.swapaxes(l, -1, -2) * b  # [..., 3(col), 3] — rows are L's columns
    zero = jnp.zeros_like(xyz)[..., None, :]
    offsets = jnp.concatenate([zero, -cols, cols], axis=-2)  # [..., 7, 3]
    samples = xyz[..., None, :] + offsets  # [..., 7, 3]

    # Transform into each camera and project, written COMPONENTWISE: the
    # rigid transform contracts only 4 terms, so expressing it as broadcast
    # multiply-adds (instead of a dot) lets XLA fuse the entire
    # (batch x sigma x camera) product into the weighted reductions below —
    # nothing of shape [..., 7, C, *] is ever materialized in HBM. (On the
    # scaled 64-camera config the dot-shaped form wrote hundreds of MB of
    # sigma-point projections per batch.)
    sx = samples[..., 0:1]  # [..., 7, 1]
    sy = samples[..., 1:2]
    sz = samples[..., 2:3]

    def cam_row(i):
        return (
            P[:, i, 0] * sx + P[:, i, 1] * sy + P[:, i, 2] * sz + P[:, i, 3]
        )  # [..., 7, C]

    z = cam_row(2)
    z = jnp.where(jnp.abs(z) > 1e-20, z, 1e-20)
    px_x = K[:, 0] * cam_row(0) / z + K[:, 2]  # [..., 7, C]
    px_y = K[:, 1] * cam_row(1) / z + K[:, 3]

    denom = 2.0 * (dim + kappa)
    w = jnp.concatenate(
        [
            jnp.full((1,), 2.0 * kappa / denom, dtype),
            jnp.full((6,), 1.0 / denom, dtype),
        ]
    )[:, None]  # [7, 1]
    mean_x = jnp.sum(w * px_x, axis=-2)  # [..., C]
    mean_y = jnp.sum(w * px_y, axis=-2)
    dx = px_x - mean_x[..., None, :]
    dy = px_y - mean_y[..., None, :]
    cov_px = jnp.stack(
        [
            jnp.sum(w * dx * dx, axis=-2),
            jnp.sum(w * dx * dy, axis=-2),
            jnp.sum(w * dy * dy, axis=-2),
        ],
        axis=-1,
    )  # [..., C, 3]
    mean_px = jnp.stack([mean_x, mean_y], axis=-1)  # [..., C, 2]
    return mean_px, cov_px
