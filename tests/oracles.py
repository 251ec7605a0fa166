"""Float64 NumPy oracle implementations of the pipeline math.

Independent re-derivations of the cited formulas (Hartley-Zisserman DLT,
symmetric epipolar distance, unscented transform, bone-length LM) used as
golden references for the JAX kernels. Written against the algorithm
descriptions in SURVEY.md, variable-size and loop-based on purpose: they
mirror the reference C++ semantics (dynamic view lists, erase-based outlier
rejection) so tests check that the masked fixed-shape JAX versions agree.
"""

from __future__ import annotations

import numpy as np


# --------------------------------------------------------------------------
# Geometry
# --------------------------------------------------------------------------

def dlt_triangulate(P_list, kp_list, weight_by_conf=True):
    """Weighted DLT: P_list [k,3,4], kp_list [k,3] (x, y, conf)."""
    rows = []
    for P, kp in zip(P_list, kp_list):
        for coord, row_idx in ((kp[0], 0), (kp[1], 1)):
            r = coord * P[2] - P[row_idx]
            r = r / np.linalg.norm(r)
            if weight_by_conf:
                r = r * kp[2]
            rows.append(r)
    a = np.stack(rows)
    _, _, vt = np.linalg.svd(a)
    h = vt[-1]
    return h[:3] / h[3]


def reprojection_error(xyz, P_list, kp_list):
    total, norm = 0.0, 0.0
    xyz_h = np.append(xyz, 1.0)
    for P, kp in zip(P_list, kp_list):
        proj = P @ xyz_h
        px = proj[:2] / proj[2]
        err = np.linalg.norm(px - kp[:2])
        total += kp[2] * err
        norm += kp[2]
    return total / norm


def symmetric_epipolar_distance(F, p1, p2):
    p1h = np.append(p1, 1.0)
    p2h = np.append(p2, 1.0)
    l1 = F @ p1h
    l2 = F.T @ p2h
    d1 = abs(p2h @ l1) / np.hypot(l1[0], l1[1])
    d2 = abs(p1h @ l2) / np.hypot(l2[0], l2[1])
    return d1 + d2


def triangulation_covariance(P_list, kp_list, cov_list, mean_xyz, kappa=0.5):
    """UT covariance of a triangulated joint; variable view count k."""
    k = len(P_list)
    dim = 2 * k
    b = np.sqrt(dim + kappa)
    n_samples = 2 * dim + 1
    weights = np.full(n_samples, 1.0 / (2.0 * (dim + kappa)))
    weights[0] = 2.0 * kappa / (2.0 * (dim + kappa))

    base = np.array(kp_list, dtype=np.float64)
    samples = [base.copy() for _ in range(n_samples)]
    for c in range(k):
        xx, xy, yy = cov_list[c]
        l11 = np.sqrt(xx)
        l21 = xy / l11 if l11 > 0 else 0.0
        l22 = np.sqrt(max(yy - l21 * l21, 0.0))
        samples[4 * c + 1][c, 0] -= l11 * b
        samples[4 * c + 1][c, 1] -= l21 * b
        samples[4 * c + 2][c, 1] -= l22 * b
        samples[4 * c + 3][c, 0] += l11 * b
        samples[4 * c + 3][c, 1] += l21 * b
        samples[4 * c + 4][c, 1] += l22 * b

    pts = np.stack(
        [dlt_triangulate(P_list, s, weight_by_conf=False) for s in samples]
    )
    centered = pts - mean_xyz
    return (centered * weights[:, None]).T @ centered


def project_with_covariance(xyz, cov3d, P, K, kappa=0.5):
    """3-dim UT through a pinhole camera. P [3,4], K (fx, fy, cx, cy)."""
    dim = 3
    b = np.sqrt(dim + kappa)
    n = 2 * dim + 1
    weights = np.full(n, 1.0 / (2.0 * (dim + kappa)))
    weights[0] = 2.0 * kappa / (2.0 * (dim + kappa))
    l = np.linalg.cholesky(cov3d)
    samples = [xyz]
    for i in range(3):
        samples.append(xyz - b * l[:, i])
    for i in range(3):
        samples.append(xyz + b * l[:, i])
    px = []
    for s in samples:
        cam = P @ np.append(s, 1.0)
        px.append(
            [K[0] * cam[0] / cam[2] + K[2], K[1] * cam[1] / cam[2] + K[3]]
        )
    px = np.array(px)
    mean = weights @ px
    centered = px - mean
    cov = (centered * weights[:, None]).T @ centered
    return mean, cov


# --------------------------------------------------------------------------
# Association cost (calcCost oracle)
# --------------------------------------------------------------------------

def association_cost(
    hyp_obs,  # list of (cam_idx, kp [J,3], person_score)
    det_kp,  # [J, 3]
    F_full,  # [C, C, 3, 3]
    det_cam,
    min_kp_score=0.30,
    max_epipolar_error=0.05,
    max_cost=1e6,
):
    """Returns (cost, veto) replicating calcCost semantics."""
    n_obs = len(hyp_obs)
    if n_obs == 0:
        return max_cost, True
    tolerance = 1.0 - 1.0 / (2 * n_obs)
    veto_delta = 1.0 / n_obs
    total, n_used, tmp_veto = 0.0, 0, 0.0
    for cam_idx, kp, score in hyp_obs:
        F = F_full[cam_idx, det_cam]
        cost, n_joints = 0.0, 0
        for j in range(kp.shape[0]):
            if kp[j, 2] > min_kp_score and det_kp[j, 2] > min_kp_score:
                cost += symmetric_epipolar_distance(
                    F, kp[j, :2], det_kp[j, :2]
                )
                n_joints += 1
        if n_joints > 0:
            cost /= n_joints
            total += cost
            n_used += 1
            if cost > max_epipolar_error and (score > 0.5 or n_obs == 1):
                tmp_veto += veto_delta
    veto = tmp_veto > tolerance
    if n_used > 0:
        return total / n_used, veto
    return max_cost, True
