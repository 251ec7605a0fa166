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


# --------------------------------------------------------------------------
# gtsam-faithful Levenberg-Marquardt (pose_prior_mult_node.cpp:746-767)
# --------------------------------------------------------------------------
#
# gtsam itself is not installable in this sandbox (no package, no network,
# no vendored source), so this is a float64 re-implementation of the exact
# semantics the reference relies on, written against gtsam 4.0.3's
# documented behavior (LevenbergMarquardtOptimizer/Params, NonlinearOptimizer
# ::defaultOptimize, Marginals):
#
#   * factor error convention: E = 0.5 * ||whitened residual||^2 summed over
#     factors (NoiseModelFactor::error);
#   * UnaryFactor (reference :126-145): identity-Jacobian 3D position prior
#     with a full 3x3 Gaussian covariance noise model;
#   * RangeFactor<Point3>: r = (||xi - xj|| - L) / sigma, Jacobians +-u^T
#     with u the unit direction (Gauss-Newton H contribution
#     w [uu^T, -uu^T; -uu^T, uu^T]);
#   * damping: buildDampedSystem with diagonalDamping=false (the default)
#     adds sqrt(lambda) unit priors on every variable -> H + lambda*I;
#   * tryLambda acceptance: solve the damped system exactly, accept when the
#     nonlinear cost decrease is non-negative AND modelFidelity =
#     costChange / linearizedCostChange > minModelFidelity (default 1e-3),
#     where linearizedCostChange is evaluated on the UNdamped Gauss-Newton
#     model m(d) = E + g.d + 0.5 d^T H d; on accept lambda /= lambdaFactor
#     (useFixedLambdaFactor default), on reject lambda *= lambdaFactor until
#     lambdaUpperBound aborts the iteration;
#   * defaultOptimize loop: repeat iterate() until maxIterations or
#     checkConvergence(relativeErrorTol, absoluteErrorTol, errorTol,
#     previousError, currentError);
#   * checkConvergence: newError <= errorTol, OR absoluteDecrease <=
#     absoluteErrorTol, OR relativeDecrease <= relativeErrorTol;
#   * Marginals(graph, result): per-variable 3x3 diagonal block of the
#     inverse UNdamped Gauss-Newton Hessian at the result, raising
#     (IndeterminantLinearSystemException) on a singular system.
#
# Known residual gaps vs the real library (documented in STATUS.md): gtsam
# counts only ACCEPTED steps as iterations (lambda retries are an inner
# loop); per-iteration numbers also differ when a step decreases the error
# but fails the modelFidelity gate (gtsam retries with larger lambda). Both
# sides converge to the same stationary point; `attempts_cap` exists so a
# truncated run can be compared attempt-for-attempt against prior.optimize's
# while_loop, whose counter ticks once per damped solve.

GTSAM_LM_DEFAULTS = dict(
    lambda_initial=1e-5,
    lambda_factor=10.0,
    lambda_upper=1e5,
    min_model_fidelity=1e-3,
    max_iterations=100,
    relative_error_tol=1e-5,
    absolute_error_tol=1e-5,
    error_tol=0.0,
)


class GtsamLMGraph:
    """Active-subgraph factor graph: variables are the MEASURED joints only
    (gtsam has no key for an unmeasured joint), unary info = inverse of the
    (normalized) measurement covariance, bones between measured endpoints."""

    def __init__(self, keys, meas, info, bones):
        self.keys = list(keys)                    # joint indices, sorted
        self.idx = {k: i for i, k in enumerate(self.keys)}
        self.meas = {k: np.asarray(meas[k], np.float64) for k in self.keys}
        self.info = {k: np.asarray(info[k], np.float64) for k in self.keys}
        self.bones = [
            (i, j, float(L), float(sig)) for (i, j, L, sig) in bones
        ]
        self.n = len(self.keys)

    def error(self, x):
        e = 0.0
        for k in self.keys:
            r = x[self.idx[k]] - self.meas[k]
            e += 0.5 * float(r @ self.info[k] @ r)
        for (i, j, L, sig) in self.bones:
            d = x[self.idx[i]] - x[self.idx[j]]
            r = (np.linalg.norm(d) - L) / sig
            e += 0.5 * r * r
        return e

    def linearize(self, x):
        n3 = 3 * self.n
        h = np.zeros((n3, n3))
        g = np.zeros(n3)
        for k in self.keys:
            a = 3 * self.idx[k]
            r = x[self.idx[k]] - self.meas[k]
            h[a : a + 3, a : a + 3] += self.info[k]
            g[a : a + 3] += self.info[k] @ r
        for (i, j, L, sig) in self.bones:
            a, b = 3 * self.idx[i], 3 * self.idx[j]
            d = x[self.idx[i]] - x[self.idx[j]]
            nrm = np.linalg.norm(d)
            u = d / nrm if nrm > 1e-12 else np.zeros(3)
            w = 1.0 / (sig * sig)
            r = nrm - L
            uu = w * np.outer(u, u)
            h[a : a + 3, a : a + 3] += uu
            h[b : b + 3, b : b + 3] += uu
            h[a : a + 3, b : b + 3] -= uu
            h[b : b + 3, a : a + 3] -= uu
            g[a : a + 3] += w * r * u
            g[b : b + 3] -= w * r * u
        return h, g


def gtsam_lm_optimize(graph, x0, attempts_cap=None, **overrides):
    """LevenbergMarquardtOptimizer(graph, x0).optimize() semantics.

    x0: dict key -> xyz (prevEstimate after setInitialState).
    Returns (x_dict, stats) with stats = dict(iterations, attempts,
    rejections, final_error, converged).
    """
    p = dict(GTSAM_LM_DEFAULTS)
    p.update(overrides)
    x = np.stack([np.asarray(x0[k], np.float64) for k in graph.keys])
    lam = p["lambda_initial"]
    err = graph.error(x)
    iterations = attempts = rejections = 0
    converged = False
    while iterations < p["max_iterations"]:
        prev_err = err
        # --- one iterate(): tryLambda until accept or lambda overflow.
        h, g = graph.linearize(x)
        accepted = False
        while True:
            if attempts_cap is not None and attempts >= attempts_cap:
                stats = dict(iterations=iterations, attempts=attempts,
                             rejections=rejections, final_error=err,
                             converged=converged)
                return {k: x[graph.idx[k]] for k in graph.keys}, stats
            attempts += 1
            damped = h + lam * np.eye(h.shape[0])
            try:
                delta = np.linalg.solve(damped, -g)
            except np.linalg.LinAlgError:
                delta = None
            if delta is not None and np.isfinite(delta).all():
                model_decrease = -(g @ delta + 0.5 * delta @ h @ delta)
                x_new = x + delta.reshape(-1, 3)
                new_err = graph.error(x_new)
                cost_change = err - new_err
                if model_decrease > 0 and cost_change >= 0 and (
                    cost_change / model_decrease > p["min_model_fidelity"]
                ):
                    x, err = x_new, new_err
                    lam /= p["lambda_factor"]
                    accepted = True
                    break
            rejections += 1
            lam *= p["lambda_factor"]
            if lam >= p["lambda_upper"]:
                break
        iterations += 1
        if not accepted:
            break  # lambda overflow: optimize() gives up (returns best x)
        # --- checkConvergence(prev_err, err)
        abs_dec = prev_err - err
        rel_dec = abs_dec / prev_err if prev_err > 0 else 0.0
        if (
            err <= p["error_tol"]
            or abs_dec <= p["absolute_error_tol"]
            or rel_dec <= p["relative_error_tol"]
        ):
            converged = True
            break
    stats = dict(iterations=iterations, attempts=attempts,
                 rejections=rejections, final_error=err,
                 converged=converged)
    return {k: x[graph.idx[k]] for k in graph.keys}, stats


def gtsam_marginals(graph, x_dict):
    """Marginals(graph, result).marginalCovariance(k) for every key: the
    3x3 diagonal blocks of the inverse undamped Hessian. Raises
    np.linalg.LinAlgError on an indeterminate system (gtsam's
    IndeterminantLinearSystemException)."""
    x = np.stack([np.asarray(x_dict[k], np.float64) for k in graph.keys])
    h, _ = graph.linearize(x)
    # Match gtsam: an exactly singular information matrix must raise.
    if np.linalg.matrix_rank(h) < h.shape[0]:
        raise np.linalg.LinAlgError("indeterminate linear system")
    cov = np.linalg.inv(h)
    return {
        k: cov[3 * graph.idx[k] : 3 * graph.idx[k] + 3,
               3 * graph.idx[k] : 3 * graph.idx[k] + 3]
        for k in graph.keys
    }
