"""Differential tests against the ACTUAL reference C++ kernels.

BASELINE.md's parity target ("3D joints within 1 mm of the reference
C++/gtsam output") is verified here against the real implementation, not a
re-derived oracle: at test time the reference's dependency-free Hungarian
solver (skeleton_3d/src/Hungarian.cpp) and its Eigen geometry kernels —
`triangulate`, `calcReprojectionError`, `calc_covariance` (+ sigma-point
helpers) and `calcCost` (skeleton_3d_triang_mult_node.cpp:335-523) — are
extracted verbatim from the mounted read-only reference tree, wrapped in a
small extern-C harness, compiled into /tmp (never vendored into this repo),
and loaded via ctypes.

Skips gracefully when the reference tree, a C++ toolchain, or Eigen headers
are unavailable.
"""

import ctypes
import glob
import os
import shutil
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from smartedgesensor3dhumanpose_tpu.ops import (
    covariance,
    epipolar,
    hungarian,
    triangulation,
)

REF = "/root/reference"
NODE = os.path.join(REF, "skeleton_3d/src/skeleton_3d_triang_mult_node.cpp")
HUNG = os.path.join(REF, "skeleton_3d/src/Hungarian.cpp")
HUNG_INC = os.path.join(REF, "skeleton_3d/include")
BUILD = "/tmp/ses3d_ref_oracle"

_PROLOGUE = r"""
// Auto-generated differential-test harness. The function bodies below the
// marker are extracted VERBATIM from the read-only reference tree at test
// time; this prologue only supplies the minimal declarations they need.
#include <Eigen/Dense>
#include <vector>
#include <cmath>
#include <cassert>
#include <limits>
#include <algorithm>
#include "Hungarian.h"
using namespace std;
typedef Eigen::Matrix<float, 3, 4> Matrix34f;
static const double MAX_COSTS = 1.0e6;           // node :43
static double g_max_epipolar_error = 0.05;       // node :59-60
static const float g_triangulation_threshold = 0.30f;  // node :58
static const int NUM_KEYPOINTS = 17;
static int NUM_CAMERAS = 16;
struct PersonHypothesis {                        // node :153-159
  vector<int> cameraIDs;
  vector<vector<Eigen::Vector3f> > keypoints_normalized;
  vector<vector<Eigen::Matrix2f> > covs_normalized;
  vector<float> score;
};
// ---- verbatim reference code below ----
"""

_EPILOGUE = r"""
// ---- extern "C" wrappers ----
extern "C" {

void ref_set_params(double max_epi, int num_cameras) {
  g_max_epipolar_error = max_epi;
  NUM_CAMERAS = num_cameras;
}

int ref_fundamental_idx(int i, int j) { return get_fundamental_idx(i, j); }

void ref_triangulate(const float* Ps, const float* kps, int k, int weight,
                     float* out_xyz, double* out_err) {
  vector<Matrix34f> cams(k);
  vector<Eigen::Vector3f> pts(k);
  for (int i = 0; i < k; ++i) {
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 4; ++c) cams[i](r, c) = Ps[i * 12 + r * 4 + c];
    pts[i] = Eigen::Vector3f(kps[i * 3], kps[i * 3 + 1], kps[i * 3 + 2]);
  }
  double err = 0.0;
  Eigen::Vector3f x = triangulate(cams, pts, weight != 0, &err);
  out_xyz[0] = x.x();
  out_xyz[1] = x.y();
  out_xyz[2] = x.z();
  *out_err = err;
}

void ref_covariance(const float* Ps, const float* kps, const float* covs,
                    int k, const float* mean, float* out_cov) {
  vector<Matrix34f> cams(k);
  vector<Eigen::Vector3f> pts(k);
  vector<Eigen::Matrix2f> cv(k);
  for (int i = 0; i < k; ++i) {
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 4; ++c) cams[i](r, c) = Ps[i * 12 + r * 4 + c];
    pts[i] = Eigen::Vector3f(kps[i * 3], kps[i * 3 + 1], kps[i * 3 + 2]);
    cv[i] << covs[i * 3], covs[i * 3 + 1], covs[i * 3 + 1], covs[i * 3 + 2];
  }
  Eigen::Matrix3f C;
  calc_covariance(C, Eigen::Vector3f(mean[0], mean[1], mean[2]), pts, cv,
                  cams);
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) out_cov[r * 3 + c] = C(r, c);
}

double ref_calc_cost(const int* cam_ids, const float* hyp_kps,
                     const float* hyp_scores, int n_obs, const float* det_kps,
                     int det_id, const float* Fs, int n_pairs,
                     int* veto_out) {
  PersonHypothesis hyp;
  hyp.cameraIDs.assign(cam_ids, cam_ids + n_obs);
  hyp.score.assign(hyp_scores, hyp_scores + n_obs);
  hyp.keypoints_normalized.resize(n_obs);
  for (int o = 0; o < n_obs; ++o) {
    hyp.keypoints_normalized[o].resize(NUM_KEYPOINTS);
    for (int j = 0; j < NUM_KEYPOINTS; ++j)
      hyp.keypoints_normalized[o][j] =
          Eigen::Vector3f(hyp_kps[(o * NUM_KEYPOINTS + j) * 3],
                          hyp_kps[(o * NUM_KEYPOINTS + j) * 3 + 1],
                          hyp_kps[(o * NUM_KEYPOINTS + j) * 3 + 2]);
  }
  vector<Eigen::Vector3f> det(NUM_KEYPOINTS);
  for (int j = 0; j < NUM_KEYPOINTS; ++j)
    det[j] = Eigen::Vector3f(det_kps[j * 3], det_kps[j * 3 + 1],
                             det_kps[j * 3 + 2]);
  vector<Eigen::Matrix3f> F(n_pairs);
  for (int p = 0; p < n_pairs; ++p)
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) F[p](r, c) = Fs[p * 9 + r * 3 + c];
  bool veto = false;
  double cost = calcCost(hyp, det, det_id, F, veto);
  *veto_out = veto ? 1 : 0;
  return cost;
}

void ref_hungarian(double* dist_colmajor, int rows, int cols,
                   int* assignment, double* cost) {
  HungarianAlgorithm::assignmentoptimal(assignment, cost, dist_colmajor,
                                        rows, cols);
}

}  // extern "C"
"""


def _extract(src: str, start: str, end: str) -> str:
    i = src.index(start)
    j = src.index(end, i)
    return src[i:j]


def _find_eigen():
    for pat in (
        "/usr/include/eigen3",
        "/opt/venv/lib/python*/site-packages/tensorflow/include",
    ):
        hits = glob.glob(pat)
        for h in hits:
            if os.path.exists(os.path.join(h, "Eigen", "Dense")):
                return h
    return None


def _build_oracle():
    if not os.path.exists(NODE) or not os.path.exists(HUNG):
        pytest.skip("reference tree not mounted")
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no C++ toolchain")
    eigen = _find_eigen()
    if eigen is None:
        pytest.skip("no Eigen headers")

    os.makedirs(BUILD, exist_ok=True)
    lib_path = os.path.join(BUILD, "libses3dref.so")
    src = open(NODE).read()
    pieces = [
        _extract(src, "int get_fundamental_idx(", "void setKeypointCovariance("),
        _extract(src, "double calcCost(const PersonHypothesis&", "double calc_3D_dist("),
        _extract(src, "double calcReprojectionError(", "Eigen::Vector3f triangulate("),
        _extract(src, "Eigen::Vector3f triangulate(", "double calcJointDist("),
        _extract(src, "inline void mod_samples(", "Eigen::RowVectorXf draw_sigma_points("),
        _extract(src, "Eigen::RowVectorXf draw_sigma_points(", "void calc_covariance("),
        _extract(src, "void calc_covariance(", "void triangulate_persons("),
    ]
    harness = _PROLOGUE + "\n".join(pieces) + _EPILOGUE
    harness_path = os.path.join(BUILD, "harness.cpp")
    stamp = harness + NODE + HUNG
    stamp_path = os.path.join(BUILD, "stamp.txt")
    if (
        not os.path.exists(lib_path)
        or not os.path.exists(stamp_path)
        or open(stamp_path).read() != stamp
    ):
        open(harness_path, "w").write(harness)
        cmd = [
            gxx, "-O2", "-std=c++14", "-fPIC", "-shared",
            harness_path, HUNG,
            f"-I{eigen}", f"-I{HUNG_INC}",
            "-o", lib_path,
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if proc.returncode != 0:
            pytest.skip(f"oracle build failed: {proc.stderr[-800:]}")
        open(stamp_path, "w").write(stamp)

    lib = ctypes.CDLL(lib_path)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.ref_set_params.argtypes = [ctypes.c_double, ctypes.c_int]
    lib.ref_fundamental_idx.restype = ctypes.c_int
    lib.ref_fundamental_idx.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.ref_triangulate.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int, f32p, f64p]
    lib.ref_covariance.argtypes = [f32p, f32p, f32p, ctypes.c_int, f32p, f32p]
    lib.ref_calc_cost.restype = ctypes.c_double
    lib.ref_calc_cost.argtypes = [
        i32p, f32p, f32p, ctypes.c_int, f32p, ctypes.c_int, f32p,
        ctypes.c_int, i32p,
    ]
    lib.ref_hungarian.argtypes = [f64p, ctypes.c_int, ctypes.c_int, i32p, f64p]
    return lib


@pytest.fixture(scope="module")
def oracle():
    return _build_oracle()


def _f32p(a):
    return np.ascontiguousarray(a, np.float32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)
    )


def _scene(rng, k, noise=0.003):
    """k cameras in a rough ring looking at a point near the origin."""
    Ps, kps = [], []
    gt = rng.normal(scale=0.8, size=3) + np.array([0.0, 0.0, 0.3])
    for i in range(k):
        ang = 2 * np.pi * i / k + rng.uniform(-0.2, 0.2)
        c = np.array([4.0 * np.cos(ang), 4.0 * np.sin(ang), 1.8])
        z = gt - c
        z = z / np.linalg.norm(z)
        xr = np.cross(np.array([0.0, 0.0, 1.0]), z)
        xr /= np.linalg.norm(xr)
        yr = np.cross(z, xr)
        R = np.stack([xr, yr, z])
        P = np.hstack([R, (-R @ c)[:, None]]).astype(np.float32)
        Ps.append(P)
        uvw = P @ np.append(gt, 1.0)
        kp = uvw[:2] / uvw[2] + rng.normal(scale=noise, size=2)
        kps.append(np.array([kp[0], kp[1], rng.uniform(0.4, 1.0)], np.float32))
    return np.stack(Ps), np.stack(kps), gt


def test_triangulate_parity_vs_reference_cpp(oracle, rng):
    """Weighted DLT must match the reference's Jacobi-SVD solution to well
    under the 1 mm budget (different algorithm: normal-matrix eigenvector
    vs thin-SVD of the 2k x 4 system)."""
    worst = 0.0
    for trial in range(20):
        k = int(rng.integers(2, 7))
        Ps, kps, gt = _scene(rng, k)
        for weight in (0, 1):
            out = np.zeros(3, np.float32)
            err = ctypes.c_double()
            oracle.ref_triangulate(
                _f32p(Ps), _f32p(kps), k, weight, _f32p(out), ctypes.byref(err)
            )
            xyz, rerr = triangulation.triangulate_with_error(
                jnp.asarray(Ps, jnp.float32),
                jnp.asarray(kps, jnp.float32),
                jnp.ones((k,), bool),
                weight_by_conf=bool(weight),
            )
            d = float(np.abs(np.asarray(xyz) - out).max())
            worst = max(worst, d)
            assert d < 1e-4, (trial, weight, d)  # 0.1 mm
            np.testing.assert_allclose(
                float(rerr), err.value, rtol=2e-3, atol=1e-7
            )
    assert worst < 1e-4


def test_ut_covariance_parity_vs_reference_cpp(oracle, rng):
    for trial in range(10):
        k = int(rng.integers(2, 6))
        Ps, kps, _ = _scene(rng, k)
        covs = np.zeros((k, 3), np.float32)
        for i in range(k):
            a = rng.normal(scale=2e-3, size=(2, 2))
            m = a @ a.T + 1e-6 * np.eye(2)
            covs[i] = [m[0, 0], m[0, 1], m[1, 1]]
        # Mean = the weighted triangulation, as in the reference main loop.
        mean = np.zeros(3, np.float32)
        err = ctypes.c_double()
        oracle.ref_triangulate(
            _f32p(Ps), _f32p(kps), k, 1, _f32p(mean), ctypes.byref(err)
        )
        want = np.zeros(9, np.float32)
        oracle.ref_covariance(
            _f32p(Ps), _f32p(kps), _f32p(covs), k, _f32p(mean), _f32p(want)
        )
        got = covariance.triangulation_covariance(
            jnp.asarray(Ps, jnp.float32),
            jnp.asarray(kps, jnp.float32),
            jnp.asarray(covs, jnp.float32),
            jnp.ones((k,), bool),
            jnp.asarray(mean, jnp.float32),
            kappa=0.5,
        )
        np.testing.assert_allclose(
            np.asarray(got).reshape(9),
            want,
            atol=2e-7 + 1e-3 * np.abs(want).max(),
            err_msg=f"trial {trial} k={k}",
        )


def test_calc_cost_parity_vs_reference_cpp(oracle, rng):
    """Epipolar association cost + veto arithmetic vs the real calcCost."""
    num_cams = 6
    oracle.ref_set_params(0.05, num_cams)
    n_pairs = num_cams * (num_cams - 1) // 2
    checked_veto = 0
    for trial in range(30):
        n_obs = int(rng.integers(1, 4))
        det_id = num_cams - 1  # detections come from the newest camera
        cam_ids = np.sort(
            rng.choice(np.arange(det_id), size=n_obs, replace=False)
        ).astype(np.int32)
        hyp_kps = np.zeros((n_obs, 17, 3), np.float32)
        hyp_kps[..., :2] = rng.normal(scale=0.3, size=(n_obs, 17, 2))
        hyp_kps[..., 2] = rng.uniform(0.0, 1.0, size=(n_obs, 17))
        hyp_scores = rng.uniform(0.2, 1.0, size=n_obs).astype(np.float32)
        det_kps = np.zeros((17, 3), np.float32)
        det_kps[..., :2] = hyp_kps[0, :, :2] + rng.normal(
            scale=rng.choice([0.005, 0.08]), size=(17, 2)
        )
        det_kps[..., 2] = rng.uniform(0.0, 1.0, size=17)
        Fs = rng.normal(scale=1.0, size=(n_pairs, 3, 3)).astype(np.float32)

        veto = ctypes.c_int()
        want = oracle.ref_calc_cost(
            np.ascontiguousarray(cam_ids).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int)
            ),
            _f32p(hyp_kps), _f32p(hyp_scores), n_obs,
            _f32p(det_kps), det_id, _f32p(Fs), n_pairs, ctypes.byref(veto),
        )

        # Build the framework's [H=1, C, ...] layout.
        hk = np.zeros((1, num_cams, 17, 3), np.float32)
        hk[..., 2] = -1.0
        mask = np.zeros((1, num_cams), bool)
        scores = np.zeros((1, num_cams), np.float32)
        f_to_det = np.zeros((num_cams, 3, 3), np.float32)
        for o, cid in enumerate(cam_ids):
            hk[0, cid] = hyp_kps[o]
            mask[0, cid] = True
            scores[0, cid] = hyp_scores[o]
        for cid in range(det_id):
            f_to_det[cid] = Fs[oracle.ref_fundamental_idx(cid, det_id)]
        cost, got_veto = epipolar.association_cost(
            jnp.asarray(hk), jnp.asarray(mask), jnp.asarray(scores),
            jnp.asarray(det_kps)[None], jnp.ones((1,), bool),
            jnp.asarray(f_to_det),
            0.30, 0.05, 1.0e6,
        )
        np.testing.assert_allclose(
            float(cost[0, 0]), want, rtol=2e-5, atol=1e-7,
            err_msg=f"trial {trial} n_obs={n_obs}",
        )
        assert bool(got_veto[0, 0]) == bool(veto.value), (
            trial, n_obs, want, float(cost[0, 0]),
        )
        checked_veto += int(veto.value)
    assert 0 < checked_veto < 30  # fixture exercises both outcomes


def test_hungarian_parity_vs_reference_cpp(oracle, rng):
    """Assignment totals must match the reference Munkres exactly, including
    degenerate all-MAX_COSTS rows/columns; assignments themselves must match
    when the optimum is unique."""
    for trial in range(40):
        r = int(rng.integers(1, 10))
        c = int(rng.integers(1, 10))
        cost = rng.uniform(0.0, 1.0, size=(r, c))
        # Degenerate MAX_COSTS=1e6 patterns (vetoed pairings, node :43).
        veto = rng.uniform(size=(r, c)) < rng.choice([0.0, 0.3, 0.8])
        cost = np.where(veto, 1.0e6, cost)

        assignment = np.full((r,), -7, np.int32)
        total = ctypes.c_double()
        oracle.ref_hungarian(
            np.asfortranarray(cost).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)
            ),
            r, c,
            assignment.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.byref(total),
        )

        ours = np.asarray(
            hungarian.linear_sum_assignment(jnp.asarray(cost))
        )
        rows = np.arange(r)
        ours_total = cost[rows[ours >= 0], ours[ours >= 0]].sum()
        np.testing.assert_allclose(ours_total, total.value, rtol=0, atol=1e-9,
                                    err_msg=f"trial {trial} {r}x{c}")
        # Where the reference assigned, we must assign the same number.
        assert (ours >= 0).sum() == (assignment >= 0).sum()


def test_hungarian_tie_break_divergence_boundary(oracle, rng):
    """The acknowledged divergence boundary, as a test artifact (not just a
    STATUS sentence): on matrices with MASSIVE cost ties the JV solver can
    legally pick a DIFFERENT optimal permutation than the reference's
    column-major Munkres (Hungarian.cpp:60) — totals must still agree to
    the last bit and both sides assign the same number of pairs. On
    tie-free (continuous) costs the optimum is a.s. unique and the
    permutations themselves must be identical."""
    diverged = tied_trials = 0
    for trial in range(60):
        r = int(rng.integers(2, 9))
        c = int(rng.integers(2, 9))
        # Three-level quantized costs: most entries tie with many others.
        cost = rng.choice([0.25, 0.5, 1.0], size=(r, c))

        assignment = np.full((r,), -7, np.int32)
        total = ctypes.c_double()
        oracle.ref_hungarian(
            np.asfortranarray(cost).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)
            ),
            r, c,
            assignment.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.byref(total),
        )
        ours = np.asarray(hungarian.linear_sum_assignment(jnp.asarray(cost)))
        rows = np.arange(r)
        ours_total = cost[rows[ours >= 0], ours[ours >= 0]].sum()
        # The invariant that HOLDS under ties: bit-equal optimal totals,
        # same assignment cardinality.
        np.testing.assert_allclose(
            ours_total, total.value, rtol=0, atol=0,
            err_msg=f"tied trial {trial} {r}x{c}",
        )
        assert (ours >= 0).sum() == (assignment >= 0).sum()
        tied_trials += 1
        if not np.array_equal(ours, assignment):
            diverged += 1
    # The boundary is real: the fixture must actually produce divergent
    # (equal-total) permutations, or this test documents nothing.
    assert diverged > 0, (
        f"no tie divergence in {tied_trials} tie-heavy trials — "
        "fixture too weak"
    )

    # Tie-free boundary: continuous costs -> a.s. unique optimum -> the
    # permutations must match the reference EXACTLY.
    for trial in range(30):
        r = int(rng.integers(2, 9))
        c = int(rng.integers(2, 9))
        cost = rng.uniform(0.0, 1.0, size=(r, c))
        assignment = np.full((r,), -7, np.int32)
        total = ctypes.c_double()
        oracle.ref_hungarian(
            np.asfortranarray(cost).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)
            ),
            r, c,
            assignment.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.byref(total),
        )
        ours = np.asarray(hungarian.linear_sum_assignment(jnp.asarray(cost)))
        np.testing.assert_array_equal(
            ours, assignment, err_msg=f"tie-free trial {trial} {r}x{c}"
        )
