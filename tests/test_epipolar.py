import jax.numpy as jnp
import numpy as np

import oracles
from smartedgesensor3dhumanpose_tpu import cameras
from smartedgesensor3dhumanpose_tpu.ops import epipolar
from test_triangulation import project, random_rig


def test_epipolar_constraint_on_true_correspondences(rng):
    P = random_rig(rng, c=4)
    F = cameras.fundamental_matrices(P)
    for _ in range(10):
        xyz = rng.normal(size=3) * 0.5
        for i in range(4):
            for j in range(4):
                if i == j:
                    continue
                p1 = project(P[i], xyz)
                p2 = project(P[j], xyz)
                d = float(
                    epipolar.symmetric_epipolar_distance(
                        jnp.asarray(F[i, j]), jnp.asarray(p1), jnp.asarray(p2)
                    )
                )
                assert d < 1e-8


def test_symmetric_epipolar_distance_matches_oracle(rng):
    P = random_rig(rng, c=2)
    F = cameras.fundamental_matrices(P)[0, 1]
    for _ in range(10):
        p1 = rng.normal(size=2) * 0.5
        p2 = rng.normal(size=2) * 0.5
        got = float(
            epipolar.symmetric_epipolar_distance(
                jnp.asarray(F), jnp.asarray(p1), jnp.asarray(p2)
            )
        )
        want = oracles.symmetric_epipolar_distance(F, p1, p2)
        np.testing.assert_allclose(got, want, rtol=1e-10)


def _random_joints(rng, xyz, j=17):
    """A consistent random 3D 'skeleton' around a center point."""
    return xyz + rng.normal(size=(j, 3)) * 0.15


def _project_joints(rng, P, joints, noise, conf_range=(0.35, 1.0)):
    j = joints.shape[0]
    kp = np.zeros((j, 3))
    for jj in range(j):
        kp[jj, :2] = project(P, joints[jj]) + rng.normal(size=2) * noise
        kp[jj, 2] = rng.uniform(*conf_range)
    return kp


def test_association_cost_matches_oracle(rng):
    c, j = 5, 17
    P = random_rig(rng, c=c)
    F = cameras.fundamental_matrices(P)
    det_cam = 4

    # Build 3 hypotheses with varying observation sets / scores.
    hyp_obs_sets = []
    hyp_joints = [_random_joints(rng, rng.normal(size=3) * 0.4, j) for _ in range(3)]
    cam_sets = [[0], [0, 1], [1, 2, 3]]
    scores = [[0.9], [0.3, 0.8], [0.6, 0.6, 0.4]]
    for joints, cams_h, sc in zip(hyp_joints, cam_sets, scores):
        obs = []
        for cidx, s in zip(cams_h, sc):
            kp = _project_joints(rng, P[cidx], joints, noise=0.002)
            # Knock out some joints below threshold.
            drop = rng.uniform(size=j) < 0.2
            kp[drop, 2] = 0.1
            obs.append((cidx, kp, s))
        hyp_obs_sets.append(obs)

    # Two detections in camera det_cam: one matching hypothesis 1, one random.
    det0 = _project_joints(rng, P[det_cam], hyp_joints[1], noise=0.002)
    det1 = _project_joints(
        rng, P[det_cam], _random_joints(rng, rng.normal(size=3), j), noise=0.002
    )
    dets = np.stack([det0, det1])
    det_valid = np.array([True, True])

    # Pack into fixed shapes [H, C, J, 3].
    h_n = 3
    hyp_kp = np.zeros((h_n, c, j, 3))
    hyp_kp[..., 2] = -1.0
    hyp_mask = np.zeros((h_n, c), bool)
    hyp_score = np.zeros((h_n, c))
    for hi, obs in enumerate(hyp_obs_sets):
        for cidx, kp, s in obs:
            hyp_kp[hi, cidx] = kp
            hyp_mask[hi, cidx] = True
            hyp_score[hi, cidx] = s

    cost, veto = epipolar.association_cost(
        jnp.asarray(hyp_kp),
        jnp.asarray(hyp_mask),
        jnp.asarray(hyp_score),
        jnp.asarray(dets),
        jnp.asarray(det_valid),
        jnp.asarray(F[:, det_cam]),
        min_kp_score=0.30,
        max_epipolar_error=0.05,
        max_cost=1e6,
    )
    cost, veto = np.asarray(cost), np.asarray(veto)

    for hi, obs in enumerate(hyp_obs_sets):
        for di in range(2):
            want_cost, want_veto = oracles.association_cost(
                obs, dets[di], F, det_cam
            )
            np.testing.assert_allclose(
                cost[hi, di], want_cost, rtol=1e-8,
                err_msg=f"hyp {hi} det {di}",
            )
            assert veto[hi, di] == want_veto, f"hyp {hi} det {di}"

    # The near-hypothesis-1 detection should not be vetoed against hyp 1.
    assert not veto[1, 0]
    assert cost[1, 0] < 0.05


def test_pairwise_association_costs_matches_oracle(rng):
    """f64 NumPy oracle for the frame-level pair-cost precompute: every
    ordered (c1, d1, c2, d2) entry must equal the per-observation calcCost
    term — joint-mean symmetric epipolar distance over joints confident in
    both views (oracles.symmetric_epipolar_distance)."""
    c, d, j = 4, 3, 17
    min_kp_score = 0.30
    P = random_rig(rng, c=c)
    F = cameras.fundamental_matrices(P)

    kp = np.zeros((c, d, j, 3))
    for ci in range(c):
        for di in range(d):
            joints = _random_joints(rng, rng.normal(size=3) * 0.4, j)
            kp[ci, di] = _project_joints(
                rng, P[ci], joints, noise=0.003, conf_range=(0.1, 1.0)
            )

    cost, usable = epipolar.pairwise_association_costs(
        jnp.asarray(kp), jnp.asarray(F), min_kp_score
    )
    cost, usable = np.asarray(cost), np.asarray(usable)

    for c1 in range(c):
        for c2 in range(c):
            if c1 == c2:
                continue  # same-camera entries are never gathered
            for d1 in range(d):
                for d2 in range(d):
                    total, n = 0.0, 0
                    for jj in range(j):
                        if (
                            kp[c1, d1, jj, 2] > min_kp_score
                            and kp[c2, d2, jj, 2] > min_kp_score
                        ):
                            total += oracles.symmetric_epipolar_distance(
                                F[c1, c2],
                                kp[c1, d1, jj, :2],
                                kp[c2, d2, jj, :2],
                            )
                            n += 1
                    assert usable[c1, d1, c2, d2] == (n > 0)
                    if n > 0:
                        np.testing.assert_allclose(
                            cost[c1, d1, c2, d2], total / n, rtol=1e-8,
                            err_msg=f"pair ({c1},{d1})->({c2},{d2})",
                        )


def test_invalid_detection_slots_are_vetoed(rng):
    c, j = 3, 17
    P = random_rig(rng, c=c)
    F = cameras.fundamental_matrices(P)
    hyp_kp = np.zeros((1, c, j, 3))
    hyp_kp[0, 0, :, 2] = 0.9
    hyp_mask = np.zeros((1, c), bool)
    hyp_mask[0, 0] = True
    det = np.zeros((2, j, 3))
    det[..., 2] = 0.9
    cost, veto = epipolar.association_cost(
        jnp.asarray(hyp_kp),
        jnp.asarray(hyp_mask),
        jnp.asarray(np.ones((1, c))),
        jnp.asarray(det),
        jnp.asarray(np.array([True, False])),
        jnp.asarray(F[:, 2]),
        0.30, 0.05, 1e6,
    )
    assert bool(np.asarray(veto)[0, 1])
    assert float(np.asarray(cost)[0, 1]) == 1e6


def test_pairwise_joint_epipolar_sq(rng):
    c = 4
    P = random_rig(rng, c=c)
    F = cameras.fundamental_matrices(P)
    xyz = rng.normal(size=3) * 0.4
    kp = np.zeros((c, 3))
    for ci in range(c):
        kp[ci, :2] = project(P[ci], xyz) + rng.normal(size=2) * 0.01
        kp[ci, 2] = 0.9
    mask = np.array([True, True, True, False])
    d2 = np.asarray(
        epipolar.pairwise_joint_epipolar_sq(
            jnp.asarray(F), jnp.asarray(kp), jnp.asarray(mask)
        )
    )
    for i in range(c):
        for jj in range(i + 1, c):
            if mask[i] and mask[jj]:
                # Oracle: squared symmetric distance via F[i, j].
                p1h = np.append(kp[i, :2], 1.0)
                p2h = np.append(kp[jj, :2], 1.0)
                l1 = F[i, jj] @ p1h
                l2 = F[i, jj].T @ p2h
                want = (p2h @ l1) ** 2 / (l1[0] ** 2 + l1[1] ** 2) + (
                    p1h @ l2
                ) ** 2 / (l2[0] ** 2 + l2[1] ** 2)
                np.testing.assert_allclose(d2[i, jj], want, rtol=1e-8)
                np.testing.assert_allclose(d2[jj, i], want, rtol=1e-8)
            else:
                assert d2[i, jj] == 0.0


def test_three_view_drop_scores_match_dense(rng):
    """The gathered 3-view drop scores must equal the dense pair-matrix
    formulation they replaced: rem_d2[v] == sum of the OTHER two views'
    pairwise d^2 entry, with ascending valid indices."""
    c = 6
    P = random_rig(rng, c=c)
    F = cameras.fundamental_matrices(P)
    for trial in range(8):
        xyz = rng.normal(size=3) * 0.4
        kp = np.zeros((c, 3))
        for ci in range(c):
            kp[ci, :2] = project(P[ci], xyz) + rng.normal(size=2) * 0.01
            kp[ci, 2] = 0.9
        mask = np.zeros(c, bool)
        mask[rng.choice(c, size=3, replace=False)] = True

        rem_d2, idx3 = epipolar.three_view_drop_scores(
            jnp.asarray(F), jnp.asarray(kp), jnp.asarray(mask)
        )
        rem_d2, idx3 = np.asarray(rem_d2), np.asarray(idx3)
        want_idx = np.nonzero(mask)[0]
        np.testing.assert_array_equal(idx3, want_idx)

        dense = np.asarray(
            epipolar.pairwise_joint_epipolar_sq(
                jnp.asarray(F), jnp.asarray(kp), jnp.asarray(mask)
            )
        )
        for v in range(3):
            others = [want_idx[o] for o in range(3) if o != v]
            np.testing.assert_allclose(
                rem_d2[v], dense[others[0], others[1]], rtol=1e-10,
                err_msg=f"trial {trial} drop slot {v}",
            )
