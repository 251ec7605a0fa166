import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu import cameras, skeleton


def test_quat_roundtrip():
    r = cameras.quat_to_rot(0.0, 0.0, 0.0, 1.0)
    np.testing.assert_allclose(r, np.eye(3), atol=1e-15)
    # 90 degrees about z.
    r = cameras.quat_to_rot(0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4))
    np.testing.assert_allclose(
        r @ np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), atol=1e-12
    )


def test_transform_inverse():
    t = cameras.make_transform([1.0, 2.0, 3.0], [0.1, 0.2, 0.3, 0.9])
    np.testing.assert_allclose(
        t @ cameras.invert_transform(t), np.eye(4), atol=1e-12
    )


def test_fundamental_epipolar_constraint(rng):
    from test_triangulation import project, random_rig

    P = random_rig(rng, c=5)
    F = cameras.fundamental_matrices(P)
    # x2^T F x1 = 0 for true correspondences.
    for _ in range(20):
        xyz = rng.normal(size=3)
        i, j = rng.integers(5), rng.integers(5)
        if i == j:
            continue
        x1 = np.append(project(P[i], xyz), 1.0)
        x2 = np.append(project(P[j], xyz), 1.0)
        val = x2 @ F[i, j] @ x1
        scale = np.linalg.norm(F[i, j])
        assert abs(val) / scale < 1e-9


def test_hall_rig_shapes():
    rig = cameras.hall_rig(16)
    assert rig.P.shape == (16, 3, 4)
    assert rig.F.shape == (16, 16, 3, 3)
    assert rig.K.shape == (16, 4)
    # Rotations must be orthonormal.
    r = np.asarray(rig.P, dtype=np.float64)[:, :, :3]
    eye = np.einsum("cij,ckj->cik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    # Cameras should be a few meters from the base origin.
    centers = -np.einsum("cji,cj->ci", r, np.asarray(rig.P)[:, :, 3])
    dist = np.linalg.norm(centers, axis=-1)
    assert np.all(dist > 1.0) and np.all(dist < 30.0)


def test_normalize_keypoints(rng):
    c, d, j = 2, 3, 17
    K = np.array([[600.0, 610.0, 320.0, 240.0], [500.0, 505.0, 310.0, 230.0]])
    kp = rng.uniform(0, 640, size=(c, d, j, 3))
    kp[..., 2] = rng.uniform(0, 1, size=(c, d, j))
    cov = np.abs(rng.normal(size=(c, d, j, 3))) * 4.0

    kp_n, cov_n, ok = cameras.normalize_keypoints(
        jnp.asarray(kp), jnp.asarray(cov), jnp.asarray(K), min_score=0.30
    )
    kp_n, cov_n, ok = np.asarray(kp_n), np.asarray(cov_n), np.asarray(ok)

    for ci in range(c):
        fx, fy, cx, cy = K[ci]
        for di in range(d):
            for ji in range(j):
                if kp[ci, di, ji, 2] >= 0.30:
                    assert ok[ci, di, ji]
                    np.testing.assert_allclose(
                        kp_n[ci, di, ji, 0],
                        (kp[ci, di, ji, 0] - cx) / fx,
                        rtol=1e-6,
                    )
                    np.testing.assert_allclose(
                        kp_n[ci, di, ji, 1],
                        (kp[ci, di, ji, 1] - cy) / fy,
                        rtol=1e-6,
                    )
                    np.testing.assert_allclose(
                        cov_n[ci, di, ji],
                        cov[ci, di, ji]
                        / np.array([fx * fx, fx * fy, fy * fy]),
                        rtol=1e-6,
                    )
                else:
                    assert not ok[ci, di, ji]
                    assert kp_n[ci, di, ji, 2] == -1.0


def test_skeleton_tables_consistent():
    assert skeleton.FUSION_PARENT.shape == (21,)
    assert skeleton.SIMPLE_MODEL.to_fusion.shape == (17,)
    assert skeleton.H36M_MODEL.to_fusion.shape == (17,)
    # Fusion maps must be injective.
    assert len(set(skeleton.SIMPLE_MODEL.to_fusion.tolist())) == 17
    assert len(set(skeleton.H36M_MODEL.to_fusion.tolist())) == 17
    # Bone tables align.
    assert skeleton.BONE_I.shape == skeleton.BONE_LENGTH_ABS.shape
    assert skeleton.BONE_I.shape == skeleton.BONE_LENGTH_NORM.shape
    # Spine bone is MidHip <-> Neck.
    assert skeleton.BONE_I[skeleton.SPINE_BONE_IDX] == skeleton.MIDHIP
    assert skeleton.BONE_J[skeleton.SPINE_BONE_IDX] == skeleton.NECK


def test_project_to_pixels():
    K = jnp.asarray([600.0, 610.0, 320.0, 240.0])
    pt = jnp.asarray([0.1, -0.2, 2.0])
    px = np.asarray(cameras.project_to_pixels(pt, K))
    np.testing.assert_allclose(px, [600 * 0.05 + 320, 610 * -0.1 + 240])
