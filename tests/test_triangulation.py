import jax.numpy as jnp
import numpy as np

import oracles
from smartedgesensor3dhumanpose_tpu.ops import covariance, triangulation


def random_rig(rng, c=6):
    """Cameras on a ring looking at the origin."""
    P = np.zeros((c, 3, 4))
    for i in range(c):
        angle = 2 * np.pi * i / c + rng.normal() * 0.1
        center = np.array(
            [4.0 * np.cos(angle), 4.0 * np.sin(angle), 2.0 + rng.normal() * 0.3]
        )
        z = -center / np.linalg.norm(center)  # optical axis toward origin
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        r = np.stack([x, y, z])  # world->cam rotation
        P[i, :, :3] = r
        P[i, :, 3] = -r @ center
    return P


def project(P, xyz):
    h = P @ np.append(xyz, 1.0)
    return h[:2] / h[2]


def test_triangulate_exact(rng):
    P = random_rig(rng)
    pts = rng.normal(size=(10, 3)) * 0.5
    kp = np.zeros((10, 6, 3))
    for b in range(10):
        for c in range(6):
            kp[b, c, :2] = project(P[c], pts[b])
            kp[b, c, 2] = rng.uniform(0.4, 1.0)
    mask = np.ones((10, 6), bool)
    out = np.asarray(
        triangulation.triangulate(jnp.asarray(P), jnp.asarray(kp), jnp.asarray(mask))
    )
    np.testing.assert_allclose(out, pts, atol=1e-8)


def test_triangulate_matches_oracle_noisy(rng):
    P = random_rig(rng, c=5)
    for weight in (True, False):
        for trial in range(5):
            xyz = rng.normal(size=3) * 0.4
            kp = np.zeros((5, 3))
            for c in range(5):
                kp[c, :2] = project(P[c], xyz) + rng.normal(size=2) * 0.01
                kp[c, 2] = rng.uniform(0.35, 1.0)
            mask = rng.uniform(size=5) > 0.3
            while mask.sum() < 2:
                mask = rng.uniform(size=5) > 0.3
            got = np.asarray(
                triangulation.triangulate(
                    jnp.asarray(P),
                    jnp.asarray(kp),
                    jnp.asarray(mask),
                    weight_by_conf=weight,
                )
            )
            want = oracles.dlt_triangulate(
                P[mask], kp[mask], weight_by_conf=weight
            )
            # The adjugate nullvector's error floor is (eigengap)^-iters;
            # sub-micrometer agreement is far beyond the 1 mm parity target.
            np.testing.assert_allclose(got, want, atol=1e-6)


def test_triangulate_f32_noiseless_precision(rng):
    """The single-pass f32 solve on exact projections must stay far inside
    the 1 mm parity budget (the final pipeline positions are this solve —
    the reference publishes the base/leave-one-out DLT solution verbatim,
    see tests/test_reference_parity_frame.py)."""
    P = random_rig(rng, c=8)
    pts = rng.normal(size=(20, 3)) * 1.5
    kp = np.zeros((20, 8, 3))
    for b in range(20):
        for c in range(8):
            kp[b, c, :2] = project(P[c], pts[b])
            kp[b, c, 2] = rng.uniform(0.4, 1.0)
    mask = np.ones((20, 8), bool)
    out = np.asarray(
        triangulation.triangulate(
            jnp.asarray(P, jnp.float32),
            jnp.asarray(kp, jnp.float32),
            jnp.asarray(mask),
        )
    )
    err = np.linalg.norm(out - pts, axis=-1)
    assert err.max() < 1e-4  # meters; f32 normal-equation floor


def test_reprojection_error_matches_oracle(rng):
    P = random_rig(rng, c=4)
    xyz = rng.normal(size=3) * 0.3
    kp = np.zeros((4, 3))
    for c in range(4):
        kp[c, :2] = project(P[c], xyz) + rng.normal(size=2) * 0.02
        kp[c, 2] = rng.uniform(0.3, 1.0)
    mask = np.array([True, True, False, True])
    got = float(
        triangulation.reprojection_error(
            jnp.asarray(xyz), jnp.asarray(P), jnp.asarray(kp), jnp.asarray(mask)
        )
    )
    want = oracles.reprojection_error(xyz, P[mask], kp[mask])
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_triangulation_covariance_matches_oracle(rng):
    P = random_rig(rng, c=5)
    xyz = rng.normal(size=3) * 0.3
    kp = np.zeros((5, 3))
    cov = np.zeros((5, 3))
    for c in range(5):
        kp[c, :2] = project(P[c], xyz) + rng.normal(size=2) * 0.005
        kp[c, 2] = rng.uniform(0.4, 1.0)
        sx, sy = rng.uniform(1e-3, 5e-3, size=2)
        rho = rng.uniform(-0.5, 0.5)
        cov[c] = [sx * sx, rho * sx * sy, sy * sy]
    mask = np.array([True, False, True, True, True])

    mean = np.asarray(
        triangulation.triangulate(jnp.asarray(P), jnp.asarray(kp), jnp.asarray(mask))
    )
    got = np.asarray(
        covariance.triangulation_covariance(
            jnp.asarray(P),
            jnp.asarray(kp),
            jnp.asarray(cov),
            jnp.asarray(mask),
            jnp.asarray(mean),
        )
    )
    want = oracles.triangulation_covariance(
        P[mask], kp[mask], cov[mask], mean
    )
    np.testing.assert_allclose(got, want, atol=1e-10)
    # Symmetric PSD sanity.
    np.testing.assert_allclose(got, got.T, atol=1e-14)
    assert np.all(np.linalg.eigvalsh(got) > -1e-12)


def test_project_with_covariance_matches_oracle(rng):
    P = random_rig(rng, c=3)
    K = np.array([[600.0, 610.0, 320.0, 240.0]] * 3)
    xyz = rng.normal(size=3) * 0.3
    a = rng.normal(size=(3, 3)) * 0.05
    cov3d = a @ a.T + 0.001 * np.eye(3)
    mean_px, cov_px = covariance.project_with_covariance(
        jnp.asarray(xyz), jnp.asarray(cov3d), jnp.asarray(P), jnp.asarray(K)
    )
    mean_px, cov_px = np.asarray(mean_px), np.asarray(cov_px)
    for c in range(3):
        want_mean, want_cov = oracles.project_with_covariance(
            xyz, cov3d, P[c], K[c]
        )
        np.testing.assert_allclose(mean_px[c], want_mean, rtol=1e-9)
        np.testing.assert_allclose(
            cov_px[c],
            [want_cov[0, 0], want_cov[0, 1], want_cov[1, 1]],
            rtol=1e-7,
            atol=1e-10,
        )
