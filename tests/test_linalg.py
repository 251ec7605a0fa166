import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu.ops import linalg


def test_eigh4_matches_numpy(rng):
    a = rng.normal(size=(64, 4, 4))
    a = a + np.swapaxes(a, -1, -2)
    w, v = linalg.eigh4(jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    w_np = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.sort(w, axis=-1), w_np, rtol=1e-10, atol=1e-10)
    # Eigenvector property: A v = w v.
    av = np.einsum("bij,bjk->bik", a, v)
    wv = w[:, None, :] * v
    np.testing.assert_allclose(av, wv, atol=1e-9)


def test_smallest_eigvec4(rng):
    a = rng.normal(size=(32, 4, 4))
    a = np.einsum("bij,bkj->bik", a, a)  # PSD
    vec = np.asarray(linalg.smallest_eigvec4(jnp.asarray(a)))
    w_np, v_np = np.linalg.eigh(a)
    expected = v_np[..., 0]
    # Compare up to sign.
    dots = np.abs(np.einsum("bi,bi->b", vec, expected))
    np.testing.assert_allclose(dots, 1.0, atol=1e-9)


def test_chol2x2_packed(rng):
    l_true = np.abs(rng.normal(size=(16, 3))) + 0.1
    cov = np.stack(
        [
            l_true[:, 0] ** 2,
            l_true[:, 0] * l_true[:, 1],
            l_true[:, 1] ** 2 + l_true[:, 2] ** 2,
        ],
        axis=-1,
    )
    l = np.asarray(linalg.chol2x2_packed(jnp.asarray(cov)))
    np.testing.assert_allclose(l, l_true, rtol=1e-12)
    # Zero (masked) input stays finite.
    l0 = np.asarray(linalg.chol2x2_packed(jnp.zeros((3,))))
    assert np.all(np.isfinite(l0)) and np.all(l0 == 0)


def test_chol3x3(rng):
    a = rng.normal(size=(8, 3, 3))
    cov = np.einsum("bij,bkj->bik", a, a) + 0.01 * np.eye(3)
    l = np.asarray(linalg.chol3x3(jnp.asarray(cov)))
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", l, l), cov, rtol=1e-10, atol=1e-12
    )
    l0 = np.asarray(linalg.chol3x3(jnp.zeros((3, 3))))
    assert np.all(np.isfinite(l0)) and np.all(l0 == 0)


def test_sym3_pack_roundtrip(rng):
    a = rng.normal(size=(5, 3, 3))
    a = a + np.swapaxes(a, -1, -2)
    packed = linalg.sym3_pack(jnp.asarray(a))
    restored = np.asarray(linalg.sym3_unpack(packed))
    np.testing.assert_allclose(restored, a, rtol=1e-15)
