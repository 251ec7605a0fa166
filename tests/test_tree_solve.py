"""Tree-structured block solver vs dense linear algebra."""

import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu import skeleton as sk
from smartedgesensor3dhumanpose_tpu.ops import tree_solve as ts


def random_tree_system(rng, p=4):
    k, b = sk.NUM_FUSION_JOINTS, sk.NUM_BONES
    hdiag = np.zeros((p, k, 3, 3))
    for pi in range(p):
        for ki in range(k):
            a = rng.normal(size=(3, 3))
            hdiag[pi, ki] = a @ a.T + 3 * np.eye(3)
    u = rng.normal(size=(p, b, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    w = rng.uniform(0.5, 2.0, size=(p, b))
    coup = -w[..., None, None] * np.einsum("pbi,pbj->pbij", u, u)
    act = rng.uniform(size=(p, b)) < 0.7
    # NECK's two parent bones are mutually exclusive in real graphs.
    both = act[:, 14] & act[:, 20]
    act[both, 20] = False
    for pi in range(p):
        for bi in range(b):
            if act[pi, bi]:
                i, j = int(sk.BONE_I[bi]), int(sk.BONE_J[bi])
                uu = w[pi, bi] * np.outer(u[pi, bi], u[pi, bi])
                hdiag[pi, i] += uu
                hdiag[pi, j] += uu
    rhs = rng.normal(size=(p, k, 3))
    return hdiag, coup, act, rhs


def dense_reference(hdiag, coup, act, rhs):
    p, k = hdiag.shape[:2]
    xs, sigmas = [], []
    for pi in range(p):
        h = np.zeros((3 * k, 3 * k))
        for ki in range(k):
            h[3 * ki : 3 * ki + 3, 3 * ki : 3 * ki + 3] = hdiag[pi, ki]
        for bi in range(sk.NUM_BONES):
            if act[pi, bi]:
                i, j = int(sk.BONE_I[bi]), int(sk.BONE_J[bi])
                h[3 * i : 3 * i + 3, 3 * j : 3 * j + 3] = coup[pi, bi]
                h[3 * j : 3 * j + 3, 3 * i : 3 * i + 3] = coup[pi, bi].T
        xs.append(np.linalg.solve(h, rhs[pi].reshape(-1)).reshape(k, 3))
        hinv = np.linalg.inv(h)
        sigmas.append(
            np.stack(
                [hinv[3 * ki : 3 * ki + 3, 3 * ki : 3 * ki + 3] for ki in range(k)]
            )
        )
    return np.stack(xs), np.stack(sigmas)


def test_tree_solve_matches_dense(rng):
    hdiag, coup, act, rhs = random_tree_system(rng)
    x, sigma = ts.tree_solve(
        jnp.asarray(hdiag), jnp.asarray(coup), jnp.asarray(act),
        jnp.asarray(rhs), want_sigma=True,
    )
    want_x, want_s = dense_reference(hdiag, coup, act, rhs)
    np.testing.assert_allclose(np.asarray(x), want_x, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sigma), want_s, atol=1e-10)


def test_tree_solve_levels_matches_dense(rng):
    for p in (1, 4, 9):
        hdiag, coup, act, rhs = random_tree_system(rng, p=p)
        x, sigma = ts.tree_solve_levels(
            jnp.asarray(hdiag), jnp.asarray(coup), jnp.asarray(act),
            jnp.asarray(rhs), want_sigma=True,
        )
        want_x, want_s = dense_reference(hdiag, coup, act, rhs)
        np.testing.assert_allclose(np.asarray(x), want_x, atol=1e-10)
        np.testing.assert_allclose(np.asarray(sigma), want_s, atol=1e-10)


def test_tree_solve_levels_cover_all_bones():
    got = np.sort(np.concatenate([lvl for lvl in ts.LEVELS]))
    np.testing.assert_array_equal(got, np.arange(sk.NUM_BONES))


def test_elimination_order_is_children_first():
    order = ts.ELIMINATION_ORDER.tolist()
    eliminated = set()
    for b in order:
        child = int(sk.BONE_J[b])
        # Every bone whose PARENT is this child must already be done.
        for b2 in range(sk.NUM_BONES):
            if int(sk.BONE_I[b2]) == child:
                assert b2 in eliminated, (b, b2)
        eliminated.add(b)
