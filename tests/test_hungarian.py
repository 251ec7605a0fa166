import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment as scipy_lsa

from smartedgesensor3dhumanpose_tpu.ops.hungarian import linear_sum_assignment


def check_against_scipy(cost):
    got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    rows, cols = scipy_lsa(cost)
    want_total = cost[rows, cols].sum()
    # Our solution must be a valid assignment...
    assigned = got >= 0
    assert assigned.sum() == min(cost.shape)
    used_cols = got[assigned]
    assert len(np.unique(used_cols)) == len(used_cols)
    # ...achieving the optimal total (assignments may differ under ties).
    got_total = cost[np.nonzero(assigned)[0], used_cols].sum()
    np.testing.assert_allclose(got_total, want_total, rtol=1e-9, atol=1e-9)


def test_square_random(rng):
    for n in (1, 2, 3, 5, 8, 16):
        for _ in range(5):
            check_against_scipy(rng.uniform(size=(n, n)))


def test_rectangular(rng):
    for shape in ((2, 5), (5, 2), (1, 7), (7, 1), (16, 9), (3, 16)):
        for _ in range(5):
            check_against_scipy(rng.uniform(size=shape))


def test_degenerate_uniform_costs():
    # All-equal costs (e.g. an all-veto MAX_COSTS matrix).
    cost = np.full((4, 6), 1e3)
    check_against_scipy(cost)


def test_mixed_large_placeholders(rng):
    cost = rng.uniform(size=(6, 6))
    cost[rng.uniform(size=(6, 6)) < 0.4] = 1e3  # clipped placeholder costs
    check_against_scipy(cost)


def test_integer_like_ties():
    cost = np.array([[1.0, 1.0, 2.0], [1.0, 2.0, 1.0], [2.0, 1.0, 1.0]])
    check_against_scipy(cost)


def test_jit_and_grad_free(rng):
    cost = rng.uniform(size=(5, 5))
    f = jax.jit(linear_sum_assignment)
    got = np.asarray(f(jnp.asarray(cost)))
    rows, cols = scipy_lsa(cost)
    np.testing.assert_allclose(
        cost[np.arange(5), got].sum(), cost[rows, cols].sum(), rtol=1e-9
    )


def test_float32(rng):
    cost = rng.uniform(size=(8, 8)).astype(np.float32)
    got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    rows, cols = scipy_lsa(cost.astype(np.float64))
    np.testing.assert_allclose(
        cost[np.arange(8), got].sum(),
        cost[rows, cols].sum(),
        rtol=1e-5,
    )
