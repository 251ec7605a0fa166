import jax.numpy as jnp
import numpy as np
from scipy.optimize import least_squares

from smartedgesensor3dhumanpose_tpu import prior, skeleton
from smartedgesensor3dhumanpose_tpu.config import PriorConfig
from smartedgesensor3dhumanpose_tpu.types import Persons3D

K = skeleton.NUM_FUSION_JOINTS


def make_person(rng, joints_present=None, noise=0.02):
    """A plausible 21-joint person in fusion layout (COCO-visible joints)."""
    base = np.zeros((K, 3))
    base[skeleton.NOSE] = (0.0, 0.05, 1.72)
    base[skeleton.REYE] = (0.03, 0.06, 1.75)
    base[skeleton.LEYE] = (-0.03, 0.06, 1.75)
    base[skeleton.REAR] = (0.07, 0.02, 1.73)
    base[skeleton.LEAR] = (-0.07, 0.02, 1.73)
    base[skeleton.RSHOULDER] = (0.18, 0.0, 1.52)
    base[skeleton.LSHOULDER] = (-0.18, 0.0, 1.52)
    base[skeleton.RELBOW] = (0.25, 0.02, 1.27)
    base[skeleton.LELBOW] = (-0.25, 0.02, 1.27)
    base[skeleton.RWRIST] = (0.27, 0.05, 1.03)
    base[skeleton.LWRIST] = (-0.27, 0.05, 1.03)
    base[skeleton.RHIP] = (0.10, 0.0, 1.0)
    base[skeleton.LHIP] = (-0.10, 0.0, 1.0)
    base[skeleton.RKNEE] = (0.11, 0.02, 0.55)
    base[skeleton.LKNEE] = (-0.11, 0.02, 0.55)
    base[skeleton.RANKLE] = (0.12, 0.04, 0.11)
    base[skeleton.LANKLE] = (-0.12, 0.04, 0.11)
    coco = [
        skeleton.NOSE, skeleton.REYE, skeleton.LEYE, skeleton.REAR,
        skeleton.LEAR, skeleton.RSHOULDER, skeleton.LSHOULDER,
        skeleton.RELBOW, skeleton.LELBOW, skeleton.RWRIST, skeleton.LWRIST,
        skeleton.RHIP, skeleton.LHIP, skeleton.RKNEE, skeleton.LKNEE,
        skeleton.RANKLE, skeleton.LANKLE,
    ]
    present = coco if joints_present is None else joints_present
    xyz = np.zeros((K, 3))
    score = np.zeros(K)
    cov = np.zeros((K, 3, 3))
    for j in present:
        xyz[j] = base[j] + rng.normal(size=3) * noise
        score[j] = rng.uniform(0.5, 1.0)
        s = rng.uniform(0.01, 0.03)
        cov[j] = np.eye(3) * s * s
    return xyz, score, cov


def pack_persons(people):
    n = len(people)
    xyz = np.stack([p[0] for p in people])
    score = np.stack([p[1] for p in people])
    cov = np.stack([p[2] for p in people])
    return Persons3D(
        xyz=jnp.asarray(xyz),
        score=jnp.asarray(score),
        cov=jnp.asarray(cov),
        valid=jnp.ones((n,), bool),
        person_id=-jnp.ones((n,), jnp.int32),
    )


def scipy_oracle(g_in, p_idx, cfg):
    """Solve the same factor graph with scipy least_squares (float64)."""
    active = np.asarray(g_in.active[p_idx])
    meas = np.asarray(g_in.meas[p_idx])
    inv_cov = np.asarray(g_in.inv_cov[p_idx])
    bone_active = np.asarray(g_in.bone_active[p_idx])
    bi, bj, blen, bsig = skeleton.bone_tables(
        cfg.normalize_by_height, cfg.effective_limb_sigma_factor
    )
    # Whitening square roots of the information matrices.
    sqrt_info = np.stack([np.linalg.cholesky(m).T for m in inv_cov])

    idx = np.nonzero(active)[0]
    pos_of = {j: i for i, j in enumerate(idx)}

    def residuals(z):
        x = z.reshape(-1, 3)
        r = []
        for i, j in enumerate(idx):
            r.append(sqrt_info[j] @ (x[i] - meas[j]))
        for b in range(len(bi)):
            if bone_active[b]:
                d = np.linalg.norm(x[pos_of[bi[b]]] - x[pos_of[bj[b]]])
                r.append(np.array([(d - blen[b]) / bsig[b]]))
        return np.concatenate(r)

    z0 = meas[idx].ravel()
    sol = least_squares(residuals, z0, method="lm", xtol=1e-14, ftol=1e-14)
    out = np.zeros((K, 3))
    out[idx] = sol.x.reshape(-1, 3)
    return out, active


TIGHT = dict(
    lm_absolute_error_tol=1e-12,
    lm_relative_error_tol=1e-12,
    lm_max_iterations=64,
)


def test_optimize_matches_scipy(rng):
    cfg = PriorConfig(**TIGHT)
    people = [make_person(rng, noise=0.03) for _ in range(3)]
    persons = pack_persons(people)
    g_in = prior.build_graph_inputs(persons, cfg)
    warm = g_in.meas  # cold start
    result = prior.optimize(g_in, warm, cfg)
    x = np.asarray(result.x)
    for p in range(3):
        want, active = scipy_oracle(g_in, p, cfg)
        err = np.linalg.norm(x[p][active] - want[active], axis=-1)
        assert err.max() < 1e-5, f"person {p}: max err {err.max()}"


def test_optimize_matches_scipy_height_normalized(rng):
    cfg = PriorConfig(normalize_by_height=True, **TIGHT)
    persons = pack_persons([make_person(rng, noise=0.02)])
    g_in = prior.build_graph_inputs(persons, cfg)
    result = prior.optimize(g_in, g_in.meas, cfg)
    want, active = scipy_oracle(g_in, 0, cfg)
    err = np.linalg.norm(np.asarray(result.x)[0][active] - want[active], axis=-1)
    assert err.max() < 1e-5
    # Height should be the neck-root distance, not 1.
    assert abs(float(g_in.height[0]) - 1.0) > 0.05


def test_root_is_pinned(rng):
    cfg = PriorConfig()
    persons = pack_persons([make_person(rng)])
    g_in = prior.build_graph_inputs(persons, cfg)
    result = prior.optimize(g_in, g_in.meas, cfg)
    # The root measurement sits at the origin with covariance shrunk by
    # 100^2 — the optimized root must stay within a fraction of a millimeter.
    root = np.asarray(result.x)[0, skeleton.MIDHIP]
    assert np.linalg.norm(root) < 5e-4


def test_marginals_match_inverse_hessian(rng):
    cfg = PriorConfig()
    persons = pack_persons([make_person(rng)])
    g_in = prior.build_graph_inputs(persons, cfg)
    result = prior.optimize(g_in, g_in.meas, cfg)
    assert bool(result.marg_ok[0]), "marginals must not fall back"
    marg = np.asarray(result.marg_cov)[0]
    active = np.asarray(g_in.active)[0]
    # Dense reference: assemble the full Hessian at the solution and invert.
    bi, bj, blen, bsig = skeleton.bone_tables(False, 1.0)
    import jax.numpy as jnp2

    h, _, _ = prior._linearize(
        result.x,
        g_in,
        jnp2.asarray(blen),
        jnp2.asarray(1.0 / bsig**2),
        jnp2.asarray(bi),
        jnp2.asarray(bj),
    )
    h_dense = np.asarray(h)[0].reshape(3 * K, 3 * K)
    h_inv = np.linalg.inv(h_dense)
    for j in range(K):
        np.testing.assert_allclose(marg[j], marg[j].T, atol=1e-10)
        want = h_inv[3 * j : 3 * j + 3, 3 * j : 3 * j + 3]
        np.testing.assert_allclose(marg[j], want, rtol=1e-5, atol=1e-10)
        if not active[j]:
            np.testing.assert_allclose(marg[j], np.eye(3), atol=1e-8)


def test_denormalize_and_output_scores(rng):
    cfg = PriorConfig()
    people = [make_person(rng)]
    persons = pack_persons(people)
    g_in = prior.build_graph_inputs(persons, cfg)
    result = prior.optimize(g_in, g_in.meas, cfg)
    xyz, cov = prior.denormalize(result, g_in, cfg)
    xyz = np.asarray(xyz)
    active = np.asarray(g_in.active)[0]
    # Denormalized root ~ measured hip mean.
    want_root = 0.5 * (
        people[0][0][skeleton.LHIP] + people[0][0][skeleton.RHIP]
    )
    np.testing.assert_allclose(xyz[0, skeleton.MIDHIP], want_root, atol=1e-3)
    # Optimized joints stay close to measurements (weak bone priors).
    err = np.linalg.norm(
        xyz[0][active] - np.asarray(persons.xyz)[0][active], axis=-1
    )
    # MidHip/Neck are synthesized; exclude from this comparison.
    mask = active.copy()
    mask[skeleton.MIDHIP] = False
    mask[skeleton.NECK] = False
    err2 = np.linalg.norm(
        xyz[0][mask] - np.asarray(persons.xyz)[0][mask], axis=-1
    )
    assert err2.max() < 0.10
    # Scores: max(min_score, raw).
    score_out = np.asarray(g_in.score_out)[0]
    raw = np.asarray(persons.score)[0]
    for j in np.nonzero(mask)[0]:
        np.testing.assert_allclose(
            score_out[j], max(cfg.min_score, raw[j]), rtol=1e-6
        )


def test_empty_person_is_skipped():
    cfg = PriorConfig()
    persons = Persons3D.empty(2, dtype=jnp.float64)
    g_in = prior.build_graph_inputs(persons, cfg)
    assert int(g_in.num_meas.sum()) == 0
    result = prior.optimize(g_in, g_in.meas, cfg)
    assert np.all(np.isfinite(np.asarray(result.x)))
    assert int(result.iters) <= 1


def test_spine_bone_gated_on_belly(rng):
    cfg = PriorConfig()
    # COCO person: Belly absent -> spine bone active.
    persons = pack_persons([make_person(rng)])
    g_in = prior.build_graph_inputs(persons, cfg)
    assert bool(g_in.bone_active[0, skeleton.SPINE_BONE_IDX])
    # H36M person with Belly present -> spine bone off.
    cfg_h = PriorConfig(pose_method="h36m")
    xyz, score, cov = make_person(rng)
    for j in (skeleton.MIDHIP, skeleton.NECK, skeleton.BELLY, skeleton.HEAD):
        xyz[j] = (0.0, 0.0, 1.2)
        score[j] = 0.9
        cov[j] = np.eye(3) * 4e-4
    g_h = prior.build_graph_inputs(pack_persons([(xyz, score, cov)]), cfg_h)
    assert not bool(g_h.bone_active[0, skeleton.SPINE_BONE_IDX])


def test_truncated_lm_is_start_dependent(rng):
    """Pin the non-convergence boundary of the warm/cold-start trade.

    The offline pipeline hoists the LM out of the frame scan with a cold
    start (tracking.smooth_cold), relying on converged runs being
    start-independent. On a frame where LM hits lm_max_iterations first,
    that equivalence legitimately breaks (reference behavior is the online
    warm start, setInitialState, pose_prior_mult_node.cpp:483-503). This
    documents both sides of the boundary at the prior level.
    """
    people = [make_person(rng, noise=0.03) for _ in range(3)]
    persons = pack_persons(people)

    # A warm start a track would plausibly supply: the measurements plus a
    # ~5 cm previous-frame offset on the active joints.
    cfg_probe = PriorConfig()
    g_in = prior.build_graph_inputs(persons, cfg_probe)
    bump = jnp.asarray(
        np.random.default_rng(7).normal(size=g_in.meas.shape) * 0.05
    )
    warm_x0 = jnp.where(g_in.active[..., None], g_in.meas + bump, 0.0)

    # Converged runs are start-independent (the basis of smooth_cold).
    cfg_full = PriorConfig(**TIGHT)
    cold_full = prior.optimize(g_in, g_in.meas, cfg_full)
    warm_full = prior.optimize(g_in, warm_x0, cfg_full)
    assert int(cold_full.iters) < cfg_full.lm_max_iterations
    d_full = np.abs(np.asarray(cold_full.x - warm_full.x))[
        np.asarray(g_in.active)
    ].max()
    assert d_full < 1e-6

    # Truncated runs hit the iteration ceiling without converging ...
    cfg_trunc = PriorConfig(
        lm_max_iterations=2,
        lm_absolute_error_tol=1e-12,
        lm_relative_error_tol=1e-12,
    )
    cold_t = prior.optimize(g_in, g_in.meas, cfg_trunc)
    warm_t = prior.optimize(g_in, warm_x0, cfg_trunc)
    assert int(cold_t.iters) == 2
    assert int(warm_t.iters) == 2
    # ... and their outputs are start-dependent: nonzero divergence, but
    # finite, and bounded by the initial 5 cm start separation (LM steps
    # contract toward the shared optimum from both sides).
    d_t = np.abs(np.asarray(cold_t.x - warm_t.x))[np.asarray(g_in.active)]
    assert np.all(np.isfinite(d_t))
    assert d_t.max() > 1e-5
    assert d_t.max() < 0.05
