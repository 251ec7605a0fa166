"""The O(P)-depth victim-major merge sweeps must match the reference's
sequential lexicographic pair loop exactly (reference
skeleton_3d_triang_mult_node.cpp:984-996, pose_prior_mult_node.cpp:869-903).

Oracles below ARE the pair loop, in NumPy float64, run on adversarial dense
clusters (merge chains, multi-victim keepers) at both small P (unrolled
branch) and large P (lax.scan branch).
"""

import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu import fusion, tracking
from smartedgesensor3dhumanpose_tpu.config import FusionConfig, TrackerConfig
from smartedgesensor3dhumanpose_tpu.types import Persons3D

K = 21


def _pair_loop_merge_persons(xyz, score, cov, valid, thresh):
    """The reference's sequential pair sweep (merge loop :984-996 +
    calc_3D_dist :392-408 + merge_persons :410-423)."""
    xyz, score, cov, valid = (
        xyz.copy(), score.copy(), cov.copy(), valid.copy()
    )
    p = xyz.shape[0]
    for i in range(p):
        for j in range(i + 1, p):
            if not (valid[i] and valid[j]):
                continue
            ok = (score[i] > 0) & (score[j] > 0)
            n = ok.sum()
            if n == 0:
                continue
            d = np.linalg.norm(xyz[i] - xyz[j], axis=-1)
            if d[ok].mean() >= thresh:
                continue
            tot = score[i] + score[j]
            any_s = tot > 0
            w = np.where(any_s, score[i] / np.where(any_s, tot, 1.0), 0.0)
            xyz[i] = np.where(
                any_s[:, None],
                w[:, None] * xyz[i] + (1 - w)[:, None] * xyz[j],
                xyz[i],
            )
            score[i] = np.where(any_s, np.maximum(score[i], score[j]), score[i])
            cov[i] = np.where(any_s[:, None, None], 0.5 * (cov[i] + cov[j]), cov[i])
            valid[j] = False
    return xyz, score, cov, valid


def _clustered_people(rng, p, n_clusters):
    """People piled into tight clusters so the sweep has chains and
    multi-victim keepers."""
    centers = rng.uniform(-3, 3, size=(n_clusters, 3))
    assign = rng.integers(0, n_clusters, size=p)
    xyz = centers[assign][:, None, :] + rng.normal(scale=0.03, size=(p, K, 3))
    score = rng.uniform(0.0, 1.0, size=(p, K))
    score[score < 0.25] = 0.0  # some unmeasured joints
    cov = np.broadcast_to(np.eye(3) * 1e-3, (p, K, 3, 3)).copy()
    cov += rng.uniform(0, 1e-4, size=(p, K, 1, 1))
    valid = rng.uniform(size=p) > 0.15
    return xyz, score, cov, valid


def test_merge_close_persons_matches_pair_loop():
    rng = np.random.default_rng(7)
    for p, n_clusters in [(6, 2), (12, 3), (12, 1), (24, 4), (40, 6)]:
        for trial in range(4):
            xyz, score, cov, valid = _clustered_people(rng, p, n_clusters)
            cfg = FusionConfig(max_hypotheses=p)
            persons = Persons3D(
                xyz=jnp.asarray(xyz),
                score=jnp.asarray(score),
                cov=jnp.asarray(cov),
                valid=jnp.asarray(valid),
                person_id=jnp.arange(p, dtype=jnp.int32),
            )
            got = fusion.merge_close_persons(persons, cfg)
            w_xyz, w_score, w_cov, w_valid = _pair_loop_merge_persons(
                xyz, score, cov, valid, cfg.merge_dist_thresh
            )
            np.testing.assert_array_equal(
                np.asarray(got.valid), w_valid,
                err_msg=f"p={p} clusters={n_clusters} trial={trial}",
            )
            np.testing.assert_allclose(
                np.asarray(got.xyz), w_xyz, atol=1e-12,
                err_msg=f"p={p} clusters={n_clusters} trial={trial}",
            )
            np.testing.assert_allclose(np.asarray(got.score), w_score, atol=1e-12)
            np.testing.assert_allclose(np.asarray(got.cov), w_cov, atol=1e-12)
            # Make the fixture non-trivial: at least one merge must happen
            # in the single-cluster case.
            if n_clusters == 1 and valid.sum() >= 2:
                assert np.asarray(got.valid).sum() < valid.sum()


def _pair_loop_merge_tracks(alive, track_id, world, est_exists, fid, pid,
                            has_dets, thresh):
    alive, fid, pid = alive.copy(), fid.copy(), pid.copy()
    t = alive.shape[0]
    for i in range(t):
        for j in range(i + 1, t):
            if not (alive[i] and alive[j] and has_dets):
                continue
            ok = est_exists[i] & est_exists[j]
            n = ok.sum()
            if n == 0:
                continue
            d = np.linalg.norm(world[i] - world[j], axis=-1)
            if d[ok].mean() >= thresh:
                continue
            alive[j] = False
            fid = np.where(fid == track_id[j], track_id[i], fid)
            pid = np.where(pid == track_id[j], track_id[i], pid)
    return alive, fid, pid


def test_merge_tracks_matches_pair_loop():
    rng = np.random.default_rng(3)
    cfg = TrackerConfig()
    for t, n_clusters in [(8, 2), (12, 1), (24, 3), (64, 8)]:
        for trial in range(3):
            world, score, _, alive = _clustered_people(rng, t, n_clusters)
            est_exists = score > 0
            track_id = np.arange(100, 100 + t, dtype=np.int32)
            fid = rng.choice(track_id, size=t).astype(np.int32)
            pid = rng.choice(track_id, size=t).astype(np.int32)
            height = np.ones(t)
            root = np.zeros((t, 3))
            persons = Persons3D(
                xyz=jnp.zeros((t, K, 3)),
                score=jnp.asarray(score),
                cov=jnp.zeros((t, K, 3, 3)),
                valid=jnp.asarray(alive),
                person_id=jnp.asarray(fid),
            )
            persons_pred = persons._replace(person_id=jnp.asarray(pid))
            got_alive, got_f, got_p = tracking._merge_tracks(
                jnp.asarray(alive), jnp.asarray(track_id),
                jnp.asarray(world), jnp.asarray(est_exists),
                jnp.asarray(height), jnp.asarray(root),
                persons, persons_pred, jnp.asarray(True), cfg,
            )
            w_alive, w_f, w_p = _pair_loop_merge_tracks(
                alive, track_id, world, est_exists, fid, pid, True,
                cfg.merge_dist_thresh,
            )
            np.testing.assert_array_equal(np.asarray(got_alive), w_alive)
            np.testing.assert_array_equal(np.asarray(got_f.person_id), w_f)
            np.testing.assert_array_equal(np.asarray(got_p.person_id), w_p)
