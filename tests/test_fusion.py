import jax
import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu import cameras, fusion, skeleton
from smartedgesensor3dhumanpose_tpu.config import FusionConfig
from smartedgesensor3dhumanpose_tpu.io import synthetic
from smartedgesensor3dhumanpose_tpu.types import Frame


def make_frame(scene, t):
    return Frame(
        kp2d=jnp.asarray(scene["kp2d"][t]),
        cov2d=jnp.asarray(scene["cov2d"][t]),
        det_score=jnp.asarray(scene["det_score"][t]),
        det_valid=jnp.asarray(scene["det_valid"][t]),
        cam_stamp=jnp.asarray(scene["cam_stamp"][t]),
        fb_delay=jnp.asarray(scene["fb_delay"][t]),
    )


def match_to_gt(
    persons_xyz, persons_score, persons_valid, gt, to_fusion, max_dist=0.5
):
    """Greedy-match fused persons to ground truth; return per-GT best error
    (inf for unmatched). Matches farther than max_dist are rejected so a
    missing person does not steal another's skeleton."""
    valid_idx = np.nonzero(persons_valid)[0]
    errs = []
    used = set()
    for g in range(gt.shape[0]):
        best, best_p = np.inf, None
        for p in valid_idx:
            if p in used:
                continue
            sc = persons_score[p][to_fusion]
            ok = sc > 0
            if ok.sum() < 5:
                continue
            e = np.linalg.norm(
                persons_xyz[p][to_fusion][ok] - gt[g][ok], axis=-1
            ).mean()
            if e < best:
                best, best_p = e, p
        if best_p is not None and best < max_dist:
            used.add(best_p)
            errs.append(best)
        else:
            errs.append(np.inf)
    return np.array(errs), used


def test_fuse_frame_recovers_people():
    cfg = synthetic.SceneConfig(
        num_cameras=16, num_people=6, num_frames=3, pixel_noise=1.0, seed=3
    )
    scene = synthetic.generate_scene(cfg)
    fcfg = FusionConfig(num_cameras=16, max_dets_per_cam=6, max_hypotheses=12)
    to_fusion = np.asarray(skeleton.SIMPLE_MODEL.to_fusion)

    fuse = jax.jit(
        lambda fr: fusion.fuse_frame(fr, scene["rig"], fcfg),
        static_argnums=(),
    )
    for t in range(3):
        persons = fuse(make_frame(scene, t))
        xyz = np.asarray(persons.xyz)
        score = np.asarray(persons.score)
        valid = np.asarray(persons.valid)
        errs, used = match_to_gt(xyz, score, valid, scene["gt_xyz"][t], to_fusion)
        # Every ground-truth person recovered to centimeter accuracy.
        assert np.all(np.isfinite(errs)), f"frame {t}: unmatched GT person"
        assert errs.max() < 0.05, f"frame {t}: errors {errs}"
        # No spurious extra persons.
        assert valid.sum() == cfg.num_people, (
            f"frame {t}: {valid.sum()} persons vs {cfg.num_people} GT"
        )


def test_fuse_frame_noise_free_mm_accuracy():
    cfg = synthetic.SceneConfig(
        num_cameras=16,
        num_people=4,
        num_frames=1,
        pixel_noise=0.0,
        keypoint_dropout=0.0,
        detection_dropout=0.0,
        seed=5,
    )
    scene = synthetic.generate_scene(cfg)
    # Noise-free covariances are zero; give a nominal 1px sigma.
    scene["cov2d"][..., 0] = np.where(scene["kp2d"][..., 2] > 0, 1.0, 0.0)
    scene["cov2d"][..., 2] = np.where(scene["kp2d"][..., 2] > 0, 1.0, 0.0)
    fcfg = FusionConfig(num_cameras=16, max_dets_per_cam=4, max_hypotheses=8)
    to_fusion = np.asarray(skeleton.SIMPLE_MODEL.to_fusion)
    persons = fusion.fuse_frame(make_frame(scene, 0), scene["rig"], fcfg)
    errs, _ = match_to_gt(
        np.asarray(persons.xyz),
        np.asarray(persons.score),
        np.asarray(persons.valid),
        scene["gt_xyz"][0],
        to_fusion,
    )
    assert errs.max() < 1e-3  # sub-millimeter on noise-free input


def test_fuse_frame_f32_matches_f64():
    """The fixed-shape program must agree between dtypes (sanity for TPU)."""
    cfg = synthetic.SceneConfig(
        num_cameras=8, num_people=3, num_frames=1, pixel_noise=1.0, seed=7
    )
    scene = synthetic.generate_scene(cfg)
    fcfg = FusionConfig(num_cameras=8, max_dets_per_cam=4, max_hypotheses=8)

    def run(dtype):
        rig = scene["rig"]
        rig = rig._replace(
            K=rig.K.astype(dtype),
            P=rig.P.astype(dtype),
            F=rig.F.astype(dtype),
            image_size=rig.image_size.astype(dtype),
        )
        fr = make_frame(scene, 0)
        fr = fr._replace(
            kp2d=fr.kp2d.astype(dtype),
            cov2d=fr.cov2d.astype(dtype),
            det_score=fr.det_score.astype(dtype),
            fb_delay=fr.fb_delay.astype(dtype),
        )
        return fusion.fuse_frame(fr, rig, fcfg)

    p32 = run(jnp.float32)
    p64 = run(jnp.float64)
    np.testing.assert_array_equal(np.asarray(p32.valid), np.asarray(p64.valid))
    v = np.asarray(p64.valid)
    sc64 = np.asarray(p64.score)[v]
    xyz_err = np.abs(np.asarray(p32.xyz)[v] - np.asarray(p64.xyz)[v])
    assert xyz_err[sc64 > 0].max() < 1e-3


def test_dropped_cameras_are_tolerated():
    cfg = synthetic.SceneConfig(
        num_cameras=16, num_people=3, num_frames=1, pixel_noise=1.0, seed=11
    )
    scene = synthetic.generate_scene(cfg)
    # Knock out 10 of 16 cameras entirely.
    scene["det_valid"][:, 6:] = False
    fcfg = FusionConfig(num_cameras=16, max_dets_per_cam=4, max_hypotheses=8)
    to_fusion = np.asarray(skeleton.SIMPLE_MODEL.to_fusion)
    persons = fusion.fuse_frame(make_frame(scene, 0), scene["rig"], fcfg)
    errs, _ = match_to_gt(
        np.asarray(persons.xyz),
        np.asarray(persons.score),
        np.asarray(persons.valid),
        scene["gt_xyz"][0],
        to_fusion,
    )
    assert np.isfinite(errs).all()
    assert errs.max() < 0.05


def test_single_camera_yields_nothing():
    cfg = synthetic.SceneConfig(
        num_cameras=16, num_people=2, num_frames=1, seed=13
    )
    scene = synthetic.generate_scene(cfg)
    scene["det_valid"][:, 1:] = False
    fcfg = FusionConfig(num_cameras=16, max_dets_per_cam=4, max_hypotheses=8)
    persons = fusion.fuse_frame(make_frame(scene, 0), scene["rig"], fcfg)
    assert not np.asarray(persons.valid).any()


def test_merge_close_persons():
    fcfg = FusionConfig()
    k = skeleton.NUM_FUSION_JOINTS
    xyz = np.zeros((3, k, 3))
    score = np.zeros((3, k))
    cov = np.tile(np.eye(3) * 0.01, (3, k, 1, 1))
    # Person 0 and 1 nearly coincide; person 2 is far away.
    xyz[0, :, :] = np.linspace(0, 1, k)[:, None]
    xyz[1] = xyz[0] + 0.05
    xyz[2] = xyz[0] + 5.0
    score[:] = 0.8
    score[1] *= 0.5  # person 1 weaker
    from smartedgesensor3dhumanpose_tpu.types import Persons3D

    persons = Persons3D(
        xyz=jnp.asarray(xyz),
        score=jnp.asarray(score),
        cov=jnp.asarray(cov),
        valid=jnp.asarray([True, True, True]),
        person_id=jnp.asarray([-1, -1, -1], jnp.int32),
    )
    merged = fusion.merge_close_persons(persons, fcfg)
    valid = np.asarray(merged.valid)
    assert valid.tolist() == [True, False, True]
    # Score-weighted merge: (0.8*x0 + 0.4*x1) / 1.2.
    want = (0.8 * xyz[0] + 0.4 * xyz[1]) / 1.2
    np.testing.assert_allclose(np.asarray(merged.xyz)[0], want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(merged.score)[0], 0.8, rtol=1e-6)
