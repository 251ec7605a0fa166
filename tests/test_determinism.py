"""Determinism under jit/vmap/scan (SURVEY.md section 4 test plan item d)."""

import jax
import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu import pipeline
from smartedgesensor3dhumanpose_tpu.io import synthetic
from test_pipeline import scene_frames, small_config


def _setup():
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=8, num_people=2, num_frames=6, seed=77
        )
    )
    cfg = small_config(8, 2)
    return scene, cfg, scene_frames(scene)


def test_offline_replay_is_bitwise_deterministic():
    scene, cfg, frames = _setup()
    pipe = pipeline.Pipeline(scene["rig"], cfg)
    state = pipe.init_state(dtype=jnp.float64)
    _, a = pipe.run_offline(state, frames)
    _, b = pipe.run_offline(state, frames)
    for name in ("persons_raw", "fused", "fused_pred"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name).xyz), np.asarray(getattr(b, name).xyz)
        )
    np.testing.assert_array_equal(
        np.asarray(a.feedback.kp2d), np.asarray(b.feedback.kp2d)
    )


def test_online_steps_match_offline_scan():
    """The per-frame jitted step threads state identically to the scan.

    Fusion outputs are bit-identical; the fused skeletons agree to the LM
    convergence tolerance (the offline scan cold-starts the batched LM, see
    tracking.smooth_cold and test_pipeline's dedicated equivalence test).
    """
    scene, cfg, frames = _setup()
    pipe = pipeline.Pipeline(scene["rig"], cfg)
    state = pipe.init_state(dtype=jnp.float64)
    _, offline = pipe.run_offline(state, frames)

    st = state
    for t in range(6):
        fr = jax.tree.map(lambda a: a[t], frames)
        st, out = pipe.step(st, fr)
        np.testing.assert_array_equal(
            np.asarray(out.persons_raw.xyz),
            np.asarray(offline.persons_raw.xyz[t]),
            err_msg=f"frame {t}",
        )
        np.testing.assert_allclose(
            np.asarray(out.fused.xyz),
            np.asarray(offline.fused.xyz[t]),
            atol=1e-3,  # the BASELINE.md parity budget (1 mm)
            err_msg=f"frame {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(out.fused.person_id),
            np.asarray(offline.fused.person_id[t]),
        )
