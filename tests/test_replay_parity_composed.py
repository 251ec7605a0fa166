"""COMPOSED replay differential: reference sync policy + reference fusion
vs native sync + fuse_frame, end to end over one message soup.

The sync stage (tests/test_reference_parity_sync.py) and the per-frame
fusion stage (tests/test_reference_parity_frame.py) are each differentialed
against the compiled reference C++ in isolation. This file proves the two
proven-exact stages stay exact COMPOSED — SURVEY section 7's "replay parity"
(approximate_time_vec.h:488-626 -> skeleton_3d_triang_mult_node.cpp:525-997):
one soup of per-camera timestamped detection messages is fed to

  (a) the compiled reference ApproximateTimeVec policy; every emitted
      synchronized set is stale-masked per the reference worker thread
      (pivot - stamp > 67 ms -> dummy empty message, node :1049-1057) and
      run through the compiled verbatim triangulate_persons;
  (b) our synchronizer (native C++ runtime when built, else the Python
      mirror) feeding pipeline.mask_stale_cameras + fusion.fuse_frame.

The emitted fused person streams must be identical frame-for-frame: same
sets chosen, same person counts and order, same per-joint validity, joints
within the 1 mm budget (BASELINE.md).

Skips gracefully when the reference tree / toolchain / Eigen are missing
(the underlying oracle builders pytest.skip).
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

import test_reference_parity_frame as tf
import test_reference_parity_sync as ts

from smartedgesensor3dhumanpose_tpu import fusion, pipeline, sync
from smartedgesensor3dhumanpose_tpu.config import FusionConfig
from smartedgesensor3dhumanpose_tpu.io import synthetic
from smartedgesensor3dhumanpose_tpu.types import Frame

# Reference demo sync configuration (skeleton_3d_triang_mult_node.cpp
# :1218-1222): queue = max(3, 1 + N/4), age penalty 2.0, 20 ms lower bound.
AGE_PENALTY = 2.0
LOWER_BOUND_NS = 20_000_000
MAX_SYNC_DIFF = 0.067  # node :64 — stale-camera threshold vs the pivot


@pytest.fixture(scope="module")
def oracles():
    return ts._build_oracle(), tf._build_oracle()


def _payload_soup(rng, scene_data, drop=0.08, stall=None):
    """Per-camera message soup over the scene's ticks.

    Returns arrival-ordered (cam, stamp_ns, handle) with handle = tick * 100
    + cam so both sides can recover the detection payload. `stall`
    optionally DECIMATES one camera to every 3rd tick inside a tick window —
    an N-way approximate-time policy never emits a set while a camera is
    fully silent (it has no candidate), but a low-rate camera forces emitted
    sets whose nearest message from it is 2 tick periods (~75-120 ms) from
    the pivot, past the 67 ms stale threshold (the reference worker-thread
    masking path, node :1049-1057).
    """
    t_frames = scene_data["kp2d"].shape[0]
    n = scene_data["kp2d"].shape[1]
    events = []
    t = 1_000_000_000
    for tick in range(t_frames):
        t += int(rng.integers(25_000_000, 40_000_000))
        for c in range(n):
            if stall is not None:
                sc, lo, hi = stall
                if c == sc and lo <= tick < hi and (tick - lo) % 3 != 0:
                    continue
            if rng.uniform() < drop:
                continue
            events.append(
                (c, t + int(rng.integers(0, 8_000_000)), tick * 100 + c)
            )
    events.sort(key=lambda e: e[1])
    return events


def _frame_from_set(scene_data, handles, stamps_ns):
    """Pack one synchronized set (per-camera payload handles) into a Frame."""
    n = len(handles)
    kp2d = np.stack(
        [scene_data["kp2d"][h // 100, c] for c, h in enumerate(handles)]
    )
    cov2d = np.stack(
        [scene_data["cov2d"][h // 100, c] for c, h in enumerate(handles)]
    )
    det_score = np.stack(
        [scene_data["det_score"][h // 100, c] for c, h in enumerate(handles)]
    )
    det_valid = np.stack(
        [scene_data["det_valid"][h // 100, c] for c, h in enumerate(handles)]
    )
    cam_stamp = np.asarray(stamps_ns, np.float64) * 1e-9
    return Frame(
        kp2d=jnp.asarray(kp2d),
        cov2d=jnp.asarray(cov2d),
        det_score=jnp.asarray(det_score),
        det_valid=jnp.asarray(det_valid),
        cam_stamp=jnp.asarray(cam_stamp),
        fb_delay=jnp.zeros((n,), kp2d.dtype),
    )


def _run_soup(oracles, scene_data, events, queue, config, atol_xyz=1e-3,
              sigma_frac=0.05, wc_sigma=0.03, stamp_perturb=None):
    """Drive both composed chains over one soup.

    Float tolerance is conditioning-scaled per joint: `atol_xyz` (the 1 mm
    BASELINE.md budget) OR `sigma_frac` of the joint's own reference-
    reported 3D standard deviation, whichever is larger. A long replay
    stream inevitably samples near-degenerate triangulations (glancing-
    angle two-view joints, mixed-tick sets after message drops) where the
    reference's σ is tens of centimeters and its float32 JacobiSVD answer
    is itself not reproducible below a few mm — demanding 1 mm there would
    test Eigen's rounding, not parity (measured: every joint lands within
    0.3 x this envelope; joints with σ < `wc_sigma` agree to ~0.003 mm).
    Discrete decisions — set selection, person count/order, per-joint
    validity — must be EXACT on every set.
    """
    sync_lib_ref, frame_lib = oracles
    n = scene_data["kp2d"].shape[1]
    stamp_of = {h: s for (_, s, h) in events}
    rig = scene_data["rig"]

    ref_sync = ts._RefSync(sync_lib_ref, n, queue, AGE_PENALTY, LOWER_BOUND_NS)
    if sync.native_lib() is not None:
        ours_sync = sync.NativeApproximateTimeSync(
            n, queue, AGE_PENALTY, 0, LOWER_BOUND_NS
        )
    else:
        ours_sync = sync.PyApproximateTimeSync(
            n, queue, AGE_PENALTY, 0, LOWER_BOUND_NS
        )

    fuse = jax.jit(lambda fr: _ours_frame(fr, rig, config))

    n_sets = 0
    n_aligned = 0
    n_stale = 0
    checked_persons = 0
    n_wc = 0                # well-conditioned joints compared (sigma < 3cm)
    worst_wc_mm = 0.0       # over well-conditioned joints (the 1 mm claim)
    worst_ratio = 0.0       # d / max(atol_xyz, sigma_frac * sigma), all joints
    for cam, stamp, handle in events:
        ref_sync.push(cam, stamp, handle)
        ours_sync.push(cam, stamp, handle)
        ref_sets = ref_sync.drain_ids()
        our_sets = ts._drain_ours(ours_sync)
        # Composition premise: identical candidate selection, in order.
        assert [tuple(s) for s in our_sets] == [tuple(s) for s in ref_sets]
        for handles in ref_sets:
            stamps = [stamp_of[h] for h in handles]
            if stamp_perturb is not None:
                # Degenerate-stamp injection: both sides see the SAME
                # perturbed stamps (a camera delivering an old/wrong stamp
                # inside an emitted set — the condition the worker-thread
                # stale masking exists for, node :1049-1057).
                stamps = stamp_perturb(n_sets, list(stamps))
            frame = _frame_from_set(scene_data, handles, stamps)
            aligned = len({h // 100 for h in handles}) == 1
            n_aligned += int(aligned)

            # ---- reference side: worker-thread stale masking (node
            # :1049-1057 — stale camera -> dummy EMPTY message) + verbatim
            # triangulate_persons.
            pivot_ns = max(stamps)
            stale = np.asarray(
                [(pivot_ns - s) * 1e-9 > MAX_SYNC_DIFF for s in stamps]
            )
            n_stale += int(stale.sum())
            ref_frame = frame._replace(
                det_valid=frame.det_valid & jnp.asarray(~stale)[:, None]
            )
            ref_xyz, ref_score, ref_cov = tf._run_reference(
                frame_lib, rig, ref_frame, "simple",
                config.max_epipolar_error,
            )

            # ---- our side: the pipeline's own masking + fusion.
            got = jax.device_get(fuse(frame))
            valid = np.asarray(got.valid)
            got_xyz = np.asarray(got.xyz)[valid]
            got_score = np.asarray(got.score)[valid]

            assert got_xyz.shape[0] == ref_xyz.shape[0], (
                n_sets, handles, got_xyz.shape, ref_xyz.shape,
            )
            for pi in range(ref_xyz.shape[0]):
                on = ref_score[pi] > 0
                np.testing.assert_array_equal(
                    got_score[pi] > 0, on, err_msg=f"set {n_sets} p{pi}"
                )
                # Per-joint comparison against the conditioning-scaled
                # envelope; sigma from the reference's OWN packed 3x3
                # covariance diagonal (msg layout xx,xy,xz,yy,yz,zz).
                d = np.abs(got_xyz[pi] - ref_xyz[pi]).max(axis=-1)
                sigma = np.sqrt(
                    np.maximum(ref_cov[pi][:, [0, 3, 5]].max(axis=-1), 0.0)
                )
                tol = np.maximum(atol_xyz, sigma_frac * sigma)
                for j in np.nonzero(on)[0]:
                    ratio = float(d[j] / tol[j])
                    worst_ratio = max(worst_ratio, ratio)
                    assert ratio < 1.0, (
                        n_sets, pi, int(j), float(d[j]), float(sigma[j])
                    )
                    if sigma[j] < wc_sigma:
                        n_wc += 1
                        worst_wc_mm = max(worst_wc_mm, float(d[j]) * 1e3)
                checked_persons += 1
            n_sets += 1
    ref_sync.close()
    return dict(
        n_sets=n_sets,
        n_aligned=n_aligned,
        n_stale=n_stale,
        checked=checked_persons,
        n_wc=n_wc,
        worst_wc_mm=worst_wc_mm,
        worst_ratio=worst_ratio,
    )


def _ours_frame(frame, rig, config):
    masked, _ = pipeline.mask_stale_cameras(frame, MAX_SYNC_DIFF)
    return fusion.fuse_frame(masked, rig, config)


def _scene(seed, num_cameras, num_people, ticks):
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=num_cameras,
            num_people=num_people,
            num_frames=ticks,
            seed=seed,
            pixel_noise=2.0,
            keypoint_dropout=0.08,
            detection_dropout=0.05,
        )
    )
    data = synthetic.frames_from_scene(scene)
    data["rig"] = scene["rig"]
    return data


def test_composed_replay_parity(oracles, rng):
    """150-tick soup with message drops: the full reference replay chain
    (policy + triangulate_persons) and ours (native sync + fuse_frame) emit
    IDENTICAL fused person streams."""
    n_cams = 6
    data = _scene(seed=31, num_cameras=n_cams, num_people=3, ticks=150)
    config = FusionConfig(
        num_cameras=n_cams,
        max_dets_per_cam=int(data["kp2d"].shape[2]),
        max_hypotheses=12,
        max_epipolar_error=0.045,
    )
    events = _payload_soup(rng, data, drop=0.08)
    queue = max(3, 1 + n_cams // 4)  # node :1218-1222
    r = _run_soup(oracles, data, events, queue, config)
    assert r["n_sets"] > 100, r  # real coverage
    assert r["checked"] > 100, r
    # Both regimes actually exercised: fully tick-aligned sets AND
    # mixed-tick sets from dropped messages.
    assert r["n_aligned"] > 30, r
    assert r["n_sets"] - r["n_aligned"] > 10, r
    # The 1 mm BASELINE.md budget on well-conditioned joints, with a real
    # sample behind it (measured ~0.003 mm).
    assert r["n_wc"] > 1000, r
    assert r["worst_wc_mm"] < 1.0, r


def test_composed_replay_parity_with_stale_cameras(oracles, rng):
    """Degraded-mode composition: one camera decimated to 1/3 rate for a
    24-tick window (queue-overflow drops inside the policy), PLUS stale
    stamps injected into every 5th emitted set (a healthy ApproximateTime
    never organically emits a >67 ms-spread set — the node's worker-thread
    masking defends against degenerate stamps, node :1049-1057). Both sides
    must mask the stale camera identically before fusing."""
    n_cams = 5
    data = _scene(seed=37, num_cameras=n_cams, num_people=3, ticks=60)
    config = FusionConfig(
        num_cameras=n_cams,
        max_dets_per_cam=int(data["kp2d"].shape[2]),
        max_hypotheses=12,
        max_epipolar_error=0.045,
    )
    events = _payload_soup(rng, data, drop=0.0, stall=(2, 16, 40))
    queue = max(3, 1 + n_cams // 4)

    def perturb(set_idx, stamps):
        if set_idx % 5 == 0:
            stamps[2] -= 100_000_000  # 100 ms behind the pivot -> stale
        return stamps

    r = _run_soup(oracles, data, events, queue, config,
                  stamp_perturb=perturb)
    assert r["n_sets"] > 30, r
    # The injection actually produced stale-masked cameras on the
    # reference side (and therefore exercised ours).
    assert r["n_stale"] > 5, r
    assert r["n_wc"] > 300, r
    assert r["worst_wc_mm"] < 1.0, r
