"""On-hardware parity artifact: whole-frame differential vs the compiled
reference C++, run on WHATEVER backend jax is currently on (the driver
environment pins the real TPU via JAX_PLATFORMS=axon).

The CI suite (tests/test_reference_parity_frame.py) runs the same
differential forced to CPU/float64; BASELINE.md's 1 mm budget is a claim
about the TPU float32 path, so bench.py calls `run_parity()` every round and
records `parity_worst_mm` in the bench JSON — a driver-visible artifact
instead of a one-off manual run.

Usage: `python parity.py` prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_TESTS = os.path.join(_HERE, "tests")


def run_parity(seeds=(11, 12), pose_methods=("simple", "h36m")) -> dict:
    """Run the whole-frame differential on the current backend.

    Returns {"parity_worst_mm": float, "parity_persons_checked": int,
    "parity_backend": str}. Raises on any failure (missing reference tree /
    toolchain / Eigen raise pytest-skip exceptions — callers catch and
    record).
    """
    if _TESTS not in sys.path:
        sys.path.insert(0, _TESTS)
    import jax
    import jax.tree_util
    import test_reference_parity_frame as tf

    from smartedgesensor3dhumanpose_tpu import fusion
    from smartedgesensor3dhumanpose_tpu.config import FusionConfig

    lib = tf._build_oracle()
    worst_m = 0.0
    checked = 0
    # One jitted fuse per pose_method: the per-seed scenes share shapes and
    # config, so re-wrapping jax.jit inside the seed loop would recompile
    # the identical program (minutes each on the remote-compile service).
    fuse_cache = {}
    for pose_method in pose_methods:
        for seed in seeds:
            rig, frames = tf._scene_frames(pose_method, seed=seed)
            c = int(np.asarray(rig.K).shape[0])
            config = FusionConfig(
                num_cameras=c,
                max_dets_per_cam=int(frames.kp2d.shape[2]),
                max_hypotheses=16,
                max_epipolar_error=0.045,
                pose_method=pose_method,
            )
            key = (pose_method, c, int(frames.kp2d.shape[2]))
            if key not in fuse_cache:
                fuse_cache[key] = jax.jit(
                    lambda fr, rg, config=config: fusion.fuse_frame(
                        fr, rg, config
                    )
                )
            fuse = functools.partial(fuse_cache[key], rg=rig)
            for ti in range(int(frames.kp2d.shape[0])):
                frame = jax.tree_util.tree_map(lambda a: a[ti], frames)
                ref_xyz, ref_score, _ = tf._run_reference(
                    lib, rig, frame, pose_method, config.max_epipolar_error
                )
                persons = jax.device_get(fuse(frame))
                valid = np.asarray(persons.valid)
                got_xyz = np.asarray(persons.xyz)[valid]
                got_score = np.asarray(persons.score)[valid]
                if got_xyz.shape[0] != ref_xyz.shape[0]:
                    raise AssertionError(
                        f"{pose_method} seed {seed} t{ti}: person count "
                        f"{got_xyz.shape[0]} vs reference {ref_xyz.shape[0]}"
                    )
                for pi in range(ref_xyz.shape[0]):
                    on = ref_score[pi] > 0
                    if not np.array_equal(got_score[pi] > 0, on):
                        raise AssertionError(
                            f"{pose_method} seed {seed} t{ti} p{pi}: "
                            "joint validity mismatch"
                        )
                    if on.any():
                        d = float(
                            np.abs(got_xyz[pi][on] - ref_xyz[pi][on]).max()
                        )
                        worst_m = max(worst_m, d)
                    checked += 1
    if checked < 8:
        raise AssertionError(f"only {checked} persons checked")
    return {
        "parity_worst_mm": round(worst_m * 1e3, 4),
        "parity_persons_checked": checked,
        "parity_backend": jax.default_backend(),
    }


if __name__ == "__main__":
    print(json.dumps(run_parity()))
