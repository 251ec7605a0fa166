"""Per-stage pipeline profiler (dispatch-defogged wall times).

The reference self-measures with per-node wall-time accumulators dumped at
shutdown (skeleton_3d_triang_mult_node.cpp:39-41,1234-1241 — reproduced by
`timing.TimingBuckets`). This module is the development-facing complement:
it times each OFFLINE pipeline stage in isolation on the current backend —
fusion (association + triangulation), cold-start LM smoothing, the
sequential tracker, reprojection feedback — plus the fused end-to-end
program, using pipelined repetitions (dispatch all reps, block once) so the
number reported is device time, not host-dispatch latency.

The stage bodies mirror `pipeline.Pipeline._scan_impl` exactly (same chunked
`lax.map` batching, same TPU kernel dispatch rules); `full` is the real
`run_offline`, so `full` vs the stage sum also exposes what XLA fusion
across stage boundaries buys.

CLI:
    python -m smartedgesensor3dhumanpose_tpu.profiling            # 16-cam demo
    python -m smartedgesensor3dhumanpose_tpu.profiling --big      # 64-cam hall
    python -m smartedgesensor3dhumanpose_tpu.profiling --json
"""

from __future__ import annotations

import time
from typing import Dict

import jax

from smartedgesensor3dhumanpose_tpu import pipeline as pl
from smartedgesensor3dhumanpose_tpu import fusion, reprojection, tracking
from smartedgesensor3dhumanpose_tpu.config import PipelineConfig
from smartedgesensor3dhumanpose_tpu.types import Frame


def _timeit(fn, *args, reps: int) -> float:
    """Seconds per call: warm once, then pipeline `reps` dispatches and
    block on all of them (see bench.py's methodology note)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


def profile_stages(
    pipe: pl.Pipeline, frames: Frame, reps: int = 5
) -> Dict[str, float]:
    """Time each offline stage of `pipe` on `frames`.

    Returns {stage: milliseconds per frame}; stages are `fuse`,
    `smooth_cold`, `tracker`, `reproj`, and `full` (= run_offline, the
    number bench.py's throughput derives from).
    """
    config = pipe.config
    rig = pipe.rig
    batch = pipe._fusion_batch
    num_frames = int(frames.cam_stamp.shape[0])

    fusion_cfg = config.fusion  # fusion.associate resolves the TPU impl

    def fuse_one(frame):
        frame, pivot = pl.mask_stale_cameras(frame, fusion_cfg.max_sync_diff)
        persons, n_drop = fusion.fuse_frame(
            frame, rig, fusion_cfg, unroll_cameras=True, with_stats=True
        )
        return persons, pivot, n_drop

    stage_fuse = jax.jit(
        lambda fr: jax.lax.map(fuse_one, fr, batch_size=batch)
    )
    stage_smooth = jax.jit(
        lambda p: jax.lax.map(
            lambda q: tracking.smooth_cold(q, config.prior),
            p,
            batch_size=batch,
        )
    )

    p_slots = config.fusion.max_hypotheses
    t_slots = config.tracker.max_tracks
    use_tracker_kernel = (
        jax.default_backend() == "tpu" and p_slots <= t_slots <= 128
    )
    if use_tracker_kernel:
        from smartedgesensor3dhumanpose_tpu.ops import tracker_pallas

        stage_track = jax.jit(
            lambda s, p, pv, fb, pr: tracker_pallas.tracker_scan(
                s, p, pv, fb, pr, config.prior, config.tracker
            )
        )
    else:
        def _track_scan(s, p, pv, fb, pr):
            def body(carry, xs):
                person_t, pivot_t, fb_t, pre_t = xs
                return tracking.step(
                    carry,
                    person_t,
                    pivot_t.astype(person_t.xyz.dtype),
                    fb_t,
                    config.prior,
                    config.tracker,
                    precomputed=pre_t,
                )

            return jax.lax.scan(body, s, (p, pv, fb, pr))

        stage_track = jax.jit(_track_scan)

    @jax.jit
    def stage_reproj(fused_pred, pred_dt, ts):
        def one(pred_t, delta_t, ts_t):
            return reprojection.reproject(
                pred_t,
                rig,
                config.prior.pose_method,
                delta_t,
                ut_kappa=config.fusion.ut_kappa,
                ts_per_cam=ts_t,
            )

        return jax.vmap(one)(fused_pred, pred_dt, ts)

    state = pipe.init_state()
    per_frame_ms = {}

    persons, pivots, _ = stage_fuse(frames)
    per_frame_ms["fuse"] = _timeit(stage_fuse, frames, reps=reps)

    pre = stage_smooth(persons)
    per_frame_ms["smooth_cold"] = _timeit(stage_smooth, persons, reps=reps)

    _, track_outs = stage_track(state, persons, pivots, frames.fb_delay, pre)
    per_frame_ms["tracker"] = _timeit(
        stage_track, state, persons, pivots, frames.fb_delay, pre, reps=reps
    )

    per_frame_ms["reproj"] = _timeit(
        stage_reproj,
        track_outs.fused_pred,
        track_outs.pred_delta_t,
        frames.cam_stamp,
        reps=reps,
    )

    per_frame_ms["full"] = _timeit(
        pipe.run_offline, pipe.init_state(), frames, reps=reps
    )

    return {k: v / num_frames * 1e3 for k, v in per_frame_ms.items()}


def _demo_inputs(big: bool, batch: int | None, num_frames: int | None):
    from smartedgesensor3dhumanpose_tpu.config import (
        FusionConfig,
        TrackerConfig,
    )
    from smartedgesensor3dhumanpose_tpu.io import synthetic

    if big:
        f = num_frames or 128
        cams, people = 64, 25
        config = PipelineConfig.scaled_64cam()
        batch = batch or 4
    else:
        f = num_frames or 256
        cams, people = 16, 6
        config = PipelineConfig(
            fusion=FusionConfig(
                num_cameras=16,
                max_dets_per_cam=6,
                max_hypotheses=12,
                max_epipolar_error=0.045,
            ),
            tracker=TrackerConfig(max_tracks=12),
        )
        batch = batch or 128
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=cams, num_people=people, num_frames=f, seed=1
        )
    )
    data = synthetic.frames_from_scene(scene)
    frames = Frame.from_arrays(data)
    return pl.Pipeline(scene["rig"], config, fusion_batch=batch), frames


def main(argv=None) -> None:
    import argparse
    import json

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--big", action="store_true",
                   help="64-camera x 25-person scaled hall")
    p.add_argument("--batch", type=int, default=None,
                   help="fusion chunk size (defaults per config)")
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--json", action="store_true", help="one JSON line")
    args = p.parse_args(argv)

    pipe, frames = _demo_inputs(args.big, args.batch, args.frames)
    stages = profile_stages(pipe, frames, reps=args.reps)
    if args.json:
        print(json.dumps(
            {"config": "64x25" if args.big else "16x6",
             "unit": "ms/frame", **{k: round(v, 4) for k, v in stages.items()}}
        ))
    else:
        for k, v in stages.items():
            print(f"{k:>12}: {v:8.4f} ms/frame")
        fps = 1e3 / stages["full"]
        print(f"{'throughput':>12}: {fps:8.1f} frames/s")


if __name__ == "__main__":
    main()
