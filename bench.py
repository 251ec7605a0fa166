"""Benchmark: fused 3D skeleton frames/sec on the 16-cam x 6-person demo.

Replays a synthetic hall sequence (the reference's poses2D_16cam.bag
equivalent, io.synthetic) through the full pipeline — association,
triangulation + UT covariance, LM smoothing, tracking/prediction, per-camera
reprojection feedback — as one compiled lax.scan on the available device.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": fps/500}
vs_baseline is the ratio to the 500 fps single-chip north-star target
(BASELINE.md). Additional context fields (p50 step latency, device) ride
along in the same line.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

# Persistent compilation cache: the bench compiles ~10 large programs
# (offline scan, online chain, per-frame step, scaled config, 2x parity
# fuse); on the remote-compile TPU service that is minutes of pure compile
# per run. The cache keys on HLO, so repeat runs (driver rounds, local
# iteration) skip straight to execution. Harmless if the backend does not
# support executable serialization — jax falls back to compiling.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from smartedgesensor3dhumanpose_tpu import pipeline as pl
    from smartedgesensor3dhumanpose_tpu.config import (
        FusionConfig,
        PipelineConfig,
        TrackerConfig,
    )
    from smartedgesensor3dhumanpose_tpu.io import synthetic
    from smartedgesensor3dhumanpose_tpu.types import Frame

    num_frames = 256
    scene = synthetic.generate_scene(
        synthetic.SceneConfig(
            num_cameras=16, num_people=6, num_frames=num_frames, seed=42
        )
    )
    config = PipelineConfig(
        fusion=FusionConfig(
            num_cameras=16,
            max_dets_per_cam=6,
            max_hypotheses=12,
            max_epipolar_error=0.045,
        ),
        tracker=TrackerConfig(max_tracks=12),
    )
    data = synthetic.frames_from_scene(scene)
    frames = Frame.from_arrays(data)

    # fusion_batch=128 measured fastest for the 16-cam demo (256-frame
    # sequence in two chunks; the full-sequence chunk loses to HBM pressure).
    pipe = pl.Pipeline(scene["rig"], config, fusion_batch=128)
    state = pipe.init_state()

    # ---- offline throughput (compile + 1 warm run, then timed runs).
    # Sustained-throughput timing: issue all reps asynchronously and block
    # once at the end, so the host dispatch of rep i+1 overlaps the device
    # execution of rep i — the steady-state of a continuous replay stream.
    # (In this sandbox each dispatch crosses a remote tunnel, ~25 ms; a
    # blocking per-rep loop would charge that latency to every rep.)
    final_state, outs = pipe.run_offline(state, frames)
    jax.block_until_ready(outs)
    n_rep = 5
    t0 = time.perf_counter()
    all_outs = []
    for _ in range(n_rep):
        _, outs = pipe.run_offline(state, frames)
        all_outs.append(outs)
    # Block on EVERY rep's outputs, not just the last: on a multi-stream /
    # multi-device runtime an earlier independent rep could still be in
    # flight when the last one completes (costs nothing on single device).
    jax.block_until_ready(all_outs)
    del all_outs
    dt = (time.perf_counter() - t0) / n_rep
    fps = num_frames / dt

    # ---- accuracy vs the scene's ground truth: mean per-joint position
    # error of the published (tracked + LM-smoothed) skeletons, greedy-
    # matched to GT people per frame (metrics.py), plus the qualifying
    # accounting the paper reports alongside it — PCK@0.15, the unmatched-GT
    # miss rate, and scored-joint coverage (a fragment skeleton matching on
    # its easy joints shows up here, not in MPJPE). Evaluated after the
    # tracker's publish gate has warmed (> min_num_obs frames). Host-side
    # NumPy on outputs the throughput runs already produced.
    from smartedgesensor3dhumanpose_tpu import metrics, skeleton

    ev = metrics.evaluate_sequence(
        outs.fused.xyz,
        outs.fused.score,
        outs.fused.valid,
        scene["gt_xyz"],  # [T, G, 17, 3]
        # Derived from the pipeline config (not hardcoded SIMPLE_MODEL) so a
        # pose_method switch cannot silently mis-map GT joints (demo.py:300).
        to_fusion=np.asarray(
            skeleton.input_model(config.fusion.pose_method).to_fusion
        ),
        start=num_frames // 4,
    )
    joint_errs = ev.joint_errors
    mpjpe_mm = (
        round(metrics.mpjpe(joint_errs) * 1e3, 3) if joint_errs.size else None
    )
    pck_015 = (
        round(metrics.pck(joint_errs, 0.15), 4) if joint_errs.size else None
    )
    miss_rate = round(ev.miss_rate, 4) if ev.n_gt else None
    joint_coverage = round(ev.coverage, 4) if ev.n_matched else None

    # ---- online p50 step latency (wall clock, includes host dispatch; in
    # this sandbox the remote-dispatch tunnel dominates it)
    frame0 = jax.tree.map(lambda a: a[0], frames)
    st, out = pipe.step(state, frame0)
    jax.block_until_ready(out)
    lat = []
    for i in range(30):
        fr = jax.tree.map(lambda a: a[i % num_frames], frames)
        t0 = time.perf_counter()
        st, out = pipe.step(st, fr)
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat) * 1e3)

    # ---- live synced-loop latency: per-camera messages -> native
    # ApproximateTimeSync -> latest-wins slot -> device step, ONE process
    # (the reference's actual topology, skeleton_3d_triang_mult_node.cpp
    # :999-1025,1216-1224). e2e = newest-contributing-message arrival ->
    # step done; like p50_step it includes this sandbox's remote-dispatch
    # tunnel, so report both and let p50_device above carry the device cost.
    e2e_ms_p50 = None
    sync_drop_stats = None
    try:
        import tempfile

        from smartedgesensor3dhumanpose_tpu import online
        from smartedgesensor3dhumanpose_tpu.io import replay as replay_lib

        live_scene = synthetic.generate_scene(
            synthetic.SceneConfig(
                num_cameras=16, num_people=6, num_frames=64, seed=43
            )
        )
        with tempfile.TemporaryDirectory() as td:
            live_path = f"{td}/live.jsonl"
            replay_lib.save_jsonl(live_path, live_scene)
            msgs = list(replay_lib.load_jsonl_messages(live_path))
        # pipe.step is warm from the latency loop above (same shapes).
        _, _, live_report = online.run_online_synced(
            pipe.step,
            pipe.init_state(),
            msgs,
            num_cameras=16,
            max_dets=6,
            message_interval_s=1.0 / (30.0 * 16),  # 30 Hz sensors x 16 cams
        )
        e2e_ms_p50 = round(live_report.e2e_ms_p50, 3)
        sync_drop_stats = {
            "frames_synced": live_report.frames_synced,
            "processed": live_report.processed_frames,
            "slot_dropped": live_report.slot_dropped,
        }
    except Exception as e:  # context metric; record, never fail the bench
        e2e_ms_p50 = f"error: {type(e).__name__}: {e}"

    # ---- on-device step time: the SAME online per-frame step chained in
    # one compiled scan — zero per-call dispatch, so wall/K is the genuine
    # device cost of a step (the defensible latency number; the per-call
    # p50 above is 90% environment here).
    # One wall-clock window still carries ONE remote-dispatch round trip
    # (tens of ms through this sandbox's tunnel), so amortize it over the
    # longest chain the bench scene allows and take the min over a few
    # calls — at k_dev=64 the tunnel alone added a run-to-run ~0.5-0.8
    # ms/step swing to this metric.
    k_dev = frames.cam_stamp.shape[0]  # 256: full bench scene
    sub = frames
    # NOTE: the chain jit DONATES its state argument on TPU
    # (pipeline.Pipeline._chain, donate_argnums=(0,)), so the state must be
    # rebuilt per call — reusing one across calls hits a deleted buffer
    # (TPU INVALID_ARGUMENT). The init transfer is amortized over k_dev
    # frames here, unlike the per-rep run_offline loops below.
    st2, outs2 = pipe.run_per_frame_chain(pipe.init_state(), sub)
    jax.block_until_ready(outs2)
    device_step_ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st2, outs2 = pipe.run_per_frame_chain(pipe.init_state(), sub)
        jax.block_until_ready(outs2)
        device_step_ms = min(
            device_step_ms, (time.perf_counter() - t0) / k_dev * 1e3
        )

    # ---- scaled 64-camera x 25-person hall (context metric; the headline
    # stays the 16-cam demo the 500 fps target refers to).
    scaled_fps = None
    scaled_error = None
    try:
        # 256-frame window: with depth-1 pipelining below, the one
        # unhidden ~25 ms remote-dispatch falls to <0.03 ms/frame, so the
        # number measures the device, not this sandbox's tunnel.
        s_frames = 256
        s_scene = synthetic.generate_scene(
            synthetic.SceneConfig(
                num_cameras=64, num_people=25, num_frames=s_frames, seed=1
            )
        )
        s_config = PipelineConfig.scaled_64cam()
        s_data = synthetic.frames_from_scene(s_scene)
        sf = Frame.from_arrays(s_data)
        # fusion_batch=4 measured fastest for the 64-cam config (the larger
        # chunks' HBM working set outweighs the launch amortization there).
        s_pipe = pl.Pipeline(s_scene["rig"], s_config, fusion_batch=4)
        s_state = s_pipe.init_state()
        _, s_out = s_pipe.run_offline(s_state, sf)
        jax.block_until_ready(s_out)
        t0 = time.perf_counter()
        # Depth-1 pipelining: dispatch rep i+1 before blocking rep i, so the
        # ~25 ms remote-dispatch tunnel of this sandbox overlaps device
        # execution (at 256 frames x ~2 ms it is otherwise ~5% of the
        # measured budget), while never keeping more than TWO reps'
        # workspaces live (unbounded in-flight 64-cam x 25-person runs risk
        # device OOM surfacing as a spurious scaled_error).
        n_scaled_rep = 4
        prev = None
        for _ in range(n_scaled_rep):
            _, s_out = s_pipe.run_offline(s_state, sf)
            if prev is not None:
                jax.block_until_ready(prev)
            prev = s_out
        jax.block_until_ready(prev)
        scaled_fps = round(
            s_frames / ((time.perf_counter() - t0) / n_scaled_rep), 2
        )
    except Exception as e:  # context metric only; never fail the bench —
        # but record the failure so a scaled regression is visible in the
        # artifact instead of a silent null.
        scaled_error = f"{type(e).__name__}: {e}"
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)

    # ---- adversarial throughput: the same 16-cam pipeline under ghost
    # detections + identity swaps + correlated occlusions (io/synthetic.py
    # knobs, mirroring the reference's veto accumulation stress,
    # skeleton_3d_triang_mult_node.cpp:344-381). The association kernel's
    # early-exit JV cannot skip work here, so this is the stressed
    # counterpart of the benign headline fps.
    adversarial_fps = None
    a_out = None  # reused by the adversarial parity artifact below
    try:
        import parity as parity_lib

        a_scene, a_data, a_config = parity_lib._full_scene_and_config(True)
        a_frames = Frame.from_arrays(a_data)
        a_n = int(a_frames.cam_stamp.shape[0])
        a_pipe = pl.Pipeline(a_scene["rig"], a_config, fusion_batch=32)
        # One device-resident initial state reused across reps: init_state()
        # inside the rep loop would charge a host->device transfer (a full
        # remote-tunnel round trip in this sandbox) to every rep — an
        # isolated A/B with a warm compile cache measured 2427 vs 4079 fps
        # (1.7x under-reporting of the stressed throughput).
        a_state = a_pipe.init_state()
        _, a_out = a_pipe.run_offline(a_state, a_frames)
        jax.block_until_ready(a_out)
        t0 = time.perf_counter()
        a_outs = []
        for _ in range(n_rep):
            _, a_out = a_pipe.run_offline(a_state, a_frames)
            a_outs.append(a_out)
        jax.block_until_ready(a_outs)
        del a_outs
        adversarial_fps = round(a_n / ((time.perf_counter() - t0) / n_rep), 2)
    except Exception as e:
        adversarial_fps = f"error: {type(e).__name__}: {e}"

    # ---- scaled roofline: per-stage device ms/frame on the 64-cam hall
    # (profiling.py), recorded so the "where the time goes at scale" claim
    # is a driver-visible artifact rather than prose in STATUS.md.
    scaled_stage_ms = None
    try:
        from smartedgesensor3dhumanpose_tpu import profiling

        if scaled_error is None:
            s_stages = profiling.profile_stages(s_pipe, sf, reps=3)
            scaled_stage_ms = {k: round(v, 4) for k, v in s_stages.items()}
    except Exception as e:
        scaled_stage_ms = f"error: {type(e).__name__}: {e}"

    # ---- on-hardware parity artifacts (parity.py):
    #  - whole-frame fusion differential against the compiled reference C++
    #    on THIS backend (BASELINE.md's 1 mm budget is a claim about the TPU
    #    float32 path),
    #  - the FULL offline pipeline (Pallas association fold + single-launch
    #    tracker kernel + tree LM + reprojection) vs the forced-f64 CPU
    #    XLA-scan oracle: integer decisions exact, floats within budget —
    #    measured on the benign scene AND the adversarial one.
    parity = {}
    try:
        import parity as parity_lib

        parity = parity_lib.run_parity()
    except (KeyboardInterrupt, SystemExit):
        raise
    except BaseException as e:  # pytest-skip exceptions derive from BaseException
        parity = {"parity_error": f"{type(e).__name__}: {e}"}
    try:
        import parity as parity_lib

        parity.update(parity_lib.run_full_parity())
        # The adversarial-throughput section above already ran the exact
        # pipeline this differential needs (same scene/config/f32, the
        # fusion_batch=32 a_pipe); reuse its outputs instead of re-tracing
        # and re-running an identical 64-frame program on the device.
        parity.update(
            parity_lib.run_full_parity(
                adversarial=True, prefix="adversarial_parity", outs=a_out
            )
        )
    except (KeyboardInterrupt, SystemExit):
        raise
    except BaseException as e:
        parity["full_parity_error"] = f"{type(e).__name__}: {e}"

    result = {
        "metric": "fused_3d_skeleton_fps_16cam_6people",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 4),
        # Methodology marker: "pipelined" = reps dispatched asynchronously,
        # blocked once at the end (sustained-throughput timing, round 3+);
        # BENCH_r01/r02 used per-rep blocking and are not comparable.
        "timing": "pipelined",
        "mpjpe_mm": mpjpe_mm,
        "pck_0.15": pck_015,
        "gt_miss_rate": miss_rate,
        "joint_coverage": joint_coverage,
        "p50_step_latency_ms": round(p50_ms, 3),
        "p50_device_ms": round(device_step_ms, 3),
        "e2e_ms_p50": e2e_ms_p50,
        "adversarial_fps": adversarial_fps,
        "scaled_64cam_25people_fps": scaled_fps,
        "scaled_stage_ms": scaled_stage_ms,
        "device": str(jax.devices()[0]),
        "num_frames": num_frames,
    }
    if sync_drop_stats is not None:
        result["live_sync"] = sync_drop_stats
    if scaled_error is not None:
        result["scaled_error"] = scaled_error
    result.update(parity)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
