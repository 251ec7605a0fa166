"""Online latest-wins execution: producer/consumer decoupling (P3).

The reference decouples its synchronizer callback thread from the compute
worker with a mutex+condvar latest-frame-wins handoff
(skeleton_3d_triang_mult_node.cpp:999-1006, 1008-1086): if triangulation
falls behind the sensor rate, backlogged frames are overwritten and only the
newest synchronized set is processed. Here the producer thread feeds
synchronized frames into the native `LatestSlot` (sync.py ctypes binding
over native/runtime.cpp) and the consumer loop drains it into the jitted
device step; drops are counted by the slot.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, List, NamedTuple, Optional

import jax
import numpy as np

from smartedgesensor3dhumanpose_tpu import sync as sync_lib


class OnlineReport(NamedTuple):
    processed_handles: List[int]   # frame indices actually stepped, in order
    dropped: int                   # backlog frames overwritten in the slot
    produced: int                  # frames offered by the producer
    step_ms_p50: float             # consumer device-step latency
    step_ms: List[float]           # per-step consumer latencies


def run_online(
    step_fn: Callable,
    state,
    frames,
    feed_interval_s: float,
    slot=None,
    consumer_hook: Optional[Callable[[int], None]] = None,
    prefer_native_slot: bool = True,
):
    """Replay `frames` (stacked Frame pytree) through a latest-wins loop.

    Args:
      step_fn: (state, frame) -> (state, out); the jitted pipeline step.
      frames: Frame pytree with a leading time axis.
      feed_interval_s: producer period (the sensor/sync output rate).
      slot: optional injected slot (for differential tests).
      consumer_hook: called once per processed frame with the handle —
        tests use this to slow the consumer and force drops.

    Returns:
      (final_state, last_out, OnlineReport)
    """
    n = int(frames.kp2d.shape[0])
    if slot is None:
        slot = sync_lib.make_latest_slot(1, prefer_native=prefer_native_slot)
    done = threading.Event()
    # Nanosecond stamps from the pivot (newest camera) time.
    stamps_ns = (
        np.asarray(jax.device_get(frames.cam_stamp)).max(axis=-1) * 1e9
    ).astype(np.int64)

    def producer():
        for i in range(n):
            slot.put([int(stamps_ns[i])], [i])
            time.sleep(feed_interval_s)
        done.set()

    th = threading.Thread(target=producer, daemon=True)

    processed: List[int] = []
    lat: List[float] = []
    out = None
    th.start()
    while True:
        got = slot.take()
        if got is None:
            if done.is_set():
                # done.set() happens after the final put, so one more take
                # drains a frame published between our empty take and the
                # done check; a second empty take means truly finished.
                got = slot.take()
                if got is None:
                    break
            else:
                time.sleep(feed_interval_s / 20.0)
                continue
        _, (handle,) = got
        handle = int(handle)
        fr = jax.tree.map(lambda a: a[handle], frames)
        t0 = time.perf_counter()
        state, out = step_fn(state, fr)
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
        processed.append(handle)
        if consumer_hook is not None:
            consumer_hook(handle)
    th.join()
    report = OnlineReport(
        processed_handles=processed,
        dropped=int(slot.dropped),
        produced=n,
        step_ms_p50=float(np.median(lat) * 1e3) if lat else 0.0,
        step_ms=[t * 1e3 for t in lat],
    )
    return state, out, report
