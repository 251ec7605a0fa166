"""Approximate-time synchronizer: behavioral tests + native/Python
differential testing."""

import numpy as np
import pytest

from smartedgesensor3dhumanpose_tpu import sync


def both_impls(n, queue_size=3, age_penalty=2.0, lb=20_000_000):
    impls = [sync.PyApproximateTimeSync(n, queue_size, age_penalty, 0, lb)]
    if sync.native_lib() is not None:
        impls.append(
            sync.NativeApproximateTimeSync(n, queue_size, age_penalty, 0, lb)
        )
    return impls


def drain(s):
    out = []
    while True:
        got = s.pop()
        if got is None:
            return out
        out.append(got)


def test_perfectly_aligned_streams():
    for s in both_impls(4):
        for t in range(5):
            for c in range(4):
                s.push(c, t * 33_000_000, t * 10 + c)
        sets = drain(s)
        # All but the last tick can be emitted (the algorithm waits for the
        # next message to prove optimality).
        assert len(sets) >= 4
        for k, (stamps, handles) in enumerate(sets):
            assert len(set(stamps)) == 1  # perfectly aligned
            assert handles == [k * 10 + c for c in range(4)]


def test_jittered_streams_group_correctly(rng):
    n = 8
    period = 33_000_000
    for s in both_impls(n, queue_size=3):
        for t in range(20):
            for c in range(n):
                stamp = t * period + int(rng.integers(0, 4_000_000))
                s.push(c, stamp, t * 100 + c)
        sets = drain(s)
        assert len(sets) >= 17
        for stamps, handles in sets:
            # Every set groups messages of one tick: same tick id.
            ticks = {h // 100 for h in handles}
            assert len(ticks) == 1, f"mixed ticks {ticks}"
            assert max(stamps) - min(stamps) < 5_000_000


def test_native_matches_python(rng):
    if sync.native_lib() is None:
        pytest.skip("native runtime not built")
    n = 5
    py = sync.PyApproximateTimeSync(n, 3, 2.0, 0, 20_000_000)
    cc = sync.NativeApproximateTimeSync(n, 3, 2.0, 0, 20_000_000)
    # Random message soup: jitter, drops, bursts.
    events = []
    t = 0
    for tick in range(200):
        t += int(rng.integers(25_000_000, 40_000_000))
        for c in range(n):
            if rng.uniform() < 0.05:
                continue  # dropped message
            events.append((c, t + int(rng.integers(0, 8_000_000)), tick * 10 + c))
    # Deliver in near-arrival order with some reordering across streams.
    events.sort(key=lambda e: e[1])
    py_sets, cc_sets = [], []
    for c, stamp, h in events:
        py.push(c, stamp, h)
        cc.push(c, stamp, h)
        py_sets.extend(drain(py))
        cc_sets.extend(drain(cc))
    assert len(py_sets) > 100
    assert py_sets == cc_sets


def test_queue_overflow_drops_oldest():
    for s in both_impls(2, queue_size=3):
        # Stream 1 silent; stream 0 floods -> old messages dropped, no sets.
        for t in range(10):
            s.push(0, t * 33_000_000, t)
        assert s.ready() == 0
        # Stream 1 wakes up at t=9: only recent stream-0 messages remain.
        s.push(1, 9 * 33_000_000, 900)
        s.push(1, 10 * 33_000_000, 1000)
        s.push(0, 10 * 33_000_000, 10)
        s.push(1, 11 * 33_000_000, 1100)
        s.push(0, 11 * 33_000_000, 11)
        sets = drain(s)
        assert len(sets) >= 1
        stamps, handles = sets[0]
        assert max(stamps) - min(stamps) <= 33_000_000


def test_make_synchronizer_reference_config():
    s = sync.make_synchronizer(16)
    # queue_size = max(3, 1 + 16/4) = 5 (reference :1219).
    if isinstance(s, sync.PyApproximateTimeSync):
        assert s.queue_size == 5
    for t in range(3):
        for c in range(16):
            s.push(c, t * 66_000_000 + c * 1_000_000, t * 100 + c)
    assert s.ready() >= 1
