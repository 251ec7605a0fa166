import numpy as np

from smartedgesensor3dhumanpose_tpu import monitor


def test_frame_guards():
    m = monitor.PipelineMonitor(emit_log=False)
    # First frame: always processed, no history.
    assert m.check_frame(np.array([1.0, 1.0, 1.0]))
    # Normal advance.
    assert m.check_frame(np.array([1.033, 1.033, 1.033]))
    assert m.summary() == {}
    # Large delay warning.
    assert m.check_frame(np.array([1.4, 1.4, 1.4]))
    assert m.summary() == {"large_frame_delay": 1}
    # Backwards in time: skip verdict, last_stamp unchanged.
    assert not m.check_frame(np.array([1.3, 1.3, 1.3]))
    assert m.summary()["non_monotonic_frame"] == 1
    assert m.last_stamp == 1.4


def test_stale_camera_event():
    m = monitor.PipelineMonitor(emit_log=False)
    m.check_frame(np.array([2.0, 2.0, 1.9, 2.0]))  # cam 2 lags 100 ms
    s = m.summary()
    assert s["stale_camera_removed"] == 1
    ev = [e for e in m.events if e.kind == "stale_camera_removed"][0]
    assert ev.data["camera"] == 2


class _Fake:
    pass


def _fake_out(valid, person_id, n_dropped_hyp=0, n_dropped_trk=0):
    out = _Fake()
    out.fused = _Fake()
    out.fused.valid = np.asarray(valid)
    out.fused.person_id = np.asarray(person_id)
    out.n_dropped_hypotheses = np.int32(n_dropped_hyp)
    out.n_dropped_track_spawns = np.int32(n_dropped_trk)
    return out


def test_track_published_events():
    m = monitor.PipelineMonitor(emit_log=False)
    out = _fake_out([True, False, True], [0, -1, 3])
    m.check_output(out)
    m.check_output(out)  # no duplicates
    assert m.summary() == {"track_published": 2}


def test_overflow_events():
    m = monitor.PipelineMonitor(emit_log=False)
    m.check_output(_fake_out([False], [-1]))  # clean frame: no events
    assert m.summary() == {}
    m.check_output(_fake_out([False], [-1], n_dropped_hyp=3))
    m.check_output(_fake_out([False], [-1], n_dropped_trk=2))
    s = m.summary()
    assert s["hypothesis_overflow"] == 1
    assert s["track_overflow"] == 1
    ev = [e for e in m.events if e.kind == "hypothesis_overflow"][0]
    assert ev.data["n_dropped"] == 3
    ev = [e for e in m.events if e.kind == "track_overflow"][0]
    assert ev.data["n_dropped"] == 2
