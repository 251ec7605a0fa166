"""Tracker-state checkpoint / resume.

The reference keeps all tracker state in process memory and loses it on
restart (SURVEY.md: no checkpointing; the disconnected reset() hook,
pose_prior_mult_node.cpp:182-189). Here the whole tracker is one pytree, so
persistence is trivial: NPZ snapshots of every leaf plus a version tag.
`reset` reproduces the reference's reset() semantics (fresh tracks, fresh
ids, reseeded delay buffer).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from smartedgesensor3dhumanpose_tpu.types import TrackerState

_VERSION = 1
_FIELDS = TrackerState._fields


def save_tracker_state(path: str, state: TrackerState) -> None:
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    np.savez_compressed(path, __version__=_VERSION, **arrays)


def load_tracker_state(path: str, dtype=jnp.float32) -> TrackerState:
    with np.load(path) as z:
        version = int(z["__version__"])
        if version != _VERSION:
            raise ValueError(
                f"tracker checkpoint version {version} != {_VERSION}"
            )
        kwargs = {}
        for f in _FIELDS:
            a = z[f]
            if a.dtype in (np.float32, np.float64):
                kwargs[f] = jnp.asarray(a, dtype)
            else:
                kwargs[f] = jnp.asarray(a)
        return TrackerState(**kwargs)


def reset(state: TrackerState, avg_delay: float = 0.10) -> TrackerState:
    """Fresh tracker with the same shapes (reference reset(), :182-189).

    The reference reseeds the feedback-delay buffer with the DEFAULT
    g_avg_delay, discarding the learned value
    (pose_prior_mult_node.cpp:186), so `avg_delay` defaults to that
    constant rather than the buffer mean.
    """
    t = state.alive.shape[0]
    w = state.fb_delay_buffer.shape[0]
    dtype = state.estimate.dtype
    return TrackerState.initial(t, w, avg_delay, dtype=dtype)
