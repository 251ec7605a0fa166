"""Ground-truth evaluation metrics (MPJPE / PCK) for published skeletons.

The reference evaluates against ground truth out-of-repo (the rviz config
expects a `skeleton3d_gt_new` marker topic, pose_hall.rviz:167, and the RSS
2021 paper reports PCK@t / MPJPE); this module is the in-repo equivalent for
any source of ground truth — the synthetic scene generator
(`io.synthetic.generate_scene` returns exact `gt_xyz`) or externally
recorded GT.

Host-side NumPy on pipeline outputs: evaluation is offline tooling, not a
per-frame device stage. `bench.py` uses `sequence_joint_errors` for the
`mpjpe_mm` it records in every round's artifact.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np


class Match(NamedTuple):
    """One matched GT person: which prediction matched it, the per-scored-
    joint errors, and the scored-joint coverage (n_scored / J) — coverage
    makes fragment matches visible: a prediction is judged on its OWN
    scored joints, so a skeleton that drops its hard joints is scored only
    on the easy ones; low coverage flags exactly that."""

    gt_index: int
    pred_index: int
    errors: np.ndarray  # [n_scored_joints] meters
    coverage: float  # scored-joint fraction of the matched prediction


def frame_matches(
    xyz: np.ndarray,
    score: np.ndarray,
    valid: np.ndarray,
    gt_xyz: np.ndarray,
    min_joints: int = 5,
    max_match_dist: float = 0.5,
) -> List[Match]:
    """Greedy GT <- prediction matching for one frame.

    For each ground-truth person (in order), pick the unused published
    person with the lowest mean per-joint error over that prediction's
    scored joints; accept the match when the mean is below
    `max_match_dist` meters. Predictions with fewer than `min_joints`
    scored joints never match (a skeleton fragment should count as a miss,
    not lower the error by cherry-picking its best joints).

    Args:
      xyz: [P, J, 3] published joint positions (input-model layout).
      score: [P, J] per-joint scores (> 0 marks a published joint).
      valid: [P] person validity / publish gate.
      gt_xyz: [G, J, 3] ground-truth joints.

    Returns:
      One Match per MATCHED ground-truth person; unmatched GT people
      contribute nothing (count misses via len(result) vs G).
    """
    matches: List[Match] = []
    used: set = set()
    cand = np.nonzero(np.asarray(valid))[0]
    n_joints = score.shape[-1]
    for g in range(gt_xyz.shape[0]):
        best = np.inf
        best_e: Optional[np.ndarray] = None
        best_p: Optional[int] = None
        for p in cand:
            if p in used:
                continue
            ok = score[p] > 0
            if ok.sum() < min_joints:
                continue
            e = np.linalg.norm(xyz[p][ok] - gt_xyz[g][ok], axis=-1)
            if e.mean() < best:
                best, best_e, best_p = e.mean(), e, p
        if best_e is not None and best < max_match_dist:
            used.add(best_p)
            matches.append(
                Match(
                    gt_index=g,
                    pred_index=int(best_p),
                    errors=best_e,
                    coverage=float(best_e.shape[0] / n_joints),
                )
            )
    return matches


def frame_joint_errors(
    xyz: np.ndarray,
    score: np.ndarray,
    valid: np.ndarray,
    gt_xyz: np.ndarray,
    min_joints: int = 5,
    max_match_dist: float = 0.5,
) -> List[np.ndarray]:
    """Per-matched-GT-person error vectors (see `frame_matches`)."""
    return [
        m.errors
        for m in frame_matches(
            xyz, score, valid, gt_xyz,
            min_joints=min_joints, max_match_dist=max_match_dist,
        )
    ]


def sequence_joint_errors(
    xyz: np.ndarray,
    score: np.ndarray,
    valid: np.ndarray,
    gt_xyz: np.ndarray,
    to_fusion: Optional[np.ndarray] = None,
    start: int = 0,
    min_joints: int = 5,
    max_match_dist: float = 0.5,
    gt_valid: Optional[np.ndarray] = None,
) -> np.ndarray:
    """All matched per-joint errors over a sequence.

    Args:
      xyz: [T, P, K, 3] published positions — fusion (21-joint) layout when
        `to_fusion` is given (it selects the input model's 17 joints so the
        comparison runs in the ground truth's layout), else already [T,P,J,3].
      score: [T, P, K]; valid: [T, P]; gt_xyz: [T, G, J, 3].
      start: first frame to evaluate (skip the tracker's publish-gate
        warm-up, reference pose_prior_mult_node.cpp:845-852).

    Returns:
      [N] concatenated joint errors in meters (empty when nothing matched).
    """
    return evaluate_sequence(
        xyz, score, valid, gt_xyz,
        to_fusion=to_fusion, start=start,
        min_joints=min_joints, max_match_dist=max_match_dist,
        gt_valid=gt_valid,
    ).joint_errors


class SequenceEval(NamedTuple):
    """Aggregate GT evaluation over a sequence (the paper reports MPJPE and
    PCK@t; misses and coverage qualify those numbers — a low MPJPE earned
    by matching only the easy people/joints is visible here)."""

    joint_errors: np.ndarray  # [N] all matched joint errors (meters)
    n_gt: int  # ground-truth person instances evaluated
    n_matched: int  # GT instances that matched a prediction
    coverage: float  # mean scored-joint fraction over matches (NaN if none)

    @property
    def miss_rate(self) -> float:
        return 1.0 - self.n_matched / self.n_gt if self.n_gt else float("nan")


def evaluate_sequence(
    xyz: np.ndarray,
    score: np.ndarray,
    valid: np.ndarray,
    gt_xyz: np.ndarray,
    to_fusion: Optional[np.ndarray] = None,
    start: int = 0,
    min_joints: int = 5,
    max_match_dist: float = 0.5,
    gt_valid: Optional[np.ndarray] = None,
) -> SequenceEval:
    """`sequence_joint_errors` plus match accounting (misses, coverage).

    Same arguments; returns a SequenceEval whose `joint_errors` equals the
    `sequence_joint_errors` output for identical inputs.

    `gt_valid` ([T, G] bool, optional) marks which GT person slots hold a
    real person per frame. External GT sources commonly pad to a fixed
    person axis (people enter/leave the scene); without the mask every
    padded slot would count as an unmatched person and inflate miss_rate.
    The synthetic generator's GT has every slot live, so `None` (all valid)
    is correct there.
    """
    xyz = np.asarray(xyz)
    score = np.asarray(score)
    valid = np.asarray(valid)
    gt_xyz = np.asarray(gt_xyz)
    if to_fusion is not None:
        sel = np.asarray(to_fusion)
        xyz = xyz[..., sel, :]
        score = score[..., sel]
    if gt_valid is not None:
        gt_valid = np.asarray(gt_valid).astype(bool)
        if gt_valid.shape != gt_xyz.shape[:2]:
            raise ValueError(
                f"gt_valid shape {gt_valid.shape} != gt person axes "
                f"{gt_xyz.shape[:2]}"
            )
    errs: List[np.ndarray] = []
    covs: List[float] = []
    n_gt = 0
    for t in range(start, gt_xyz.shape[0]):
        gt_t = gt_xyz[t] if gt_valid is None else gt_xyz[t][gt_valid[t]]
        n_gt += gt_t.shape[0]
        for m in frame_matches(
            xyz[t], score[t], valid[t], gt_t,
            min_joints=min_joints, max_match_dist=max_match_dist,
        ):
            errs.append(m.errors)
            covs.append(m.coverage)
    return SequenceEval(
        joint_errors=np.concatenate(errs) if errs else np.zeros((0,)),
        n_gt=n_gt,
        n_matched=len(covs),
        coverage=float(np.mean(covs)) if covs else float("nan"),
    )


def mpjpe(joint_errors: np.ndarray) -> float:
    """Mean per-joint position error in meters (NaN when empty)."""
    joint_errors = np.asarray(joint_errors)
    return float(joint_errors.mean()) if joint_errors.size else float("nan")


def pck(joint_errors: np.ndarray, threshold: float = 0.15) -> float:
    """Percentage of correct keypoints: fraction of matched joints within
    `threshold` meters (the paper's PCK@t; NaN when empty)."""
    joint_errors = np.asarray(joint_errors)
    if not joint_errors.size:
        return float("nan")
    return float((joint_errors <= threshold).mean())
