"""Head-to-head against the reference's ACTUAL code (imported verbatim from
/root/reference/src with open3d stubbed) on identical inputs — the end-to-end
parity check of SURVEY §4 plan c.

The reference's default gates (inlier ratio > 0.7) reject every in-tree
frame, so both sides run with the same relaxed gates.  Its pose-chain quirk
(SURVEY §2.4) leaves its desk trajectory degenerate (keyframe spacing jumps
47 -> 0.4 world units and its global BA stalls around 2e7 squared px), so the
assertions are structural parity + a quality dominance bound rather than ATE
against a broken oracle.
"""

import dataclasses

import numpy as np
import pytest

from bundle_adjustment_tpu.config import CameraModel, preset_desk
from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
from bundle_adjustment_tpu.utils.event_log import EventLog
from bundle_adjustment_tpu.utils.io import image_folder_frames

import sys

sys.path.insert(0, "/root/repo/tools")
from run_reference import run_reference  # noqa: E402

DESK = "/root/reference/desk_images"
K = np.array([[431.4, 0, 640], [0, 431.4, 360], [0, 0, 1.0]])


@pytest.fixture(scope="module")
def desk_frames():
    return list(image_folder_frames(DESK))


@pytest.fixture(scope="module")
def reference_run(desk_frames, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ref_run"))
    return run_reference(desk_frames, K, wd, ratio_test=0.75, min_matches=5,
                         inlier_ratio_gate=0.0, inlier_number_gate=5)


@pytest.fixture(scope="module")
def our_run(desk_frames, tmp_path_factory):
    cfg = preset_desk()
    cfg = dataclasses.replace(
        cfg,
        camera=CameraModel(fx=431.4, fy=431.4, cx=640, cy=360),
        pose_inlier_ratio=0.0, pose_inlier_numbers=5, min_tracked_features=5,
    )
    log = EventLog(echo=False)
    pipe = VisualOdometryPipeline(cfg, log=log, use_pallas_matcher=False)
    for f in desk_frames:
        pipe.process_frame(f)
    summary = pipe.finalize(str(tmp_path_factory.mktemp("ours_out")))
    return pipe, summary, log


def test_structural_parity(reference_run, our_run):
    ref_traj, ref_pts, ref_kf_ids, _ = reference_run
    pipe, summary, _ = our_run
    # same keyframe decisions on the same frames with equivalent gates
    assert summary["num_keyframes"] == len(ref_kf_ids) == 3
    # comparable map density (same order of magnitude; the reference's
    # exhaustive per-frame triangulation over-counts vs our dedup)
    assert summary["num_points"] > 0.1 * ref_pts


def test_quality_dominates_reference(reference_run, our_run):
    """On identical inputs, our final global-BA reprojection cost must be
    at least 100x below the reference's (its quirky initialization leaves
    scipy TRF stuck in the e7 range on desk; historically ~2.1e7 vs our
    ~1.5e3).  The oracle cost is measured from the reference run that
    actually executed in this session, not a hard-coded constant."""
    ref_traj, ref_pts, ref_kf_ids, ref_final = reference_run
    pipe, summary, log = our_run
    ours_final = summary["global_ba"]["final"]

    assert ref_final > 0, "reference run produced no observations to score"
    assert ours_final * 100 < ref_final, (
        f"ours {ours_final} not << reference {ref_final}"
    )


def test_reference_trajectory_is_reproducible(reference_run):
    """Pin the oracle: the reference's desk trajectory (its own convention)
    so future rounds can detect drift in the harness itself."""
    ref_traj, ref_pts, ref_kf_ids, _ = reference_run
    assert ref_traj.shape == (3, 3)
    np.testing.assert_allclose(ref_traj[0], 0.0, atol=1e-12)
    # its unit-norm+quirk chain puts KF1 ~47 units out and KF2 back near the
    # origin — the degeneracy our consistent mode fixes (see PARITY.md)
    assert np.linalg.norm(ref_traj[1]) > 10 * np.linalg.norm(ref_traj[2])
