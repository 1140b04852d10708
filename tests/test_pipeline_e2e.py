"""End-to-end pipeline tests on the in-tree datasets (SURVEY §4: desk_images
exercises the full match->triangulate->BA path; scout_images exercises
keyframe chains)."""

import numpy as np
import pytest

from bundle_adjustment_tpu.config import preset_desk, preset_scout
from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
from bundle_adjustment_tpu.utils.event_log import EventLog
from bundle_adjustment_tpu.utils.io import image_folder_frames

DESK = "/root/reference/desk_images"
SCOUT = "/root/reference/scout_images"


@pytest.fixture(scope="module")
def desk_run(tmp_path_factory):
    cfg = preset_desk()
    cfg = type(cfg)(**{**cfg.__dict__, "num_features": 1500, "pyramid_levels": 4})
    log = EventLog(echo=False)
    pipe = VisualOdometryPipeline(cfg, log=log, use_pallas_matcher=False)
    results = [pipe.process_frame(f) for f in image_folder_frames(DESK)]
    summary = pipe.finalize(str(tmp_path_factory.mktemp("desk_out")))
    return pipe, results, summary, log


def test_desk_every_frame_is_keyframe(desk_run):
    pipe, results, summary, log = desk_run
    # desk preset forces permissive gates: all 3 frames become keyframes
    assert results[0]["status"] == "initialized"
    assert all(r["status"] == "keyframe" for r in results[1:]), results
    assert summary["num_keyframes"] == 3


def test_desk_map_populated(desk_run):
    pipe, results, summary, log = desk_run
    assert summary["num_points"] >= 40, summary
    assert summary["num_observations"] > 2 * summary["num_points"] * 0.8
    pts, colors = pipe.map.get_pcd()
    assert np.isfinite(pts).all()
    assert (colors >= 0).all() and (colors <= 1).all()
    # triangulated structure must be mostly in front of the first camera
    assert (pts[:, 2] > 0).mean() > 0.9


def test_desk_ba_improves_cost(desk_run):
    pipe, results, summary, log = desk_run
    ba_events = [e for e in log.events if e["event"] == "ba_complete"]
    assert ba_events, "no BA completed"
    for e in ba_events:
        assert e["final_cost"] < e["initial_cost"]


def test_desk_observation_consistency(desk_run):
    """Bidirectional observation invariant (ref: src/pipeline.py:305-307):
    every obs row's kp_to_mp back-pointer agrees with the table."""
    pipe, _, _, _ = desk_run
    m = pipe.map
    n = m._n_obs
    for i in range(n):
        if not m._obs_alive[i]:
            continue
        kf = m.keyframes[m._obs_kf[i]]
        assert kf.kp_to_mp[m._obs_kp[i]] == m._obs_mp[i]


def test_desk_artifacts_written(desk_run, tmp_path):
    pipe, _, summary, _ = desk_run
    from bundle_adjustment_tpu.utils.io import read_pcd, write_pcd

    pts, colors = pipe.map.get_pcd()
    p = tmp_path / "map.pcd"
    write_pcd(str(p), pts, colors)
    pts2, colors2 = read_pcd(str(p))
    np.testing.assert_allclose(pts2, pts, atol=1e-4)
    np.testing.assert_allclose(colors2, colors, atol=1 / 255 + 1e-6)


@pytest.fixture(scope="module")
def scout_run(tmp_path_factory):
    cfg = preset_scout()  # full 4000-feature budget — scout pairs are wide-baseline
    log = EventLog(echo=False)
    pipe = VisualOdometryPipeline(cfg, log=log, use_pallas_matcher=False)
    results = [pipe.process_frame(f) for f in image_folder_frames(SCOUT)]
    summary = pipe.finalize(str(tmp_path_factory.mktemp("scout_out")))
    return pipe, results, summary, log


def test_scout_keyframe_chain(scout_run):
    pipe, results, summary, log = scout_run
    assert results[0]["status"] == "initialized"
    assert summary["num_keyframes"] >= 3, summary
    # keyframe triggers carry the reference taxonomy
    reasons = {e["reason"] for e in log.events if e["event"] == "keyframe_trigger"}
    allowed = {"Parallax", "Pixel Displacement", "Rotation", "Feature Ratio",
               "Initialization", "Relocalization"}
    assert reasons <= allowed, reasons


def test_scout_trajectory_moves(scout_run):
    pipe, _, _, _ = scout_run
    traj = pipe.map.trajectory()
    assert len(traj) >= 3
    d = np.linalg.norm(np.diff(traj, axis=0), axis=1)
    assert (d > 1e-6).all(), "keyframes must have distinct positions"


def test_event_log_grammar(scout_run):
    """The jsonl event stream carries the parsed-contract fields
    (SURVEY §3.5): frame ids, inlier ratios, trigger reasons, improvements."""
    _, _, _, log = scout_run
    ev = log.events
    assert any(e["event"] == "frame" and "frame_idx" in e for e in ev)
    assert any(e["event"] == "pose" and "inlier_ratio" in e for e in ev)
    assert any(e["event"] == "keyframe_trigger" and "reason" in e for e in ev)
    ba_done = [e for e in ev if e["event"] in ("ba_complete", "ba_diverged", "ba_skipped")]
    assert ba_done
