"""Log-analytics tests: jsonl and text parsers must agree; summaries carry
the parsed-contract fields (SURVEY §3.5/§5)."""

import json

from bundle_adjustment_tpu.utils import analyze_log
from bundle_adjustment_tpu.utils.event_log import EventLog


def make_run_log(tmp_path, echo_file):
    """Emit a small synthetic run through the real EventLog."""
    import contextlib

    path = str(tmp_path / "events.jsonl")
    log = EventLog(path, echo=True)
    with open(echo_file, "w") as fh:
        with contextlib.redirect_stdout(fh):
            log.frame(0)
            log.keyframe_trigger(0, 0, "Initialization", {})
            log.frame(1)
            log.pose(1, 40, 60, 40 / 60)
            log.keyframe_trigger(1, 1, "Pixel Displacement",
                                 {"median_displacement_px": 25.0})
            log.lba(1, 1000.0, 100.0, 12, False, 0.05)
            log.frame(2)
            log.pose(2, 10, 50, 0.2)
            log.frame_discarded(2, "Low inlier ratio or insufficient inliers.")
            log.frame(3)
            log.pose(3, 45, 55, 45 / 55)
            log.keyframe_trigger(3, 2, "Parallax", {"median_parallax_deg": 2.0})
            log.lba(2, 2000.0, 2500.0, 3, True, 0.01)
    log.close()
    return path


def test_jsonl_and_text_parsers_agree(tmp_path):
    echo_file = str(tmp_path / "console.log")
    jsonl = make_run_log(tmp_path, echo_file)

    s_json = analyze_log.summarize(analyze_log.load_events(jsonl))
    s_text = analyze_log.summarize(analyze_log.load_events(echo_file))

    assert s_json["frames"] == s_text["frames"] == 4
    assert s_json["keyframes"] == s_text["keyframes"] == 3
    assert s_json["ba_runs"] == s_text["ba_runs"] == 1
    assert s_json["ba_divergences"] == s_text["ba_divergences"] == 1
    assert s_json["trigger_reasons"] == s_text["trigger_reasons"] == {
        "Initialization": 1, "Pixel Displacement": 1, "Parallax": 1,
    }
    assert abs(s_json["mean_inlier_ratio"] - s_text["mean_inlier_ratio"]) < 5e-3


def test_plot_renders(tmp_path):
    echo_file = str(tmp_path / "console.log")
    jsonl = make_run_log(tmp_path, echo_file)
    out_png = tmp_path / "analysis.png"
    summary = analyze_log.analyze_and_plot(analyze_log.load_events(jsonl),
                                           str(out_png))
    assert out_png.exists() and out_png.stat().st_size > 1000
    assert summary["keyframes"] == 3


def test_low_ratio_warning_emitted(tmp_path, capsys):
    log = EventLog(echo=True)
    log.pose(5, 4, 20, 0.2)
    out = capsys.readouterr().out
    assert "WARNING: Low inlier ratio" in out  # ref: pose_estimator.py:38-40
