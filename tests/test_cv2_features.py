"""cv2 feature-injection mode (SURVEY §7 hard-part-1 escape hatch, ref:
src/features.py:13-16): the reference's exact ORB keypoints/descriptors
through our matcher/pose/BA stack — isolates detector parity from geometry
parity.  VERDICT r1 item 8."""

import dataclasses

import numpy as np

from bundle_adjustment_tpu.config import CameraModel, preset_desk
from bundle_adjustment_tpu.models.pipeline import VisualOdometryPipeline
from bundle_adjustment_tpu.utils.event_log import EventLog
from bundle_adjustment_tpu.utils.io import image_folder_frames

DESK = "/root/reference/desk_images"


def _run(features_source):
    cfg = dataclasses.replace(
        preset_desk(),
        camera=CameraModel(fx=431.4, fy=431.4, cx=640, cy=360),
        features_source=features_source,
    )
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                  use_pallas_matcher=False)
    for f in image_folder_frames(DESK):
        pipe.process_frame(f)
    return pipe


def test_cv2_injection_runs_desk_e2e(tmp_path):
    pipe = _run("cv2")
    summary = pipe.finalize(str(tmp_path))
    assert summary["num_keyframes"] == 3
    assert summary["num_points"] > 20
    assert summary["global_ba"] is not None
    assert not summary["global_ba"]["diverged"]
    # geometry stack converges on cv2 features too (detector isolated out)
    assert summary["global_ba"]["final"] < summary["global_ba"]["initial"]


def test_cv2_keypoints_shape_contract():
    """Injected keypoints satisfy the static-capacity SoA contract."""
    import cv2

    from bundle_adjustment_tpu.config import PipelineConfig

    cfg = dataclasses.replace(
        preset_desk(), camera=CameraModel(fx=431.4, fy=431.4, cx=640, cy=360),
        features_source="cv2", num_features=500)
    pipe = VisualOdometryPipeline(cfg, log=EventLog(echo=False),
                                  use_pallas_matcher=False)
    frame = next(iter(image_folder_frames(DESK)))
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    kp = pipe._extract(gray)
    assert kp.xy.shape == (500, 2)
    assert kp.desc.shape == (500, 8)
    valid = np.asarray(kp.valid)
    assert 0 < valid.sum() <= 500
    # valid slots carry real descriptors (not all-zero padding)
    assert np.asarray(kp.desc)[valid].any()
