"""Import + fallback-path smoke for the committed measurement tools.

The BASELINE rows must reproduce from committed harnesses; these tests keep
the harnesses importable and exercise their non-TPU fallback paths so a
refactor cannot silently break the reproduce commands (the TPU measurement
paths run on hardware via bench.py / the BASELINE commands).
"""

import os
import sys

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools")
if TOOLS not in sys.path:
    sys.path.insert(0, TOOLS)


def test_global_scale_sweep_cpu_reports_ineligible():
    # on the CPU backend the kernel gate refuses every size; the sweep must
    # report that, not crash (tiny C so the problem build is instant)
    import global_scale_sweep

    out = global_scale_sweep.main(["--cams", "16", "--pts-per-cam", "8"])
    assert out["sizes"]["16"] == {"path": "ineligible"}


def test_dedup_study_aggregates_committed_cells():
    # the committed .dedup_study cells are the r05 decision record; the
    # aggregator must keep reading them (cells cached -> no subprocess runs)
    import dedup_study

    study_dir = os.path.join(os.path.dirname(TOOLS), ".dedup_study")
    summary = dedup_study.main(["--out", study_dir])
    by = summary["by_dedup"]
    assert by["1"]["n"] == 5 and by["3"]["n"] == 5
    # the decision facts BASELINE.md quotes
    assert by["3"]["ate_pct_mean"] < by["1"]["ate_pct_mean"]
