"""Run-log analytics: parse the event stream, summarize, plot.

The reference regex-parses its print log into a dataframe of frame ids,
pose-estimation inlier ratios, keyframe trigger reasons, and LBA improvement
percentages, then renders a two-panel quality plot color-coded by trigger
reason (ref: src/analyze_log.py:6-121).  Here the machine contract is the
``events.jsonl`` stream (utils/event_log.py) — no regex needed — but a text
parser for the printed lines is kept so tee'd console logs work the same way
the reference's did.

CLI:  python -m bundle_adjustment_tpu.utils.analyze_log events.jsonl [out.png]
"""

from __future__ import annotations

import json
import re
import sys
from typing import Optional

# trigger-reason taxonomy (ref: src/analyze_log.py:80-85) + our additions
REASON_COLORS = {
    "Initialization": "tab:gray",
    "Parallax": "tab:green",
    "Pixel Displacement": "tab:blue",
    "Rotation": "tab:orange",
    "Feature Ratio": "tab:red",
    "Relocalization": "tab:purple",
}

_TEXT_PATTERNS = [
    ("frame", re.compile(r"Processing frame (\d+)\.\.\."), ("frame_idx",)),
    ("pose", re.compile(
        r"Pose Estimation: (\d+)/(\d+) inliers\. Inlier Ratio: ([\d.]+)"),
     ("num_inliers", "num_matches", "inlier_ratio")),
    ("keyframe_trigger", re.compile(r"Keyframe Trigger: ([A-Za-z ]+?) \("),
     ("reason",)),
    ("ba_complete", re.compile(
        r"(?:LBA|Global BA) Complete\. Initial Cost: ([\d.]+), Final Cost: "
        r"([\d.]+), Improvement: ([-\d.]+)%"),
     ("initial_cost", "final_cost", "improvement")),
    ("ba_diverged", re.compile(
        r"(?:LBA|Global BA) Diverged! Cost increased from ([\d.]+) to ([\d.]+)"),
     ("initial_cost", "final_cost")),
]


def parse_text_log(path: str) -> list[dict]:
    """Parse a tee'd console log into events (reference-style ingestion)."""
    events = []
    frame_idx = None
    with open(path) as f:
        for line in f:
            for event, pat, fields in _TEXT_PATTERNS:
                m = pat.search(line)
                if not m:
                    continue
                rec = {"event": event}
                for name, val in zip(fields, m.groups()):
                    try:
                        rec[name] = float(val) if "." in val or name == "improvement" else int(val)
                    except ValueError:
                        rec[name] = val.strip()
                if event == "frame":
                    frame_idx = rec["frame_idx"]
                elif frame_idx is not None:
                    rec.setdefault("frame_idx", frame_idx)
                events.append(rec)
                break
    return events


def load_events(path: str) -> list[dict]:
    if path.endswith(".jsonl"):
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
    return parse_text_log(path)


def summarize(events: list[dict]) -> dict:
    poses = [e for e in events if e["event"] == "pose"]
    triggers = [e for e in events if e["event"] == "keyframe_trigger"]
    bas = [e for e in events if e["event"] == "ba_complete"]
    divs = [e for e in events if e["event"] == "ba_diverged"]
    reasons: dict[str, int] = {}
    for t in triggers:
        reasons[t.get("reason", "?")] = reasons.get(t.get("reason", "?"), 0) + 1
    out = {
        "frames": sum(1 for e in events if e["event"] == "frame"),
        "keyframes": len(triggers),
        "trigger_reasons": reasons,
        "ba_runs": len(bas),
        "ba_divergences": len(divs),
    }
    if poses:
        ratios = [e["inlier_ratio"] for e in poses]
        out["mean_inlier_ratio"] = sum(ratios) / len(ratios)
        out["min_inlier_ratio"] = min(ratios)
    if bas:
        imps = [e.get("improvement", 0.0) for e in bas]
        out["mean_ba_improvement_pct"] = sum(imps) / len(imps)
        if any("elapsed_s" in e for e in bas):
            ts = [e["elapsed_s"] for e in bas if "elapsed_s" in e]
            its = [e.get("iterations", 0) for e in bas if "elapsed_s" in e]
            out["ba_total_s"] = sum(ts)
            out["ba_iters_per_s"] = sum(its) / max(sum(ts), 1e-9)
    return out


def analyze_and_plot(events: list[dict], out_png: Optional[str] = None) -> dict:
    """Two-panel quality plot: per-frame pose inlier ratio with keyframe
    triggers color-coded by reason, and per-BA improvement % (the reference's
    analysis figure, src/analyze_log.py:57-121)."""
    summary = summarize(events)
    if out_png:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        poses = [e for e in events if e["event"] == "pose"]
        triggers = [e for e in events if e["event"] == "keyframe_trigger"]
        bas = [e for e in events if e["event"] == "ba_complete"]

        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(12, 8))
        if poses:
            ax1.plot([e.get("frame_idx", i) for i, e in enumerate(poses)],
                     [e["inlier_ratio"] for e in poses],
                     "k.-", lw=0.5, ms=3, label="inlier ratio")
        for t in triggers:
            color = REASON_COLORS.get(t.get("reason", ""), "tab:brown")
            ax1.axvline(t.get("frame_idx", 0), color=color, alpha=0.5, lw=1)
        handles = [plt.Line2D([0], [0], color=c, label=r)
                   for r, c in REASON_COLORS.items()]
        ax1.legend(handles=handles + list(ax1.get_legend_handles_labels()[0]),
                   fontsize=8, loc="lower right")
        ax1.set_ylabel("pose inlier ratio")
        ax1.set_title("Keyframe quality (triggers color-coded by reason)")

        if bas:
            ax2.bar(range(len(bas)), [e.get("improvement", 0.0) for e in bas],
                    color="tab:green")
        ax2.set_ylabel("BA improvement %")
        ax2.set_xlabel("BA run")
        fig.tight_layout()
        fig.savefig(out_png, dpi=110)
        plt.close(fig)
    return summary


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    events = load_events(argv[0])
    out_png = argv[1] if len(argv) > 1 else None
    print(json.dumps(analyze_and_plot(events, out_png), indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
