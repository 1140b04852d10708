"""REAL multi-process distributed BA (SURVEY §4 plan d; VERDICT r1 #4):
spawn 2 OS processes joined by jax.distributed (gloo), run the point-sharded
Schur solve and the window consensus across them, assert equality with the
single-process solve.  The heavy lifting + in-worker assertions live in
tools/run_multiprocess_ba.py (also runnable standalone)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "run_multiprocess_ba.py")


def test_two_process_distributed_ba(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pin their own device counts
    out = subprocess.run(
        [sys.executable, TOOL, "--nproc", "2", "--local-devices", "2",
         "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=850, env=env)
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    summary = json.loads(last)
    assert summary["ok"] and summary["nproc"] == 2
    assert summary["devices_total"] == 4
    rel = abs(summary["sharded_final_cost"] - summary["single_final_cost"])
    assert rel <= 1e-3 * max(summary["single_final_cost"], 1.0)
