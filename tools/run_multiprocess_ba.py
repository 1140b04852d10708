"""Multi-PROCESS distributed BA: launcher + worker (VERDICT r1 #4).

The round-1 distributed layer only ever ran on a single-process virtual
device mesh.  This tool exercises the REAL multi-process path: N OS
processes, each owning its own local CPU devices, joined by
``jax.distributed.initialize`` (gloo collectives), running

  1. point-sharded Schur BA (``ba_solve_sharded``) — the per-CG/per-LM
     psum of the reduced camera system crosses PROCESS boundaries, and
  2. window-partitioned consensus (``solve_windows_consensus``) over a
     (win, pt) mesh spanning the processes,

and asserting both equal the single-process solve (modulo reduction order).
This is SURVEY §4 plan (d) done with actual process isolation — the same
code path ``--multihost`` uses on a real multi-host TPU slice
(bundle_adjustment_tpu/run.py), where gloo is replaced by ICI/DCN.

Launcher (spawns itself; used by tests/test_multiprocess.py):
    python tools/run_multiprocess_ba.py --nproc 2 --local-devices 2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(args):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{args.port}", args.nproc,
                               args.process_id)

    import numpy as np

    from bundle_adjustment_tpu.ops import ba
    from bundle_adjustment_tpu.parallel import dist_ba, mesh as mesh_mod

    n_dev = len(jax.devices())
    assert n_dev == args.nproc * args.local_devices, n_dev

    # identical problem in every process (same seed -> no data exchange)
    def make_problem(rng, n_cams=4, n_pts=64, noise=0.2, perturb=0.05):
        from bundle_adjustment_tpu.ops.lie import so3_exp_np
        import jax.numpy as jnp

        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1.0]])
        X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(n_pts, 3))
        rvecs = np.stack([[0.02 * c, -0.03 * c, 0.01 * c] for c in range(n_cams)])
        tvecs = np.stack([[0.3 * c, 0.05 * c, 0.02 * c] for c in range(n_cams)])
        cam_idx = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
        pnt_idx = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
        uv = np.empty((n_cams * n_pts, 2))
        for c in range(n_cams):
            R = so3_exp_np(rvecs[c])
            Xc = X @ R.T + tvecs[c]
            uv[c * n_pts:(c + 1) * n_pts] = (
                (Xc[:, :2] / Xc[:, 2:]) * [K[0, 0], K[1, 1]]
                + [K[0, 2], K[1, 2]] + rng.normal(size=(n_pts, 2)) * noise)
        rv_p = rvecs.copy()
        tv_p = tvecs.copy()
        rv_p[1:] += rng.normal(size=(n_cams - 1, 3)) * perturb * 0.3
        tv_p[1:] += rng.normal(size=(n_cams - 1, 3)) * perturb
        X_p = X + rng.normal(size=X.shape) * perturb
        return ba.BAProblem(
            rvecs=jnp.asarray(rv_p, jnp.float32),
            tvecs=jnp.asarray(tv_p, jnp.float32),
            points=jnp.asarray(X_p, jnp.float32),
            cam_idx=jnp.asarray(cam_idx), pnt_idx=jnp.asarray(pnt_idx),
            uv=jnp.asarray(uv, jnp.float32),
            obs_mask=jnp.ones(len(uv), jnp.float32),
            point_mask=jnp.ones(n_pts, bool),
            K=jnp.asarray(K, jnp.float32),
        )

    prob = make_problem(np.random.default_rng(0))

    # oracle: plain single-device solve, identical in every process
    rv1, tv1, pt1, s1 = ba.ba_solve(prob, n_fixed=1, max_iterations=20)

    # 1. point-sharded Schur BA across ALL devices of ALL processes
    mesh = mesh_mod.make_mesh(1, n_dev)
    sharded = dist_ba.shard_problem(prob, n_dev)
    rvN, tvN, ptN, sN = dist_ba.ba_solve_sharded(
        sharded, mesh, axis="pt", n_fixed=1, max_iterations=20,
        globalize_inputs=True)
    rvN = np.asarray(jax.device_get(rvN))  # replicated out-spec: addressable
    tvN = np.asarray(jax.device_get(tvN))
    err_rv = float(np.abs(rvN - np.asarray(rv1)).max())
    err_tv = float(np.abs(tvN - np.asarray(tv1)).max())
    cost1 = float(s1.final_cost)
    costN = float(np.asarray(jax.device_get(sN.final_cost)))
    assert err_rv < 1e-4 and err_tv < 1e-3, (err_rv, err_tv)
    assert abs(costN - cost1) <= 1e-3 * max(cost1, 1.0), (costN, cost1)

    # 2. window-partitioned consensus over a (2, n_dev//2) mesh
    win = 2 if n_dev >= 2 else 1
    pt = max(n_dev // win, 1)
    mesh2 = mesh_mod.make_mesh(win, pt)
    problems, win_ids = [], []
    for w in range(win):
        p = make_problem(np.random.default_rng(3 + w), n_cams=3, n_pts=32)
        problems.append(dist_ba.shard_problem(p, pt))
        win_ids.append(np.arange(w * 2, w * 2 + 3))
    poses, sim3s, (_, _, _, stats) = dist_ba.solve_windows_consensus(
        problems, win_ids, mesh2, n_fixed=1, max_iterations=10,
        globalize_inputs=True)
    final = np.asarray(stats.final_cost)
    assert np.isfinite(final).all(), final
    assert len(poses) == len({int(k) for ids in win_ids for k in ids})

    result = {"process_id": args.process_id, "n_devices": n_dev,
              "sharded_final_cost": costN, "single_final_cost": cost1,
              "max_rvec_err": err_rv, "max_tvec_err": err_tv,
              "consensus_windows": win, "consensus_poses": len(poses),
              "ok": True}
    out = os.path.join(args.workdir, f"result_{args.process_id}.json")
    with open(out, "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)


def launcher(args):
    import socket
    import tempfile

    with socket.socket() as s:  # pick a free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    workdir = args.workdir or tempfile.mkdtemp(prefix="mp_ba_")
    os.makedirs(workdir, exist_ok=True)

    procs = []
    for pid in range(args.nproc):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--process-id", str(pid), "--nproc", str(args.nproc),
               "--local-devices", str(args.local_devices),
               "--port", str(port), "--workdir", workdir]
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs.append(subprocess.Popen(cmd, env=env))
    codes = [p.wait(timeout=900) for p in procs]
    assert all(c == 0 for c in codes), f"worker exit codes {codes}"

    results = []
    for pid in range(args.nproc):
        with open(os.path.join(workdir, f"result_{pid}.json")) as f:
            results.append(json.load(f))
    assert all(r["ok"] for r in results)
    # all processes must agree bit-for-bit on the replicated result
    assert len({r["sharded_final_cost"] for r in results}) == 1
    print(json.dumps({"nproc": args.nproc,
                      "devices_total": results[0]["n_devices"],
                      "sharded_final_cost": results[0]["sharded_final_cost"],
                      "single_final_cost": results[0]["single_final_cost"],
                      "ok": True}))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args(argv)
    if args.process_id is None:
        return launcher(args)
    return worker(args)


if __name__ == "__main__":
    main()
