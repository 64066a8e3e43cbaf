"""Multi-host data-parallel equivalence (SURVEY.md §2.3 "jax.distributed
init + GSPMD mesh").

Runs tools/dryrun_multihost.py as real OS processes: a 2-process x
4-virtual-CPU-device run (jax.distributed + Gloo collectives + BatchLoader
process striding) must produce the same per-step losses as a single-process
8-device run — the global batch composition and the 8-way mesh partitioning
are identical by construction, so only cross-host reduction order can
differ (float tolerance).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CMD = [sys.executable, "-m", "dcl_net_tpu.tools.dryrun_multihost"]


def _env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the tool sets its own device count
    return env


@pytest.mark.slow
def test_two_process_dryrun_matches_single_process(tmp_path):
    ref_out = tmp_path / "ref.json"
    subprocess.run(
        CMD + ["--local_devices", "8", "--steps", "3", "--out", str(ref_out)],
        check=True, env=_env(), cwd=REPO, timeout=540,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    h0_out = tmp_path / "h0.json"
    common = ["--coordinator", f"127.0.0.1:{port}", "--num_hosts", "2",
              "--local_devices", "4", "--steps", "3"]
    log0, log1 = open(tmp_path / "h0.log", "w"), open(tmp_path / "h1.log", "w")
    p0 = subprocess.Popen(
        CMD + common + ["--host_id", "0", "--out", str(h0_out)],
        env=_env(), cwd=REPO,
        stdout=log0, stderr=subprocess.STDOUT,
    )
    p1 = subprocess.Popen(
        CMD + common + ["--host_id", "1"],
        env=_env(), cwd=REPO,
        stdout=log1, stderr=subprocess.STDOUT,
    )
    try:
        rc0 = p0.wait(timeout=540)
        rc1 = p1.wait(timeout=120)
        if rc0 != 0 or rc1 != 0:
            raise AssertionError(
                f"worker exit codes ({rc0}, {rc1});\n--- h0 ---\n"
                f"{(tmp_path / 'h0.log').read_text()[-3000:]}\n--- h1 ---\n"
                f"{(tmp_path / 'h1.log').read_text()[-3000:]}"
            )
    finally:
        for p in (p0, p1):
            if p.poll() is None:
                p.kill()
        log0.close()
        log1.close()

    ref = json.loads(ref_out.read_text())
    got = json.loads(h0_out.read_text())
    assert got["process_count"] == 2
    assert got["n_devices"] == 8
    assert len(got["losses"]) == len(ref["losses"]) == 3
    # Step 1 runs on identical params + identical global batch: any
    # difference is cross-host allreduce reduction order only (~1e-7 rel).
    np.testing.assert_allclose(got["losses"][0], ref["losses"][0], rtol=1e-5)
    # Later steps amplify that float noise through Adam + SVD-gradient
    # chaos at random init — same-trajectory, loose tolerance.
    np.testing.assert_allclose(got["losses"][1:], ref["losses"][1:],
                               rtol=5e-2)
    # eval arm: process-sharded Evaluator.evaluate (local-shard fetch +
    # cross-process score allgather) must reproduce the single-process
    # metrics EXACTLY — same scores, same aggregation order after gather
    assert got["eval"]["auc_mean"] == ref["eval"]["auc_mean"]
    assert got["eval"]["acc_mean"] == ref["eval"]["acc_mean"]
    assert got["eval"]["n_overflow"] == ref["eval"]["n_overflow"] == 0
    # stage-2 arm: refiner steps over the mesh (frozen stage-1 closure,
    # identical inits) — forward-only losses, tight tolerance
    np.testing.assert_allclose(got["stage2_losses"], ref["stage2_losses"],
                               rtol=1e-5)
