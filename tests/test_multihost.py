"""Multi-process (multi-host analog) sweep via jax.distributed."""

import json
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_sweep_runs():
    """Spawn the launcher with 2 CPU processes; cross-process collectives
    must produce a finite converged summary from process 0."""
    proc = subprocess.run(
        [
            sys.executable, "-m", "pnp_admm_cnc_mri_tpu.cli.multihost",
            "--launch_local", "2", "--cpu", "--coordinator", "localhost:12419",
            "--iter_num", "10",
        ],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    summaries = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{")
    ]
    assert len(summaries) == 1, proc.stdout
    s = summaries[0]
    assert s["processes"] == 2 and s["global_devices"] >= 4  # 2 procs x local devices (XLA_FLAGS-dependent)
    assert s["mean_rel_residual"] < 1.0
    assert s["scenario_iters_per_s"] > 0
