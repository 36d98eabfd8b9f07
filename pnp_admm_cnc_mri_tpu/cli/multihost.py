"""Multi-host scenario sweep: jax.distributed over N processes/hosts.

The DCN-level scaling path (SURVEY.md §5 distributed-communication
backend): each process (one per host on a pod slice) owns its local
devices; the scenario grid is sharded over the GLOBAL device mesh with
``jax.make_array_from_process_local_data``; convergence statistics reduce
across hosts inside the jitted program; process 0 reports.

Real deployment — one invocation per host:

    python -m pnp_admm_cnc_mri_tpu.cli.multihost \
        --coordinator host0:12345 --num_processes N --process_id $HOST_ID

Local testing (this spawns N CPU processes itself):

    python -m pnp_admm_cnc_mri_tpu.cli.multihost --launch_local 2 --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def worker(args) -> int:
    if args.cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        args.coordinator, num_processes=args.num_processes, process_id=args.process_id
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from pnp_admm_cnc_mri_tpu.config import ADMM_L1_DEFAULT
    from pnp_admm_cnc_mri_tpu.data import images, masks as masks_mod, noise as noise_mod
    from pnp_admm_cnc_mri_tpu.solvers import admm

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))

    # Every process loads ITS shard of the scenario grid (here: the same
    # testset replicated per local device for the demo workload; a real
    # sweep splits the grid by process_id).
    imgs01, truth, names = images.load_testset(
        os.path.join(images.DEFAULT_TESTSETS, args.testset)
    )
    mask = masks_mod.load_mask("Q_Random30")
    kn = noise_mod.load_noise()

    per_dev = max(1, args.scenarios_per_device)
    local_n = n_local * per_dev
    idx = (np.arange(local_n) + args.process_id * local_n) % imgs01.shape[0]
    local_imgs = imgs01[idx]
    local_y = (np.fft.fft2(local_imgs, axes=(-2, -1)) * mask + kn).astype(np.complex64)

    sharding = NamedSharding(mesh, P("data"))
    y_global = jax.make_array_from_process_local_data(sharding, local_y)
    m_rep = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), mask.astype(np.float32)
    )

    cfg = type(ADMM_L1_DEFAULT)(**{**ADMM_L1_DEFAULT.__dict__, "iter_num": args.iter_num})

    @jax.jit
    def solve(y, m):
        final, res = admm.admm_l1(y, m, cfg, dtype=jnp.float32, collect_residuals=True)
        xn = jnp.sqrt(jnp.sum(final.x**2, axis=(-2, -1))) + 1e-12
        rel = res[-1] / xn
        # cross-host reductions inside the program
        return jnp.mean(rel), jnp.max(rel), jnp.mean(final.x)

    import time

    float(solve(y_global, m_rep)[0])  # compile + warmup
    t0 = time.perf_counter()
    mean_rel, max_rel, mean_x = solve(y_global, m_rep)
    mean_rel = float(mean_rel)  # forces execution across all hosts
    dt = time.perf_counter() - t0
    total = n_global * per_dev

    if args.process_id == 0:
        print(
            json.dumps(
                {
                    "processes": args.num_processes,
                    "global_devices": n_global,
                    "scenarios": int(total),
                    "iters": cfg.iter_num,
                    "wall_s": round(dt, 3),
                    "scenario_iters_per_s": round(total * cfg.iter_num / dt, 1),
                    "mean_rel_residual": mean_rel,
                    "max_rel_residual": float(max_rel),
                }
            ),
            flush=True,
        )
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default="localhost:12377")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--launch_local", type=int, default=0,
                   help="spawn N local worker processes (testing)")
    p.add_argument("--testset", default="set1")
    p.add_argument("--iter_num", type=int, default=20)
    p.add_argument("--scenarios_per_device", type=int, default=2)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.launch_local:
        n = args.launch_local
        procs = []
        for i in range(n):
            cmd = [
                sys.executable, "-m", "pnp_admm_cnc_mri_tpu.cli.multihost",
                "--coordinator", args.coordinator,
                "--num_processes", str(n), "--process_id", str(i),
                "--testset", args.testset, "--iter_num", str(args.iter_num),
                "--scenarios_per_device", str(args.scenarios_per_device),
            ] + (["--cpu"] if args.cpu else [])
            procs.append(subprocess.Popen(cmd))
        rc = 0
        for pr in procs:
            rc |= pr.wait()
        return rc
    return worker(args)


if __name__ == "__main__":
    raise SystemExit(main())
