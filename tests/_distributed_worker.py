"""Subprocess body for the multi-process (multi-host) mesh test.

Run as: python tests/_distributed_worker.py <process_id> <num_processes> <port>

Each process exposes 4 virtual CPU devices; jax.distributed.initialize joins
them into one 8-device global mesh (the multi-host path behind the CLI's
`--distributed` flag, main.py:114-116 — reference multi-node is an empty stub,
Multiprocessing.py:32-61 / communicators.py:87-105). The restart-sharded
phasing run executes as one SPMD program across both processes; each process
then checks its addressable shards against a locally-computed single-device
trajectory.
"""
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    n_global = len(jax.devices())
    assert n_global == 4 * nproc, n_global

    import numpy as np
    from xframe_tpu.parallel.mesh import make_mesh, MultiStartRunner
    from xframe_tpu.projects.fxs.demo import make_demo_problem
    from xframe_tpu.projects.fxs.phasing import Segment

    p = make_demo_problem(8, 4)
    schedule = [Segment("HIO", 2, betas=np.full(2, 0.5), ft_stab=True),
                Segment("ER", 1, betas=np.zeros(1), ft_stab=True)]
    n_restarts = n_global
    rho0s = p.initial_density_batch(0, n_restarts)  # same on every process

    mesh = make_mesh({"restarts": n_global})
    runner = MultiStartRunner(p.mtip, schedule, mesh)
    states, errors = runner(np.asarray(rho0s))
    jax.block_until_ready(errors)

    # single-device reference for the restarts this process owns
    import jax.numpy as jnp
    ref_states, ref_errors = jax.jit(
        lambda r: p.mtip.run_batch(r, schedule))(jnp.asarray(rho0s))
    ref_errors = np.asarray(ref_errors)

    worst = 0.0
    for shard in errors.addressable_shards:
        got = np.asarray(shard.data)
        want = ref_errors[shard.index]
        assert np.isfinite(got).all()
        worst = max(worst, float(np.abs(got - want).max()
                                 / (np.abs(want).max() + 1e-12)))
    assert worst < 2e-3, worst
    print(f"DIST OK p{pid} rel={worst:.2e}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
