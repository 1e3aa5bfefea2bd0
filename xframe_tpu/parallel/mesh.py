"""Device-mesh scale-out for multi-start phasing.

TPU-native replacement for the reference's fork-per-restart multiprocessing
(reference reconstruct.py:141-157 + Multiprocessing.py:799-887, SURVEY.md
§2.8): restarts become a vmapped batch axis sharded over a `jax.sharding.Mesh`
('restarts' = data parallel), and optionally the θ axis of the angular grid is
sharded over a second mesh axis ('theta' — the tensor-parallel analog for this
workload: the SHT Legendre contraction over θ then runs as a sharded matmul
with an XLA-inserted psum over ICI). No queues, no shared memory, no RPC — one
jitted SPMD program.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict | None = None, devices=None) -> Mesh:
    """Create a Mesh from {'axis_name': size}. Default: all devices on 'restarts'."""
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"restarts": len(devices)}
    names = tuple(axis_sizes)
    shape = tuple(int(v) for v in axis_sizes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {axis_sizes} needs {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(shape), names)


def default_mesh_axes(n_devices: int) -> dict:
    """dp×tp factorization: θ-shard over 2 devices when the count allows,
    restarts over the rest."""
    if n_devices % 2 == 0 and n_devices > 2:
        return {"restarts": n_devices // 2, "theta": 2}
    return {"restarts": n_devices}


class MultiStartRunner:
    """Jitted multi-start phasing over a device mesh.

    rho0_batch (n_restarts, n_q, n_theta, n_phi) is sharded
    P('restarts', None, 'theta', None); constants (Legendre tables, Hankel
    weights, projection data) are replicated by the partitioner. Output
    PhasingStates keep the restart sharding; error curves are gathered host-side.
    """

    def __init__(self, mtip, schedule, mesh: Mesh | None = None,
                 restart_axis: str = "restarts", theta_axis: str | None = "theta"):
        self.mtip = mtip
        self.schedule = schedule
        self.mesh = mesh
        fn = jax.vmap(partial(mtip.run, schedule=schedule))
        grid_rank = np.ndim(mtip.initial_support)  # 3 for (r,θ,φ), 2 for (r,φ)
        if mesh is not None:
            theta = theta_axis if (theta_axis in mesh.axis_names
                                   and grid_rank == 3) else None
            spec = P(restart_axis, None, theta, None) if grid_rank == 3 \
                else P(restart_axis, None, None)
            self.in_sharding = NamedSharding(mesh, spec)
            self._jitted = jax.jit(fn, in_shardings=(self.in_sharding,))
        else:
            self.in_sharding = None
            self._jitted = jax.jit(fn)

    def __call__(self, rho0_batch):
        if self.in_sharding is not None:
            rho0_batch = jax.device_put(rho0_batch, self.in_sharding)
        return self._jitted(rho0_batch)


def rank_restarts(states, errors=None):
    """Host-side: restart indices sorted by best error (ascending), as the
    reference's error-sorted result collection (reconstruct.py:160-184)."""
    from xframe_tpu.library.hostio import to_host
    best = to_host(states.best_err)
    return np.argsort(best), best
