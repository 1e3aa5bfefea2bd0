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

import os

import numpy as np
import jax
import jax.numpy as jnp
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


def _shard_map_restarts(fn, mesh: Mesh, spec, n_in: int = 1):
    """shard_map `fn` over the restart axis; later inputs stay replicated."""
    in_specs = (spec,) + (P(),) * (n_in - 1)
    try:  # jax >= 0.7: keyword is check_vma
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=spec, check_vma=False)
    except TypeError:  # older API
        from jax.experimental.shard_map import shard_map
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=spec, check_rep=False)


def _pad_restarts(batch, n_shards: int):
    """Pad the leading (restart) axis to a multiple of n_shards with
    wrap-around copies (also covers n_restarts < n_shards)."""
    n = int(batch.shape[0])
    if n % n_shards == 0:
        return batch
    target = -(-n // n_shards) * n_shards
    idx = np.arange(target) % n
    return jnp.asarray(batch)[idx]


class MultiStartRunner:
    """Jitted multi-start phasing over a device mesh.

    rho0_batch (n_restarts, n_q, n_theta, n_phi) is sharded
    P('restarts', None, 'theta', None); constants (Legendre tables, Hankel
    weights, projection data) are replicated by the partitioner. Output
    PhasingStates keep the restart sharding; error curves are gathered host-side.
    """

    def __init__(self, mtip, schedule, mesh: Mesh | None = None,
                 restart_axis: str = "restarts", theta_axis: str | None = "theta",
                 arg_tables: bool | str | dict = "auto"):
        """arg_tables: thread the big numeric tables (Hankel, fused SHT,
        projection matrices — mtip.arg_tables) into jit as ARGUMENTS instead
        of embedded constants. 'auto' (default) always uses argument mode:
        it avoids the tunnel's compile-payload limit (measured HTTP 413
        between ~150 and 432 MB of embedded constants) AND keeps the
        program data-independent so the persistent compile cache hits
        across datasets; bitwise-identical either way."""
        self.mtip = mtip
        self.schedule = schedule
        self.mesh = mesh
        self._tables = self._resolve_tables(mtip, arg_tables, mesh)
        fn = lambda rho, t: mtip.run_batch(rho, schedule, tables=t)  # noqa: E731
        grid_rank = np.ndim(mtip.initial_support)  # 3 for (r,θ,φ), 2 for (r,φ)
        fused = getattr(mtip, "_fi", None) is not None
        self._n_shards = None
        if mesh is not None and fused:
            # Pallas kernels are opaque to the GSPMD partitioner: shard the
            # (embarrassingly parallel) restart axis explicitly with
            # shard_map — each shard runs its own kernel grids, no
            # collectives. The θ tensor-parallel axis applies only to the
            # jnp SHT path (a sharded einsum), so flatten whatever mesh was
            # configured into a restarts-only mesh over ALL its devices —
            # otherwise every θ replica would silently recompute identical
            # work.
            sub = Mesh(mesh.devices.reshape(-1), (restart_axis,))
            spec = P(restart_axis)
            self.in_sharding = NamedSharding(sub, spec)
            self._n_shards = int(sub.devices.size)
            fn = _shard_map_restarts(fn, sub, spec, n_in=2)
            self._jitted = jax.jit(fn)
        elif mesh is not None:
            theta = theta_axis if (theta_axis in mesh.axis_names
                                   and grid_rank == 3) else None
            spec = P(restart_axis, None, theta, None) if grid_rank == 3 \
                else P(restart_axis, None, None)
            self.in_sharding = NamedSharding(mesh, spec)
            repl = NamedSharding(mesh, P())
            self._jitted = jax.jit(
                fn, in_shardings=(self.in_sharding,
                                  jax.tree.map(lambda _: repl, self._tables)))
        else:
            self.in_sharding = None
            self._jitted = jax.jit(fn)

    @staticmethod
    def _resolve_tables(mtip, arg_tables, mesh):
        """→ device-resident tables dict ({} = embedded-constant mode).
        A dict is taken as already-resolved (possibly device-resident)
        tables — callers that device_put their own copy pass it here so the
        ~½ GB set is not resident twice."""
        if isinstance(arg_tables, dict):
            return arg_tables
        if arg_tables == "auto":
            # Argument mode is the default whenever tables exist: besides
            # the payload rule (HTTP 413 above ~150-400 MB of embedded
            # constants), embedded V/PD/fi tables change with every extract
            # output, so each dataset recompiled the whole phasing program —
            # argument mode keeps the jaxpr data-independent and the
            # persistent compile cache hit across runs (measured: tutorial
            # reconstruct chunk-0 218.7 s embedded vs 19.4 s args+cache).
            # XF_ARG_TABLES=0/1 overrides for A/Bs.
            env = os.environ.get("XF_ARG_TABLES")
            arg_tables = env.lower() not in ("0", "false") if env else True
        if not arg_tables or not hasattr(mtip, "arg_tables"):
            return {}
        t = mtip.arg_tables()
        if mesh is not None:
            repl = NamedSharding(mesh, P())
            t = {k: jax.device_put(v, repl) for k, v in t.items()}
        else:
            t = jax.device_put(t)
        return t

    def __call__(self, rho0_batch):
        n = int(rho0_batch.shape[0])
        if self._n_shards:
            # shard_map needs the restart axis divisible by the shard count:
            # pad with wrap-around copies and trim every output leaf back.
            rho0_batch = _pad_restarts(rho0_batch, self._n_shards)
        if self.in_sharding is not None:
            rho0_batch = jax.device_put(rho0_batch, self.in_sharding)
        out = self._jitted(rho0_batch, self._tables)
        if self._n_shards and int(rho0_batch.shape[0]) != n:
            out = jax.tree.map(lambda x: x[:n], out)
        return out


def rank_restarts(states, errors=None):
    """Host-side: restart indices sorted by best error (ascending), as the
    reference's error-sorted result collection (reconstruct.py:160-184)."""
    from xframe_tpu.library.hostio import to_host
    best = to_host(states.best_err)
    return np.argsort(best), best


def split_schedule_chunks(schedule):
    """Split a flattened schedule at shrink-wrap boundaries: each chunk is a
    run of iteration segments ending with (and including) the next SW. Chunks
    with identical structure share one jit compilation."""
    chunks, current = [], []
    for seg in schedule:
        current.append(seg)
        if seg.method in ("SW", "SW_center"):
            chunks.append(current)
            current = []
    if current:
        chunks.append(current)
    return chunks


def _chunk_structure_args(chunk):
    structure, args = [], []
    for seg in chunk:
        if seg.method in ("SW", "SW_center"):
            structure.append((seg.method,))
            args.append((np.float32(seg.sigma), np.float32(seg.threshold)))
        elif seg.method in ("SNAPSHOT", "RESET_TO_BEST"):
            structure.append((seg.method,))
            args.append(())
        else:
            link = int(getattr(seg, "ft_stab_link_delay", 0) or 0)
            structure.append((seg.method, int(seg.n), bool(seg.ft_stab))
                             if not link else
                             (seg.method, int(seg.n), bool(seg.ft_stab),
                              link))
            args.append(np.asarray(seg.betas, dtype=np.float32))
    return tuple(structure), tuple(args)


class CheckpointingRunner:
    """Multi-start runner that executes the schedule in shrink-wrap-bounded
    chunks, snapshotting the full batched PhasingState to disk between chunks
    — mid-run durability the reference lacks (SURVEY.md §5 "no checkpoint
    restart"). Identical chunk structures reuse one compilation because ramp
    values enter as traced arguments (MTIP.run_chunk)."""

    def __init__(self, mtip, schedule, mesh: Mesh | None = None,
                 checkpoint_path: str | None = None, save_every: int = 1,
                 restart_axis: str = "restarts", theta_axis: str = "theta",
                 arg_tables: bool | str | dict = "auto"):
        self.mtip = mtip
        self.chunks = split_schedule_chunks(schedule)
        # replay-mode best tracking: global schedule tables + per-chunk
        # iteration offsets (pos0 enters the chunk program as a traced
        # scalar so identical structures still share one compilation)
        if getattr(mtip, "best_mode", "eager") == "replay":
            mtip.set_schedule_tables(schedule)
        # dynamic ft_stab: the enforce-history length must come from the FULL
        # schedule, not per-chunk sub-schedules (history carries across SWs)
        if hasattr(mtip, "register_schedule_dynamics"):
            mtip.register_schedule_dynamics(schedule)
        self._chunk_pos = np.cumsum(
            [0] + [sum(s.n for s in c if s.method not in
                       ("SW", "SW_center", "SNAPSHOT", "RESET_TO_BEST"))
                   for c in self.chunks])[:-1]
        self.mesh = mesh
        self.checkpoint_path = checkpoint_path
        self.save_every = max(int(save_every), 1)
        self._compiled = {}
        self._n_shards = None
        self._fused_mesh = None
        self._tables = MultiStartRunner._resolve_tables(mtip, arg_tables, mesh)
        fused = getattr(mtip, "_fi", None) is not None
        if mesh is not None and fused:
            # Same treatment as MultiStartRunner: pallas_call is opaque to
            # GSPMD, so checkpointed multi-chip runs must shard_map the
            # restart axis explicitly to get restart-parallel speedup.
            self._fused_mesh = Mesh(mesh.devices.reshape(-1), (restart_axis,))
            self._restart_axis = restart_axis
            self._n_shards = int(self._fused_mesh.devices.size)
            self.in_sharding = NamedSharding(self._fused_mesh, P(restart_axis))
        elif mesh is not None:
            grid_rank = np.ndim(mtip.initial_support)
            theta = theta_axis if (theta_axis in mesh.axis_names
                                   and grid_rank == 3) else None
            spec = P(restart_axis, None, theta, None) if grid_rank == 3 \
                else P(restart_axis, None, None)
            self.in_sharding = NamedSharding(mesh, spec)
        else:
            self.in_sharding = None
        # One jit wrapper for the initial state, with the support passed as a
        # device argument: a fresh jax.jit(initial_state_batch) per __call__
        # re-traces and re-hashes the ~50 MB embedded support constant each
        # time (~3 s/call measured on the axon tunnel at production scale).
        self._init_support = jnp_bool(np.asarray(mtip.initial_support))
        use_mesh = self._fused_mesh if self._fused_mesh is not None else mesh
        if use_mesh is not None:  # replicate: inputs must share device sets
            self._init_support = jax.device_put(
                self._init_support, NamedSharding(use_mesh, P()))
        self._init_state = jax.jit(mtip.initial_state_batch)

    def _step(self, structure):
        if structure not in self._compiled:
            def fn(state, args, tables, pos0):
                with self.mtip.bound_tables(tables):
                    return jax.vmap(
                        lambda s: self.mtip.run_chunk(s, structure, args,
                                                      pos0=pos0))(state)
            if self._fused_mesh is not None:
                fn = _shard_map_restarts(fn, self._fused_mesh,
                                         P(self._restart_axis), n_in=4)
            self._compiled[structure] = jax.jit(fn, static_argnums=())
        return self._compiled[structure]

    def _materialize(self):
        """Replay-mode finalization step (fills best_rho/best_mask once per
        run); compiled lazily, shared across calls."""
        if "__materialize__" not in self._compiled:
            def fn(state, tables):
                with self.mtip.bound_tables(tables):
                    return jax.vmap(self.mtip.materialize_best)(state)
            if self._fused_mesh is not None:
                fn = _shard_map_restarts(fn, self._fused_mesh,
                                         P(self._restart_axis), n_in=2)
            self._compiled["__materialize__"] = jax.jit(fn)
        return self._compiled["__materialize__"]

    # --------------------------------------------------------- checkpoint IO
    def _save(self, state, errors_list, chunk_index):
        from xframe_tpu.library.hostio import tree_to_host, to_host
        from xframe_tpu.io import hdf5 as hdf5_io
        import os
        h = tree_to_host(state)
        data = {
            "chunk_index": int(chunk_index),
            "rho_re": np.real(h.rho), "rho_im": np.imag(h.rho),
            "support": np.asarray(h.support),
            "best_rho_re": np.real(h.best_rho),
            "best_rho_im": np.imag(h.best_rho),
            "best_mask": np.asarray(h.best_mask),
            "best_err": np.asarray(h.best_err),
            "last_err": np.asarray(h.last_err),
            "errors": np.concatenate([to_host(e) for e in errors_list], axis=1)
            if errors_list else np.zeros((0, 0, 2), dtype=np.float32),
        }
        if h.err_snapshot is not None:  # mid-loop SNAPSHOT (reset-to-best)
            data["err_snapshot"] = np.asarray(h.err_snapshot)
        if h.anchor_rho is not None:    # replay-mode best tracking
            data["anchor_rho_re"] = np.real(h.anchor_rho)
            data["anchor_rho_im"] = np.imag(h.anchor_rho)
            data["anchor_sup"] = np.asarray(h.anchor_sup)
            data["anchor_z_re"] = np.real(h.anchor_z)
            data["anchor_z_im"] = np.imag(h.anchor_z)
            data["anchor_z2_re"] = np.real(h.anchor_z2)
            data["anchor_z2_im"] = np.imag(h.anchor_z2)
            data["anchor_start"] = np.asarray(h.anchor_start)
            data["anchor_len"] = np.asarray(h.anchor_len)
            if h.anchor_gate is not None:
                data["anchor_gate"] = np.asarray(h.anchor_gate)
        if h.enforce_hist is not None:  # dynamic ft_stab shift register
            data["enforce_hist"] = np.asarray(h.enforce_hist)
        tmp = self.checkpoint_path + ".tmp"
        os.makedirs(os.path.dirname(os.path.abspath(tmp)), exist_ok=True)
        hdf5_io.save(tmp, data)
        os.replace(tmp, self.checkpoint_path)

    def _load(self):
        from xframe_tpu.io import hdf5 as hdf5_io
        from xframe_tpu.library.hostio import to_device_complex
        from xframe_tpu.projects.fxs.phasing import PhasingState
        import os
        if not (self.checkpoint_path and os.path.exists(self.checkpoint_path)):
            return None, 0, []
        d = hdf5_io.load(self.checkpoint_path)
        state = PhasingState(
            rho=to_device_complex(np.asarray(d["rho_re"])
                                  + 1j * np.asarray(d["rho_im"]),
                                  self.mtip.cdtype),
            support=jnp_bool(np.asarray(d["support"])),
            best_rho=to_device_complex(np.asarray(d["best_rho_re"])
                                       + 1j * np.asarray(d["best_rho_im"]),
                                       self.mtip.cdtype),
            best_mask=jnp_bool(np.asarray(d["best_mask"])),
            best_err=np.asarray(d["best_err"], dtype=np.float32),
            last_err=np.asarray(d["last_err"], dtype=np.float32),
            err_snapshot=np.asarray(d["err_snapshot"], dtype=np.float32)
            if "err_snapshot" in d else None)
        if "anchor_rho_re" in d:        # replay-mode best tracking
            f = jax.jit(lambda x: x.astype(jnp.int8))
            state = state._replace(
                anchor_rho=to_device_complex(
                    np.asarray(d["anchor_rho_re"])
                    + 1j * np.asarray(d["anchor_rho_im"]), self.mtip.cdtype),
                anchor_sup=f(np.asarray(d["anchor_sup"], dtype=np.float32)),
                anchor_z=to_device_complex(
                    np.asarray(d["anchor_z_re"])
                    + 1j * np.asarray(d["anchor_z_im"]), self.mtip.cdtype),
                anchor_z2=to_device_complex(
                    np.asarray(d["anchor_z2_re"])
                    + 1j * np.asarray(d["anchor_z2_im"]), self.mtip.cdtype),
                anchor_start=np.asarray(d["anchor_start"], dtype=np.int32),
                anchor_len=np.asarray(d["anchor_len"], dtype=np.int32),
                anchor_gate=np.asarray(d["anchor_gate"], dtype=np.float32)
                if "anchor_gate" in d else
                np.ones_like(np.asarray(d["best_err"], dtype=np.float32)))
        elif self.mtip.best_mode == "replay":
            # checkpoint written by eager/lazy bookkeeping (or round-3
            # code) resumed under replay: synthesize fresh anchors from the
            # loaded best state — the replayed best is then the best found
            # AFTER resume, combined with the checkpointed best through the
            # ordinary best_err comparison
            state = state._replace(**self.mtip._anchor_fields(
                state.best_rho, state.best_mask,
                batch_shape=state.best_err.shape))
        if "enforce_hist" in d:          # dynamic ft_stab shift register
            state = state._replace(
                enforce_hist=np.asarray(d["enforce_hist"]).astype(bool))
        prev = np.asarray(d["errors"], dtype=np.float32)
        errors = [prev] if prev.ndim == 3 and prev.shape[1] > 0 else []
        return state, int(d["chunk_index"]), errors

    # ------------------------------------------------------------------ run
    def __call__(self, rho0_batch, resume=True, max_chunks=None):
        """max_chunks limits how many chunks run this call (the snapshot
        still lands, so a later call resumes where this one stopped)."""
        n_out = int(rho0_batch.shape[0])
        if self._n_shards:
            rho0_batch = _pad_restarts(rho0_batch, self._n_shards)
        if self.in_sharding is not None:
            rho0_batch = jax.device_put(rho0_batch, self.in_sharding)
        state, start_chunk, errors = (None, 0, [])
        if resume and self.checkpoint_path:
            state, start_chunk, errors = self._load()
        if state is None:
            state = self._init_state(rho0_batch, self._init_support)
            start_chunk, errors = 0, []
        stop = len(self.chunks) if max_chunks is None \
            else min(start_chunk + int(max_chunks), len(self.chunks))
        for i in range(start_chunk, stop):
            structure, args = _chunk_structure_args(self.chunks[i])
            pos0 = jnp.asarray(np.int32(self._chunk_pos[i]))
            state, errs = self._step(structure)(state, args, self._tables,
                                                pos0)
            errors.append(errs)
            if self.checkpoint_path and ((i + 1) % self.save_every == 0
                                         or i == stop - 1):
                jax.block_until_ready(state.rho)
                self._save(state, errors, i + 1)
        if stop == len(self.chunks) \
                and getattr(self.mtip, "best_mode", "eager") == "replay":
            state = self._materialize()(state, self._tables)
        all_errors = jnp.concatenate(
            [jnp.asarray(e) for e in errors], axis=1) if errors \
            else jnp.zeros((len(rho0_batch), 0, 2))
        if int(len(rho0_batch)) != n_out:
            state = jax.tree.map(lambda x: x[:n_out], state)
            all_errors = all_errors[:n_out]
        return state, all_errors


def jnp_bool(arr):
    """bool host array → device bool via a jitted cast (axon-safe)."""
    f = jax.jit(lambda x: x > 0.5)
    return f(np.asarray(arr, dtype=np.float32))
