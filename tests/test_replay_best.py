"""Replay-mode best-state tracking (VERDICT r3 #1): the anchor+replay
strategy must reproduce eager per-iteration best tracking exactly — same
error trajectories, same best_err, same best_rho/best_mask — while carrying
no grid-sized best state through the scan."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xframe_tpu.projects.fxs.demo import make_demo_problem
from xframe_tpu.projects.fxs.phasing import MTIP, Segment


@pytest.fixture(scope="module")
def demo():
    return make_demo_problem(12, 6, fused_sht=True)


def _mtip_clone(p, best_mode):
    m = p.mtip
    clone = MTIP(p.ft, m.rc, m.real, m.sw, m._w_err_host, m.initial_support,
                 enforce_initial_support_limit=m.enforce_limit,
                 best_mode=best_mode)
    return clone


def _schedule(sw_sigma):
    # HIO (fluctuating errors → mid-segment best) + SW + ER + a
    # SNAPSHOT/RESET_TO_BEST pair + final ER (monotone → 0-length replay)
    return [
        Segment("SNAPSHOT"),
        Segment("HIO", 7, betas=np.linspace(0.6, 0.4, 7), ft_stab=True),
        Segment("SW", sigma=sw_sigma, threshold=0.1),
        Segment("ER", 5, betas=np.zeros(5), ft_stab=True),
        Segment("RESET_TO_BEST"),
        Segment("HIO", 4, betas=np.full(4, 0.5), ft_stab=False),
        Segment("ER", 4, betas=np.zeros(4), ft_stab=True),
    ]


def test_replay_matches_eager(demo):
    p = demo
    sched = _schedule(p.mtip.sw.default_sigma)
    rho0 = p.initial_density_batch(3, 1)[0]
    eager = _mtip_clone(p, "eager")
    replay = _mtip_clone(p, "replay")
    assert replay.best_mode == "replay"
    s_e, errs_e = jax.jit(lambda r: eager.run(r, sched))(rho0)
    s_r, errs_r = jax.jit(lambda r: replay.run(r, sched))(rho0)
    errs_e, errs_r = np.asarray(errs_e), np.asarray(errs_r)
    assert np.isfinite(errs_e).all()
    # identical trajectories (same kernels, different bookkeeping)
    np.testing.assert_allclose(errs_r, errs_e, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(float(s_r.best_err), float(s_e.best_err),
                               rtol=2e-5)
    # the replayed best density IS the eager best density
    d = np.abs(np.asarray(s_r.best_rho) - np.asarray(s_e.best_rho)).max()
    scale = np.abs(np.asarray(s_e.best_rho)).max()
    assert d < 2e-5 * scale, d
    assert (np.asarray(s_r.best_mask) == np.asarray(s_e.best_mask)).all()
    # final iterate agrees too (RESET_TO_BEST took the same branch)
    d2 = np.abs(np.asarray(s_r.rho) - np.asarray(s_e.rho)).max()
    assert d2 < 2e-5 * scale, d2


def test_replay_batched_and_runner(demo):
    """Multi-start batch through MultiStartRunner (vmapped replay incl. the
    while_loop-under-vmap replay) matches eager."""
    from xframe_tpu.parallel.mesh import MultiStartRunner
    p = demo
    sched = _schedule(p.mtip.sw.default_sigma)
    rho0s = p.initial_density_batch(0, 3)
    eager = _mtip_clone(p, "eager")
    replay = _mtip_clone(p, "replay")
    run_e = MultiStartRunner(eager, sched)
    run_r = MultiStartRunner(replay, sched)
    s_e, errs_e = run_e(rho0s)
    s_r, errs_r = run_r(rho0s)
    np.testing.assert_allclose(np.asarray(errs_r), np.asarray(errs_e),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_r.best_err),
                               np.asarray(s_e.best_err), rtol=2e-5)
    d = np.abs(np.asarray(s_r.best_rho) - np.asarray(s_e.best_rho)).max()
    assert d < 3e-5 * np.abs(np.asarray(s_e.best_rho)).max()


def test_replay_checkpoint_resume(demo, tmp_path):
    """CheckpointingRunner in replay mode: anchors survive the checkpoint
    round-trip; a resumed run finishes with the same best as one-shot."""
    from xframe_tpu.parallel.mesh import CheckpointingRunner
    p = demo
    sched = _schedule(p.mtip.sw.default_sigma)
    rho0s = p.initial_density_batch(5, 2)
    replay = _mtip_clone(p, "replay")
    one = CheckpointingRunner(replay, sched)
    s_full, errs_full = one(rho0s, resume=False)

    ck = str(tmp_path / "ck.h5")
    two = CheckpointingRunner(replay, sched, checkpoint_path=ck)
    two(rho0s, resume=False, max_chunks=1)
    s_res, errs_res = two(rho0s, resume=True)
    np.testing.assert_allclose(np.asarray(errs_res), np.asarray(errs_full),
                               rtol=2e-5, atol=1e-7)
    d = np.abs(np.asarray(s_res.best_rho) - np.asarray(s_full.best_rho)).max()
    assert d < 3e-5 * np.abs(np.asarray(s_full.best_rho)).max()
    np.testing.assert_allclose(np.asarray(s_res.best_err),
                               np.asarray(s_full.best_err), rtol=2e-5)


def test_replay_anchor_len_zero_for_monotone_tail(demo):
    """When the best is the last iterate of a segment (monotone ER), the
    anchor replays ZERO iterations — the steady-state cost model."""
    p = demo
    sched = [Segment("HIO", 6, betas=np.full(6, 0.5), ft_stab=True),
             Segment("ER", 8, betas=np.zeros(8), ft_stab=True)]
    rho0 = p.initial_density_batch(1, 1)[0]
    replay = _mtip_clone(p, "replay")
    replay.set_schedule_tables(sched)
    state = replay.initial_state(rho0)
    state, errs = jax.jit(
        lambda s: replay.run_from(s, sched, materialize=False))(state)
    errs = np.asarray(errs)[:, 0]
    if errs[6:].argmin() == len(errs[6:]) - 1:   # ER tail monotone
        assert int(state.anchor_len) == 0
    assert int(state.anchor_len) <= 8


def test_resume_eager_checkpoint_under_replay(demo, tmp_path):
    """A checkpoint written by EAGER bookkeeping (round-3 files have no
    anchor fields) must resume under the replay default: fresh anchors are
    synthesized from the checkpointed best state, and the finished run's
    best is still the global best across both halves."""
    from xframe_tpu.parallel.mesh import CheckpointingRunner
    p = demo
    sched = _schedule(p.mtip.sw.default_sigma)
    rho0s = p.initial_density_batch(11, 2)
    ck = str(tmp_path / "eager_ck.h5")
    eager = _mtip_clone(p, "eager")
    CheckpointingRunner(eager, sched, checkpoint_path=ck)(
        rho0s, resume=False, max_chunks=1)
    replay = _mtip_clone(p, "replay")
    s_res, errs_res = CheckpointingRunner(replay, sched,
                                          checkpoint_path=ck)(
        rho0s, resume=True)
    errs_res = np.asarray(errs_res)
    assert np.isfinite(errs_res).all()
    # global best over the full trajectory, regardless of which half and
    # which bookkeeping found it
    np.testing.assert_allclose(np.asarray(s_res.best_err),
                               errs_res[:, :, 0].min(axis=1), rtol=2e-5)
    assert np.isfinite(np.asarray(s_res.best_rho)).all()


def test_square_angular_grid_fused_weight_grid():
    """K4's plane-vs-grid weight dispatch keys on ndim, not shape: a square
    angular grid (n_theta == n_phi, legal whenever n_phi >= 2L+1) with a
    full-grid weight array must run — shape[-1] == n_theta used to misfire
    and broadcast-crash."""
    p = make_demo_problem(12, 6, n_theta=16, n_phi=16, fused_sht=True)
    sched = [Segment("HIO", 3, betas=np.full(3, 0.5), ft_stab=True)]
    # non-separable weights: perturb one φ column so the separable-plane
    # detection cannot reduce them to a (q, θ) plane
    w = np.asarray(p.mtip._w_err_host, dtype=np.float64)
    w = np.broadcast_to(w[..., None] if w.ndim == 2 else w,
                        (12, 16, 16)).copy()
    w[:, :, 3] *= 1.25
    m = MTIP(p.ft, p.mtip.rc, p.mtip.real, p.mtip.sw, w,
             p.mtip.initial_support,
             enforce_initial_support_limit=p.mtip.enforce_limit,
             best_mode="replay")
    rho0 = p.initial_density_batch(0, 1)[0]
    state, errs = jax.jit(lambda r: m.run(r, sched))(rho0)
    assert np.isfinite(np.asarray(errs)).all()
