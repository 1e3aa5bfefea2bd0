"""Mesh sharding correctness: dp and dp×tp sharded phasing must reproduce
the single-device trajectory bit-for-tolerance."""
import numpy as np
import jax
import pytest

from xframe_tpu.parallel.mesh import (make_mesh, default_mesh_axes,
                                      MultiStartRunner, CheckpointingRunner)
from xframe_tpu.projects.fxs.demo import make_demo_problem
from xframe_tpu.projects.fxs.phasing import Segment


@pytest.fixture(scope="module")
def problem():
    return make_demo_problem(16, 8)


@pytest.fixture(scope="module")
def schedule(problem):
    return [
        Segment("HIO", 6, betas=np.full(6, 0.5), ft_stab=True),
        Segment("SW", sigma=problem.mtip.sw.default_sigma, threshold=0.1),
        Segment("ER", 4, betas=np.zeros(4), ft_stab=True),
    ]


def test_mesh_axes_factorization():
    assert default_mesh_axes(8) == {"restarts": 4, "theta": 2}
    assert default_mesh_axes(2) == {"restarts": 2}
    assert default_mesh_axes(1) == {"restarts": 1}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_unsharded(problem, schedule):
    rho0s = problem.initial_density_batch(0, 8)
    ref_states, ref_errors = MultiStartRunner(problem.mtip, schedule,
                                              mesh=None)(rho0s)
    ref_errors = np.asarray(ref_errors)

    for axes in ({"restarts": 8}, {"restarts": 4, "theta": 2}):
        mesh = make_mesh(axes)
        states, errors = MultiStartRunner(problem.mtip, schedule, mesh)(rho0s)
        errors = np.asarray(errors)
        assert errors.shape == ref_errors.shape
        # tp-sharding changes the f32 reduction order of the θ contraction:
        # trajectories agree to single-precision accumulation tolerance
        assert np.allclose(errors, ref_errors, rtol=2e-2, atol=1e-5), axes
        assert np.allclose(np.asarray(states.best_err),
                           np.asarray(ref_states.best_err), rtol=2e-2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_checkpointing_runner_sharded(problem, schedule, tmp_path):
    rho0s = problem.initial_density_batch(3, 8)
    mesh = make_mesh({"restarts": 4, "theta": 2})
    ref_states, ref_errors = MultiStartRunner(problem.mtip, schedule,
                                              mesh=None)(rho0s)
    runner = CheckpointingRunner(problem.mtip, schedule, mesh,
                                 checkpoint_path=str(tmp_path / "ck.h5"))
    states, errors = runner(rho0s)
    assert np.allclose(np.asarray(errors), np.asarray(ref_errors),
                       rtol=2e-2, atol=1e-5)


def test_checkpointing_runner_resume(problem, schedule, tmp_path):
    """Interrupt after one chunk, resume with a FRESH runner from the
    snapshot; the completed run matches an uninterrupted one."""
    rho0s = problem.initial_density_batch(5, 4)
    ck = str(tmp_path / "resume.h5")
    ref_states, ref_errors = CheckpointingRunner(
        problem.mtip, schedule, None, checkpoint_path=None)(rho0s,
                                                            resume=False)
    first = CheckpointingRunner(problem.mtip, schedule, None,
                                checkpoint_path=ck)
    assert len(first.chunks) >= 2, "schedule must split into >=2 chunks"
    first(rho0s, resume=False, max_chunks=1)
    import os
    assert os.path.exists(ck)
    second = CheckpointingRunner(problem.mtip, schedule, None,
                                 checkpoint_path=ck)
    states, errors = second(rho0s, resume=True)
    assert np.asarray(errors).shape == np.asarray(ref_errors).shape
    assert np.allclose(np.asarray(errors), np.asarray(ref_errors),
                       rtol=2e-2, atol=1e-5)
    assert np.allclose(np.asarray(states.best_err),
                       np.asarray(ref_states.best_err), rtol=2e-2, atol=1e-5)
