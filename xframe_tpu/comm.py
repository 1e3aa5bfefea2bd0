"""Communication facade: the project-facing experiment access surface.

Mirrors the reference's comm_module (reference control/communicators.py:14-85)
minus the multiprocessing/GPU RPC halves, which the jitted compute path made
obsolete (SURVEY.md §2.8): projects call `get_data`/`get_geometry`/
`get_pixel_grid_reciprocal` against whichever experiment was selected — via
the CLI `-e` flag, settings, or `select_experiment`.
"""
from __future__ import annotations

_experiment = None


def select_experiment(name_or_worker, **kwargs):
    """Bind an experiment: an ExperimentWorker instance, or a name like
    'SPB' (resolved from xframe_tpu.experiments.<name>.experiment)."""
    global _experiment
    if isinstance(name_or_worker, str):
        import importlib
        mod = importlib.import_module(
            f"xframe_tpu.experiments.{name_or_worker}.experiment")
        _experiment = mod.ExperimentWorker(**kwargs)
    else:
        _experiment = name_or_worker
    return _experiment


def experiment():
    if _experiment is None:
        raise RuntimeError("no experiment selected "
                           "(comm.select_experiment or the CLI -e flag)")
    return _experiment


def get_data(selection=None):
    return experiment().get_data(selection)


def get_geometry():
    return experiment().get_geometry()


def get_pixel_grid_reciprocal():
    return experiment().get_pixel_grid_reciprocal()
