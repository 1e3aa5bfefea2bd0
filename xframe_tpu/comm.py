"""Communication facade: the project-facing experiment access surface.

Mirrors the reference's comm_module (reference control/communicators.py:14-85)
minus the multiprocessing/GPU RPC halves, which the jitted compute path made
obsolete (SURVEY.md §2.8): projects call `get_data`/`get_geometry`/
`get_pixel_grid_reciprocal` against whichever experiment was selected — via
the CLI `-e` flag, settings, or `select_experiment`.
"""
from __future__ import annotations

_experiment = None


def select_experiment(name_or_worker, settings_name=None, **kwargs):
    """Bind an experiment: an ExperimentWorker instance, or a name like
    'SPB' (resolved from xframe_tpu.experiments.<name>.experiment).

    For a name, the per-experiment settings tree is loaded first (versioned
    defaults + the named file through the loader precedence — reference
    select_experiment, startup_routines.py:249-258; CLI `-eset`) into
    `settings.experiment`, and the worker binds from it via its
    `from_settings` hook. Explicit keyword arguments override settings."""
    global _experiment
    if isinstance(name_or_worker, str):
        import importlib
        from xframe_tpu import settings
        mod_name = settings.general.get("default_experiment_module_name",
                                        "experiment")
        mod = importlib.import_module(
            f"xframe_tpu.experiments.{name_or_worker}.{mod_name}")
        opt = settings.load_experiment_settings(name_or_worker, settings_name)
        cls = getattr(mod, settings.general.get(
            "default_experiment_worker_name", "ExperimentWorker"))
        if hasattr(cls, "from_settings"):
            _experiment = cls.from_settings(opt, **kwargs)
        else:
            _experiment = cls(**kwargs)
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
