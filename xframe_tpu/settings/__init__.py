"""Settings system — the three global trees of the reference
(`general`/`project`/`experiment`, reference settings/__init__.py:7-19),
populated by settings.loader (see that module for the YAML dialect)."""
from xframe_tpu.settings.tools import DictNamespace
from xframe_tpu.settings.loader import load_general_settings

# general: code defaults + <home>/settings/general.yaml overrides (the
# reference's general.py survivors; loglevel/home/install/worker names)
general = load_general_settings()
project = DictNamespace()
raw_project = {}
experiment = DictNamespace()
raw_experiment = {}


def load_settings(project_name, worker, settings_name=None, overrides=None):
    from xframe_tpu.settings.loader import load_project_settings
    global raw_project
    ns, raw = load_project_settings(project_name, worker, settings_name, overrides=overrides)
    project.clear()
    project.update(ns)
    raw_project = raw
    return project


def load_experiment_settings(experiment_name, settings_name=None,
                             overrides=None):
    """Populate settings.experiment from per-experiment YAML (defaults +
    named file via the loader precedence; reference
    _update_settings_on_experiment_select, settings/__init__.py:32-39)."""
    from xframe_tpu.settings.loader import load_experiment_settings as _load
    global raw_experiment
    ns, raw = _load(experiment_name, settings_name, overrides=overrides)
    experiment.clear()
    experiment.update(ns)
    raw_experiment = raw
    return experiment


def reload_general():
    """Re-read general settings (picks up <home>/settings/general.yaml after
    a home change — tests repoint XFRAME_TPU_HOME)."""
    ns = load_general_settings()
    general.clear()
    general.update(ns)
    return general
