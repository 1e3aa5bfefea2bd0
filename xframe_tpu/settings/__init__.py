"""Settings system — populated by settings.loader (see that module)."""
from xframe_tpu.settings.tools import DictNamespace

general = DictNamespace()
project = DictNamespace()
raw_project = {}


def load_settings(project_name, worker, settings_name=None, overrides=None):
    from xframe_tpu.settings.loader import load_project_settings
    global raw_project
    ns, raw = load_project_settings(project_name, worker, settings_name, overrides=overrides)
    project.clear()
    project.update(ns)
    raw_project = raw
    return project
