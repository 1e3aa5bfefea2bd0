"""Scripting-facade access to the selected project's database.

Mirrors the reference's `xframe.database.project` (populated by
select_project, reference startup_routines.py:206-218 `_load_db` and
docs/fxs/scripting.md "Accessing project files"): after

    import xframe_tpu as xf
    xf.select_project('fxs', 'extract', 'tutorial')
    db = xf.database.project
    ccd = db.load('ccd')

`project` is an instance of the project's ProjectDB (its `_database_`
module) built from the live settings tree, or a DefaultDB when the project
ships no custom database. Workers construct their own instance at run time
(interfaces.ProjectWorkerInterface._load_db) — this module only serves
interactive/scripting use; mutating it does not affect a running worker.
"""
from __future__ import annotations

project = None


def __getattr__(name):
    # `default` = framework-level DB (reference startup_routines.py:128),
    # built lazily so importing the package stays side-effect free
    if name == "default":
        from xframe_tpu.io.database import DefaultDB
        db = DefaultDB()
        globals()["default"] = db
        return db
    raise AttributeError(name)


def _select(project_name: str):
    """(Re)build `project` for the newly selected project. Called by
    xframe_tpu.select_project after the settings tree is loaded."""
    global project
    import importlib

    from xframe_tpu import settings

    # fall back to DefaultDB only when the project ships no _database_ module
    # or no ProjectDB class — NOT on errors raised inside ProjectDB.__init__
    # (those are real bugs and must surface, not silently degrade paths)
    try:
        mod = importlib.import_module(
            f"xframe_tpu.projects.{project_name}._database_")
    except ModuleNotFoundError:
        mod = None
    cls = getattr(mod, "ProjectDB", None) if mod is not None else None
    if cls is None:
        from xframe_tpu.io.database import DefaultDB
        project = DefaultDB()
    else:
        project = cls(settings.project)
    return project
