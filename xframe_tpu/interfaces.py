"""Abstract contracts between the framework shell and project/experiment code.

Mirrors the reference's interface layer (/root/reference/xframe/
interfaces.py:9-45): a ProjectWorker is constructed with the live settings
tree and its project database and exposes `run()`; an ExperimentWorker serves
detector data + geometry to projects.
"""
from __future__ import annotations

import abc


class ProjectWorkerInterface(abc.ABC):
    """One runnable analysis step of a project (correlate, extract, ...)."""

    def __init__(self):
        from xframe_tpu import settings
        self.settings = settings.project
        self.db = self._load_db()

    def _load_db(self):
        """Project database; projects override `database_class`."""
        cls = getattr(self, "database_class", None)
        if cls is None:
            from xframe_tpu.io.database import DefaultDB
            return DefaultDB()
        return cls(self.settings)

    @abc.abstractmethod
    def run(self):
        ...


class ExperimentWorkerInterface(abc.ABC):
    """Facility data access (reference interfaces.py:22-45)."""

    @abc.abstractmethod
    def get_data(self, selection):
        ...

    @abc.abstractmethod
    def get_geometry(self):
        ...

    @abc.abstractmethod
    def get_pixel_grid_reciprocal(self):
        ...
