"""Name → path-template database with format dispatch and run archiving.

Re-design of the reference DefaultDB (/root/reference/xframe/database/
database.py:59-251): every logical dataset name maps to a path template with
`{placeholder}` modifiers; `load(name)`/`save(name, data)` first look for a
`load_<name>`/`save_<name>` override method, then dispatch on the file
extension. Run-numbered archive folders follow the reference convention
(`projects/fxs/_database_.py:59-89`).
"""
from __future__ import annotations

import os
import re
import glob

import numpy as np

from xframe_tpu.io import hdf5 as hdf5_io
from xframe_tpu.settings import loader as settings_loader


class DefaultDB:
    """path templating + extension dispatch + per-name override hooks."""

    def __init__(self, path_templates: dict | None = None, **base_modifiers):
        self.path_templates = dict(path_templates or {})
        self.base_modifiers = dict(base_modifiers)
        self.base_modifiers.setdefault("home", settings_loader.home_dir())

    # ------------------------------------------------------------------ paths
    def get_path(self, key, makedirs=False, **modifiers):
        template = self.path_templates.get(key, key)
        subs = {**self.base_modifiers, **modifiers}
        # repeated substitution lets templates reference other templates
        path = template
        for _ in range(8):
            try:
                new = path.format(**subs)
            except (KeyError, IndexError) as e:
                raise KeyError(
                    f"path template {template!r} for {key!r} is missing "
                    f"modifier {e}") from e
            if new == path:
                break
            path = new
        path = os.path.expanduser(path)
        if makedirs:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        return path

    # --------------------------------------------------------------- dispatch
    def load(self, name, **kwargs):
        hook = getattr(self, f"load_{name}", None)
        if hook is not None:
            return hook(**kwargs)
        return self.load_direct(self.get_path(name, **kwargs.pop("path_modifiers", {})),
                                **kwargs)

    def save(self, name, data, **kwargs):
        hook = getattr(self, f"save_{name}", None)
        if hook is not None:
            return hook(data, **kwargs)
        return self.save_direct(self.get_path(name, makedirs=True,
                                              **kwargs.pop("path_modifiers", {})),
                                data, **kwargs)

    def load_direct(self, path, **kwargs):
        if str(path).startswith("pdb://"):
            # reference PDB_loader protocol (database.py:197-199): electron
            # density of a deposited structure. With grid_cartesian → density
            # on that grid; without → the parsed atom records.
            from xframe_tpu.library import pdb as pdb_io
            file = str(path)[len("pdb://"):]
            grid = kwargs.get("grid_cartesian")
            if pdb_io.is_map_file(file):
                # experimental density (CCP4/MRC map file) with the
                # reference's crs↔xyz sampling (pdb_plugin.py:74-123)
                if grid is None:
                    return pdb_io.read_ccp4(file)
                return pdb_io.map_density(
                    file, grid, center=kwargs.get("center", True),
                    fill_value=kwargs.get("fill_value", 0.0))
            if grid is None:
                pos, zs, occ = pdb_io.parse_pdb(file)
                return {"positions": pos, "electrons": zs, "occupancies": occ}
            return pdb_io.pdb_density(
                file, grid,
                resolution=kwargs.get("resolution", 4.0),
                center=kwargs.get("center", True))
        ext = os.path.splitext(path)[1].lower()
        if ext in (".h5", ".hdf5"):
            return hdf5_io.load(path)
        if ext in (".yaml", ".yml"):
            return settings_loader.load_yaml(path)
        if ext == ".npy":
            return np.load(path)
        if ext in (".txt", ".bash", ".sh", ".zsh", ".fish"):
            with open(path) as f:
                return f.read()
        if ext == ".py":
            # reference PythonAccess: load a python file as a module
            import importlib.util
            name = os.path.splitext(os.path.basename(path))[0]
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod
        if ext == ".raw":
            dtype = kwargs.get("dtype", np.float32)
            data = np.fromfile(path, dtype=dtype)
            shape = kwargs.get("shape")
            return data.reshape(shape) if shape is not None else data
        raise ValueError(f"no loader for extension {ext!r} ({path})")

    def save_direct(self, path, data, **kwargs):
        ext = os.path.splitext(path)[1].lower()
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if ext in (".h5", ".hdf5"):
            return hdf5_io.save(path, data)
        if ext in (".yaml", ".yml"):
            return settings_loader.save_yaml(path, data)
        if ext == ".npy":
            return np.save(path, np.asarray(data))
        if ext in (".txt", ".bash", ".sh", ".zsh", ".fish", ".py"):
            with open(path, "w") as f:
                f.write(str(data))
            return None
        if ext == ".raw":
            return np.asarray(data).tofile(path)
        if ext in (".png", ".pdf", ".svg"):
            data.savefig(path)  # matplotlib figure
            import matplotlib.pyplot as plt
            plt.close(data)
            return None
        if ext in (".vts", ".vtr"):
            from xframe_tpu.io import vtk as vtk_io
            return vtk_io.save(path, **data)
        raise ValueError(f"no saver for extension {ext!r} ({path})")

    # ---------------------------------------------------------- run archiving
    @staticmethod
    def get_latest_run(folder, prefix="run_"):
        """Highest existing run number in `folder` (0 if none);
        reference get_latest_run (fxs _database_.py:59-89)."""
        runs = []
        for p in glob.glob(os.path.join(folder, prefix + "*")):
            m = re.search(rf"{prefix}(\d+)$", p)
            if m:
                runs.append(int(m.group(1)))
        return max(runs) if runs else 0

    @classmethod
    def next_run_folder(cls, folder, prefix="run_"):
        n = cls.get_latest_run(folder, prefix) + 1
        path = os.path.join(folder, f"{prefix}{n}")
        os.makedirs(path, exist_ok=True)
        return path, n
