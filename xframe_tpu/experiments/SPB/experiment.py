"""SPB experiment layer: chunked AGIPD data streaming from EuXFEL-layout HDF5.

Rebuilt from the reference's SPB ExperimentWorker (experiments/SPB/
experiment.py:64-436 + _database_.py VDS machinery): run folders contain one
HDF5 file per module (`RAW-…-AGIPD{mod:02}-….h5` naming) with datasets under
`INSTRUMENT/…/image/{data,cellId,trainId}`. This build streams frame chunks
as numpy batches (host IO), applies gain/offset calibration + filters, and
exposes the geometry through detectors.agipd.AGIPD — no virtual datasets or
per-chunk worker processes needed, since the downstream correlator consumes
whole batches on device.
"""
from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import numpy as np

from xframe_tpu.interfaces import ExperimentWorkerInterface
from xframe_tpu.experiments.SPB.detectors.agipd import AGIPD


@dataclass
class DataSelection:
    """Which frames to stream (reference DataSelection semantics)."""
    frame_range: tuple = (0, None)          # (start, stop) over the run
    modules: tuple = tuple(range(16))
    batch_size: int = 32
    good_cells_only: bool = True


@dataclass
class Filters:
    mask_below: float | None = None
    mask_above: float | None = None
    lit_pixel_fraction_min: float = 0.0


class ExperimentWorker(ExperimentWorkerInterface):
    """Streams calibrated AGIPD frames from a run folder."""

    def __init__(self, run_folder, geometry_file=None, detector_distance=0.217,
                 wavelength=1.23984, data_path_glob="*AGIPD{module:02d}*.h5",
                 image_key="image/data", calibration=None,
                 filters: Filters | None = None):
        self.run_folder = run_folder
        self.wavelength = float(wavelength)
        self.detector = AGIPD(geometry_file=geometry_file,
                              detector_distance=detector_distance)
        self.data_path_glob = data_path_glob
        self.image_key = image_key
        self.calibration = calibration  # dict {offset: (16,...), gain: (16,...)}
        self.filters = filters or Filters()
        self._module_files = self._discover_files()

    # ----------------------------------------------------------------- files
    def _discover_files(self):
        files = {}
        for mod in range(16):
            pattern = os.path.join(self.run_folder,
                                   self.data_path_glob.format(module=mod))
            found = sorted(glob.glob(pattern))
            if found:
                files[mod] = found
        if not files:
            raise FileNotFoundError(
                f"no module files matching {self.data_path_glob!r} under "
                f"{self.run_folder}")
        return files

    def _find_dataset(self, h5file, key):
        """Locate `…/image/data`-style keys anywhere under INSTRUMENT."""
        hits = []

        def visit(name, obj):
            import h5py
            if isinstance(obj, h5py.Dataset) and name.endswith(key):
                hits.append(name)

        h5file.visititems(visit)
        if not hits:
            raise KeyError(f"no dataset ending in {key!r} in {h5file.filename}")
        return hits[0]

    def n_frames(self):
        import h5py
        mod = min(self._module_files)
        n = 0
        for path in self._module_files[mod]:
            with h5py.File(path, "r") as f:
                n += f[self._find_dataset(f, self.image_key)].shape[0]
        return n

    # ------------------------------------------------------------------ data
    def get_data(self, selection: DataSelection | None = None):
        """Generator of dicts {'data': (B, n_mod, ss, fs) float32,
        'frame_ids': (B,), 'good': (B,) bool} (reference get_data :341)."""
        import h5py
        sel = selection or DataSelection()
        total = self.n_frames()
        start, stop = sel.frame_range
        stop = total if stop is None else min(stop, total)
        mods = list(sel.modules)

        handles = {}
        try:
            for mod in mods:
                path = self._module_files[mod][0]
                f = h5py.File(path, "r")
                handles[mod] = (f, f[self._find_dataset(f, self.image_key)])
            for lo in range(start, stop, sel.batch_size):
                hi = min(lo + sel.batch_size, stop)
                batch = np.stack([
                    np.asarray(handles[mod][1][lo:hi], dtype=np.float32)
                    for mod in mods], axis=1)
                batch = self._calibrate(batch, mods)
                good = self._good_mask(batch)
                yield {"data": batch, "frame_ids": np.arange(lo, hi),
                       "good": good}
        finally:
            for f, _ in handles.values():
                f.close()

    def _calibrate(self, batch, mods):
        """offset subtraction + gain scaling (reference calibrators)."""
        if not self.calibration:
            return batch
        off = self.calibration.get("offset")
        gain = self.calibration.get("gain")
        if off is not None:
            batch = batch - np.asarray(off, dtype=np.float32)[None][:, mods]
        if gain is not None:
            batch = batch * np.asarray(gain, dtype=np.float32)[None][:, mods]
        return batch

    def _good_mask(self, batch):
        flt = self.filters
        good = np.ones(len(batch), dtype=bool)
        if flt.lit_pixel_fraction_min > 0:
            frac = (batch > 0).mean(axis=tuple(range(1, batch.ndim)))
            good &= frac >= flt.lit_pixel_fraction_min
        return good

    # -------------------------------------------------------------- geometry
    def get_geometry(self):
        return self.detector.pixel_centers

    def get_pixel_grid_reciprocal(self):
        return self.detector.pixel_grid_reciprocal(self.wavelength)

    def run(self):  # experiments are passive data providers here
        return None
