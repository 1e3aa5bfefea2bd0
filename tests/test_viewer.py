"""Headless viewer (presenters/viewer.py): renders reconstruction and
average HDF5 files to PNG without a display."""
import numpy as np

from xframe_tpu.io import hdf5 as hdf5_io
from xframe_tpu.presenters.viewer import view_file


def _recon_file(tmp_path, ndim=3):
    n_r, n_t, n_p = 8, 6, 12
    shape = (n_r, n_t, n_p) if ndim == 3 else (n_r, n_p)
    grid = {"real_grid": np.linspace(0.1, 1.0, n_r),
            "phis": np.linspace(0, 2 * np.pi, n_p, endpoint=False)}
    if ndim == 3:
        grid["thetas"] = np.linspace(0.1, np.pi - 0.1, n_t)
    data = {
        "configuration": {"internal_grid": grid},
        "reconstruction_results": {
            "0": {"real_density": np.random.default_rng(0).random(shape),
                  "support_mask": np.ones(shape, dtype=bool),
                  "error_dict": {"main": np.geomspace(1, 1e-3, 20)}},
            "1": {"real_density": np.random.default_rng(1).random(shape),
                  "support_mask": np.ones(shape, dtype=bool),
                  "error_dict": {"main": np.geomspace(1, 1e-2, 20)}},
        },
    }
    p = str(tmp_path / f"recon{ndim}d.h5")
    hdf5_io.save(p, data)
    return p


def test_view_reconstruction_3d(tmp_path):
    out = view_file(_recon_file(tmp_path, 3), out_dir=str(tmp_path),
                    max_results=1)
    assert len(out) == 1 and out[0].endswith("_view_0.png")
    import os
    assert os.path.getsize(out[0]) > 1000


def test_view_reconstruction_2d(tmp_path):
    out = view_file(_recon_file(tmp_path, 2), out_dir=str(tmp_path))
    assert len(out) == 2


def test_view_average(tmp_path):
    n_r, n_t, n_p = 8, 6, 12
    data = {
        "average": {"real_density":
                    np.random.default_rng(2).random((n_r, n_t, n_p))},
        "grid": {"rs": np.linspace(0.1, 1, n_r),
                 "thetas": np.linspace(0.1, np.pi - 0.1, n_t),
                 "phis": np.linspace(0, 2 * np.pi, n_p, endpoint=False)},
        "resolution_metrics": {"PRTF": np.linspace(1, 0.4, n_r),
                               "PRTF_qs": np.linspace(0, 1, n_r)},
        "rotation_metric": {"l2_to_ref": np.array([0.0, 0.1])},
    }
    p = str(tmp_path / "avg.h5")
    hdf5_io.save(p, data)
    out = view_file(p, out_dir=str(tmp_path))
    assert len(out) == 1 and out[0].endswith("_view.png")


def test_view_rejects_unknown(tmp_path):
    p = str(tmp_path / "junk.h5")
    hdf5_io.save(p, {"foo": np.zeros(3)})
    try:
        view_file(p)
        assert False
    except ValueError:
        pass
