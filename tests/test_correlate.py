"""correlate worker tests: device batch correlator vs direct numpy reference,
and the worker end-to-end over raw files."""
import os

import numpy as np
import pytest
from scipy.ndimage import map_coordinates

import xframe_tpu as xf
from xframe_tpu.projects.fxs.correlate import Correlator


def _blob_frame(ny, nx, oy, ox, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:ny, 0:nx]
    r2 = (y - oy) ** 2 + (x - ox) ** 2
    base = np.exp(-r2 / (2 * (nx / 6) ** 2))
    angular = 1 + 0.3 * np.cos(2 * np.arctan2(y - oy, x - ox))
    return (base * angular * (1 + 0.05 * rng.normal(size=(ny, nx)))
            ).astype(np.float32)


def test_correlator_matches_numpy_reference():
    ny = nx = 64
    oy = ox = 31.5
    corr = Correlator((ny, nx), (oy, ox), pixel_size_um=200.0,
                      sample_distance_mm=800.0, wavelength=1.23984,
                      n_phi=64, n_q=16, interpolation_order=1)
    frames = np.stack([_blob_frame(ny, nx, oy, ox, s) for s in range(4)])
    out = corr.correlate_frames(iter([frames]))
    cc = out["cross_correlation"]
    assert cc.shape == (16, 16, 64)

    # numpy reference: same polar sampling + FFT CCF, mask-count normalized
    polar = np.stack([map_coordinates(f, corr._coords, order=1, cval=0.0)
                      for f in frames]) * corr._corrections
    f = np.fft.rfft(polar, axis=-1)
    ccf = np.fft.irfft(np.einsum("bqn,bpn->qpn", f.conj(), f), 64, axis=-1)
    # full mask (no invalid pixels inside r_max) → counts = B * n_phi
    expected = ccf / (len(frames) * 64)
    assert np.allclose(cc, expected, rtol=1e-3, atol=1e-5 * np.abs(expected).max())

    # average intensity: angular+frame mean of the polar representation
    waxs = polar.mean(axis=(0, 2))
    assert np.allclose(out["average_intensity"], waxs, rtol=1e-3)


@pytest.fixture()
def home(tmp_path, monkeypatch):
    monkeypatch.setenv("XFRAME_TPU_HOME", str(tmp_path))
    return str(tmp_path)


def test_correlate_worker_end_to_end(home):
    ny = nx = 64
    folder = os.path.join(home, "data", "fxs", "input_files")
    os.makedirs(folder, exist_ok=True)
    names = []
    for s in range(10):
        frame = _blob_frame(ny, nx, 31.5, 31.5, s)
        name = f"frame_{s}.raw"
        frame.tofile(os.path.join(folder, name))
        names.append(name)
    with open(os.path.join(folder, "patterns_list.txt"), "w") as f:
        f.write("\n".join(names))

    xf.select_project("fxs", "correlate", overrides={
        "structure_name": "corr_test",
        "image_dimensions": [ny, nx],
        "detector_origin": [31.5, 31.5],
        "polar_grid": {"n_phi": 64, "n_q": 16},
        "batch_size": 4,
        "max_n_patterns": 8,
    })
    ccd = xf.run()
    assert ccd["cross_correlation"]["I1I1"].shape == (16, 16, 64)
    assert ccd["num_images_processed"] == 8
    assert ccd["num_images_good"] == 8
    assert ccd["radial_points"].shape == (16,)
    assert np.isfinite(ccd["cross_correlation"]["I1I1"]).all()
    path = os.path.join(home, "data", "fxs", "ccd", "corr_test", "run_1",
                        "ccd.h5")
    assert os.path.exists(path)
