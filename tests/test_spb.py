"""SPB experiment layer tests: geometry assembly, geom parsing, streaming."""
import os

import numpy as np
import h5py
import pytest

from xframe_tpu.experiments.SPB.detectors.agipd import (
    AGIPD, parse_crystfel_geom, PIXEL_SIZE)
from xframe_tpu.experiments.SPB.experiment import (
    ExperimentWorker, DataSelection, Filters)


def test_agipd_nominal_geometry():
    det = AGIPD(detector_distance=0.2)
    assert det.pixel_centers.shape == (16, 512, 128, 3)
    # all pixels on the detector plane
    assert np.allclose(det.pixel_centers[..., 2], 0.2)
    # modules don't collapse onto each other: distinct mean positions
    means = det.pixel_centers[:, :, :, :2].mean(axis=(1, 2))
    d = np.linalg.norm(means[:, None] - means[None, :], axis=-1)
    assert (d[~np.eye(16, dtype=bool)] > 0.001).all()
    qgrid = det.pixel_grid_reciprocal(1.23984)
    assert qgrid.shape == (16, 512, 128, 3)
    assert (qgrid[..., 0] >= 0).all() and np.isfinite(qgrid).all()
    # θ near π/2 for small scattering angles (Ewald convention)
    assert np.abs(qgrid[..., 1] - np.pi / 2).max() < 0.5


def test_crystfel_geom_parser(tmp_path):
    geom = tmp_path / "test.geom"
    geom.write_text("""
res = 5000
clen = 0.25
coffset = 0.01
p0/fs = +1.0x
p0/ss = +1.0y
p0/corner_x = -100
p0/corner_y = 50
p1a0/fs = -1.0x
p1a0/ss = +1.0y
p1a0/corner_x = 10
p1a0/corner_y = 20
""")
    panels = parse_crystfel_geom(str(geom))
    assert np.allclose(panels["p0"]["fs"], [1, 0, 0])
    assert np.allclose(panels["p0"]["corner"],
                       [-100 / 5000, 50 / 5000, 0.26])
    assert np.allclose(panels["p1a0"]["fs"], [-1, 0, 0])

    det = AGIPD(geometry_file=str(geom))
    # p0 module filled, first pixel near its corner
    p = det.pixel_centers[0, 0, 0]
    assert np.allclose(p[:2], [-100 / 5000 + 0.5 / 5000, 50 / 5000 + 0.5 / 5000],
                       atol=1e-6)
    # p1 asic 0 fills rows 0:64 of module 1
    assert np.abs(det.pixel_centers[1, :64]).sum() > 0
    assert np.abs(det.pixel_centers[1, 64:]).sum() == 0


@pytest.fixture()
def run_folder(tmp_path):
    rng = np.random.default_rng(0)
    for mod in range(4):  # 4 modules suffice for the test
        path = tmp_path / f"RAW-R0001-AGIPD{mod:02d}-S00000.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset(
                f"INSTRUMENT/SPB_DET_AGIPD1M-1/DET/{mod}CH0:xtdf/image/data",
                data=rng.uniform(0, 10, (20, 512, 128)).astype(np.float32))
    return str(tmp_path)


def test_streaming_and_calibration(run_folder):
    offset = np.full((16, 512, 128), 1.0, dtype=np.float32)
    gain = np.full((16, 512, 128), 2.0, dtype=np.float32)
    exp = ExperimentWorker(run_folder, calibration={"offset": offset,
                                                    "gain": gain},
                           filters=Filters(lit_pixel_fraction_min=0.0))
    assert exp.n_frames() == 20
    sel = DataSelection(frame_range=(2, 18), modules=(0, 1, 2, 3),
                        batch_size=7)
    chunks = list(exp.get_data(sel))
    assert [len(c["data"]) for c in chunks] == [7, 7, 2]
    assert chunks[0]["data"].shape == (7, 4, 512, 128)
    assert chunks[0]["frame_ids"][0] == 2
    assert chunks[0]["good"].all()
    # calibration applied: (raw - 1) * 2 stays in (-2, 18)
    assert chunks[0]["data"].min() > -2.01
    assert chunks[0]["data"].max() < 18.01


def test_panel_correlator_with_agipd(run_folder, tmp_path, monkeypatch):
    """Experiment-sourced correlation: AGIPD geometry binning end-to-end
    through the correlate worker."""
    monkeypatch.setenv("XFRAME_TPU_HOME", str(tmp_path))
    import xframe_tpu as xf
    xf.select_project("fxs", "correlate", overrides={
        "structure_name": "spb_test",
        "wavelength": 1.23984,
        "polar_grid": {"n_q": 24, "n_phi": 64},
        "batch_size": 8,
        "max_n_patterns": 16,
        "input": {"source": "experiment"},
        "experiment": {"run_folder": run_folder, "detector_distance": 0.2},
    })
    ccd = xf.run()
    cc = ccd["cross_correlation"]["I1I1"]
    assert cc.shape == (24, 24, 64)
    assert np.isfinite(cc).all()
    assert ccd["num_images_good"] == 16
    assert (ccd["radial_points"] > 0).all()
    import os
    assert os.path.exists(os.path.join(
        str(tmp_path), "data", "fxs", "ccd", "spb_test", "run_1", "ccd.h5"))


def test_panel_correlator_binning_correctness():
    """Uniform frames must bin to uniform polar intensity wherever bins have
    pixels; CC of constant frames is constant."""
    from xframe_tpu.projects.fxs.correlate import PanelCorrelator
    from xframe_tpu.experiments.SPB.detectors.agipd import AGIPD
    det = AGIPD(detector_distance=0.2)
    corr = PanelCorrelator(det.pixel_grid_reciprocal(1.23984),
                           n_q=16, n_phi=32)
    frames = np.full((4,) + det.data_shape, 2.0, dtype=np.float32)
    out = corr.correlate_frames(iter([frames]))
    filled = corr._bin_counts > 0
    avg_rings = out["average_intensity"]
    # rings that have pixels average to the frame value
    ring_filled = filled.any(axis=1)
    polar_mean = np.where(filled, 2.0, 0.0).sum(1) / np.maximum(
        filled.sum(1), 1)
    assert np.allclose(avg_rings[ring_filled],
                       (np.where(filled, 2.0, 0.0).sum(1)
                        / 32)[ring_filled], atol=1e-5)


def test_comm_facade(run_folder):
    from xframe_tpu import comm
    from xframe_tpu.experiments.SPB.experiment import DataSelection
    comm.select_experiment("SPB", run_folder=run_folder,
                           detector_distance=0.2)
    assert comm.get_geometry().shape == (16, 512, 128, 3)
    chunk = next(comm.get_data(DataSelection(frame_range=(0, 4),
                                             modules=(0, 1, 2, 3),
                                             batch_size=4)))
    assert chunk["data"].shape == (4, 4, 512, 128)


def test_exp_library_saxs_and_rois():
    from xframe_tpu.experiments.SPB import exp_library as xl
    from xframe_tpu.experiments.SPB.detectors.agipd import AGIPD
    det = AGIPD(detector_distance=0.2)
    qgrid = det.pixel_grid_reciprocal(1.23984)
    # isotropic frames: I(q) = 3 everywhere
    frames = np.full((3,) + det.data_shape, 3.0, dtype=np.float32)
    prof, centers = xl.saxs_profile(frames, qgrid, n_q=32)
    filled = prof > 0
    assert np.allclose(prof[filled], 3.0, atol=1e-6)
    assert len(centers) == 32 and np.all(np.diff(centers) > 0)
    roi = xl.annulus_roi(qgrid, centers[5], centers[20])
    assert roi.shape == det.data_shape
    assert 0 < roi.sum() < roi.size
    az = xl.azimuthal_roi(qgrid, -0.5, 0.5)  # wrap-around sector
    assert 0 < az.sum() < az.size


def test_refine_beam_center_recovers_offset():
    from xframe_tpu.experiments.SPB import exp_library as xl
    rng = np.random.default_rng(0)
    # synthetic single-panel detector with a ring pattern offset from origin
    ax = np.linspace(-0.05, 0.05, 64)
    X, Y = np.meshgrid(ax, ax, indexing="ij")
    centers = np.stack([X, Y, np.full_like(X, 0.2)], axis=-1)
    true = (1.5e-3, -1.0e-3)
    r = np.hypot(X - true[0], Y - true[1])
    frame = np.exp(-(r - 0.02) ** 2 / 2e-6)
    dx, dy = xl.refine_beam_center(frame, centers, search_radius=2e-3, steps=9)
    assert abs(dx - true[0]) <= 6e-4 and abs(dy - true[1]) <= 6e-4
