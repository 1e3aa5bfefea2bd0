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
