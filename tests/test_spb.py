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


def _write_module_file(path, mod, data, trains=None, pulses=None, cells=None):
    with h5py.File(path, "w") as f:
        grp = f"INSTRUMENT/SPB_DET_AGIPD1M-1/DET/{mod}CH0:xtdf/image"
        f.create_dataset(f"{grp}/data", data=data)
        n = len(data)
        if trains is not None:
            f.create_dataset(f"{grp}/trainId",
                             data=np.asarray(trains, dtype=np.uint64))
        if pulses is not None:
            f.create_dataset(f"{grp}/pulseId",
                             data=np.asarray(pulses, dtype=np.uint64))
        if cells is not None:
            f.create_dataset(f"{grp}/cellId",
                             data=np.asarray(cells, dtype=np.uint16))
        del n


@pytest.fixture()
def multiseq_run(tmp_path):
    """2 sequence files per module (12 + 8 frames), 4 pulses/train, with bad
    frames: one trainId==0 and one cellId==65535 in the second file."""
    rng = np.random.default_rng(1)
    n_pulses = 4
    trains = np.repeat([100, 101, 102, 103, 104], n_pulses)  # 20 frames
    pulses = np.tile(np.arange(n_pulses), 5)
    cells = np.tile(np.arange(n_pulses), 5).astype(np.uint16)
    trains = trains.copy()
    trains[14] = 0              # bad: no AGIPD input
    cells = cells.copy()
    cells[17] = 65535           # bad: sentinel cell id
    for mod in range(4):
        # frame value encodes the global frame index for order verification
        data = (np.arange(20, dtype=np.float32)[:, None, None]
                + np.zeros((20, 512, 128), np.float32))
        _write_module_file(tmp_path / f"RAW-R2-AGIPD{mod:02d}-S00000.h5",
                           mod, data[:12], trains[:12], pulses[:12], cells[:12])
        _write_module_file(tmp_path / f"RAW-R2-AGIPD{mod:02d}-S00001.h5",
                           mod, data[12:], trains[12:], pulses[12:], cells[12:])
    del rng
    return str(tmp_path)


def test_multi_sequence_streaming_and_ids(multiseq_run):
    exp = ExperimentWorker(multiseq_run)
    assert exp.n_frames() == 20
    idx = exp.index
    assert idx.n_pulses == 4
    # bad frames flagged: trainId==0 at 14, cellId sentinel at 17
    assert not idx.frame_mask[14]
    assert not idx.frame_mask[17]
    assert idx.frame_mask.sum() == 18
    # stream across the file boundary (frames 8..16 span both files)
    sel = DataSelection(frame_range=(8, 16), modules=(0, 1, 2, 3),
                        batch_size=5)
    chunks = list(exp.get_data(sel))
    assert [len(c["data"]) for c in chunks] == [5, 3]
    got = np.concatenate([c["data"][:, 0, 0, 0] for c in chunks])
    assert np.allclose(got, np.arange(8, 16))  # file seam is invisible
    ids = np.concatenate([c["train_ids"] for c in chunks])
    assert ids[0] == 102 and ids[14 - 8] == 0  # frame 14 carries trainId 0
    good = np.concatenate([c["good"] for c in chunks])
    assert not good[14 - 8]
    assert good.sum() == 7


def test_multi_sequence_mismatched_modules_raises(tmp_path):
    _write_module_file(tmp_path / "RAW-R3-AGIPD00-S00000.h5", 0,
                       np.zeros((5, 512, 128), np.float32))
    _write_module_file(tmp_path / "RAW-R3-AGIPD01-S00000.h5", 1,
                       np.zeros((4, 512, 128), np.float32))
    with pytest.raises(ValueError, match="disagree"):
        ExperimentWorker(str(tmp_path))


def test_repeated_train_filtering(tmp_path):
    """Repeated trainIds keep only the first n_pulses frames (reference
    _database_.py:569-573)."""
    n_pulses = 2
    trains = np.asarray([10, 10, 11, 11, 11, 12, 12], dtype=np.uint64)
    pulses = np.asarray([0, 1, 0, 1, 0, 0, 1], dtype=np.uint64)
    cells = np.zeros(7, dtype=np.uint16)
    _write_module_file(tmp_path / "RAW-R4-AGIPD00-S00000.h5", 0,
                       np.zeros((7, 512, 128), np.float32),
                       trains, pulses, cells)
    exp = ExperimentWorker(str(tmp_path))
    assert exp.index.n_pulses == n_pulses
    # train 11 appears 3 times -> third occurrence masked
    assert list(exp.index.frame_mask) == [True, True, True, True, False,
                                          True, True]


def test_per_cell_calibration_recovers_flat_field(multiseq_run):
    """Cell-varying offsets/gains indexed by cellId flatten the data
    (reference per-memory-cell constants, calibrators.py)."""
    n_cells = 4
    # offset[c] = c (the cell id), gain[c] = 1/(1+c)
    offset = np.zeros((16, n_cells, 512, 128), np.float32)
    gain = np.ones((16, n_cells, 512, 128), np.float32)
    for c in range(n_cells):
        offset[:, c] = c
        gain[:, c] = 1.0 / (1 + c)
    exp = ExperimentWorker(multiseq_run,
                           calibration={"offset": offset, "gain": gain})
    cells = exp.index.cell_ids
    sel = DataSelection(frame_range=(0, 12), modules=(0, 1), batch_size=12,
                        good_cells_only=False)
    chunk = next(exp.get_data(sel))
    raw = np.arange(12, dtype=np.float32)
    expect = (raw - cells[:12]) / (1 + cells[:12])
    assert np.allclose(chunk["data"][:, 0, 0, 0], expect, atol=1e-6)


def test_per_cell_calibration_survives_cellid_sentinel(tmp_path):
    """Frames carrying the 65535 cellId sentinel reach _calibrate before the
    bad-frame mask (contiguous-range reads): per-cell constants must flag
    them bad instead of IndexError-ing on the out-of-range lookup."""
    n, ss, fs = 4, 8, 4
    cells = np.asarray([0, 65535, 1, 0], dtype=np.uint16)
    trains = np.asarray([5, 5, 6, 6], dtype=np.uint64)
    pulses = np.asarray([0, 1, 0, 1], dtype=np.uint64)
    data = np.full((n, ss, fs), 7.0, np.float32)
    _write_module_file(tmp_path / "RAW-R5-AGIPD00-S00000.h5", 0, data,
                       trains, pulses, cells)
    n_cells = 2
    offset = np.zeros((16, n_cells, ss, fs), np.float32)
    offset[:, 1] = 3.0
    exp = ExperimentWorker(str(tmp_path), calibration={"offset": offset})
    chunk = next(exp.get_data(DataSelection(frame_range=(0, 4), modules=(0,),
                                            batch_size=4,
                                            good_cells_only=False)))
    assert np.allclose(chunk["data"][[0, 3], 0, 0, 0], 7.0)
    assert np.allclose(chunk["data"][2, 0, 0, 0], 4.0)
    # the sentinel frame is calibrated with the clamped cell-0 constants but
    # flagged bad
    assert chunk["good"].tolist() == [True, False, True, True]

    # adaptive path: same sentinel robustness
    gl = np.zeros((3, n_cells, 16, ss, fs), np.float32)
    gl[1], gl[2] = 1000.0, 2000.0
    cal = {"gain_levels": gl,
           "analog_offset": np.zeros((3, n_cells, 16, ss, fs), np.float32),
           "relative_gain": np.ones((3, n_cells, 16, ss, fs), np.float32)}
    raw = np.stack([data, np.full_like(data, 500.0)], axis=1)
    r6 = tmp_path / "r6"
    r6.mkdir()
    _write_module_file(r6 / "RAW-R6-AGIPD00-S00000.h5", 0, raw,
                       trains, pulses, cells)
    exp2 = ExperimentWorker(str(r6), calibration=cal)
    chunks = list(exp2.get_data(DataSelection(frame_range=(0, 4),
                                              modules=(0,), batch_size=4,
                                              good_cells_only=False)))
    assert chunks  # at least the first file's frames stream through


def test_adu_filter_bound_conventions():
    """None and False disable a bound; numpy scalars count as numbers —
    deviations from the reference's isinstance((float,int)) check, which
    treats False as the bound 0 and skips np scalars (documented in
    ADUFilter)."""
    from xframe_tpu.experiments.SPB.exp_library import ADUFilter
    data = np.asarray([[-5.0, 2.0, 9.0]])
    mask = np.ones_like(data, dtype=bool)

    def run(limits):
        return ADUFilter(limits)({"data": data.copy(), "mask": mask.copy(),
                                  "good": np.ones(1, bool)})["mask"][0]

    assert run((False, None)).tolist() == [True, True, True]
    assert run((np.float64(0.0), np.int64(5))).tolist() == [False, True,
                                                            False]
    assert run((None, 5)).tolist() == [True, True, False]


def test_adaptive_gain_calibration(tmp_path):
    """3-gain-stage calibration: digital plane selects the stage per pixel;
    (analog - offset[stage, cell]) * gain[stage, cell]; bad pixels zeroed
    (reference calibrators.py:137-214)."""
    n, ss, fs = 6, 8, 4
    n_cells = 2
    cells = np.asarray([0, 1, 0, 1, 0, 1], dtype=np.uint16)
    trains = np.asarray([5, 5, 6, 6, 7, 7], dtype=np.uint64)
    pulses = np.tile([0, 1], 3).astype(np.uint64)
    rng = np.random.default_rng(0)
    analog = rng.uniform(100, 200, (n, ss, fs)).astype(np.float32)
    # digital plane: thresholds at 1000/2000 -> stage pattern per frame
    digital = np.full((n, ss, fs), 500.0, np.float32)     # high gain
    digital[:, :, 1] = 1500.0                             # medium
    digital[:, :, 2] = 2500.0                             # low
    data = np.stack([analog, digital], axis=1)            # (n, 2, ss, fs)
    _write_module_file(tmp_path / "RAW-R5-AGIPD00-S00000.h5", 0, data,
                       trains, pulses, cells)

    gl = np.zeros((3, n_cells, 16, ss, fs), np.float32)
    gl[1] = 1000.0
    gl[2] = 2000.0
    off = np.zeros((3, n_cells, 16, ss, fs), np.float32)
    off[0], off[1], off[2] = 10.0, 20.0, 30.0
    off[:, 1] += 5.0                                      # cell-dependent
    gn = np.ones((3, n_cells, 16, ss, fs), np.float32)
    gn[1], gn[2] = 2.0, 4.0
    bad = np.zeros((3, n_cells, 16, ss, fs), np.float32)
    bad[:, :, :, 0, 3] = 1                                # one dead pixel
    cal = {"gain_levels": gl, "analog_offset": off, "relative_gain": gn,
           "badpixel": bad}
    exp = ExperimentWorker(str(tmp_path), calibration=cal)
    chunk = next(exp.get_data(DataSelection(frame_range=(0, 6), modules=(0,),
                                            batch_size=6)))
    out = chunk["data"]                                   # (6, 1, ss, fs)
    for i, c in enumerate(cells):
        dc = 5.0 * c
        assert np.allclose(out[i, 0, 1, 0], analog[i, 1, 0] - 10 - dc)
        assert np.allclose(out[i, 0, 1, 1], (analog[i, 1, 1] - 20 - dc) * 2)
        assert np.allclose(out[i, 0, 1, 2], (analog[i, 1, 2] - 30 - dc) * 4)
    assert (out[:, 0, 0, 3] == 0).all()                   # dead pixel zeroed


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


def test_filter_pipeline():
    """FilterSequence composition: ADU pixel masking, per-frame metric
    filtering, lit-pixel filtering, normalization, Bragg outlier masking
    (reference expLibrary/filters.py rebuilt vectorized)."""
    from xframe_tpu.experiments.SPB import exp_library as xl
    rng = np.random.default_rng(0)
    B, ny, nx = 6, 16, 16
    data = rng.uniform(1.0, 2.0, (B, ny, nx)).astype(np.float32)
    data[1] *= 10            # hot frame (metric filter target)
    data[2] = 0.01           # dim frame (lit-pixel target)
    data[3, 4, 7] = 1000.0   # single Bragg-like outlier pixel
    data[0, 0, 0] = -5.0     # negative ADU pixel
    chunk = {"data": data.copy(), "mask": np.ones_like(data, dtype=bool),
             "good": np.ones(B, dtype=bool)}

    seq = xl.FilterSequence([
        xl.ADUFilter((0.0, None)),
        xl.MetricFilter("mean", (None, 10.0)),
        xl.LitPixelsFilter(0.5, (0.5, None)),
    ])
    out = seq(chunk)
    assert not out["mask"][0, 0, 0]          # ADU-masked pixel
    assert out["mask"][0, 1, 1]
    assert not out["good"][1]                # hot frame dropped
    assert not out["good"][2]                # dim frame dropped
    assert out["good"][[0, 3, 4, 5]].all()

    # normalization: frame means (over valid pixels) become 1
    norm = xl.NormalizationFilter()
    out2 = norm({"data": data.copy(), "mask": out["mask"].copy(),
                 "good": out["good"].copy()})
    m = out2["mask"]
    means = [out2["data"][i][m[i]].mean() for i in range(B)]
    assert np.allclose(means, 1.0, atol=1e-5)

    # Bragg filter: the outlier pixel is masked, its ring statistics intact
    bins = np.zeros((ny, nx), dtype=np.int64)   # single q-ring
    bragg = xl.BraggFilter(bins, n_bins=1, max_sigma=5.0, mode="mask")
    out3 = bragg({"data": data.copy(), "mask": np.ones_like(data, bool),
                  "good": np.ones(B, bool)})
    assert not out3["mask"][3, 4, 7]
    assert out3["data"][3, 4, 7] == 0.0
    assert out3["mask"][3].sum() == ny * nx - 1
    # frames without outliers keep all pixels (σ cut at 5)
    assert out3["mask"][4].all()
    # discard mode drops the outlier frame instead
    bragg_d = xl.BraggFilter(bins, n_bins=1, max_sigma=5.0, mode="discard")
    out4 = bragg_d({"data": data.copy(), "mask": np.ones_like(data, bool),
                    "good": np.ones(B, bool)})
    assert not out4["good"][3]
    assert out4["good"][4]


def test_filter_sequence_through_experiment(multiseq_run):
    """filter_sequence plugs into ExperimentWorker.get_data."""
    from xframe_tpu.experiments.SPB import exp_library as xl
    seq = xl.FilterSequence([xl.MetricFilter("mean", (None, 10.0))])
    exp = ExperimentWorker(multiseq_run, filter_sequence=seq)
    sel = DataSelection(frame_range=(0, 20), modules=(0, 1), batch_size=20,
                        good_cells_only=False)
    chunk = next(exp.get_data(sel))
    # frame values encode the frame index 0..19: frames >10 mean get dropped
    assert chunk["good"].sum() == 11
    assert "mask" in chunk and chunk["mask"].shape == chunk["data"].shape


def test_drop_counts_observable(multiseq_run):
    """Per-rule dropped-frame counts are recorded and logged (VERDICT r2 #9)."""
    import logging
    import io
    from xframe_tpu.logger import log as xlog
    stream = io.StringIO()
    h = logging.StreamHandler(stream)
    xlog.addHandler(h)
    xlog.setLevel(logging.INFO)
    try:
        exp = ExperimentWorker(multiseq_run)
    finally:
        xlog.removeHandler(h)
    drops = exp.drop_counts
    assert drops["trainId_zero"] == 1          # frame 14
    assert drops["cellId_sentinel"] == 1       # frame 17
    assert sum(drops.values()) == 2
    assert "dropped 2 of 20 frames" in stream.getvalue()


def test_good_cells_drop_count(tmp_path):
    trains = np.arange(1, 7, dtype=np.uint64) + 100
    pulses = np.zeros(6, dtype=np.uint64)
    cells = np.asarray([0, 1, 2, 0, 1, 2], dtype=np.uint16)
    _write_module_file(tmp_path / "RAW-R5-AGIPD00-S00000.h5", 0,
                       np.zeros((6, 512, 128), np.float32),
                       trains, pulses, cells)
    exp = ExperimentWorker(str(tmp_path), good_cells=[0, 1])
    assert exp.drop_counts["good_cells"] == 2
    assert exp.index.frame_mask.sum() == 4


def test_find_dataset_ambiguous_raises(tmp_path):
    """A file carrying several image/data paths must error, not silently
    pick the first visititems hit — unless exactly one is INSTRUMENT-rooted."""
    path = tmp_path / "RAW-R6-AGIPD00-S00000.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("INSTRUMENT/DET_A/image/data",
                         data=np.zeros((2, 512, 128), np.float32))
        f.create_dataset("INSTRUMENT/DET_B/image/data",
                         data=np.zeros((2, 512, 128), np.float32))
    with pytest.raises(ValueError, match="ambiguous"):
        ExperimentWorker(str(tmp_path))

    # one INSTRUMENT-rooted + one stray copy elsewhere → deterministic pick
    path2 = tmp_path / "RAW-R6-AGIPD01-S00000.h5"
    with h5py.File(path2, "w") as f:
        f.create_dataset("INSTRUMENT/DET_A/image/data",
                         data=np.arange(2 * 512 * 128, dtype=np.float32)
                         .reshape(2, 512, 128))
        f.create_dataset("CONTROL/copy/image/data",
                         data=np.zeros((2, 512, 128), np.float32))
    exp = ExperimentWorker(str(tmp_path),
                           data_path_glob="*AGIPD01*.h5")
    chunk = next(exp.get_data(DataSelection(modules=(1,))))
    assert chunk["data"][0, 0, 0, 1] == 1.0    # INSTRUMENT copy was read


def test_selection_by_train(multiseq_run):
    exp = ExperimentWorker(multiseq_run)
    sel = DataSelection(modules=(0,), batch_size=32, trains=(101, 103))
    chunks = list(exp.get_data(sel))
    good = np.concatenate([c["good"] for c in chunks])
    tids = np.concatenate([c["train_ids"] for c in chunks])
    assert set(tids[good]) == {101, 103}
    # 2 trains × 4 pulses minus frame 14, whose trainId was zeroed
    assert good.sum() == 7
    sel2 = DataSelection(modules=(0,), batch_size=32, train_range=(102, 105))
    good2 = np.concatenate([c["good"] for c in exp.get_data(sel2)])
    tids2 = np.concatenate([c["train_ids"] for c in exp.get_data(sel2)])
    assert set(tids2[good2]) == {102, 103, 104}
    # frames 14 (trainId 0) and 17 (cell sentinel) stay excluded
    assert good2.sum() == 12 - 2
