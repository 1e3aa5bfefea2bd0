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


def test_native_frame_reader(tmp_path):
    """C++ thread-pool reader: values identical to numpy, short reads zeroed."""
    from xframe_tpu.native import read_frame_batch, PrefetchingFrameLoader, _load
    rng = np.random.default_rng(1)
    shape = (32, 48)
    paths = []
    frames = []
    for i in range(9):
        f = rng.normal(size=shape).astype(np.float32)
        p = tmp_path / f"f{i}.raw"
        f.tofile(p)
        paths.append(str(p))
        frames.append(f)
    batch, ok = read_frame_batch(paths, shape)
    assert ok.all() and ok.shape == (9,)
    assert np.array_equal(batch, np.stack(frames))
    # short file → zero-filled AND flagged bad per frame
    (tmp_path / "short.raw").write_bytes(b"\x00" * 17)
    batch2, ok2 = read_frame_batch(paths[:2] + [str(tmp_path / "short.raw")],
                                   shape)
    assert list(ok2) == [True, True, False]
    assert np.array_equal(batch2[:2], np.stack(frames[:2]))
    assert (batch2[2] == 0).all()
    # missing file → zero-filled (never uninitialized memory), flagged bad
    batch_m, ok_m = read_frame_batch(
        [paths[0], str(tmp_path / "does_not_exist.raw")], shape)
    assert list(ok_m) == [True, False]
    assert (batch_m[1] == 0).all()
    # uint16 conversion path
    u = (rng.uniform(0, 1000, shape)).astype(np.uint16)
    u.tofile(tmp_path / "u16.raw")
    b3, ok3 = read_frame_batch([str(tmp_path / "u16.raw")], shape,
                               dtype=np.uint16)
    assert ok3.all() and np.array_equal(b3[0], u.astype(np.float32))
    # prefetching loader covers all frames in order, with per-frame ok masks
    loader = PrefetchingFrameLoader(paths, shape, batch_size=4)
    items = list(loader)
    got = np.concatenate([b for b, _ in items])
    assert np.array_equal(got, np.stack(frames))
    assert all(o.all() for _, o in items)
    assert _load() is not None, "native library failed to build"


def test_unreadable_frames_excluded_from_correlation(tmp_path, monkeypatch):
    """A missing frame file must not bias the accumulated CC: the worker
    counts it bad and its (zero-filled) frame carries zero weight."""
    monkeypatch.setenv("XFRAME_TPU_HOME", str(tmp_path))
    rng = np.random.default_rng(2)
    ny = nx = 32
    folder = os.path.join(str(tmp_path), "data", "fxs", "input_files")
    os.makedirs(folder, exist_ok=True)
    names = []
    for i in range(6):
        f = rng.uniform(1, 2, (ny, nx)).astype(np.float32)
        name = f"f{i}.raw"
        f.tofile(os.path.join(folder, name))
        names.append(name)
    os.remove(os.path.join(folder, names[3]))  # vanishes after listing
    with open(os.path.join(folder, "patterns_list.txt"), "w") as fh:
        fh.write("\n".join(names))
    import xframe_tpu as xf
    xf.select_project("fxs", "correlate", overrides={
        "structure_name": "badframe_test",
        "image_dimensions": [ny, nx],
        "detector_origin": [15.5, 15.5],
        "polar_grid": {"n_q": 8, "n_phi": 16},
        "batch_size": 3,
    })
    ccd = xf.run()
    assert ccd["num_images_good"] == 5
    assert np.isfinite(ccd["cross_correlation"]["I1I1"]).all()


def test_correlator_background_and_fc_cap():
    """filters.background_file subtraction and fc_n_max CC low-pass."""
    ny = nx = 64
    oy = ox = 31.5
    frames = np.stack([_blob_frame(ny, nx, oy, ox, s) for s in range(3)])
    bg = np.full((ny, nx), 0.05, dtype=np.float32)
    kw = dict(pixel_size_um=200.0, sample_distance_mm=800.0,
              wavelength=1.23984, n_phi=64, n_q=16)
    ref = Correlator((ny, nx), (oy, ox), **kw)
    sub = Correlator((ny, nx), (oy, ox), background=bg, **kw)
    out_ref = ref.correlate_frames(iter([frames + bg]))
    out_sub = sub.correlate_frames(iter([frames + bg]))
    out_direct = ref.correlate_frames(iter([frames]))
    # subtracting the background equals never having added it
    assert np.allclose(out_sub["cross_correlation"],
                       out_direct["cross_correlation"], rtol=1e-3,
                       atol=1e-5 * np.abs(out_direct["cross_correlation"]).max())
    assert not np.allclose(out_ref["cross_correlation"],
                           out_direct["cross_correlation"], rtol=1e-3)

    capped = Correlator((ny, nx), (oy, ox), fc_n_max=4, **kw)
    cc = capped.correlate_frames(iter([frames]))["cross_correlation"]
    spec = np.fft.rfft(cc, axis=-1)
    assert np.abs(spec[..., 5:]).max() < 1e-6 * np.abs(spec).max()


def test_correlator_waxs_only():
    """compute without 'ccf': CC accumulation skipped, WAXS still correct."""
    ny = nx = 64
    frames = np.stack([_blob_frame(ny, nx, 31.5, 31.5, s) for s in range(3)])
    kw = dict(pixel_size_um=200.0, sample_distance_mm=800.0,
              wavelength=1.23984, n_phi=64, n_q=16)
    waxs_only = Correlator((ny, nx), (31.5, 31.5), with_ccf=False, **kw)
    full = Correlator((ny, nx), (31.5, 31.5), **kw)
    a = waxs_only.correlate_frames(iter([frames]))
    b = full.correlate_frames(iter([frames]))
    assert a["cross_correlation"] is None
    assert np.allclose(a["average_intensity"], b["average_intensity"],
                       rtol=1e-5)
    assert a["num_images_good"] == 3
