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


def _numpy_cc(polar, pmask, n_phi, q1_pos=None, q2_pos=None):
    """Reference mask-corrected CCF accumulation in plain numpy."""
    f = np.fft.rfft(polar * pmask, axis=-1)
    m = np.fft.rfft(pmask.astype(float), axis=-1)
    if q1_pos is None:
        q1_pos = np.arange(polar.shape[1])
    if q2_pos is None:
        q2_pos = np.arange(polar.shape[1])
    ccf = np.fft.irfft(np.einsum("bqn,bpn->qpn", f[:, q1_pos].conj(),
                                 f[:, q2_pos]), n_phi, axis=-1)
    ccm = np.fft.irfft(np.einsum("bqn,bpn->qpn", m[:, q1_pos].conj(),
                                 m[:, q2_pos]), n_phi, axis=-1)
    return np.where(ccm > 0.5, ccf / np.where(ccm > 0.5, ccm, 1.0), 0.0)


def test_roi_normalization_and_mean_filter():
    """filters.roi: per-frame ROI-mean normalization and out-of-bounds frame
    rejection match the reference semantics (correlate.py:424-432)."""
    ny = nx = 64
    oy = ox = 31.5
    scales = np.array([1.0, 2.0, 50.0], dtype=np.float32)
    frames = np.stack([_blob_frame(ny, nx, oy, ox, s) for s in range(3)]) \
        * scales[:, None, None]
    kw = dict(pixel_size_um=200.0, sample_distance_mm=800.0,
              wavelength=1.23984, n_phi=64, n_q=16)
    plain = Correlator((ny, nx), (oy, ox), **kw)
    roi_range = (plain.qs[4], plain.qs[10])

    norm = Correlator((ny, nx), (oy, ox), roi_q_range=roi_range,
                      roi_normalize=True, **kw)
    out = norm.correlate_frames(iter([frames]))
    # numpy reference: divide each polar frame by its ROI-row mean
    polar = np.stack([map_coordinates(f, plain._coords, order=1, cval=0.0)
                      for f in frames])
    lo, hi = norm._roi
    roi_means = polar[:, lo:hi, :].mean(axis=(1, 2))
    polar_n = polar / roi_means[:, None, None]
    expected = _numpy_cc(polar_n, np.ones_like(polar_n), 64)
    assert np.allclose(out["cross_correlation"], expected, rtol=1e-3,
                       atol=1e-5 * np.abs(expected).max())

    # bounds that exclude the 50x frame
    mean_lo, mean_hi = 0.5 * roi_means[0], 2.0 * roi_means[1]
    filt = Correlator((ny, nx), (oy, ox), roi_q_range=roi_range,
                      roi_mean_bounds=(mean_lo, mean_hi), **kw)
    out_f = filt.correlate_frames(iter([frames]))
    assert out_f["num_images_good"] == 2
    expected2 = _numpy_cc(polar[:2], np.ones_like(polar[:2]), 64)
    assert np.allclose(out_f["cross_correlation"], expected2, rtol=1e-3,
                       atol=1e-5 * np.abs(expected2).max())


def test_radial_pixel_filter_modes():
    """filters.radial_pixel_filter masks ring outliers exactly as the
    reference (correlate.py:401-413) in both statistic modes."""
    ny = nx = 64
    oy = ox = 31.5
    frames = np.stack([_blob_frame(ny, nx, oy, ox, s) for s in range(2)])
    frames[0, 20, 38] = 50.0  # hot pixel inside the polar annulus
    frames[1, 40, 22] = -30.0
    kw = dict(pixel_size_um=200.0, sample_distance_mm=800.0,
              wavelength=1.23984, n_phi=64, n_q=16)
    plain = Correlator((ny, nx), (oy, ox), **kw)
    polar = np.stack([map_coordinates(f, plain._coords, order=1, cval=0.0)
                      for f in frames])

    for mode in ("average_sigma", "median_mad"):
        n_sig = 4.0
        corr = Correlator((ny, nx), (oy, ox),
                          radial_pixel_filter=(mode, n_sig), **kw)
        out = corr.correlate_frames(iter([frames]))
        if mode == "average_sigma":
            center = polar.mean(axis=-1, keepdims=True)
            spread = polar.std(axis=-1, keepdims=True)
        else:
            center = np.median(polar, axis=-1, keepdims=True)
            spread = np.median(np.abs(polar - center), axis=-1,
                               keepdims=True)
        pmask = np.abs(polar - center) <= n_sig * spread
        assert not pmask.all(), "test must actually mask something"
        expected = _numpy_cc(polar * pmask, pmask, 64)
        assert np.allclose(out["cross_correlation"], expected, rtol=1e-3,
                           atol=1e-4 * np.abs(expected).max()), mode


def test_qrange_and_qrange_xcca():
    """qrange builds the radial grid in q-space; qrange_xcca restricts the
    CCF to index subsets equal to the corresponding full-CC submatrix
    (reference correlate.py:489-559)."""
    ny = nx = 64
    oy = ox = 31.5
    frames = np.stack([_blob_frame(ny, nx, oy, ox, s) for s in range(3)])
    kw = dict(pixel_size_um=200.0, sample_distance_mm=800.0,
              wavelength=1.23984, n_phi=64)
    qr = (0.01, 0.05, 0.004)
    full = Correlator((ny, nx), (oy, ox), qrange=qr, **kw)
    n_q = int((qr[1] - qr[0]) / qr[2] + 1)
    assert full.n_q == n_q
    assert np.allclose(full.qs, qr[0] + qr[2] * np.arange(n_q))
    out_full = full.correlate_frames(iter([frames]))

    xcca = ((full.qs[2], full.qs[8], 2), (full.qs[1], full.qs[9], 1))
    sub = Correlator((ny, nx), (oy, ox), qrange=qr, qrange_xcca=xcca, **kw)
    assert list(sub.q1_pos) == [2, 4, 6, 8]
    assert list(sub.q2_pos) == list(range(1, 10))
    out_sub = sub.correlate_frames(iter([frames]))
    cc_sub = out_sub["cross_correlation"]
    assert cc_sub.shape == (4, 9, 64)
    expected = out_full["cross_correlation"][np.ix_(sub.q1_pos, sub.q2_pos)]
    assert np.allclose(cc_sub, expected, rtol=1e-4,
                       atol=1e-6 * np.abs(expected).max())


def test_phi_range_window():
    """phi_range restricts the azimuthal window; phi_sampling_mode='max'
    caps n_phi at the feasible circumference sampling (reference :505-525)."""
    ny = nx = 64
    oy = ox = 31.5
    frames = np.stack([_blob_frame(ny, nx, oy, ox, s) for s in range(2)])
    kw = dict(pixel_size_um=200.0, sample_distance_mm=800.0,
              wavelength=1.23984, n_q=12)
    win = (0.5, 2 * np.pi - 0.5)
    corr = Correlator((ny, nx), (oy, ox), n_phi=48, phi_range=win, **kw)
    assert np.isclose(corr.phis[0], win[0])
    assert corr.phis[-1] < win[1]
    out = corr.correlate_frames(iter([frames]))
    polar = np.stack([map_coordinates(f, corr._coords, order=1, cval=0.0)
                      for f in frames])
    expected = _numpy_cc(polar, np.ones_like(polar), 48)
    assert np.allclose(out["cross_correlation"], expected, rtol=1e-3,
                       atol=1e-5 * np.abs(expected).max())

    capped = Correlator((ny, nx), (oy, ox), n_phi=10_000,
                        phi_sampling_mode="max", **kw)
    r_last = 11.5 * 31.5 / 12  # r_pix[-1] of the 12-ring grid
    maxpix = int(round(2 * np.pi * r_last))
    maxpix += maxpix % 2
    assert capped.n_phi == maxpix


def test_symmetrize_cc_matches_reference_loop():
    """symmetrize_cc equals the reference's per-(q1,q2) loop
    (cross_correlation.py:67-78)."""
    from xframe_tpu.projects.fxs.correlate import symmetrize_cc
    rng = np.random.default_rng(3)
    n_phi = 32
    phis = 2 * np.pi * np.arange(n_phi) / n_phi
    cc = rng.normal(size=(5, 4, n_phi))
    pos_pi2 = int(np.abs(phis - np.pi / 2).argmin())
    pos_pi = int(np.abs(phis - np.pi).argmin())
    pos_3pi2 = int(np.abs(phis - 3 * np.pi / 2).argmin())
    expected = cc.copy()
    for i in range(5):
        for j in range(4):
            expected[i, j, 0:pos_pi2] = cc[i, j, pos_pi:pos_pi + pos_pi2]
            expected[i, j, pos_3pi2 + 1:] = \
                cc[i, j, pos_3pi2 + 1 - pos_pi:n_phi - pos_pi]
    got = symmetrize_cc(cc, phis)
    assert np.array_equal(got, expected)
    # settings-level: symmetrized correlator output differs only in the
    # replaced ranges
    ny = nx = 64
    frames = np.stack([_blob_frame(ny, nx, 31.5, 31.5, s) for s in range(2)])
    kw = dict(pixel_size_um=200.0, sample_distance_mm=800.0,
              wavelength=1.23984, n_phi=n_phi, n_q=8)
    plain = Correlator((ny, nx), (31.5, 31.5), **kw)
    sym = Correlator((ny, nx), (31.5, 31.5), symmetrize=True, **kw)
    cc_p = plain.correlate_frames(iter([frames]))["cross_correlation"]
    cc_s = sym.correlate_frames(iter([frames]))["cross_correlation"]
    assert np.allclose(cc_s, symmetrize_cc(cc_p, phis), rtol=1e-5)


def test_refine_beam_center():
    """refine_detector_origin recovers a deliberately shifted ring center;
    the worker wires it through settings."""
    from xframe_tpu.projects.fxs.correlate import refine_detector_origin
    ny = nx = 64
    true_oy, true_ox = 30.0, 33.0
    y, x = np.mgrid[0:ny, 0:nx]
    r = np.hypot(y - true_oy, x - true_ox)
    frame = np.exp(-((r - 12.0) / 3.0) ** 2) + 0.5 * np.exp(
        -((r - 20.0) / 3.0) ** 2)
    oy, ox = refine_detector_origin(frame, (31.5, 31.5),
                                    search_radius_pix=3.0, steps=13)
    assert abs(oy - true_oy) <= 0.5 and abs(ox - true_ox) <= 0.5


def test_correlate_worker_option_wiring(home):
    """End-to-end: every new option accepted through settings."""
    ny = nx = 64
    folder = os.path.join(home, "data", "fxs", "input_files")
    os.makedirs(folder, exist_ok=True)
    names = []
    for s in range(6):
        frame = _blob_frame(ny, nx, 31.5, 31.5, s)
        name = f"frame_{s}.raw"
        frame.tofile(os.path.join(folder, name))
        names.append(name)
    with open(os.path.join(folder, "patterns_list.txt"), "w") as f:
        f.write("\n".join(names))
    xf.select_project("fxs", "correlate", overrides={
        "structure_name": "corr_opt_test",
        "image_dimensions": [ny, nx],
        "detector_origin": [31.5, 31.5],
        "polar_grid": {"n_phi": 64, "n_q": 16},
        "batch_size": 3,
        "qrange_xcca": [[0.0, 1.0, 1], [0.0, 1.0, 1]],
        "phi_range": [0.0, 6.283185307179586],
        "ccf_2p_symmetrize": True,
        "refine_beam_center": {"search_radius_pix": 1.0, "steps": 3},
        "filters": {"radial_pixel_filter": ["average_sigma", 6.0],
                    "roi": {"q_range": [0.005, 0.02], "normalize": True,
                            "mean_bounds": [1e-8, 1e8]}},
        "corrections": {"polarization": "v", "solid_angle": True},
    })
    ccd = xf.run()
    cc = ccd["cross_correlation"]["I1I1"]
    assert cc.shape == (16, 16, 64)
    assert np.isfinite(cc).all()
    assert ccd["num_images_good"] == 6


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


def test_static_binary_mask():
    """filters.mask_file: a per-pixel binary mask excludes pixels from every
    frame exactly like setting them non-finite (reference use_binary_mask,
    correlate.py:157-164)."""
    ny = nx = 64
    oy = ox = 31.5
    frames = np.stack([_blob_frame(ny, nx, oy, ox, s) for s in range(3)])
    rng = np.random.default_rng(5)
    mask = (rng.uniform(size=(ny, nx)) > 0.1).astype(np.float32)
    kw = dict(pixel_size_um=200.0, sample_distance_mm=800.0,
              wavelength=1.23984, n_phi=64, n_q=16)
    masked = Correlator((ny, nx), (oy, ox), static_mask=mask, **kw)
    plain = Correlator((ny, nx), (oy, ox), **kw)
    out_m = masked.correlate_frames(iter([frames]))
    nanned = frames.copy()
    nanned[:, mask < 0.5] = np.nan
    out_n = plain.correlate_frames(iter([nanned]))
    cm, cn = out_m["cross_correlation"], out_n["cross_correlation"]
    assert np.allclose(np.nan_to_num(cm), np.nan_to_num(cn), rtol=1e-5,
                       atol=1e-6 * np.abs(np.nan_to_num(cn)).max())
    out_p = plain.correlate_frames(iter([frames]))
    assert not np.allclose(np.nan_to_num(cm),
                           np.nan_to_num(out_p["cross_correlation"]),
                           rtol=1e-4)


def test_roi_normalize_negative_mean_and_empty_roi():
    """Background-subtracted frames can have a NEGATIVE ROI mean: the
    normalization must divide by the actual mean (reference correlate.py:432
    np.divide) rather than a clamp (which used to scale the frame by ~1e30
    and poison the CCF); a frame whose ROI is fully masked is flagged bad."""
    ny = nx = 64
    oy = ox = 31.5
    frames = np.stack([_blob_frame(ny, nx, oy, ox, s) for s in range(2)])
    kw = dict(pixel_size_um=200.0, sample_distance_mm=800.0,
              wavelength=1.23984, n_phi=64, n_q=16)
    plain = Correlator((ny, nx), (oy, ox), **kw)
    roi_range = (plain.qs[4], plain.qs[10])

    # frame 1 strongly negative via a large background
    bg = np.zeros((ny, nx), dtype=np.float32)
    frames_neg = frames.copy()
    frames_neg[1] -= 5.0  # emulate background-subtracted negative frame
    norm = Correlator((ny, nx), (oy, ox), roi_q_range=roi_range,
                      roi_normalize=True, background=bg, **kw)
    out = norm.correlate_frames(iter([frames_neg]))
    cc = out["cross_correlation"]
    assert np.isfinite(cc).all()
    assert np.abs(cc).max() < 1e6  # no clamp-driven 1e30 blowup

    # numpy reference: divide by the true (negative for frame 1) ROI mean
    polar = np.stack([map_coordinates(f, plain._coords, order=1, cval=0.0)
                      for f in frames_neg])
    lo, hi = norm._roi
    means = polar[:, lo:hi, :].mean(axis=(1, 2))
    assert means[1] < 0
    expected = _numpy_cc(polar / means[:, None, None],
                         np.ones_like(polar), 64)
    assert np.allclose(cc, expected, rtol=1e-3,
                       atol=1e-5 * np.abs(expected).max())

    # fully-masked ROI (mask_above kills everything) → frame flagged bad
    dead = Correlator((ny, nx), (oy, ox), roi_q_range=roi_range,
                      roi_normalize=True, mask_above=-10.0, **kw)
    out_dead = dead.correlate_frames(iter([frames]))
    assert out_dead["num_images_good"] == 0


def test_refine_beam_center_degenerate_frames_keep_origin():
    """All-zero frames and edge origins score +inf, so the search returns
    the initial origin instead of silently walking to a corner."""
    from xframe_tpu.projects.fxs.correlate import refine_detector_origin
    zero = np.zeros((64, 64), dtype=np.float32)
    assert refine_detector_origin(zero, (31.5, 31.5)) == (31.5, 31.5)
    # origin on the edge: every candidate has r_max <= 0
    frame = _blob_frame(64, 64, 31.5, 31.5)
    assert refine_detector_origin(frame, (0.0, 0.0),
                                  search_radius_pix=1.0,
                                  steps=3) == (0.0, 0.0)
