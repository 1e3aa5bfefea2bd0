"""Persistence peak detector (library/peaks.py) vs hand-checked cases and
structural invariants of persistent homology."""
import numpy as np

from xframe_tpu.library.peaks import (PeakDetector, find_peaks_1d,
                                      find_peaks_2d)


def test_1d_hand_case():
    seq = np.array([0.0, 3.0, 1.0, 2.0, 0.5])
    peaks = find_peaks_1d(seq)
    assert len(peaks) == 2
    assert peaks[0].born == 1 and peaks[0].died is None
    assert peaks[0].persistence(seq) == np.inf
    # the val-2 peak dies at the val-1 saddle: persistence 1
    assert peaks[1].born == 3 and peaks[1].died == 2
    assert np.isclose(peaks[1].persistence(seq), 1.0)


def test_1d_invariants_random():
    rng = np.random.default_rng(0)
    seq = rng.permutation(41).astype(float)  # distinct values
    peaks = find_peaks_1d(seq)
    # every peak summit is a strict local max
    for p in peaks:
        if p.born > 0:
            assert seq[p.born] > seq[p.born - 1]
        if p.born < len(seq) - 1:
            assert seq[p.born] > seq[p.born + 1]
    # count of local maxima matches
    is_max = [i for i in range(len(seq))
              if (i == 0 or seq[i] > seq[i - 1])
              and (i == len(seq) - 1 or seq[i] > seq[i + 1])]
    assert len(peaks) == len(is_max)
    # exactly one immortal peak (the global max), persistences descending
    pers = [p.persistence(seq) for p in peaks]
    assert pers[0] == np.inf and all(np.isfinite(pers[1:]))
    assert all(a >= b for a, b in zip(pers, pers[1:]))
    assert peaks[0].born == int(np.argmax(seq))


def _two_bumps(h=32, w=48, a2=0.6):
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    g1 = np.exp(-(((yy - 10) ** 2 + (xx - 12) ** 2) / 18.0))
    g2 = a2 * np.exp(-(((yy - 22) ** 2 + (xx - 36) ** 2) / 18.0))
    return g1 + g2


def test_2d_two_bumps():
    im = _two_bumps()
    peaks = find_peaks_2d(im)
    assert peaks[0].born == (10, 12) and peaks[0].persistence == np.inf
    assert peaks[1].born == (22, 36)
    # second bump's persistence = its height minus the connecting saddle,
    # which is bounded by the bump amplitudes
    assert 0.3 < peaks[1].persistence < 0.6001
    sy, sx = peaks[1].saddle
    assert np.isclose(peaks[1].birth_value - im[sy, sx],
                      peaks[1].persistence)


def test_2d_periodic_wraps_edge():
    # one bump split across the x boundary: periodic sees ONE peak there
    h, w = 16, 24
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    dx = np.minimum(np.abs(xx - 0), np.abs(xx - w))  # wrapped distance to x=0
    im = np.exp(-((yy - 8) ** 2 + dx ** 2) / 6.0)
    strong = [p for p in find_peaks_2d(im, periodic=True)
              if p.persistence > 0.1]
    assert len(strong) == 1 and strong[0].born == (8, 0)
    # non-periodic: the two half-bumps at x=0 and x=w-1 are separate maxima
    strong_np = [p for p in find_peaks_2d(im, periodic=False)
                 if p.persistence > 0.1]
    assert len(strong_np) >= 1


def test_2d_invariants_random():
    rng = np.random.default_rng(3)
    im = rng.permutation(30 * 20).reshape(30, 20).astype(float)
    peaks = find_peaks_2d(im)
    # exactly one immortal component; persistences sorted descending
    pers = np.array([p.persistence for p in peaks])
    assert np.sum(np.isinf(pers)) == 1
    assert np.all(pers[:-1] >= pers[1:])
    assert peaks[0].born == tuple(np.unravel_index(np.argmax(im), im.shape))
    # every summit is a strict 4-neighborhood local max
    for p in peaks:
        y, x = p.born
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ny, nx = y + dy, x + dx
            if 0 <= ny < 30 and 0 <= nx < 20:
                assert im[y, x] > im[ny, nx]
    # peak count == number of 4-neighborhood local maxima
    n_max = sum(1 for y in range(30) for x in range(20)
                if all(im[y, x] > im[y + dy, x + dx]
                       for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1))
                       if 0 <= y + dy < 30 and 0 <= x + dx < 20))
    assert len(peaks) == n_max


def test_detector_dispatch():
    out1 = PeakDetector.find_peaks(1, [0.0, 1.0, 0.0])
    assert len(out1) == 1 and out1[0].born == 1
    out2 = PeakDetector.find_peaks(2, np.eye(4))
    assert out2[0].persistence == np.inf
    try:
        PeakDetector.find_peaks(3, np.zeros((2, 2, 2)))
        assert False
    except ValueError:
        pass
