"""Presenter smoke tests: every figure factory builds a savable figure."""
import numpy as np

from xframe_tpu.presenters.matplotlib_presenter import (
    plot1D, heat2D, heatPolar2D, sphericalSlices, detector_heat)


def test_all_presenters_build(tmp_path):
    rng = np.random.default_rng(0)
    figs = {
        "p1": plot1D.get_fig(rng.normal(size=(3, 40)), labels=["a", "b", "c"],
                             ylog=False, title="t"),
        "h2": heat2D.get_fig(rng.normal(size=(16, 24)), log_scale=True),
        "h2m": heat2D.get_fig_multi([rng.normal(size=(8, 8))] * 2,
                                    titles=["x", "y"]),
        "pol": heatPolar2D.get_fig(rng.normal(size=(10, 32)) + 2,
                                   rs=np.linspace(1, 2, 10)),
        "sph": sphericalSlices.get_fig(rng.normal(size=(6, 8, 16))),
        "det": detector_heat.get_fig(rng.normal(size=(50, 2)),
                                     rng.normal(size=50)),
    }
    for name, fig in figs.items():
        out = tmp_path / f"{name}.png"
        fig.savefig(out)
        assert out.stat().st_size > 500, name
