"""Framework integration through the ACTUAL CLI in subprocesses, with a
throwaway user project — the reference's framework test pattern
(tests/test_framework_integration.py:64-200): generated project worker,
settings with `command:` evals, custom output, stdout + file assertions."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def home(tmp_path):
    proj = tmp_path / "projects" / "hello"
    (proj / "settings" / "greet").mkdir(parents=True)
    (proj / "greet.py").write_text('''
import os
import numpy as np
from xframe_tpu.interfaces import ProjectWorkerInterface
from xframe_tpu.settings import loader as settings_loader


class ProjectWorker(ProjectWorkerInterface):
    def run(self):
        opt = self.settings
        values = np.asarray(opt.values)
        out = os.path.join(settings_loader.home_dir(), "data", "hello.txt")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            f.write(f"{opt.greeting} sum={values.sum():.1f}")
        print(f"hello worker says: {opt.greeting}")
        return values
''')
    (proj / "settings" / "greet" / "default_0.1.yaml").write_text('''
greeting:
  _value: "default-hi"
values:
  _value:
    command: 'np.arange(4)'
scale:
  _value: 1.0
''')
    (proj / "settings" / "greet" / "loud.yaml").write_text('''
greeting: "HELLO"
values:
  command: 'np.arange(5) * 2'
''')
    return str(tmp_path)


def _cli(home, *args):
    env = dict(os.environ, XFRAME_TPU_HOME=home, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, "-m", "xframe_tpu", *args],
                          capture_output=True, text=True, cwd=REPO, env=env,
                          timeout=300)


def test_cli_runs_user_project(home):
    r = _cli(home, "hello", "greet", "loud")
    assert r.returncode == 0, r.stderr
    assert "hello worker says: HELLO" in r.stdout
    out = os.path.join(home, "data", "hello.txt")
    with open(out) as f:
        content = f.read()
    assert content == "HELLO sum=20.0"  # command: eval ran (0+2+4+6+8)


def test_cli_defaults_without_named_settings(home):
    r = _cli(home, "hello", "greet")
    assert r.returncode == 0, r.stderr
    assert "default-hi" in r.stdout
    with open(os.path.join(home, "data", "hello.txt")) as f:
        assert f.read() == "default-hi sum=6.0"


def test_cli_discovery_lists_user_project(home):
    r = _cli(home, "--help")
    assert r.returncode in (0, 1)
    assert "hello" in r.stdout


def test_cli_view_subcommand(home, tmp_path):
    """`xframe-tpu view <file.h5>` renders PNGs through the CLI dispatch."""
    from xframe_tpu.io import hdf5 as hdf5_io
    from xframe_tpu.main import main
    n_r, n_p = 8, 12
    data = {
        "configuration": {"internal_grid": {
            "real_grid": np.linspace(0.1, 1.0, n_r),
            "phis": np.linspace(0, 2 * np.pi, n_p, endpoint=False)}},
        "reconstruction_results": {"0": {
            "real_density": np.random.default_rng(0).random((n_r, n_p)),
            "support_mask": np.ones((n_r, n_p), dtype=bool),
            "error_dict": {"main": np.geomspace(1, 1e-2, 10)}}},
    }
    p = str(tmp_path / "d.h5")
    hdf5_io.save(p, data)
    out = str(tmp_path / "views")
    assert main(["view", p, "-o", out, "-n", "1"]) == 0
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == 1


def test_scripting_database_facade(home, monkeypatch, tmp_path):
    """xf.database.project mirrors the reference's scripting DB access
    (docs/fxs/scripting.md "Accessing project files"): populated by
    select_project, re-built on re-selection, named artifact round-trip."""
    monkeypatch.setenv("XFRAME_TPU_HOME", str(tmp_path / "fxs_home"))
    import xframe_tpu as xf
    from xframe_tpu.settings import loader as settings_loader
    monkeypatch.setattr(settings_loader, "_home_cache", None, raising=False)

    xf.select_project("fxs", "extract", "tutorial")
    db = xf.database.project
    assert type(db).__name__ == "ProjectDB"
    assert db.structure_name == "tutorial"
    path = db.get_path("ccd", run=1, structure_name=db.structure_name)
    assert path.endswith("ccd/tutorial/run_1/ccd.h5")

    # named save/load round-trip through the facade (run auto-numbering)
    data = {"radial_points": np.linspace(0.01, 1.0, 4),
            "angular_points": np.linspace(0, 2 * np.pi, 8, endpoint=False),
            "xray_wavelength": 1.23,
            "average_intensity": np.ones(4),
            "cross_correlation": {"I1I1": np.ones((4, 4, 8))},
            "num_images_processed": 1, "num_images_good": 1}
    db.save("ccd", data)
    back = db.load("ccd")
    assert np.allclose(back["cross_correlation"]["I1I1"],
                       data["cross_correlation"]["I1I1"])

    # re-selection swaps the facade to the new project's DB
    xf.select_project("tutorial", "get_started", None)
    assert type(xf.database.project).__name__ == "DefaultDB"
    # framework-level DB (reference startup_routines.py:128)
    assert type(xf.database.default).__name__ == "DefaultDB"


def test_cli_eset_without_experiment_errors(home):
    """-eset names experiment settings; without -e there is no experiment
    to configure — must fail loudly, not silently skip the load."""
    r = _cli(home, "hello", "greet", "loud", "-eset", "my_beamtime")
    assert r.returncode != 0
    assert "-eset" in r.stderr and "--experiment" in r.stderr


def test_load_projects_scalar_string(home):
    """`load_projects: fxs` as a YAML scalar (not a list) filters projects
    instead of being silently ignored."""
    import importlib
    from xframe_tpu import settings
    from xframe_tpu.main import discover_projects
    os.environ["XFRAME_TPU_HOME"] = home
    old = settings.general.get("load_projects", "all")
    try:
        settings.general["load_projects"] = "hello"
        found = discover_projects()
        assert set(found) == {"hello"}
        settings.general["load_projects"] = "fxs"
        found = discover_projects()
        assert set(found) == {"fxs"}
    finally:
        settings.general["load_projects"] = old
