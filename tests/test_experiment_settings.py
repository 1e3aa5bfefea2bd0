"""Experiment settings subsystem (VERDICT r3 #5) + settings.general wiring
(VERDICT r3 #8): per-experiment YAML through the loader precedence into
settings.experiment, the `-eset` CLI flag, run archival, and the populated
general tree. Reference contract: xframe/main.py:61,
startup_routines.py:249-258, settings/__init__.py:7-19, settings/general.py."""
import os
import subprocess
import sys

import numpy as np
import h5py
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _clean_experiment_tree():
    """In-process global settings.experiment must not leak across tests."""
    yield
    from xframe_tpu import settings, comm
    settings.experiment.clear()
    settings.raw_experiment = {}
    comm._experiment = None


@pytest.fixture()
def exp_home(tmp_path, monkeypatch):
    """Fresh home with a synthetic SPB run + experiment settings file."""
    home = tmp_path / "home"
    run = tmp_path / "run"
    run.mkdir()
    for mod in range(2):
        with h5py.File(run / f"RAW-R1-AGIPD{mod:02d}-S00000.h5", "w") as f:
            grp = f"INSTRUMENT/SPB_DET_AGIPD1M-1/DET/{mod}CH0:xtdf/image"
            f.create_dataset(f"{grp}/data",
                             data=np.full((6, 512, 128), 3.0, np.float32))
            f.create_dataset(f"{grp}/cellId",
                             data=np.arange(6, dtype=np.uint16))
    sdir = home / "settings" / "experiments" / "SPB"
    sdir.mkdir(parents=True)
    (sdir / "myexp.yaml").write_text(f"""
run_folder: {run}
x_ray_energy: 8000
detector_distance: 0.285
good_cells:
  command: 'np.arange(1, 6)'
filter_sequence: [adu]
filters:
  adu:
    class: ADUFilter
    limits: [-40, 4000]
""")
    monkeypatch.setenv("XFRAME_TPU_HOME", str(home))
    return str(home), str(run)


def test_load_experiment_settings_precedence_and_dialect(exp_home):
    """Named file merges with the install-tree versioned defaults; the
    `command:` and `_only_if` directives run (wavelength default is dropped
    once x_ray_energy is set)."""
    from xframe_tpu import settings
    opt = settings.load_experiment_settings("SPB", "myexp")
    # named-file values
    assert opt.x_ray_energy == 8000
    assert opt.detector_distance == 0.285
    assert list(opt.good_cells) == [1, 2, 3, 4, 5]         # command: evaluated
    # defaults merged from xframe_tpu/experiments/SPB/settings/default_0.01.yaml
    assert opt.image_key == "image/data"
    assert opt.data_path_glob == "*AGIPD{module:02d}*.h5"
    # _only_if: wavelength default only applies while x_ray_energy is null
    assert "wavelength" not in opt.dict()
    # the global tree is populated (reference settings.experiment)
    assert settings.experiment.x_ray_energy == 8000
    assert settings.raw_experiment["_settings_name"] == "myexp"


def test_load_experiment_defaults_only(exp_home):
    from xframe_tpu import settings
    opt = settings.load_experiment_settings("SPB")
    assert opt.detector_distance == 0.217
    assert opt.wavelength == 1.23984        # x_ray_energy null → default kept


def test_select_experiment_builds_worker_from_settings(exp_home):
    import xframe_tpu as xf
    from xframe_tpu import comm
    home, run = exp_home
    exp = xf.select_experiment("SPB", "myexp")
    assert exp.run_folder == str(run)
    # wavelength derived from 8000 eV ≈ 1.5498 Å (physics.energy_to_wavelength)
    assert np.isclose(exp.wavelength, 1.5498, atol=1e-3)
    # declarative filter pipeline instantiated
    assert exp.filter_sequence is not None
    # good_cells from the command expression: cell 0 dropped
    assert exp.index.frame_mask.sum() == 5
    assert comm.experiment() is exp
    # explicit kwargs override settings values (incl. the energy derivation)
    exp2 = xf.select_experiment("SPB", "myexp", wavelength=2.0)
    assert exp2.wavelength == 2.0


def test_experiment_settings_archived_with_runs(exp_home, tmp_path):
    """fxs run archival includes the experiment settings snapshot."""
    import xframe_tpu as xf
    xf.select_experiment("SPB", "myexp")
    xf.select_project("fxs", "extract", "tutorial")
    db = xf.database.project
    data = {"radial_points": np.linspace(0.01, 1.0, 4),
            "angular_points": np.linspace(0, 2 * np.pi, 8, endpoint=False),
            "xray_wavelength": 1.23, "average_intensity": np.ones(4),
            "cross_correlation": {"I1I1": np.ones((4, 4, 8))},
            "num_images_processed": 1, "num_images_good": 1}
    db.save("ccd", data)
    run_dir = os.path.dirname(db.get_path("ccd", run=1,
                                          structure_name=db.structure_name))
    assert os.path.exists(os.path.join(run_dir, "settings.yaml"))
    snap = os.path.join(run_dir, "experiment_settings.yaml")
    assert os.path.exists(snap)
    with open(snap) as f:
        text = f.read()
    assert "x_ray_energy: 8000" in text          # source bytes verbatim
    assert os.path.exists(os.path.join(run_dir,
                                       "experiment_settings_merged.yaml"))


def test_cli_eset_flag(exp_home):
    """`-e SPB -eset myexp` binds the worker from the experiment settings
    tree through the real CLI (VERDICT done-criterion)."""
    home, run = exp_home
    proj = os.path.join(home, "projects", "probe")
    os.makedirs(proj)
    with open(os.path.join(proj, "check.py"), "w") as f:
        f.write("""
import numpy as np
from xframe_tpu.interfaces import ProjectWorkerInterface
from xframe_tpu import comm, settings


class ProjectWorker(ProjectWorkerInterface):
    def run(self):
        exp = comm.experiment()
        print(f"EXP run_folder={exp.run_folder}")
        print(f"EXP wavelength={exp.wavelength:.4f}")
        print(f"ESET energy={settings.experiment.x_ray_energy}")
        print(f"FRAMES={exp.n_frames()}")
""")
    env = dict(os.environ, XFRAME_TPU_HOME=home, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "xframe_tpu", "probe", "check",
         "-e", "SPB", "-eset", "myexp"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    assert f"EXP run_folder={run}" in r.stdout
    assert "EXP wavelength=1.5498" in r.stdout
    assert "ESET energy=8000" in r.stdout
    assert "FRAMES=6" in r.stdout


def test_general_settings_defaults_and_home_override(tmp_path, monkeypatch):
    """settings.general carries the surviving reference knobs and merges
    <home>/settings/general.yaml (reference general.py:12-29)."""
    home = tmp_path / "ghome"
    (home / "settings").mkdir(parents=True)
    (home / "settings" / "general.yaml").write_text(
        "loglevel: INFO\nload_projects: [fxs]\n")
    monkeypatch.setenv("XFRAME_TPU_HOME", str(home))
    from xframe_tpu import settings
    g = settings.reload_general()
    assert g.loglevel == "INFO"
    assert g.load_projects == ["fxs"]
    assert g.home == str(home)
    assert g.default_project_worker_name == "ProjectWorker"
    # load_projects filters CLI discovery
    from xframe_tpu.main import discover_projects
    found = discover_projects()
    assert set(found) == {"fxs"}
    # restore pristine general for subsequent in-process tests
    monkeypatch.delenv("XFRAME_TPU_HOME")
    settings.reload_general()


def test_cli_worker_help_strings(tmp_path):
    """Per-worker help mirrors the reference's _argparser_ texts
    (VERDICT r3 #9)."""
    env = dict(os.environ, XFRAME_TPU_HOME=str(tmp_path / "h"),
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-m", "xframe_tpu", "fxs", "--help"],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=300)
    assert r.returncode in (0, 1)
    assert "cross-correlations" in r.stdout
    assert "MTIP" in r.stdout
    r2 = subprocess.run(
        [sys.executable, "-m", "xframe_tpu", "fxs", "reconstruct", "--help"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert r2.returncode in (0, 1)
    assert "phasing" in r2.stdout or "phase retrieval" in r2.stdout
