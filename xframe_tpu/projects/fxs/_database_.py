"""FXS project database: path layout + HDF5 schemas of the pipeline files.

Preserves the reference's on-disk contracts (SURVEY.md §7 "file-format
contracts"; reference projects/fxs/_database_.py):

  ccd.h5              — correlate/simulate_ccd output, consumed by extract
  proj_data.h5        — extract output ("invariants"), consumed by reconstruct
  data.h5 (+ archive) — reconstruct output, consumed by average
  average_results.h5  — average output

Each save archives into a run-numbered folder together with the exact settings
used (reference settings snapshotting, settings/__init__.py:41-58).
"""
from __future__ import annotations

import os
import time

import numpy as np

from xframe_tpu.io.database import DefaultDB
from xframe_tpu.settings import loader as settings_loader


class ProjectDB(DefaultDB):
    def __init__(self, settings=None):
        data_root = None
        if settings is not None:
            data_root = settings.get("IO", {}).get("data_root")
        if not data_root:
            data_root = os.path.join(settings_loader.home_dir(), "data", "fxs")
        templates = {
            "ccd": "{data_root}/ccd/{structure_name}/run_{run}/ccd.h5",
            "invariants": "{data_root}/invariants/{structure_name}/run_{run}/proj_data.h5",
            "reconstructions": "{data_root}/reconstructions/{structure_name}/run_{run}/data.h5",
            "average_results": "{data_root}/averages/{structure_name}/run_{run}/average_results.h5",
        }
        super().__init__(templates, data_root=data_root)
        self.settings = settings
        self.structure_name = "default"
        if settings is not None:
            self.structure_name = settings.get("structure_name", "default")

    # ------------------------------------------------------------- run folders
    def _name_folder(self, name):
        return os.path.join(self.base_modifiers["data_root"],
                            {"ccd": "ccd", "invariants": "invariants",
                             "reconstructions": "reconstructions",
                             "average_results": "averages"}[name],
                            self.structure_name)

    def latest_run(self, name):
        return self.get_latest_run(self._name_folder(name))

    def _resolve(self, name, run=None, new_run=False):
        """Path for dataset `name`; run defaults to latest (or next for saves)."""
        folder = self._name_folder(name)
        if run is None:
            run = self.latest_run(name) + 1 if new_run else self.latest_run(name)
        if run == 0 and not new_run:
            raise FileNotFoundError(f"no runs of {name!r} under {folder}")
        return self.get_path(name, makedirs=new_run,
                             structure_name=self.structure_name, run=run), run

    def _archive_settings(self, run_folder):
        from xframe_tpu import settings
        raw = getattr(settings, "raw_project", None)
        if raw:
            settings_loader.archive_settings(run_folder, raw)
        # experiment settings archived alongside when one is selected
        # (reference archives both trees, settings/__init__.py:41-58)
        raw_exp = getattr(settings, "raw_experiment", None)
        if raw_exp:
            settings_loader.archive_settings(run_folder, raw_exp,
                                             prefix="experiment_settings")

    def _save_archived(self, name, data, run=None):
        path, run = self._resolve(name, run=run, new_run=True)
        self.save_direct(path, data)
        self._archive_settings(os.path.dirname(path))
        return path, run

    # -------------------------------------------------------------------- ccd
    # ------------------------------------------------------ per-name options
    def _io_option(self, name, key, default=None):
        """IO.files.<name>.options.<key> save-hook toggle (reference
        per-name options, e.g. default_0.01.yaml reconstructions options
        generate_vtk_files/plot_error_metrics, ccd save_symlink)."""
        if self.settings is None:
            return default
        opt = (self.settings.get("IO", {}).get("files", {}).get(name, {})
               .get("options", {}))
        val = opt.get(key, default)
        return default if val is None else val

    def _latest_symlink(self, path):
        """Refresh a '<structure folder>/<filename>' symlink pointing at the
        newest run's file (reference create_symlink, _database_.py:651,796 —
        the ccd_symlink/invariant_symlink convenience paths)."""
        try:
            run_dir = os.path.dirname(path)
            link = os.path.join(os.path.dirname(run_dir),
                                os.path.basename(path))
            rel = os.path.join(os.path.basename(run_dir),
                               os.path.basename(path))
            if os.path.islink(link) or os.path.exists(link):
                os.remove(link)
            os.symlink(rel, link)
        except OSError:
            pass

    def save_ccd(self, data, run=None, **kw):
        """Schema (reference correlate.py:274-295): radial_points,
        angular_points, xray_wavelength, average_intensity,
        cross_correlation/{I1I1,...}, num_images_processed, num_images_good."""
        path, run = self._save_archived("ccd", data, run=run)
        if bool(self._io_option("ccd", "save_symlink", True)):
            self._latest_symlink(path)
        return path, run

    def load_ccd(self, run=None, path=None, **kw):
        if path is None:
            path, _ = self._resolve("ccd", run=run)
        data = self.load_direct(path)
        # tolerate legacy layouts (reference _database_.py:482-565): a bare
        # cross_correlation array instead of the {dataset: array} group
        cc = data.get("cross_correlation")
        if cc is not None and not isinstance(cc, dict):
            data["cross_correlation"] = {"I1I1": np.asarray(cc)}
        return data

    # -------------------------------------------------------------- invariants
    def save_invariants(self, data, run=None, **kw):
        """Schema (reference _database_.py:611-): dimensions, xray_wavelength,
        max_order, average_intensity, data_radial_points, data_angular_points,
        deg_2_invariant/{I1I1}, deg_2_invariant_masks/{I1I1},
        data_projection_matrices/{I1I1} (list over l of (N_q, min(2l+1, N_q))),
        data_projection_matrices_q_id_limits,
        data_low_resolution_intensity_coefficients."""
        data = dict(data)
        pm = data.get("data_projection_matrices", {})
        data["data_projection_matrices"] = {
            k: [np.asarray(v) for v in vs] for k, vs in pm.items()}
        path, run = self._save_archived("invariants", data, run=run)
        if bool(self._io_option("invariants", "plot_first_invariants", True)):
            self._plot_first_invariants(data, os.path.dirname(path))
        if bool(self._io_option("invariants", "create_symlink", True)):
            self._latest_symlink(path)
        return path, run

    def load_invariants(self, run=None, path=None, **kw):
        if path is None:
            path, _ = self._resolve("invariants", run=run)
        data = self.load_direct(path)
        pm = data.get("data_projection_matrices", {})
        data["data_projection_matrices"] = {
            k: [np.asarray(v) for v in vs] for k, vs in pm.items()}
        return data

    def _plot_matrix_stack(self, bl, folder, fname, n=4, label="B"):
        """Log-magnitude images of the first n nonzero orders of a stacked
        (L+1, n_q, n_q) matrix family (reference _save_first_invariants,
        _database_.py:395-450)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            bl = np.asarray(bl)
            orders = [l for l in range(min(2 * n, bl.shape[0]))
                      if np.abs(bl[l]).max() > 0][:n]
            if not orders:
                return
            fig, axes = plt.subplots(1, len(orders),
                                     figsize=(4 * len(orders), 3.5))
            axes = np.atleast_1d(axes)
            for ax, l in zip(axes, orders):
                im = ax.imshow(np.log10(np.abs(bl[l]) + 1e-20), origin="lower")
                ax.set_title(f"log10 |{label}_{l}|")
                fig.colorbar(im, ax=ax)
            fig.tight_layout()
            fig.savefig(os.path.join(folder, fname), dpi=100)
            plt.close(fig)
        except Exception:  # plotting must never break the pipeline
            pass

    @staticmethod
    def _bl_from_projection_matrices(proj_list):
        """B_l = V_l V_l† from a per-l matrix list (reference
        projection_matrices_to_deg2_invariant, fxs_invariant_tools.py:1240)."""
        out = []
        n_q = np.atleast_2d(np.asarray(proj_list[0])).shape[0]
        for v in proj_list:
            v = np.atleast_2d(np.asarray(v))
            if v.shape[0] != n_q:
                v = v.T
            out.append(v @ v.conj().T)
        return np.asarray(out)

    def _plot_first_invariants(self, data, folder, n=4):
        """First-invariant diagnostic figures (reference
        _save_first_invariants, _database_.py:395-450, 655-676): |B_l| from
        the data, optionally the V_l V_l† rebuild and the factorization
        error estimates (invariants options
        plot_first_invariants_from_proj_matrices /
        plot_first_projection_matrix_error_estimates)."""
        try:
            bl = np.asarray(data["deg_2_invariant"]["I1I1"])
            self._plot_matrix_stack(bl, folder, "first_invariants.png", n)
            if bool(self._io_option(
                    "invariants", "plot_first_invariants_from_proj_matrices",
                    True)):
                proj = data.get("data_projection_matrices", {}).get("I1I1")
                if proj:
                    self._plot_matrix_stack(
                        self._bl_from_projection_matrices(proj), folder,
                        "first_invariants_from_proj_matrices.png", n)
            if bool(self._io_option(
                    "invariants",
                    "plot_first_projection_matrix_error_estimates", False)):
                est = data.get("data_projection_matrix_error_estimates",
                               {}).get("I1I1")
                if est is not None:
                    self._plot_matrix_stack(
                        np.abs(np.asarray(est)), folder,
                        "first_projection_matrix_error_estimates.png", n,
                        label="err")
        except Exception:  # plotting must never break the pipeline
            pass

    # --------------------------------------------------------- reconstructions
    def save_reconstructions(self, data, run=None, **kw):
        """Schema (reference reconstruct.py:1003-1021 + tests :388-423):
        configuration/{internal_grid/{real,reciprocal}_grid,
        reciprocity_coefficient, xray_wavelength}, projection_matrices,
        reconstruction_results/{i}/{...}. Also writes per-result vtk exports
        and an error-metric plot into the run folder."""
        path, run = self._save_archived("reconstructions", data, run=run)
        folder = os.path.dirname(path)
        # generate_vtk_files: False disables, True or an int caps the count
        # (the reference default is slice(2): first two results)
        gen = self._io_option("reconstructions", "generate_vtk_files", 2)
        if gen is not False:
            self._export_reconstruction_vtk(
                data, folder,
                max_exports=2 if gen is True else int(gen))
        if bool(self._io_option("reconstructions", "plot_error_metrics",
                                True)):
            self._plot_errors(data, folder)
        # plot_first_used_invariants: |B_l| of the regridded projection
        # matrices the reconstruction actually used (reference
        # _database_.py:376-384)
        if bool(self._io_option("reconstructions",
                                "plot_first_used_invariants", True)):
            proj = data.get("projection_matrices")
            if isinstance(proj, dict):
                proj = [proj[k] for k in sorted(proj, key=int)]
            if proj is not None and len(proj):
                self._plot_matrix_stack(
                    self._bl_from_projection_matrices(proj), folder,
                    "first_used_invariants.png")
        # generate_2d_images: density-slice pngs per result (reference
        # reconstructions options, default_0.01.yaml:382-386; 2D there,
        # rendered for both dims here via the headless viewer figures)
        n_img = self._io_option("reconstructions", "generate_2d_images", 2)
        if n_img is not False:
            self._export_reconstruction_images(
                data, folder, max_exports=2 if n_img is True else int(n_img))
        return path, run

    def _export_reconstruction_images(self, data, folder, max_exports=2):
        try:
            import matplotlib
            matplotlib.use("Agg")
            from xframe_tpu.presenters.viewer import (reconstruction_figure,
                                                      _grid_from_config)
            grid = _grid_from_config(data["configuration"])
            results = data.get("reconstruction_results", {})
            for i, key in enumerate(sorted(results, key=lambda k: int(k))):
                if i >= max_exports:
                    break
                fig = reconstruction_figure(results[key], grid, key=key)
                fig.savefig(os.path.join(folder, f"real_density_{key}.png"),
                            dpi=100)
                import matplotlib.pyplot as plt
                plt.close(fig)
        except Exception:
            pass

    def load_reconstructions(self, run=None, path=None, **kw):
        if path is None:
            path, _ = self._resolve("reconstructions", run=run)
        return self.load_direct(path)

    def _export_reconstruction_vtk(self, data, folder, max_exports=2):
        try:
            from xframe_tpu.io import vtk as vtk_io
            cfg = data["configuration"]["internal_grid"]
            rs = np.asarray(cfg["real_grid"])
            thetas = np.asarray(cfg["thetas"])
            phis = np.asarray(cfg["phis"])
            results = data.get("reconstruction_results", {})
            for i, key in enumerate(sorted(results, key=lambda k: int(k))):
                if i >= max_exports:
                    break
                rho = np.asarray(results[key]["real_density"])
                vtk_io.save_spherical(
                    os.path.join(folder, f"real_density_{key}.vts"),
                    rs, thetas, phis, {"density": rho})
        except Exception:
            pass

    def _plot_errors(self, data, folder):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(6, 4))
            for key, res in data.get("reconstruction_results", {}).items():
                err = np.asarray(res["error_dict"]["main"])
                ax.semilogy(err, label=f"run {key}", alpha=0.7)
            ax.set_xlabel("iteration")
            ax.set_ylabel("relative L2 error")
            if len(data.get("reconstruction_results", {})) <= 8:
                ax.legend(fontsize=7)
            fig.tight_layout()
            fig.savefig(os.path.join(folder, "errors.png"), dpi=100)
            plt.close(fig)
        except Exception:
            pass

    # ---------------------------------------------------------------- averages
    def save_average_results(self, data, run=None, **kw):
        """Schema (reference average.py:577-623 + tests :475-502)."""
        path, run = self._save_archived("average_results", data, run=run)
        folder = os.path.dirname(path)
        if bool(self._io_option("average_results", "plot_resolution_metrics",
                                True)):
            self._plot_prtf(data, folder)
        self._export_average_vtk(
            data, folder,
            average=bool(self._io_option("average_results",
                                         "generate_average_vtk", True)),
            aligned=bool(self._io_option("average_results",
                                         "generate_aligned_vtk", False)),
            inputs=bool(self._io_option("average_results",
                                        "generate_input_vtk", False)))
        return path, run

    def load_average_results(self, run=None, path=None, **kw):
        if path is None:
            path, _ = self._resolve("average_results", run=run)
        return self.load_direct(path)

    def _plot_prtf(self, data, folder):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            metrics = data.get("resolution_metrics", {})
            if "PRTF" not in metrics:
                return
            fig, ax = plt.subplots(figsize=(6, 4))
            ax.plot(np.asarray(metrics.get("PRTF_qs", np.arange(
                len(metrics["PRTF"])))), np.asarray(metrics["PRTF"]))
            ax.axhline(1 / np.e, color="gray", ls="--", label="1/e")
            ax.set_xlabel("q")
            ax.set_ylabel("PRTF")
            ax.legend()
            fig.tight_layout()
            fig.savefig(os.path.join(folder, "PRTF.png"), dpi=100)
            plt.close(fig)
        except Exception:
            pass

    def _export_average_vtk(self, data, folder, average=True, aligned=False,
                            inputs=False):
        """average/aligned/input vtk exports (reference average_results
        options generate_{average,aligned,input}_vtk)."""
        try:
            from xframe_tpu.io import vtk as vtk_io
            grid = data.get("grid")
            if grid is None:
                return
            rs = np.asarray(grid["rs"])
            thetas = np.asarray(grid["thetas"])
            phis = np.asarray(grid["phis"])

            def _save(fname, rho):
                vtk_io.save_spherical(os.path.join(folder, fname), rs, thetas,
                                      phis, {"density": np.asarray(rho)})

            if average:
                _save("average_density.vts", data["average"]["real_density"])
            if aligned:
                for key, rho in data.get("aligned", {}).items():
                    _save(f"aligned_density_{key}.vts", rho)
            if inputs:
                for key, rho in data.get("input", {}).items():
                    _save(f"input_density_{key}.vts", rho)
        except Exception:
            pass


def timestamp():
    t = time.gmtime()
    return f"{t.tm_mday}_{t.tm_mon}_{t.tm_year}"
