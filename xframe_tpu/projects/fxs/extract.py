"""extract worker: cross-correlation data → B_l invariants → projection matrices.

Pipeline (reference projects/fxs/extract.py:38-532, SURVEY.md §3.3):
load ccd.h5 → CC modifications → B_l extraction (back_substitution / lstsq /
circular harmonics in 2D) → PSD enforcement → per-l eigendecomposition into
projection matrices V_l → proj_data.h5. Setup-size float64 host math
(vectorized; no per-order process fan-out as in the reference).
"""
from __future__ import annotations

import numpy as np

from xframe_tpu.interfaces import ProjectWorkerInterface
from xframe_tpu.projects.fxs import invariants as itools
from xframe_tpu.projects.fxs._database_ import ProjectDB


class ProjectWorker(ProjectWorkerInterface):
    database_class = ProjectDB

    def run(self):
        opt = self.settings
        inp = opt.get("input", {})
        run_no = inp.get("ccd_run") or None
        ccd = self.db.load_ccd(run=int(run_no) if run_no else None,
                               path=inp.get("ccd_path") or None)
        dim = int(ccd.get("dimensions", opt.get("dimensions", 3)))
        data = self.extract(ccd, dim)
        path, run = self.db.save("invariants", data)
        print(f"extract: saved invariants to {path}")
        return data

    # ---------------------------------------------------------------- extract
    def extract(self, ccd, dim):
        opt = self.settings
        name = "I1I1"
        ds_opt = opt.cross_correlation.datasets[name]
        cc = np.asarray(ccd["cross_correlation"][name], dtype=float)
        qs = np.asarray(ccd["radial_points"], dtype=float)
        wavelength = float(ccd["xray_wavelength"])
        avg_intensity = np.asarray(ccd["average_intensity"], dtype=float)
        L = int(opt.max_order)
        zero_odd = bool(ds_opt.get("assume_zero_odd_orders", True))
        method = str(ds_opt.get("bl_extraction_method", "back_substitution"))

        # --- CC mask (reference cross_correlation_mask :100-232)
        phis = np.asarray(ccd["angular_points"], dtype=float)
        mask_opt = ds_opt.get("cc_mask", {})
        mask_type = str(mask_opt.get("type", "none"))
        mask = itools.cc_mask(
            qs, phis, mask_type=mask_type, xray_wavelength=wavelength,
            pixel_size=mask_opt.get("pixel_size"),
            mask_at_pi=bool(mask_opt.get("mask_at_pi", True)),
            threshold=float(mask_opt.get("threshold", 0.01)),
            custom=mask_opt.get("mask")) if dim == 3 else \
            np.ones(cc.shape, dtype=bool)

        # --- CC modifications (reference modify_cross_correlation :235-289)
        mod = ds_opt.get("modify_cc", {})
        subtracted_avg = bool(mod.get("subtract_average_intensity", True))
        if subtracted_avg:
            if dim == 3:
                # a(q1)a(q2) is exactly the B_0 term of the CC (n=0 in Δ)
                cc = cc - np.asarray(avg_intensity)[:, None, None] \
                    * np.asarray(avg_intensity)[None, :, None]
            else:
                cc = cc - avg_intensity[:, None, None] * avg_intensity[None, :, None]
        lp = mod.get("low_pass_order", False)
        if lp:
            ccn = np.fft.rfft(cc, axis=-1)
            ccn[..., int(lp) + 1:] = 0
            cc = np.fft.irfft(ccn, cc.shape[-1], axis=-1)
        if mod.get("q1q2_symmetrize", False):
            cc = (cc + np.swapaxes(cc, 0, 1)) / 2
        if mod.get("pi_periodicity", False):
            cc = itools.enforce_pi_periodicity(cc)
        if not mask.all():
            if mod.get("interpolate_masked", True):
                cc = itools.interpolate_masked_cc(cc, mask)
            else:
                cc = np.where(mask, cc, 0.0)

        # --- B_l extraction
        if dim == 3:
            bl = itools.cc_to_deg2_invariant_3d(
                cc, wavelength, qs, L, assume_zero_odd_orders=zero_odd,
                mode={"legendre": "back_substitution"}.get(method, method))
            if subtracted_avg:
                # re-insert B_0 from the averaged intensity:
                # B_0 = I_00 I_00* = 4π a(q1) a(q2)
                bl[0] = 4 * np.pi * np.outer(avg_intensity, avg_intensity)
        else:
            bl = itools.cc_to_deg2_invariant_2d(cc, L)
            if subtracted_avg:
                bl[0] = np.outer(avg_intensity, avg_intensity)

        # --- constraints (reference extract.py:332-430)
        masks = np.ones(bl.shape, dtype=bool)
        inv_opt = opt.get("invariant_constraints", {})
        if inv_opt.get("positive_semidefinite", {}).get("apply", True):
            bl = itools.nearest_positive_semidefinite_matrix(bl)

        q_limits = self._q_id_limits(bl.shape[0], len(qs))

        # --- projection matrices (reference extract.py:433-466)
        if dim == 3:
            proj, eigs = itools.deg2_invariant_to_projection_matrices(
                bl, q_id_limits=q_limits)
        else:
            vecs, eigs = itools.deg2_invariant_to_projection_vectors_2d(bl)
            proj = [v[:, None] for v in vecs]

        # --- optional prephasing: SHT positivity constraint on V_l
        # (reference extract.py:479-493 → fxs_invariant_tools.py:1271)
        pp = opt.get("projection_matrices", {}).get("prephase", {})
        if dim == 3 and bool(pp.get("apply", False)):
            from xframe_tpu.ops.sht import SphericalHarmonicTransform
            sht = SphericalHarmonicTransform(bl.shape[0] - 1)
            proj, converged = itools.enforce_sht_constraint(
                proj, sht, iterations=int(pp.get("iterations", 10)) * 10)
            print(f"extract: prephasing "
                  f"{'converged' if converged else 'ran its iteration budget'}")

        low_res = avg_intensity * 2 * np.sqrt(np.pi)
        return {
            "dimensions": dim,
            "xray_wavelength": wavelength,
            "max_order": bl.shape[0] - 1,
            "average_intensity": avg_intensity,
            "data_radial_points": qs,
            "data_angular_points": np.asarray(ccd["angular_points"]),
            "deg_2_invariant": {"I1I1": bl},
            "deg_2_invariant_masks": {"I1I1": masks},
            "data_projection_matrices": {"I1I1": proj},
            "data_projection_matrices_q_id_limits": np.asarray(q_limits),
            "data_low_resolution_intensity_coefficients": low_res,
            "number_of_particles": 1,
        }

    def _q_id_limits(self, n_orders, n_q):
        ql = self.settings.get("invariant_constraints", {}).get("q_limits", {})
        if str(ql.get("type", "none")) == "manual":
            lo, hi = ql["manual"]["limits"]
            hi = int(hi) if hi else n_q
            return [[int(lo), hi]] * n_orders
        return [[0, n_q]] * n_orders
