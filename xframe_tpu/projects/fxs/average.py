"""average worker: align multi-start reconstructions and average them.

Pipeline (reference projects/fxs/average.py:359-626, SURVEY.md §3.4):
load reconstructions (error-filtered) → center each (reciprocal phase ramp) →
normalize → pick lowest-error reference → rotational alignment via SO(3)
correlation of SH coefficients with point-inversion disambiguation → drop bad
alignments (l2 limit) → average → PRTF/FSC resolution metrics →
average_results.h5. The per-candidate alignment ops are jitted device code.
"""
from __future__ import annotations

import numpy as np

from xframe_tpu.interfaces import ProjectWorkerInterface
from xframe_tpu.library.hostio import to_host, to_device_complex
from xframe_tpu.ops.fourier import SphericalFourierTransform
from xframe_tpu.ops.integrate import SphericalIntegrator
from xframe_tpu.projects.fxs._database_ import ProjectDB
from xframe_tpu.projects.fxs.alignment import Aligner
from xframe_tpu.projects.fxs import resolution_metrics as rm


class ProjectWorker(ProjectWorkerInterface):
    database_class = ProjectDB

    def run(self):
        opt = self.settings
        recs, cfg = self._load_reconstructions()
        densities, errors, meta = self._select(recs)
        if len(densities) == 0:
            raise RuntimeError("no reconstructions pass the selection filter")
        result = self.average(densities, errors, cfg, meta,
                              proj_matrices=recs[0].get("projection_matrices"))
        path, run = self.db.save("average_results", result)
        print(f"average: aligned {len(result['aligned'])} of {len(densities)} "
              f"reconstructions; saved to {path}")
        return result

    # --------------------------------------------------------------- loading
    def _load_reconstructions(self):
        files = list(self.settings.get("reconstruction_files", []) or [])
        if not files:
            data = [self.db.load_reconstructions()]
        else:
            data = []
            for f in files:
                if isinstance(f, int):
                    data.append(self.db.load_reconstructions(run=f))
                else:
                    data.append(self.db.load_reconstructions(path=str(f)))
        cfg = data[0]["configuration"]
        return data, cfg

    def _select(self, recs):
        sel = self.settings.get("selection", {})
        limit = float(sel.get("error_limit", 1.0))
        n_max = sel.get("n_reconstructions", "all")
        densities, errors, meta = [], [], []
        for fi, rec in enumerate(recs):
            for key, res in rec["reconstruction_results"].items():
                err = float(np.asarray(res["error_dict"]["final"]))
                if str(sel.get("method", "least_error")) == "manual":
                    if int(key) not in [int(i) for i in sel.get("manual_ids", [])]:
                        continue
                elif err > limit:
                    continue
                densities.append(np.asarray(res["real_density"]))
                errors.append(err)
                meta.append({"file_index": fi, "result_key": key, "error": err})
        order = np.argsort(errors)
        if not (isinstance(n_max, str) and n_max == "all"):
            order = order[: int(n_max)]
        return ([densities[i] for i in order], [errors[i] for i in order],
                [meta[i] for i in order])

    # -------------------------------------------------------------- averaging
    def average(self, densities, errors, cfg, meta, proj_matrices=None):
        opt = self.settings
        grid_cfg = cfg["internal_grid"]
        rs = np.asarray(grid_cfg["real_grid"])
        qs = np.asarray(grid_cfg["reciprocal_grid"])
        thetas = np.asarray(grid_cfg.get("thetas", []))
        phis = np.asarray(grid_cfg["phis"])
        L = int(cfg.get("max_order", len(thetas) - 1))
        rc = float(cfg.get("reciprocity_coefficient", 2.0))

        dim = int(cfg.get("dimensions", 3))
        ft_mode = str(cfg.get("fourier_transform_mode", "midpoint"))
        q_max = float(cfg.get("q_max", 0) or
                      (qs[-1] + qs[0] if ft_mode == "midpoint" else qs[-1]))
        fr = opt.get("find_rotation", {})
        rl = fr.get("r_limit_ids", "all")
        r_ids = None if (isinstance(rl, str) and rl == "all") \
            else np.asarray(rl, dtype=int)
        if dim == 3:
            ft = SphericalFourierTransform(
                len(rs), L, q_max=q_max, mode=ft_mode,
                reciprocity_coefficient=rc,
                n_theta=len(thetas), n_phi=len(phis))
            integ = SphericalIntegrator(rs, len(thetas), len(phis))
            lma = fr.get("l_max_align", "auto")
            aligner = Aligner(ft, integ._w, r_limit_ids=r_ids,
                              bandwidth=int(fr.get("so3_n_beta") or 0) or None,
                              l_max_align=None if (isinstance(lma, str))
                              else int(lma))
            theta_weights = ft.sht.gl_weights
        else:
            from xframe_tpu.ops.fourier import PolarFourierTransform
            from xframe_tpu.ops.integrate import PolarIntegrator
            from xframe_tpu.projects.fxs.alignment import Aligner2D
            ft = PolarFourierTransform(len(rs), L, len(phis), q_max,
                                       mode=ft_mode,
                                       reciprocity_coefficient=rc)
            integ = PolarIntegrator(rs, len(phis))
            aligner = Aligner2D(ft, integ._w, r_limit_ids=r_ids)
            theta_weights = None

        # center + normalize
        mode = str(opt.get("normalize_reconstructions", {}).get("mode", "max"))
        use_norm = bool(opt.get("normalize_reconstructions", {}).get("use", True))
        centered = []
        for rho in densities:
            rho_d = to_device_complex(rho)
            if bool(opt.get("center_reconstructions", True)):
                rho_d, _ = aligner.center(rho_d)
            rho_h = to_host(rho_d)
            if use_norm:
                scale = np.abs(rho_h).max() if mode == "max" \
                    else max(np.abs(rho_h).mean(), 1e-30)
                rho_h = rho_h / max(scale, 1e-30)
            centered.append(rho_h)

        # reference = lowest error (list already error-sorted)
        ref = centered[0]
        ref_coeff = aligner.coefficients(to_device_complex(ref))

        l2_limit = float(opt.get("l2_error_limit", 0.5))
        check_inv = bool(opt.get("find_rotation", {})
                         .get("check_point_inversion", True))
        aligned, align_info, used_meta = [ref], [
            {"angles": (0.0, 0.0, 0.0), "score": np.inf, "inverted": False,
             "l2_to_ref": 0.0}], [meta[0]]
        for i, rho in enumerate(centered[1:], start=1):
            rho_d = to_device_complex(rho)
            rho_rot, _, info = aligner.align(rho_d, ref_coeff,
                                             check_point_inversion=check_inv)
            dist = aligner.l2_distance(rho_rot,
                                       to_device_complex(ref))
            info["l2_to_ref"] = dist
            if dist > l2_limit:
                continue
            aligned.append(to_host(rho_rot))
            align_info.append(info)
            used_meta.append(meta[i])

        avg = np.mean(aligned, axis=0)
        avg_d = to_device_complex(avg)
        centered_avg = to_host(aligner.center(avg_d)[0])
        psi_avg = to_host(aligner._ft_fwd(avg_d))

        # resolution metrics from the aligned reciprocal amplitudes
        psis = np.stack([to_host(aligner._ft_fwd(to_device_complex(a)))
                         for a in aligned])
        metrics = {}
        axes = None if dim == 3 else (-1,)
        if bool(opt.get("resolution_metrics", {}).get("PRTF", True)):
            prtf_vals = rm.prtf(psis, theta_weights=theta_weights, axes=axes)
            q_res, d_res = rm.prtf_resolution(prtf_vals, qs)
            metrics["PRTF"] = prtf_vals
            metrics["PRTF_qs"] = qs
            metrics["PRTF_resolution_q"] = q_res
        if bool(opt.get("resolution_metrics", {}).get("FSC", False)) \
                and len(aligned) >= 2:
            half = len(aligned) // 2
            psi_a = np.mean(psis[:half], axis=0)
            psi_b = np.mean(psis[half:], axis=0)
            metrics["FSC"] = np.abs(rm.fsc(psi_a, psi_b, theta_weights,
                                           axes=axes))
            n_shell = max(len(thetas), 1) * len(phis) * np.ones(len(qs))
            metrics["FSC_half_bit"] = rm.half_bit_threshold(n_shell)
        if bool(opt.get("resolution_metrics", {}).get("FQCB", False)) \
                and proj_matrices is not None:
            # invariant-space fidelity: B from the averaged density vs the
            # data's B = V V† (reference average.py:266-295 FQCB block)
            from xframe_tpu.projects.fxs import invariants as itools
            import jax
            intensity = np.abs(psi_avg) ** 2
            if dim == 3:
                coeff = to_host(jax.jit(ft.sht.forward)(
                    to_device_complex(intensity.astype(complex))))
                b_rec = itools.harmonic_coeff_to_deg2_invariants_3d(coeff)
                b_target = itools.projection_matrices_to_deg2_invariant_3d(
                    proj_matrices)
            else:
                cm = np.fft.fft(intensity, axis=-1)[:, : L + 1] / len(phis)
                b_rec = itools.harmonic_coeff_to_deg2_invariants_2d(cm)
                vecs = [np.atleast_2d(np.asarray(v)).reshape(len(qs), -1)
                        for v in proj_matrices]
                b_target = np.stack([v @ v.conj().T for v in vecs])
            f_q, f_std, f_2d = rm.fqcb(b_rec, b_target, skip_odd_orders=True)
            metrics["FQCB_from_density"] = f_q
            metrics["FQCB_from_density_std"] = f_std
            f_qz, f_stdz, _ = rm.fqcb(b_rec, b_target, skip_odd_orders=True,
                                      include_zero_order=True)
            metrics["FQCB_from_density_with_zero_order"] = f_qz
            metrics["FQCB_from_density_with_zero_order_std"] = f_stdz

        norm_avg = avg / max(np.abs(avg).max(), 1e-30)
        return {
            "average": {
                "real_density": avg,
                "normalized_real_density": norm_avg,
                "reciprocal_density": psi_avg,
                "intensity_from_densities": np.abs(psi_avg) ** 2,
            },
            "centered_average": centered_avg,
            "aligned": {str(i): a for i, a in enumerate(aligned)},
            "input": {str(i): d for i, d in enumerate(densities)},
            "input_meta": {str(i): m for i, m in enumerate(used_meta)},
            "resolution_metrics": metrics,
            "rotation_metric": {
                "angles": np.asarray([list(i["angles"]) for i in align_info]),
                "scores": np.asarray([i["score"] for i in align_info]),
                "inverted": np.asarray([i["inverted"] for i in align_info]),
                "l2_to_ref": np.asarray([i["l2_to_ref"] for i in align_info]),
            },
            "so3_grid": ({"alphas": aligner.corr.alphas,
                          "betas": aligner.corr.betas,
                          "gammas": aligner.corr.gammas} if dim == 3
                         else {"alphas": aligner.alphas}),
            "grid": {"rs": rs, "thetas": thetas, "phis": phis, "qs": qs},
        }
