"""Minimal PDB reader + electron-density builder.

Replaces the reference's pdb_eda plugin (`pdb://` access method,
reference database.py:197-199 + pdb_plugin.py): parses ATOM/HETATM records
and smears atoms with Gaussians (width set by a resolution parameter,
amplitude ∝ electron count) onto an arbitrary coordinate grid — enough to
simulate FXS data from a deposited structure without external dependencies.
"""
from __future__ import annotations

import gzip
import numpy as np

# electron counts of common elements (neutral atoms)
ELECTRONS = {
    "H": 1, "HE": 2, "LI": 3, "BE": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "NE": 10, "NA": 11, "MG": 12, "P": 15, "S": 16, "CL": 17,
    "K": 19, "CA": 20, "MN": 25, "FE": 26, "CO": 27, "NI": 28, "CU": 29,
    "ZN": 30, "SE": 34, "BR": 35, "I": 53,
}


def parse_pdb(path):
    """→ (positions (N,3) Å, electrons (N,), occupancies (N,))."""
    opener = gzip.open if str(path).endswith(".gz") else open
    pos, zs, occ = [], [], []
    with opener(path, "rt") as f:
        for line in f:
            if not (line.startswith("ATOM") or line.startswith("HETATM")):
                continue
            try:
                x = float(line[30:38])
                y = float(line[38:46])
                z = float(line[46:54])
                o = float(line[54:60]) if line[54:60].strip() else 1.0
            except ValueError:
                continue
            elem = line[76:78].strip().upper()
            if not elem:  # fall back to the atom-name column
                elem = "".join(c for c in line[12:16].strip()
                               if c.isalpha())[:1].upper()
            pos.append((x, y, z))
            zs.append(ELECTRONS.get(elem, 6))
            occ.append(o)
    if not pos:
        raise ValueError(f"no ATOM/HETATM records in {path}")
    return (np.asarray(pos, dtype=float), np.asarray(zs, dtype=float),
            np.asarray(occ, dtype=float))


def pdb_density(path, grid_cartesian, resolution=4.0, center=True,
                chunk_atoms=512):
    """Electron density on `grid_cartesian` (..., 3) from a PDB file:
    ρ(x) = Σ_i Z_i·occ_i·N(σ)·exp(-|x-x_i|²/2σ²), σ = resolution/(2√(2ln2))
    (FWHM = resolution). Chunked over atoms to bound memory."""
    pos, zs, occ = parse_pdb(path)
    if center:
        com = (pos * (zs * occ)[:, None]).sum(0) / (zs * occ).sum()
        pos = pos - com
    sigma = float(resolution) / (2 * np.sqrt(2 * np.log(2)))
    norm = 1.0 / ((2 * np.pi) ** 1.5 * sigma ** 3)
    grid = np.asarray(grid_cartesian, dtype=np.float32)
    flat = grid.reshape(-1, 3)
    out = np.zeros(len(flat), dtype=np.float64)
    w = (zs * occ * norm).astype(np.float64)
    for i in range(0, len(pos), chunk_atoms):
        p = pos[i: i + chunk_atoms].astype(np.float32)
        d2 = ((flat[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        out += np.exp(-d2 / (2 * sigma ** 2)) @ w[i: i + chunk_atoms]
    return out.reshape(grid.shape[:-1])
