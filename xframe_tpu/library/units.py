"""Unit constants and conversions (reference xframe/library/units.py).

Internal conventions: lengths in Ångström, energies in eV, angles in radians.
"""
from __future__ import annotations

import numpy as np

# fundamental
PLANCK_EV_S = 4.135667696e-15        # h [eV·s]
SPEED_OF_LIGHT_A_PER_S = 2.99792458e18  # c [Å/s]
ELECTRON_RADIUS_A = 2.8179403262e-5  # classical electron radius [Å]

# length
ANGSTROM = 1.0
NANOMETER = 10.0
MICROMETER = 1.0e4
MILLIMETER = 1.0e7
METER = 1.0e10

# angle
DEGREE = np.pi / 180.0


def ev_to_angstrom(energy_ev):
    """Photon energy [eV] → wavelength [Å]."""
    return PLANCK_EV_S * SPEED_OF_LIGHT_A_PER_S / np.asarray(energy_ev)


def angstrom_to_ev(wavelength_a):
    return PLANCK_EV_S * SPEED_OF_LIGHT_A_PER_S / np.asarray(wavelength_a)


def q_to_resolution(q):
    """Momentum transfer [Å⁻¹] → real-space full-period resolution [Å]."""
    q = np.asarray(q, dtype=float)
    return np.where(q > 0, 2 * np.pi / np.where(q > 0, q, 1.0), np.inf)
