"""Electromagnetic constants (SI units).

Reference parity: differt/src/differt/em/_constants.py.

The constants are mutually consistent:

>>> from differt_tpu.em._constants import c, epsilon_0, mu_0, z_0
>>> round(c * (mu_0 * epsilon_0) ** 0.5, 9)  # c == 1/sqrt(mu_0 eps_0)
1.0
>>> round((mu_0 / epsilon_0) ** 0.5 - z_0, 6)  # Z_0 == sqrt(mu_0/eps_0)
0.0
"""

c = 299792458.0
"""Speed of light in vacuum (m/s)."""

mu_0 = 1.25663706212e-06
"""Vacuum permeability (H/m)."""

epsilon_0 = 8.8541878128e-12
"""Vacuum permittivity (F/m)."""

z_0 = 376.73031341259
"""Impedance of free space (Ohm)."""
