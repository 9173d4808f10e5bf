"""Interaction type enumeration.

Reference parity: differt/src/differt/em/_interaction_type.py.
"""

from enum import IntEnum


class InteractionType(IntEnum):
    """Type of a ray-object interaction."""

    REFLECTION = 0
    """Specular reflection."""
    DIFFRACTION = 1
    """Edge diffraction."""
    SCATTERING = 2
    """Diffuse scattering."""
