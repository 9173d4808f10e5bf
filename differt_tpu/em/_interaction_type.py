"""Interaction type enumeration.

Reference parity: differt/src/differt/em/_interaction_type.py.
"""

from enum import IntEnum


class InteractionType(IntEnum):
    """Type of a ray-object interaction.

    Values are stable integers so interaction arrays can be stored as
    plain ``int32`` and compared with the enum:

    >>> int(InteractionType.REFLECTION), int(InteractionType.DIFFRACTION)
    (0, 1)
    >>> InteractionType(2).name
    'SCATTERING'
    """

    REFLECTION = 0
    """Specular reflection."""
    DIFFRACTION = 1
    """Edge diffraction."""
    SCATTERING = 2
    """Diffuse scattering."""
