"""Ray-launching lattice and viewing frustum (pure JAX).

Reference parity: ``fibonacci_lattice`` (_utils.py:369-490) and
``viewing_frustum`` (_utils.py:619-927).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jaxtyping import Array, ArrayLike, Bool, DTypeLike, Float

from ._vectors import cartesian_to_spherical, spherical_to_cartesian

# 1/phi (golden ratio conjugate), and the mixed-radix constants used to keep
# full float32 precision of (i / phi) mod 1 for very large i. With m1 = 2^18
# and m2 = 2^9 every intermediate product stays small enough for the float32
# mantissa, using the identity
#   (i/phi) % 1 = (q1*(m1/phi % 1) + q2*(m2/phi % 1) + r/phi) % 1
# with i = q1*m1 + q2*m2 + r. Reference: _utils.py:426-462.
_INV_PHI = 0.6180339887498949
_M1 = 262144.0  # 2**18
_M2 = 512.0  # 2**9
_INV_PHI_M1_FRAC = (_INV_PHI * _M1) % 1.0
_INV_PHI_M2_FRAC = (_INV_PHI * _M2) % 1.0


def _golden_fractions(i: Float[Array, " n"]) -> Float[Array, " n"]:
    """Fractional part of ``i / phi``, precision-preserving in float32."""
    q1 = jnp.floor(i / _M1)
    rem = i - q1 * _M1
    q2 = jnp.floor(rem / _M2)
    r = rem - q2 * _M2
    return (q1 * _INV_PHI_M1_FRAC + q2 * _INV_PHI_M2_FRAC + r * _INV_PHI) % 1.0


def fibonacci_lattice(
    n: int,
    dtype: DTypeLike | None = None,
    *,
    frustum: Float[ArrayLike, "2 2"] | Float[ArrayLike, "2 3"] | None = None,
) -> Float[Array, "{n} 3"]:
    """Quasi-uniform lattice of ``n`` unit vectors on the sphere.

    With ``frustum`` given (min/max rows of ``(polar, azimuth)`` — a leading
    radial column is ignored), points are distributed uniformly in solid angle
    within the frustum. Reference parity: _utils.py:369-490.

    Examples:
        >>> import jax.numpy as jnp
        >>> from differt_tpu.geometry import fibonacci_lattice
        >>> pts = fibonacci_lattice(100)
        >>> pts.shape
        (100, 3)
        >>> bool(jnp.allclose(jnp.linalg.norm(pts, axis=-1), 1.0, atol=1e-6))
        True
    """
    if n <= 0:
        msg = f"Invalid size {n!r}, must be strictly positive."
        raise ValueError(msg)
    if frustum is not None:
        frustum = jnp.asarray(frustum)
        dtype = frustum.dtype
    elif dtype is not None and not jnp.issubdtype(dtype, jnp.floating):
        msg = f"Unsupported dtype {dtype!r}, must be a floating dtype."
        raise ValueError(msg)

    i = jnp.arange(0.0, n)
    frac = _golden_fractions(i)

    if frustum is not None:
        p_min, a_min = frustum[0, -2:]
        p_max, a_max = frustum[1, -2:]
        # Uniform in cos(polar) gives equal solid-angle coverage.
        cos_min = jnp.cos(p_min)
        cos_max = jnp.cos(p_max)
        denom = jnp.where(n > 1, n - 1.0, 1.0)
        polar = jnp.arccos(cos_min - (cos_min - cos_max) * (i / denom))
        azimuth = a_min + (a_max - a_min) * frac
    else:
        polar = jnp.arccos(1.0 - 2.0 * i / n)
        azimuth = 2.0 * jnp.pi * frac

    xyz = spherical_to_cartesian(jnp.stack((polar, azimuth), axis=-1))
    return xyz.astype(dtype) if dtype is not None else xyz


@partial(jax.jit, static_argnames=("reduce",))
def viewing_frustum(
    viewing_vertex: Float[ArrayLike, "*#batch 3"],
    world_vertices: Float[ArrayLike, "*#batch num_vertices 3"],
    *,
    active_vertices: Bool[ArrayLike, "*#batch num_vertices"] | None = None,
    reduce: bool = False,
) -> Float[Array, "*batch 2 3"]:
    """Spherical bounding frustum of ``world_vertices`` seen from a viewer.

    Returns min/max rows of ``(r, polar, azimuth)``. Azimuth bounds are
    computed in both the [-pi, pi) and [0, 2*pi) domains and the narrower
    span wins, resolving the +-pi wraparound; if both spans exceed 270 deg the
    full circle is used. A degenerate polar band (min == max) is widened
    toward whichever pole gives the smaller span.
    Reference parity: _utils.py:619-927.
    """
    world_vertices = jnp.asarray(world_vertices)
    viewing_vertex = jnp.asarray(viewing_vertex)

    rpa = cartesian_to_spherical(world_vertices - viewing_vertex[..., None, :])
    if active_vertices is not None:
        active_vertices = jnp.asarray(active_vertices)

    r, p, a = rpa[..., 0], rpa[..., 1], rpa[..., 2]
    axis = None if reduce else -1

    r_min = jnp.min(r, axis=axis, where=active_vertices, initial=jnp.inf)
    r_max = jnp.max(r, axis=axis, where=active_vertices, initial=0.0)
    p_min = jnp.min(p, axis=axis, where=active_vertices, initial=jnp.pi)
    p_max = jnp.max(p, axis=axis, where=active_vertices, initial=0.0)

    # Azimuth: two-domain wraparound resolution.
    a_min = jnp.min(a, axis=axis, where=active_vertices, initial=jnp.pi)
    a_max = jnp.max(a, axis=axis, where=active_vertices, initial=-jnp.pi)

    two_pi = 2.0 * jnp.pi
    a_shifted = (a + two_pi) % two_pi
    a0_min = jnp.min(a_shifted, axis=axis, where=active_vertices, initial=two_pi)
    a0_max = jnp.max(a_shifted, axis=axis, where=active_vertices, initial=0.0)

    width = a_max - a_min
    width0 = a0_max - a0_min
    use_shifted = width > width0
    a_min = jnp.where(use_shifted, a0_min, a_min)
    a_max = jnp.where(use_shifted, a0_max, a_max)

    # Full-circle fallback when geometry surrounds the viewer (> 270 deg in
    # both domains).
    full_circle = jnp.minimum(width, width0) > 1.5 * jnp.pi
    a_min = jnp.where(full_circle, -jnp.pi, a_min)
    a_max = jnp.where(full_circle, jnp.pi, a_max)

    # Degenerate polar band: widen toward the pole giving the smaller span.
    p_min_dn = jnp.where(p_min == p_max, 0.0, p_min)
    p_max_up = jnp.where(p_min == p_max, jnp.pi, p_max)
    width_dn = p_max - p_min_dn
    width_up = p_max_up - p_min
    widen_up = width_dn > width_up
    p_lo = jnp.where(widen_up, p_min, p_min_dn)
    p_hi = jnp.where(widen_up, p_max_up, p_max)

    batch = () if reduce else r.shape[:-1]
    return jnp.stack((r_min, p_lo, a_min, r_max, p_hi, a_max), axis=-1).reshape(
        *batch, 2, 3
    )
