"""Differentiable coverage maps — a first-class op.

The reference only composes coverage maps in notebooks (or approximates
them via MLM hashes); here ``received_power`` / ``power_map`` are official
APIs: trace paths, run the Jones-chain EM pipeline, and coherently sum the
complex channel amplitudes per TX/RX. Everything is jit-able and
differentiable — gradients flow from map pixels back to material
permittivity/conductivity, geometry vertices, and TX positions. The RX-grid
axis is embarrassingly parallel and is what
:mod:`differt_tpu.parallel` shards across chips.
"""

from typing import Any

from differt_tpu import treekit as eqx
import jax
import jax.numpy as jnp
from jaxtyping import Array, ArrayLike, Complex, Float

from .em import c, epsilon_0, spherical_basis, transition_apply, z_0
from .geometry import Scene, TracedPaths, normalize
from .utils import safe_divide


@eqx.filter_jit
def complex_amplitudes(
    paths: TracedPaths,
    scene: Scene,
    frequency: Float[ArrayLike, ""],
    *,
    eta_r: Float[ArrayLike, " num_materials"],
    conductivity: Float[ArrayLike, " num_materials"],
    thickness: Float[ArrayLike, " num_materials"] | None = None,
) -> Complex[Array, "*batch"]:
    """Complex channel amplitude of every traced path (V polarization).

    The free-space 1/s spreading, propagation phase, per-bounce slab-aware
    Fresnel Jones chain, and the lambda/(4 pi) isotropic-antenna scaling are
    applied; invalid paths contribute 0 (weighted by the float confidence
    when soft masks are used, keeping the map differentiable through path
    validity).

    Material parameters are explicit arrays (not a table lookup) so they
    can be optimization variables.
    """
    frequency = jnp.asarray(frequency)
    eta_r = jnp.asarray(eta_r)
    conductivity = jnp.asarray(conductivity)
    omega = 2.0 * jnp.pi * frequency
    n_complex = jnp.sqrt(eta_r - 1j * conductivity / (omega * epsilon_0))
    wavelength = c / frequency
    if thickness is None:
        thickness = jnp.full(eta_r.shape, -1.0)
    else:
        thickness = jnp.asarray(thickness)

    # Invalid paths may carry zeroed (or degenerate) vertices; normalize at
    # zero length is non-differentiable, and NaN * 0-weight is still NaN in
    # the backward pass. Substitute a harmless straight dummy path wherever
    # the path is invalid — its contribution is zeroed by the weight below.
    valid = (
        paths.mask
        if paths.mask.dtype == jnp.bool_
        else paths.mask >= paths.confidence_threshold
    )
    path_length = paths.vertices.shape[-2]
    dummy = jnp.zeros((path_length, 3)).at[:, 0].set(jnp.arange(path_length, dtype=paths.vertices.dtype))
    vertices = jnp.where(valid[..., None, None], paths.vertices, dummy)

    segments = jnp.diff(vertices, axis=-2)
    k, s = normalize(segments, keepdims=True)

    # V-pol excitation: unit theta component, zero phi. Field components
    # are carried as two scalar arrays (component-wise Jones chain) — on
    # TPU, trailing [..., 2] / [..., 2, 2] axes tile to 128 lanes, a 64x
    # memory expansion at coverage-map batch sizes.
    batch = paths.mask.shape
    e_theta = jnp.ones(batch, dtype=jnp.complex64)
    e_phi = jnp.zeros(batch, dtype=jnp.complex64)

    order = paths.order
    if order > 0:
        obj_indices = paths.objects[..., 1:-1]
        face_materials = scene.mesh.face_materials
        if face_materials is None:
            mat_indices = jnp.zeros_like(obj_indices)
        else:
            mat_indices = jnp.take(face_materials, obj_indices, axis=0)
        obj_normals = jnp.take(scene.mesh.normals, obj_indices, axis=0)
        n_r_val = jnp.take(n_complex, mat_indices, axis=0)
        thickness_val = jnp.take(thickness, mat_indices, axis=0)
        e_theta, e_phi = transition_apply(
            vertices,
            obj_normals,
            n_r_val,
            thickness_val,
            wavelength,
            e_theta,
            e_phi,
            interaction_types=paths.interaction_types,
        )

    theta_hat_last, _ = spherical_basis(k[..., -1, :])
    theta_hat_neg = spherical_basis(-k[..., -1, :])[0]
    u_coeff = jnp.sum(theta_hat_last * theta_hat_neg, axis=-1)
    a = u_coeff * e_theta

    s_tot = s.sum(axis=-2)[..., 0]
    spreading = safe_divide(1.0, s_tot)
    phase_val = -2.0 * jnp.pi * frequency * s_tot / c
    a = a * spreading * jax.lax.complex(jnp.cos(phase_val), jnp.sin(phase_val))
    a = a * (wavelength / (4 * jnp.pi))

    weight = (
        paths.mask
        if paths.mask.dtype != jnp.bool_
        else paths.mask.astype(a.real.dtype)
    )
    return a * weight


@eqx.filter_jit
def received_power(
    paths: TracedPaths,
    scene: Scene,
    frequency: Float[ArrayLike, ""],
    *,
    eta_r: Float[ArrayLike, " num_materials"],
    conductivity: Float[ArrayLike, " num_materials"],
    thickness: Float[ArrayLike, " num_materials"] | None = None,
    coherent: bool = True,
) -> Float[Array, "*reduced_batch"]:
    """Received power per TX/RX pair (coherent or non-coherent path sum).

    The last batch axis of ``paths`` (the candidate axis) is reduced.
    """
    a = complex_amplitudes(
        paths,
        scene,
        frequency,
        eta_r=eta_r,
        conductivity=conductivity,
        thickness=thickness,
    )
    if coherent:
        total = jnp.sum(a, axis=-1)
        return jnp.abs(total) ** 2 / z_0
    return jnp.sum(jnp.abs(a) ** 2, axis=-1) / z_0


def power_map(
    scene: Scene,
    frequency: Float[ArrayLike, ""],
    *,
    order: int = 1,
    eta_r: Float[ArrayLike, " num_materials"] | None = None,
    conductivity: Float[ArrayLike, " num_materials"] | None = None,
    thickness: Float[ArrayLike, " num_materials"] | None = None,
    coherent: bool = True,
    solver: str = "exhaustive",
    with_diffraction: bool = False,
    with_scattering: bool = False,
    scattering_coefficient: Float[ArrayLike, " num_materials"] = 0.3,
    **solver_kwargs: Any,
) -> Float[Array, "*batch"]:
    """Coverage map: received power for every TX/RX pair in the scene.

    Material parameters default to the built-in ITU table evaluated at
    ``frequency``; pass explicit arrays to differentiate through them.
    With ``with_diffraction=True``, first-order UTD edge diffraction
    contributions are added coherently to the reflection paths (the
    reference has no diffraction solver at all). With
    ``with_scattering=True``, single-bounce diffuse scattering power
    (Degli-Esposti effective roughness, Lambertian pattern) is added
    incoherently — scattered phases are random in nature, so its power
    adds regardless of ``coherent``.
    """
    from .em import materials as itu_materials

    if eta_r is None or conductivity is None:
        names = scene.mesh.material_names or ("Vacuum",)
        eta_r = jnp.array([
            itu_materials[name].relative_permittivity(frequency) for name in names
        ])
        conductivity = jnp.array([
            itu_materials[name].conductivity(frequency) for name in names
        ])
        thickness = jnp.array([
            itu_materials[name].thickness
            if itu_materials[name].thickness is not None
            else -1.0
            for name in names
        ])

    paths = scene.trace_paths(order=order, solver=solver, **solver_kwargs)
    if not with_diffraction and not with_scattering:
        return received_power(
            paths,
            scene,
            frequency,
            eta_r=eta_r,
            conductivity=conductivity,
            thickness=thickness,
            coherent=coherent,
        )

    tx_batch = scene.transmitters.shape[:-1]
    rx_batch = scene.receivers.shape[:-1]
    num_tx = max(int(jnp.prod(jnp.array(tx_batch))), 1)
    num_rx = max(int(jnp.prod(jnp.array(rx_batch))), 1)

    a_spec = complex_amplitudes(
        paths.reshape(num_tx, num_rx, -1),
        scene,
        frequency,
        eta_r=eta_r,
        conductivity=conductivity,
        thickness=thickness,
    )

    a_diff = None
    if with_diffraction:
        from .rt._diffraction import diffraction_amplitudes

        mesh = (
            scene.mesh
            if scene.mesh.assume_unique_vertices
            else scene.mesh.dedup_vertices()
        )
        edges, adjacent, wedge_n = mesh._diffraction_edges_info()
        diff_paths = scene.trace_diffraction_paths()
        a_diff = diffraction_amplitudes(
            diff_paths.reshape(num_tx, num_rx, -1),
            scene,
            frequency,
            edges=edges,
            adjacent_triangles=adjacent,
            wedge_n=wedge_n,
        )

    if coherent:
        total = a_spec.sum(axis=-1)
        if a_diff is not None:
            total = total + a_diff.sum(axis=-1)
        power = jnp.abs(total) ** 2 / z_0
    else:
        power = jnp.sum(jnp.abs(a_spec) ** 2, axis=-1) / z_0
        if a_diff is not None:
            power = power + jnp.sum(jnp.abs(a_diff) ** 2, axis=-1) / z_0

    if with_scattering:
        from .rt._scattering import scattering_amplitudes

        scatter_paths = scene.trace_scattering_paths()
        a_scatter = scattering_amplitudes(
            scatter_paths.reshape(num_tx, num_rx, -1),
            scene,
            frequency,
            eta_r=eta_r,
            conductivity=conductivity,
            scattering_coefficient=scattering_coefficient,
        )
        # Scattered phases are random surface noise: power adds incoherently.
        power = power + jnp.sum(jnp.abs(a_scatter) ** 2, axis=-1) / z_0

    return power.reshape(*tx_batch, *rx_batch)
