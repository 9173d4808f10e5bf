"""Reference pipeline compositions (trace + EM chain) shared by the
oracle tests and the CPU-baseline measurement script.

All math here calls reference functions only (loaded via
:mod:`.loader`); this repo's code is not involved, so timing these
functions on CPU is an honest self-measured DiffeRT baseline
(BASELINE.md "Metrics this repo must measure").
"""

import functools

import jax
import jax.numpy as jnp


def ref_trace(ref, mesh_vertices, triangles, normals, tx, rx, candidates):
    """The reference tracing pipeline composed from its free functions.

    Mirrors ``differt/geometry/_solvers.py:499-770`` for triangle meshes
    (no quads, no mask): gather mirrors, image method, checks 3.1-3.5.
    Returns ``(full_paths, mask)`` with shapes
    ``[num_tx num_rx num_candidates order+2 3]`` / ``[... num_candidates]``.
    """
    gu = ref["geometry_utils"]
    im = ref["image_method"]

    tri = jnp.take(triangles, candidates, axis=0)
    tri_v = jnp.take(mesh_vertices, tri, axis=0)
    mirror_v = tri_v[..., 0, :]
    mirror_n = jnp.take(normals, candidates, axis=0)
    all_tri_v = jnp.take(mesh_vertices, triangles, axis=0)

    paths = im.image_method(
        tx[:, None, None, :], rx[None, :, None, :], mirror_v, mirror_n
    )
    full = gu.assemble_path(tx[:, None, None, :], paths, rx[None, :, None, :])

    ray_origins = full[..., :-1, :]
    ray_directions = jnp.diff(full, axis=-2)

    inside = gu.ray_intersect_triangle(
        ray_origins[..., :-1, :], ray_directions[..., :-1, :], tri_v
    )[1].all(axis=-1)
    same_side = im.consecutive_vertices_are_on_same_side_of_mirror(
        full, mirror_v, mirror_n
    ).all(axis=-1)
    blocked = gu.ray_intersect_any_triangle(
        ray_origins, ray_directions, all_tri_v
    ).any(axis=-1)
    lengths2 = jnp.sum(ray_directions * ray_directions, axis=-1)
    min_len = 10.0 * jnp.finfo(full.dtype).eps
    too_small = (lengths2 < min_len).any(axis=-1)
    finite = jnp.isfinite(full).all(axis=(-1, -2))
    full = jnp.where(finite[..., None, None], full, jnp.zeros_like(full))
    mask = inside & same_side & ~blocked & ~too_small & finite
    return full, mask


def ref_amplitudes(
    ref,
    *,
    vertices,
    objects,
    mask,
    face_materials,
    face_normals,
    frequency,
    eta_r,
    conductivity,
):
    """Per-path complex channel amplitude via reference functions only.

    Replicates the scalar chain of ``differt/plugins/deepmimo.py:530-675``
    (V polarization, semi-infinite media) in a grad-friendly form
    (export() converts to dBW, which loses the complex value).
    ``objects`` covers interactions only (``[... order]``).
    """
    dmod = ref["deepmimo"]
    gu = ref["geometry_utils"]
    emu = ref["em_utils"]
    c = ref["em_constants"].c
    epsilon_0 = ref["em_constants"].epsilon_0

    omega = 2.0 * jnp.pi * frequency
    epsilon_complex = eta_r - 1j * conductivity / (omega * epsilon_0)
    n_complex = jnp.sqrt(epsilon_complex)
    wavelength = c / frequency

    segs = jnp.diff(vertices, axis=-2)
    k, s = gu.normalize(segs, keepdims=True)
    theta_hat, phi_hat = dmod._spherical_basis(k)
    e_field = jnp.stack(
        [
            jnp.ones(theta_hat[..., 0, :].shape[:-1]),
            jnp.zeros(theta_hat[..., 0, :].shape[:-1]),
        ],
        axis=-1,
    ).astype(complex)[..., None]

    order = objects.shape[-1]
    if order > 0:
        mat_idx = jnp.take(face_materials, objects, axis=0)
        n = jnp.take(face_normals, objects, axis=0)
        k_in, k_out = k[..., :-1, :], k[..., 1:, :]
        n_r_val = jnp.take(n_complex, mat_idx, axis=0)
        thick = jnp.full(n_r_val.shape, -1.0)
        (e_i_s, e_i_p), (e_r_s, e_r_p) = emu.sp_directions(k_in, k_out, n)
        cos_ti = jnp.sum(n * -k_in, axis=-1)
        r_s, r_p = dmod._get_reflection_coefficients(
            n_r_val, cos_ti, thick, wavelength
        )
        in_rot = emu.sp_rotation_matrix(
            theta_hat[..., :-1, :], phi_hat[..., :-1, :], e_i_s, e_i_p
        )
        out_rot = emu.sp_rotation_matrix(
            e_r_s, e_r_p, theta_hat[..., 1:, :], phi_hat[..., 1:, :]
        )
        zero = jnp.zeros_like(r_s)
        d_j = jnp.stack(
            [jnp.stack([r_s, zero], axis=-1), jnp.stack([zero, r_p], axis=-1)],
            axis=-2,
        )
        j_mat = jnp.matmul(out_rot, jnp.matmul(d_j, in_rot))
        j_total = functools.reduce(
            lambda x, y: jnp.matmul(y, x),
            [j_mat[..., j, :, :] for j in range(order)],
        )
        e_field = jnp.matmul(j_total, e_field)
    e_field = e_field[..., 0]

    theta_last = theta_hat[..., -1, :]
    theta_neg = dmod._spherical_basis(-k[..., -1, :])[0]
    a_coeff = jnp.sum(theta_last * theta_neg, axis=-1)
    u = jnp.stack([a_coeff, jnp.zeros_like(a_coeff)], axis=-1)
    a_r = jnp.sum(u * e_field, axis=-1)
    s_tot = s.sum(axis=-2)
    spreading = ref["utils"].safe_divide(jnp.asarray(1.0), s_tot)
    phase_val = -2.0 * jnp.pi * frequency * s_tot / c
    a_r = a_r * (
        spreading * jax.lax.complex(jnp.cos(phase_val), jnp.sin(phase_val))
    )[..., 0]
    a_r = a_r * wavelength / (4 * jnp.pi)
    return jnp.where(mask, a_r, 0.0)
