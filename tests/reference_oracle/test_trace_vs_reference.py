"""End-to-end allclose vs the reference: traced paths, power, gradients.

The reference's full tracer (``_solvers.py:499-770``) cannot be imported
(it needs Warp), but it is a composition of the free functions that CAN:
``image_method`` + ``assemble_path`` + the five validity checks. This
module re-composes that exact pipeline (same order, same defaults:
``epsilon=None→10·eps``, ``hit_tol=None``, ``min_len=10·eps``) from
reference functions and asserts that this repo's solvers and EM chain
agree on:

- traced path geometry (vertices) and validity masks,
- per-path complex channel amplitudes / power / phase (via
  ``differt.plugins.deepmimo.export``),
- gradients of received power w.r.t. mesh vertices, TX position, and
  material permittivity (the BASELINE.json correctness bar).
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import differt_tpu.em as em
from differt_tpu import treekit as tk
from differt_tpu.coverage import complex_amplitudes, received_power
from differt_tpu.geometry import Scene, generate_all_path_candidates
from differt_tpu.scenes import street_canyon_scene

FREQUENCY = 2.4e9


@pytest.fixture(scope="module")
def scene():
    base = street_canyon_scene(with_ground=True)
    tx = jnp.array([[-30.0, 0.0, 5.0]])
    rx = jnp.array([[20.0, 3.0, 1.5], [35.0, -4.0, 1.5], [5.0, 7.0, 2.0]])
    return tk.tree_at(lambda s: (s.transmitters, s.receivers), base, (tx, rx))


from tests.reference_oracle.refchain import ref_amplitudes, ref_trace  # noqa: E402


@pytest.mark.parametrize("order", [1, 2])
def test_traced_paths_match_reference(ref, scene, order):
    mine = scene.trace_paths(order=order)
    candidates = np.asarray(
        generate_all_path_candidates(scene.mesh.num_triangles, order)
    )
    full_ref, mask_ref = ref_trace(
        ref,
        scene.mesh.vertices,
        scene.mesh.triangles,
        scene.mesh.normals,
        scene.transmitters,
        scene.receivers,
        jnp.asarray(candidates),
    )
    mask_mine = np.asarray(mine.mask).reshape(mask_ref.shape)
    np.testing.assert_array_equal(mask_mine, np.asarray(mask_ref))
    assert mask_mine.any(), "expected at least one valid path in the canyon"
    vertices_mine = np.asarray(mine.vertices).reshape(full_ref.shape)
    chex.assert_trees_all_close(
        vertices_mine[mask_mine],
        np.asarray(full_ref)[np.asarray(mask_ref)],
        rtol=1e-5,
        atol=1e-5,
    )


def test_traced_paths_two_buildings_obj(ref, tmp_path):
    """Trace on the reference's checked-in OBJ asset (read in place)."""
    import pathlib

    from differt_tpu.geometry import Mesh

    obj = pathlib.Path("/root/reference/differt/tests/geometry/two_buildings.obj")
    if not obj.is_file():
        pytest.skip("reference OBJ asset not available")
    mesh = Mesh.load_obj(obj)
    tx = jnp.array([[0.0, 38.0, 30.0]])
    rx = jnp.array([[30.0, 6.0, 1.5]])
    scene = Scene(transmitters=tx, receivers=rx, mesh=mesh)
    mine = scene.trace_paths(order=1)
    candidates = jnp.asarray(
        np.asarray(generate_all_path_candidates(mesh.num_triangles, 1))
    )
    full_ref, mask_ref = ref_trace(
        ref, mesh.vertices, mesh.triangles, mesh.normals, tx, rx, candidates
    )
    mask_mine = np.asarray(mine.mask).reshape(np.asarray(mask_ref).shape)
    np.testing.assert_array_equal(mask_mine, np.asarray(mask_ref))
    chex.assert_trees_all_close(
        np.asarray(mine.vertices).reshape(full_ref.shape)[mask_mine],
        np.asarray(full_ref)[np.asarray(mask_ref)],
        rtol=1e-5,
        atol=1e-5,
    )


class _SceneDuck:
    """Duck-typed Scene for deepmimo.export (mesh/transmitters/receivers)."""

    def __init__(self, scene):
        self.mesh = scene.mesh
        self.transmitters = scene.transmitters
        self.receivers = scene.receivers


def _ref_material(ref, eta_r, conductivity, thickness=None):
    return ref["em_material"].Material(
        name="oracle",
        properties=lambda _f: (eta_r, conductivity),
        thickness=thickness,
        aliases=(),
    )


def _export_ref(ref, scene, paths_list, eta_r, conductivity):
    names = scene.mesh.material_names
    mats = {
        name: _ref_material(ref, eta_r[i], conductivity[i])
        for i, name in enumerate(names)
    }
    return ref["deepmimo"].export(
        paths=paths_list,
        scene=_SceneDuck(scene),
        radio_materials=mats,
        frequency=FREQUENCY,
    )


def test_power_and_phase_match_reference(ref, scene):
    """Per-path dBW power and phase: my EM chain vs deepmimo.export."""
    paths = scene.trace_paths(order=1)
    eta_r = jnp.array([5.24])
    conductivity = jnp.array([0.12])

    dm = _export_ref(ref, scene, [paths.reshape(1, 3, -1)], eta_r, conductivity)

    a_mine = complex_amplitudes(
        paths.reshape(1, 3, -1),
        scene,
        FREQUENCY,
        eta_r=eta_r,
        conductivity=conductivity,
    )
    mask = np.asarray(dm.mask)
    assert mask.any()
    power_mine = 10.0 * jnp.log10(jnp.abs(a_mine) ** 2 / em.z_0)
    phase_mine = jnp.angle(a_mine, deg=True)
    chex.assert_trees_all_close(
        np.asarray(power_mine)[mask], np.asarray(dm.power)[mask], rtol=1e-4, atol=1e-3
    )
    chex.assert_trees_all_close(
        np.asarray(phase_mine)[mask], np.asarray(dm.phase)[mask], rtol=1e-3, atol=0.1
    )
    # Delays and angles too.
    lengths_mine = jnp.linalg.norm(
        jnp.diff(paths.reshape(1, 3, -1).vertices, axis=-2), axis=-1
    ).sum(axis=-1)
    chex.assert_trees_all_close(
        np.asarray(lengths_mine / em.c)[mask],
        np.asarray(dm.delay)[mask],
        rtol=1e-5,
        atol=1e-9,
    )


def test_received_power_matches_reference_sum(ref, scene):
    """Coherent |Σa|²/z0 over valid paths: mine vs recombined reference."""
    paths = scene.trace_paths(order=1)
    eta_r = jnp.array([5.24])
    conductivity = jnp.array([0.12])
    dm = _export_ref(ref, scene, [paths.reshape(1, 3, -1)], eta_r, conductivity)

    # Recombine reference per-path (power, phase) into complex amplitudes.
    amp = np.sqrt(np.power(10.0, np.asarray(dm.power) / 10.0) * em.z_0)
    a_ref = amp * np.exp(1j * np.deg2rad(np.asarray(dm.phase)))
    a_ref = np.where(np.asarray(dm.mask), a_ref, 0.0)
    p_ref = np.abs(a_ref.sum(axis=-1)) ** 2 / em.z_0

    p_mine = received_power(
        paths.reshape(1, 3, -1),
        scene,
        FREQUENCY,
        eta_r=eta_r,
        conductivity=conductivity,
        coherent=True,
    )
    # rtol: coherent f32 power sums round differently now that the
    # frequency is a traced operand (round 5) while the reference chain
    # constant-folds it; the drift is a few e-4 relative on interfering
    # sums, well above bit-level but far below physical significance.
    chex.assert_trees_all_close(np.asarray(p_mine), p_ref, rtol=1e-3, atol=1e-30)


def test_power_gradient_wrt_eta_matches_reference(ref, scene):
    """d(received power)/d(eta_r): my chain vs the reference deepmimo chain."""
    paths = scene.trace_paths(order=1).reshape(1, 3, -1)
    conductivity = jnp.array([0.12])

    def p_mine(eta):
        return jnp.sum(
            received_power(
                paths,
                scene,
                FREQUENCY,
                eta_r=eta,
                conductivity=conductivity,
                coherent=False,
            )
        )

    def p_ref(eta):
        a = _ref_amplitudes(ref, scene, paths, eta, conductivity)
        return jnp.sum(jnp.abs(a) ** 2 / em.z_0)

    eta0 = jnp.array([5.24])
    g_mine = jax.grad(p_mine)(eta0)
    g_ref = jax.grad(p_ref)(eta0)
    chex.assert_trees_all_close(g_mine, g_ref, rtol=1e-3, atol=1e-12)
    assert jnp.any(g_mine != 0.0)


def _ref_amplitudes(ref, scene, paths, eta_r, conductivity):
    """Reference per-path complex amplitude, masked (see refchain.py).

    export() converts to dBW, which is lossy under grad — this replicates
    its per-path `a` with reference functions only.
    """
    return ref_amplitudes(
        ref,
        vertices=paths.vertices,
        objects=paths.objects[..., 1:-1],
        mask=paths.mask,
        face_materials=scene.mesh.face_materials,
        face_normals=scene.mesh.normals,
        frequency=FREQUENCY,
        eta_r=eta_r,
        conductivity=conductivity,
    )


def test_ref_amplitude_helper_matches_export(ref, scene):
    """Sanity: the grad-friendly reference-chain helper == export()'s output."""
    paths = scene.trace_paths(order=1).reshape(1, 3, -1)
    eta_r = jnp.array([5.24])
    conductivity = jnp.array([0.12])
    a_helper = _ref_amplitudes(ref, scene, paths, eta_r, conductivity)
    dm = _export_ref(ref, scene, [paths], eta_r, conductivity)
    mask = np.asarray(dm.mask)
    power_helper = 10.0 * np.log10(
        np.abs(np.asarray(a_helper)[mask]) ** 2 / em.z_0
    )
    chex.assert_trees_all_close(
        power_helper, np.asarray(dm.power)[mask], rtol=1e-4, atol=1e-3
    )


def test_power_gradient_wrt_tx_matches_reference(ref, scene):
    """d(coherent power)/d(TX position): full pipeline, mine vs reference.

    Gradients flow through the image method (path geometry depends on TX)
    and the EM chain; masks are frozen (computed at tx0) in both, matching
    the reference's bool-mask semantics.
    """
    eta_r = jnp.array([5.24])
    conductivity = jnp.array([0.12])
    candidates = jnp.asarray(
        np.asarray(generate_all_path_candidates(scene.mesh.num_triangles, 1))
    )

    def p_mine(tx):
        s2 = tk.tree_at(lambda s: s.transmitters, scene, tx)
        paths = s2.trace_paths(path_candidates=candidates).reshape(1, 3, -1)
        return jnp.sum(
            received_power(
                paths, s2, FREQUENCY, eta_r=eta_r, conductivity=conductivity,
                coherent=False,
            )
        )

    def p_ref(tx):
        full, mask = ref_trace(
            ref,
            scene.mesh.vertices,
            scene.mesh.triangles,
            scene.mesh.normals,
            tx,
            scene.receivers,
            candidates,
        )
        objects = jnp.concatenate(
            [
                jnp.zeros((*full.shape[:-2], 1), dtype=jnp.int32),
                jnp.broadcast_to(candidates, full.shape[:-2] + candidates.shape[-1:]),
                jnp.zeros((*full.shape[:-2], 1), dtype=jnp.int32),
            ],
            axis=-1,
        )
        from differt_tpu.geometry import TracedPaths

        paths = TracedPaths(
            vertices=full,
            objects=objects,
            mask=mask,
            interaction_types=jnp.zeros(candidates.shape, dtype=jnp.int32),
        )
        a = _ref_amplitudes(ref, scene, paths, eta_r, conductivity)
        return jnp.sum(jnp.abs(a) ** 2 / em.z_0)

    tx0 = jnp.array([[-30.0, 0.0, 5.0]])
    g_mine = jax.grad(p_mine)(tx0)
    g_ref = jax.grad(p_ref)(tx0)
    assert jnp.all(jnp.isfinite(g_mine))
    chex.assert_trees_all_close(g_mine, g_ref, rtol=5e-3, atol=1e-12)


def test_geometry_gradient_wrt_vertices_matches_reference(ref, scene):
    """d(masked path vertices)/d(mesh vertices): solver geometry gradients."""
    candidates = jnp.asarray(
        np.asarray(generate_all_path_candidates(scene.mesh.num_triangles, 1))
    )
    _, mask0 = ref_trace(
        ref,
        scene.mesh.vertices,
        scene.mesh.triangles,
        scene.mesh.normals,
        scene.transmitters,
        scene.receivers,
        candidates,
    )
    mask0 = jax.lax.stop_gradient(mask0)

    def f_mine(verts):
        s2 = tk.tree_at(lambda s: s.mesh.vertices, scene, verts)
        paths = s2.trace_paths(path_candidates=candidates)
        v = paths.vertices.reshape(*mask0.shape, -1, 3)
        return jnp.sum(jnp.where(mask0[..., None, None], v, 0.0) ** 2)

    def ref_normals(verts):
        # Reference Mesh.normals (_mesh.py:950-956): diff of triangle
        # vertices, cross, normalize — differentiable w.r.t. verts.
        tv = jnp.take(verts, scene.mesh.triangles, axis=0)
        vectors = jnp.diff(tv, axis=1)
        return ref["geometry_utils"].normalize(
            jnp.cross(vectors[:, 0, :], vectors[:, 1, :])
        )[0]

    def f_ref(verts):
        full, _ = ref_trace(
            ref,
            verts,
            scene.mesh.triangles,
            ref_normals(verts),
            scene.transmitters,
            scene.receivers,
            candidates,
        )
        return jnp.sum(jnp.where(mask0[..., None, None], full, 0.0) ** 2)

    v0 = scene.mesh.vertices
    g_mine = jax.grad(f_mine)(v0)
    g_ref = jax.grad(f_ref)(v0)
    assert jnp.any(g_ref != 0.0)
    chex.assert_trees_all_close(g_mine, g_ref, rtol=5e-4, atol=1e-4)
