"""Tests for the trace/launch solver layer on simple scenes."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.geometry import Mesh, Scene
from differt_tpu.rt import ExhaustivePathTracer, HybridPathTracer


@pytest.fixture
def corridor_scene() -> Scene:
    # An open-ended box corridor along x: walls at y = +-1.5 and z = +-1,
    # TX and RX inside.
    mesh = Mesh.box(length=10.0, width=3.0, height=2.0, with_top=True)
    return Scene(
        transmitters=jnp.array([-4.0, 0.0, 0.0]),
        receivers=jnp.array([4.0, 0.0, 0.0]),
        mesh=mesh,
    )


def test_los_path(corridor_scene: Scene) -> None:
    paths = corridor_scene.trace_paths(order=0)
    assert paths.vertices.shape == (1, 2, 3)
    assert bool(paths.mask.all())
    chex.assert_trees_all_close(
        paths.vertices[0, 0], corridor_scene.transmitters
    )


def test_los_blocked() -> None:
    # A wall between TX and RX blocks line of sight.
    wall = Mesh.plane(jnp.zeros(3), normal=jnp.array([1.0, 0.0, 0.0]),
                      side_length=10.0)
    scene = Scene(
        transmitters=jnp.array([-1.0, 0.0, 0.0]),
        receivers=jnp.array([1.0, 0.0, 0.0]),
        mesh=wall,
    )
    paths = scene.trace_paths(order=0)
    assert not bool(paths.mask.any())


def test_first_order_counts(corridor_scene: Scene) -> None:
    paths = corridor_scene.trace_paths(order=1)
    # The box is closed: one specular reflection per wall (6 walls), with
    # specular points on wall centers hitting both triangles of a quad.
    num_valid = int(paths.num_valid_paths)
    assert 6 <= num_valid <= 12

    # Reflection points must lie on one of the wall planes.
    masked = paths.masked()
    mid = np.asarray(masked.vertices[:, 1, :])
    on_wall = (
        np.isclose(np.abs(mid[:, 0]), 5.0, atol=1e-5)
        | np.isclose(np.abs(mid[:, 1]), 1.5, atol=1e-5)
        | np.isclose(np.abs(mid[:, 2]), 1.0, atol=1e-5)
    )
    assert on_wall.all()


def test_quads_match_triangles(corridor_scene: Scene) -> None:
    tri_paths = corridor_scene.trace_paths(order=1)
    quad_paths = corridor_scene.set_assume_quads().trace_paths(order=1)
    # Same set of valid reflection points (quads deduplicate the
    # two-triangles-per-wall ambiguity).
    tri_points = np.unique(
        np.round(np.asarray(tri_paths.masked().vertices[:, 1, :]), 4), axis=0
    )
    quad_points = np.unique(
        np.round(np.asarray(quad_paths.masked().vertices[:, 1, :]), 4), axis=0
    )
    np.testing.assert_array_equal(tri_points, quad_points)


def test_chunked_iteration_matches(corridor_scene: Scene) -> None:
    full = corridor_scene.trace_paths(order=1)
    chunks = list(corridor_scene.trace_paths(order=1, chunk_size=3))
    vertices = jnp.concatenate([c.vertices for c in chunks], axis=-3)
    mask = jnp.concatenate([c.mask for c in chunks], axis=-1)
    chex.assert_trees_all_close(vertices, full.vertices)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(full.mask))


def test_path_candidates_bypass(corridor_scene: Scene) -> None:
    candidates = jnp.array([[0], [5]])
    paths = corridor_scene.trace_paths(path_candidates=candidates)
    assert paths.vertices.shape[-3] == 2


def test_second_order(corridor_scene: Scene) -> None:
    paths = corridor_scene.trace_paths(order=2)
    assert int(paths.num_valid_paths) > 0
    masked = paths.masked()
    # Both bounce points must lie on walls.
    for i in (1, 2):
        mid = np.asarray(masked.vertices[:, i, :])
        on_wall = (
            np.isclose(np.abs(mid[:, 0]), 5.0, atol=1e-4)
            | np.isclose(np.abs(mid[:, 1]), 1.5, atol=1e-4)
            | np.isclose(np.abs(mid[:, 2]), 1.0, atol=1e-4)
        )
        assert on_wall.all()


def test_hybrid_subset_of_exhaustive(corridor_scene: Scene) -> None:
    exhaustive = corridor_scene.trace_paths(order=1)
    hybrid = corridor_scene.trace_paths(
        order=1, solver="hybrid", num_rays=20000
    )
    # Hybrid finds a subset of candidates; all its valid paths must appear
    # in the exhaustive result.
    ex_points = np.round(
        np.asarray(exhaustive.masked().vertices[:, 1, :]), 4
    )
    hy_points = np.round(np.asarray(hybrid.masked().vertices[:, 1, :]), 4)
    for p in hy_points:
        assert (np.abs(ex_points - p).max(axis=-1) < 1e-3).any()


@pytest.mark.slow
def test_smoothing_confidence(corridor_scene: Scene) -> None:
    # Smoothed (differentiable) masks are float confidences in [0, 1]; their
    # purpose is differentiability: moving the receiver must change the
    # confidences smoothly (finite, not-identically-zero gradients).
    soft = corridor_scene.trace_paths(
        order=1, solver=ExhaustivePathTracer(smoothing_factor=10.0)
    )
    assert soft.mask.dtype != jnp.bool_
    assert float(soft.mask.min()) >= 0.0
    assert float(soft.mask.max()) <= 1.0

    # The range check alone once let an all-zero confidence regression
    # through (the smoothed blockage counted each bounce's own mirrors as
    # half-blockers). Pin the semantics on an asymmetric scene: at a
    # sharp sigmoid, hard-valid paths must carry confidence > 0.5 and
    # hard-invalid paths < 0.5.
    import differt_tpu.treekit as tk

    asym = tk.tree_at(
        lambda s: (s.transmitters, s.receivers),
        corridor_scene,
        (jnp.array([-4.0, 0.3, 0.2]), jnp.array([4.0, -0.5, 0.1])),
    )
    hard = asym.trace_paths(order=1)
    sharp = asym.trace_paths(
        order=1, solver=ExhaustivePathTracer(smoothing_factor=500.0)
    )
    h = np.asarray(hard.mask).ravel()
    c = np.asarray(sharp.mask).ravel()
    assert h.any() and (~h).any()
    assert np.all(c[h] > 0.5), c[h]
    assert np.all(c[~h] < 0.5), c[~h]

    solver = ExhaustivePathTracer(smoothing_factor=10.0)
    candidates, types = solver.generate_path_candidates(corridor_scene, 1)

    def total_confidence(rx):
        scene = Scene(
            transmitters=corridor_scene.transmitters,
            receivers=rx,
            mesh=corridor_scene.mesh,
        )
        return solver.trace_path_candidates(scene, candidates, types).mask.sum()

    with jax.disable_jit():
        g = jax.grad(total_confidence)(jnp.array([3.9, 0.1, 0.2]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_sbr_launcher(corridor_scene: Scene) -> None:
    paths = corridor_scene.launch_paths(
        order=2, solver="sbr", num_rays=5000, max_dist=0.5
    )
    assert paths.vertices.shape[-2] == 4  # TX, 2 bounces, RX.
    # The LOS mask (order 0) should capture some rays aimed at RX.
    assert int(paths.masks[..., 0].sum()) > 0


def test_trace_paths_grid(corridor_scene: Scene) -> None:
    scene = corridor_scene.with_receivers_grid(4, 3, height=0.0)
    paths = scene.trace_paths(order=1)
    assert paths.vertices.shape[:3] == (3, 4, 12)


def test_disconnect_inactive_triangles(corridor_scene: Scene) -> None:
    mask = jnp.ones(corridor_scene.mesh.num_triangles, dtype=bool)
    mask = mask.at[:2].set(False)
    scene = Scene(
        transmitters=corridor_scene.transmitters,
        receivers=corridor_scene.receivers,
        mesh=corridor_scene.mesh.set_mask(mask),
    )
    paths = scene.trace_paths(
        order=1, solver=ExhaustivePathTracer(disconnect_inactive_triangles=True)
    )
    assert paths.vertices.shape[-3] == corridor_scene.mesh.num_triangles - 2


def test_multi_order_iterator(corridor_scene: Scene) -> None:
    """A sequence of orders yields one TracedPaths per order.

    (The reference raises NotImplementedError for this case,
    _scene.py:704-708.)
    """
    it = corridor_scene.trace_paths(order=[0, 1, 2])
    assert len(it) == 3
    results = list(it)
    singles = [corridor_scene.trace_paths(order=o) for o in (0, 1, 2)]
    for got, want in zip(results, singles):
        chex.assert_trees_all_close(got.vertices, want.vertices)
        np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(want.mask))


def test_multi_order_chunked(corridor_scene: Scene) -> None:
    chunks = list(corridor_scene.trace_paths(order=[1, 2], chunk_size=4))
    full = [corridor_scene.trace_paths(order=o) for o in (1, 2)]
    total = sum(c.vertices.shape[-3] for c in chunks)
    assert total == sum(f.vertices.shape[-3] for f in full)
    # Per-order path-vertex counts differ, so group chunks by point count.
    by_len: dict[int, list] = {}
    for c in chunks:
        by_len.setdefault(c.vertices.shape[-2], []).append(c)
    for f in full:
        got = jnp.concatenate(
            [c.vertices for c in by_len[f.vertices.shape[-2]]], axis=-3
        )
        chex.assert_trees_all_close(got, f.vertices)


def test_multi_order_solver_level(corridor_scene: Scene) -> None:
    tracer = ExhaustivePathTracer()
    it = tracer.trace_paths(corridor_scene, [0, 1])
    assert len(it) == 2
    got = list(it)
    assert got[0].vertices.shape[-2] == 2
    assert got[1].vertices.shape[-2] == 3


def test_multi_order_deepmimo_export(corridor_scene: Scene) -> None:
    from differt_tpu.plugins import deepmimo

    scene = corridor_scene
    scene = type(scene)(
        transmitters=scene.transmitters.reshape(1, 3),
        receivers=scene.receivers.reshape(1, 3),
        mesh=scene.mesh.set_materials("Concrete"),
    )
    out = deepmimo.export(
        paths=scene.trace_paths(order=[0, 1]), scene=scene, frequency=2.4e9
    )
    num = 1 + scene.mesh.num_primitives
    assert out.power.shape == (1, 1, num)


class TestChunkedCandidateFiltering:
    """The pure-JAX pruning fallbacks must stream, not materialize."""

    def test_hybrid_fallback_matches_native(self, monkeypatch):
        """Force the non-native path; candidates must match the native DFS."""
        import numpy as np

        import differt_tpu.native as native
        from differt_tpu.scenes import street_canyon_scene
        import differt_tpu.treekit as tk

        scene = street_canyon_scene(with_ground=True)
        scene = tk.tree_at(
            lambda s: (s.transmitters, s.receivers),
            scene,
            (jnp.array([[-30.0, 0.0, 5.0]]), jnp.array([[20.0, 3.0, 1.5]])),
        )
        solver = HybridPathTracer(num_rays=20000)
        with_native, _ = solver.generate_path_candidates(scene, 2)
        monkeypatch.setattr(native, "is_available", lambda: False)
        without, _ = solver.generate_path_candidates(scene, 2)
        np.testing.assert_array_equal(
            np.asarray(with_native), np.asarray(without)
        )

    def test_hybrid_fallback_small_chunks(self, monkeypatch):
        """Tiny chunk_size exercises the multi-chunk concat path."""
        import numpy as np

        import differt_tpu.native as native
        from differt_tpu.geometry._candidates import (
            generate_filtered_path_candidates,
            generate_path_candidates,
        )

        full = np.asarray(generate_path_candidates(12, 3))
        keep_even_first = lambda chunk: chunk[:, 0] % 2 == 0
        got = np.asarray(
            generate_filtered_path_candidates(
                12, 3, keep_even_first, chunk_size=97
            )
        )
        expected = full[full[:, 0] % 2 == 0]
        np.testing.assert_array_equal(got, expected)

    def test_warns_on_huge_space(self):
        from differt_tpu.geometry._candidates import (
            generate_filtered_path_candidates,
        )

        with pytest.warns(UserWarning, match="chunked"):
            generate_filtered_path_candidates(
                40,
                2,
                lambda chunk: chunk[:, 0] < 2,
                warn_above=100,
            )

    def test_disconnect_inactive_triangles_chunked(self):
        """Exhaustive pruning by mesh mask goes through the chunked path."""
        import numpy as np

        from differt_tpu.geometry import Mesh, Scene
        import differt_tpu.treekit as tk

        mesh = Mesh.box(2.0, 2.0, 2.0, with_top=True)
        mask = jnp.arange(mesh.num_triangles) % 3 != 0
        mesh = tk.tree_at(
            lambda m: m.mask, mesh, mask, is_leaf=lambda x: x is None
        )
        scene = Scene(
            transmitters=jnp.array([[0.0, 0.0, 0.0]]),
            receivers=jnp.array([[0.5, 0.2, 0.0]]),
            mesh=mesh,
        )
        solver = ExhaustivePathTracer(disconnect_inactive_triangles=True)
        cands, _ = solver.generate_path_candidates(scene, 2)
        cands = np.asarray(cands)
        mask_np = np.asarray(mask)
        assert cands.shape[0] > 0
        assert mask_np[cands].all()
        # Equals brute-force filtering of the full space.
        from differt_tpu.geometry import generate_all_path_candidates

        full = np.asarray(generate_all_path_candidates(mesh.num_triangles, 2))
        expected = full[mask_np[full].all(axis=-1)]
        np.testing.assert_array_equal(cands, expected)
