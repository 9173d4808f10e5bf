"""Tests for TracedPaths / LaunchedPaths containers."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.geometry import LaunchedPaths, TracedPaths, merge_cell_ids


def make_paths(mask=None, num=6, order=1) -> TracedPaths:
    key = jax.random.key(0)
    vertices = jax.random.uniform(key, (num, order + 2, 3))
    objects = jnp.stack(
        [jnp.zeros(num, dtype=jnp.int32)]
        + [jnp.arange(num, dtype=jnp.int32) % 3 for _ in range(order)]
        + [jnp.zeros(num, dtype=jnp.int32)],
        axis=-1,
    )
    if mask is None:
        mask = jnp.arange(num) % 2 == 0
    types = jnp.zeros((num, order), dtype=jnp.int32)
    return TracedPaths(vertices, objects, mask=mask, interaction_types=types)


class TestTracedPaths:
    def test_shapes(self) -> None:
        paths = make_paths()
        assert paths.shape == (6,)
        assert paths.path_length == 3
        assert paths.order == 1
        assert int(paths.num_valid_paths) == 3

    def test_reshape_and_squeeze(self) -> None:
        paths = make_paths().reshape(2, 3)
        assert paths.shape == (2, 3)
        assert paths.reshape(-1).shape == (6,)
        squeezed = paths.reshape(1, 6).squeeze(0)
        assert squeezed.shape == (6,)
        with pytest.raises(ValueError, match="out-of-bounds"):
            paths.squeeze(5)

    def test_masked(self) -> None:
        paths = make_paths()
        masked = paths.masked()
        assert masked.vertices.shape[0] == 3
        assert bool(masked.mask.all())

    def test_float_confidence_mask(self) -> None:
        mask = jnp.array([0.9, 0.2, 0.6, 0.4, 0.5, 0.1])
        paths = make_paths(mask=mask)
        assert int(paths.num_valid_paths) == 3  # >= 0.5 threshold.
        assert paths.masked_vertices.shape[0] == 3

    def test_reduce(self) -> None:
        paths = make_paths()
        total = paths.reduce(lambda v: jnp.ones(v.shape[:-2]))
        chex.assert_trees_all_close(total, 3.0)  # Three valid paths.

    def test_reduce_with_confidence_weights(self) -> None:
        mask = jnp.array([0.5, 0.25, 0.0, 0.0, 0.0, 0.25])
        paths = make_paths(mask=mask)
        total = paths.reduce(lambda v: jnp.ones(v.shape[:-2]))
        chex.assert_trees_all_close(total, 1.0)

    def test_group_by_objects(self) -> None:
        objects = jnp.array([
            [[1, 1, 0], [0, 0, 1], [1, 0, 1], [1, 0, 0], [1, 1, 1], [1, 1, 1]],
            [[1, 0, 0], [1, 1, 1], [0, 0, 1], [1, 1, 0], [0, 0, 1], [1, 0, 0]],
        ])
        vertices = jnp.zeros((*objects.shape, 3))
        mask = jnp.ones(objects.shape[:-1], dtype=bool)
        types = jnp.zeros((*objects.shape[:-1], 1), dtype=jnp.int32)
        paths = TracedPaths(vertices, objects, mask=mask, interaction_types=types)
        groups = np.asarray(paths.group_by_objects())
        # Matching rows share group ids; distinct rows do not.
        np.testing.assert_array_equal(
            groups, [[0, 1, 2, 3, 4, 4], [3, 4, 1, 0, 1, 3]]
        )

    def test_multipath_cells_and_merge(self) -> None:
        mask = jnp.array([[True, False], [True, False], [False, True]])
        vertices = jnp.zeros((3, 2, 3, 3))
        objects = jnp.zeros((3, 2, 3), dtype=jnp.int32)
        types = jnp.zeros((3, 2, 1), dtype=jnp.int32)
        paths = TracedPaths(vertices, objects, mask=mask, interaction_types=types)
        cells = np.asarray(paths.multipath_cells())
        assert cells[0] == cells[1]
        assert cells[0] != cells[2]

        merged = np.asarray(
            merge_cell_ids(jnp.array([0, 0, 1, 1]), jnp.array([0, 1, 0, 0]))
        )
        assert merged[2] == merged[3]
        assert len({merged[0], merged[1], merged[2]}) == 3

    def test_mask_duplicate_objects(self) -> None:
        objects = jnp.array([[0, 1, 0], [0, 1, 0], [0, 2, 0], [0, 1, 0]])
        vertices = jnp.zeros((4, 3, 3))
        mask = jnp.ones(4, dtype=bool)
        types = jnp.zeros((4, 1), dtype=jnp.int32)
        paths = TracedPaths(vertices, objects, mask=mask, interaction_types=types)
        out = paths.mask_duplicate_objects(axis=-1)
        assert int(out.num_valid_paths) == 2  # [0,1,0] once + [0,2,0].

    def test_iter(self) -> None:
        paths = make_paths()
        items = list(paths)
        assert len(items) == 3
        assert all(p.vertices.shape == (3, 3) for p in items)


class TestLaunchedPaths:
    def make(self) -> LaunchedPaths:
        num, order = 4, 2
        vertices = jnp.arange(num * (order + 2) * 3, dtype=jnp.float32).reshape(
            num, order + 2, 3
        )
        objects = jnp.zeros((num, order + 2), dtype=jnp.int32)
        masks = jnp.array([
            [True, False, True],
            [False, True, True],
            [True, True, False],
            [False, False, False],
        ])
        types = jnp.zeros((num, order), dtype=jnp.int32)
        return LaunchedPaths(
            vertices=vertices, objects=objects, masks=masks,
            interaction_types=types,
        )

    def test_mask_alias_is_highest_order(self) -> None:
        paths = self.make()
        np.testing.assert_array_equal(
            np.asarray(paths.mask), [True, True, False, False]
        )

    def test_get_paths_orders(self) -> None:
        paths = self.make()
        p0 = paths.get_paths(0)
        assert p0.path_length == 2
        np.testing.assert_array_equal(
            np.asarray(p0.mask), [True, False, True, False]
        )
        # Order-0 paths join the first and last vertices.
        chex.assert_trees_all_close(p0.vertices[:, -1], paths.vertices[:, -1])
        with pytest.raises(ValueError, match="order must be"):
            paths.get_paths(5)

    def test_reshape(self) -> None:
        paths = self.make().reshape(2, 2)
        assert paths.shape == (2, 2)
        assert paths.masks.shape == (2, 2, 3)


class TestMultiOrderMerge:
    def _scene(self):
        from differt_tpu.geometry import Mesh, Scene

        mesh = Mesh.box(length=10.0, width=4.0, height=3.0, with_top=True)
        mesh = mesh.set_materials("Concrete")
        return Scene(
            transmitters=jnp.array([[-4.0, 0.0, 0.0]]),
            receivers=jnp.array([[4.0, 0.5, 0.2], [3.0, -1.0, 0.4]]),
            mesh=mesh,
        )

    def test_pad_order_preserves_geometry(self) -> None:
        scene = self._scene()
        paths = scene.trace_paths(order=1)
        padded = paths.pad_order(3)
        assert padded.order == 3
        assert padded.shape == paths.shape
        # Zero-length padded segments: total path length is unchanged.
        def total_len(p):
            return jnp.linalg.norm(
                jnp.diff(p.vertices, axis=-2), axis=-1
            ).sum(-1)
        chex.assert_trees_all_close(
            total_len(padded), total_len(paths), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(padded.mask), np.asarray(paths.mask)
        )
        assert np.all(np.asarray(padded.interaction_types[..., 1:]) == -1)
        assert np.all(np.asarray(padded.objects[..., 2:-1]) == -1)

    def test_concatenate_paths_merges_orders(self) -> None:
        from differt_tpu.geometry import concatenate_paths

        scene = self._scene()
        p1 = scene.trace_paths(order=1)
        p2 = scene.trace_paths(order=2)
        merged = concatenate_paths([p1, p2])
        assert merged.order == 2
        n1 = p1.vertices.shape[-3]
        n2 = p2.vertices.shape[-3]
        assert merged.vertices.shape[-3] == n1 + n2
        assert int(merged.num_valid_paths) == int(p1.num_valid_paths) + int(
            p2.num_valid_paths
        )

    def test_merged_power_equals_joint_coherent_sum(self) -> None:
        """Padded bounces must be exact EM no-ops: the merged container's
        coherent power equals the power of the union computed per order."""
        from differt_tpu.coverage import complex_amplitudes
        from differt_tpu.em import z_0

        scene = self._scene()
        eta = jnp.array([5.24])
        sigma = jnp.array([0.1])

        def amp(paths):
            return complex_amplitudes(
                paths.reshape(1, 2, -1), scene, 2.4e9, eta_r=eta,
                conductivity=sigma,
            )

        p1 = scene.trace_paths(order=1)
        p2 = scene.trace_paths(order=2)
        merged = scene.trace_paths(order=[1, 2], merge_orders=True)
        power_merged = jnp.abs(amp(merged).sum(-1)) ** 2 / z_0
        power_joint = (
            jnp.abs(amp(p1).sum(-1) + amp(p2).sum(-1)) ** 2 / z_0
        )
        chex.assert_trees_all_close(power_merged, power_joint, rtol=1e-4)

    def test_solver_level_multi_order(self) -> None:
        from differt_tpu.rt import ExhaustivePathTracer

        scene = self._scene()
        tracer = ExhaustivePathTracer()
        cands, types = tracer.generate_path_candidates(scene, [0, 1, 2])
        assert isinstance(cands, tuple) and len(cands) == 3
        merged = tracer.trace_path_candidates(scene, cands, types)
        direct = scene.trace_paths(order=[0, 1, 2], merge_orders=True)
        assert merged.order == direct.order == 2
        np.testing.assert_array_equal(
            np.asarray(merged.mask).sum(), np.asarray(direct.mask).sum()
        )

    def test_unified_chunks_iter_covers_all_orders(self) -> None:
        from differt_tpu.rt import ExhaustivePathTracer

        scene = self._scene()
        tracer = ExhaustivePathTracer()
        chunks = tracer.generate_path_candidates_chunks_iter(
            scene, [1, 2], chunk_size=7
        )
        seen = {1: 0, 2: 0}
        for cands, _types in chunks:
            seen[cands.shape[1]] += cands.shape[0]
        n = int(scene.mesh.num_primitives)
        assert seen[1] == n
        assert seen[2] == n * (n - 1)
