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
