"""Scene API behavior tests: grids, transforms, multi-order tracing.

Mirrors the reference's ``tests/geometry/test_scene.py`` coverage areas
(reference _scene.py:343-835) on the analytically-tractable box scenes.
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu import treekit as tk
from differt_tpu.geometry import Mesh, Scene, rotation_matrix_along_axis


@pytest.fixture()
def box_scene() -> Scene:
    # Deliberately asymmetric TX/RX: on-axis placements put reflection
    # points exactly on quad diagonals / box symmetry planes, where the
    # inside-triangle test sits on a boundary that a rigid rotation can
    # flip by one ulp.
    mesh = Mesh.box(10.0, 4.0, 3.0, with_top=True)
    return Scene(
        transmitters=jnp.array([[-4.0, 0.3, 0.2]]),
        receivers=jnp.array([[3.7, 0.5, 0.3], [2.9, -0.7, 0.1]]),
        mesh=mesh,
    )


class TestGrids:
    def test_receivers_grid_shape_and_bounds(self, box_scene) -> None:
        scene = box_scene.with_receivers_grid(8, 4, height=1.2)
        assert scene.receivers.shape == (4, 8, 3)
        assert scene.num_receivers == 32
        rx = np.asarray(scene.receivers)
        np.testing.assert_allclose(rx[..., 2], 1.2)
        bbox = np.asarray(box_scene.mesh.bounding_box)
        assert rx[..., 0].min() == pytest.approx(bbox[0, 0])
        assert rx[..., 0].max() == pytest.approx(bbox[1, 0])

    def test_square_grid_default(self, box_scene) -> None:
        # n defaults to 50 (reference signature), not to m.
        scene = box_scene.with_transmitters_grid(5)
        assert scene.transmitters.shape == (50, 5, 3)
        assert box_scene.with_transmitters_grid(5, 5).transmitters.shape == (
            5,
            5,
            3,
        )

    def test_grid_batch_shape_flows_through_trace(self, box_scene) -> None:
        scene = box_scene.with_receivers_grid(4, 3, height=0.0)
        paths = scene.trace_paths(order=0)
        # [tx, *rx_batch, candidates]
        assert paths.mask.shape[:-1] == (1, 3, 4)


class TestTransforms:
    def test_rigid_rotation_preserves_path_structure(self, box_scene) -> None:
        rot = rotation_matrix_along_axis(
            jnp.array(0.83), jnp.array([0.0, 0.0, 1.0])
        )
        base = box_scene.trace_paths(order=1)
        rotated = box_scene.rotate(rot).trace_paths(order=1)
        np.testing.assert_array_equal(
            np.asarray(rotated.mask), np.asarray(base.mask)
        )
        valid = np.asarray(base.mask)
        chex.assert_trees_all_close(
            jnp.asarray(np.asarray(rotated.vertices)[valid]),
            jnp.asarray(np.asarray(base.vertices @ rot.T)[valid]),
            atol=1e-4,
        )

    def test_translate_preserves_path_structure(self, box_scene) -> None:
        shift = jnp.array([3.0, -2.0, 1.0])
        base = box_scene.trace_paths(order=1)
        moved = box_scene.translate(shift).trace_paths(order=1)
        np.testing.assert_array_equal(
            np.asarray(moved.mask), np.asarray(base.mask)
        )
        valid = np.asarray(base.mask)
        chex.assert_trees_all_close(
            jnp.asarray(np.asarray(moved.vertices)[valid]),
            jnp.asarray(np.asarray(base.vertices + shift)[valid]),
            atol=1e-4,
        )

    def test_scale_scales_path_lengths(self, box_scene) -> None:
        base = box_scene.trace_paths(order=1)
        scaled = box_scene.scale(2.0).trace_paths(order=1)
        np.testing.assert_array_equal(
            np.asarray(scaled.mask), np.asarray(base.mask)
        )
        seg = lambda p: np.linalg.norm(  # noqa: E731
            np.diff(np.asarray(p.vertices), axis=-2), axis=-1
        ).sum(axis=-1)
        valid = np.asarray(base.mask)
        np.testing.assert_allclose(
            seg(scaled)[valid], 2.0 * seg(base)[valid], rtol=1e-5
        )


class TestTraceVariants:
    def test_multi_order_returns_one_paths_per_order(self, box_scene) -> None:
        results = box_scene.trace_paths(order=[0, 1])
        results = list(results)
        assert len(results) == 2
        assert results[0].mask.shape[-1] == 1  # LOS: one candidate.
        assert results[1].mask.shape[-1] == box_scene.mesh.num_primitives

    def test_user_supplied_path_candidates(self, box_scene) -> None:
        # Tracing a hand-picked candidate subset must equal the matching
        # slice of the exhaustive trace.
        full = box_scene.trace_paths(order=1)
        subset = jnp.array([[2], [5], [9]])
        partial = box_scene.trace_paths(path_candidates=subset)
        np.testing.assert_array_equal(
            np.asarray(partial.mask),
            np.asarray(full.mask[..., [2, 5, 9]]),
        )

    def test_launch_paths_finds_los(self, box_scene) -> None:
        launched = box_scene.launch_paths(
            order=1, solver="sbr", num_rays=20000, max_dist=0.5
        )
        masks = np.asarray(launched.masks)
        assert masks.any()

    def test_order_zero_blocked_by_wall(self) -> None:
        # A wall between TX and RX must kill the LOS path.
        wall = Mesh.plane(
            jnp.zeros(3), normal=jnp.array([1.0, 0.0, 0.0]), side_length=50.0
        )
        scene = Scene(
            transmitters=jnp.array([[-2.0, 0.0, 0.0]]),
            receivers=jnp.array([[2.0, 0.1, 0.0], [2.0, -0.3, 0.2]]),
            mesh=wall,
        )
        paths = scene.trace_paths(order=0)
        assert not bool(np.asarray(paths.mask).any())

    def test_set_assume_quads_roundtrip(self, box_scene) -> None:
        quads = box_scene.set_assume_quads()
        assert quads.mesh.assume_quads
        assert quads.mesh.num_primitives == 6
        # Quad tracing halves the candidate count but must find the same
        # geometric paths as triangle tracing.
        tri_paths = box_scene.trace_paths(order=1)
        quad_paths = quads.trace_paths(order=1)
        tri_pts = np.asarray(tri_paths.vertices)[np.asarray(tri_paths.mask)]
        quad_pts = np.asarray(quad_paths.vertices)[np.asarray(quad_paths.mask)]
        tri_set = {tuple(np.round(p.reshape(-1), 4)) for p in tri_pts}
        quad_set = {tuple(np.round(p.reshape(-1), 4)) for p in quad_pts}
        assert quad_set == tri_set


def test_scene_jit_through_tree() -> None:
    scene = Scene(
        transmitters=jnp.array([[-4.0, 0.0, 0.0]]),
        receivers=jnp.array([[4.0, 0.0, 0.0]]),
        mesh=Mesh.box(10.0, 4.0, 3.0, with_top=True),
    )

    @jax.jit
    def total_power_distance(s: Scene):
        return jnp.sum((s.transmitters - s.receivers) ** 2)

    assert float(total_power_distance(scene)) == pytest.approx(64.0)
