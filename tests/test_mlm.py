"""Property tests for the Multipath Lifetime Map (MLM).

The bit-planed scatter-max design (rt/_mlm.py) emulates the reference's
per-cell ``atomic_or`` of path hashes (_scene.py:62-302). These tests pin
its semantics, not just its shape:

- on a single ground plane every nonzero cell value must be an OR of the
  two analytically-known single-bounce hashes;
- cells on opposite sides of a split scene must carry disjoint hash sets;
- every nonzero cell must be reachable by a valid order-1 exhaustive
  image-method path (MLM = SBR sampling of the same multipath structure).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.geometry import Mesh, Scene
from differt_tpu.rt._mlm import _combine_hashes, _hash_int


# Every path hash is seeded with the FNV-1a offset basis (as the
# reference's Warp kernel, _scene.py:64): a direct (zero-bounce) plane
# crossing records the bare seed.
_SEED = 0x811C9DC5


def _single_bounce_hash(triangle_index: int) -> int:
    """Hash recorded for a path that bounced off one triangle."""
    h = _combine_hashes(
        jnp.asarray(_SEED, dtype=jnp.uint32),
        _hash_int(jnp.asarray(triangle_index, dtype=jnp.int32)),
    )
    return int(h)


def _expected_or_closure(hashes: list[int]) -> set[int]:
    """All possible OR-combinations of the path hashes (plus 0 and LOS)."""
    out = {0, _SEED}
    for h in hashes:
        out |= {prev | h for prev in out}
    return out


class TestGroundPlane:
    """TX above a single ground plane: two triangles, known hashes."""

    @pytest.fixture(scope="class")
    def mlm(self):
        mesh = Mesh.plane(
            jnp.zeros(3), normal=jnp.array([0.0, 0.0, 1.0]), side_length=20.0
        )
        scene = Scene(
            transmitters=jnp.array([[0.0, 0.0, 4.0]]),
            mesh=mesh,
        )
        return scene.compute_tx_mlm(
            num_rays=20000,
            order=1,
            receiver_plane_z=1.0,
            grid_bounds=jnp.array([[-8.0, -8.0], [8.0, 8.0]]),
            grid_size=(16, 16),
        )

    def test_values_are_or_combinations_of_known_hashes(self, mlm) -> None:
        allowed = _expected_or_closure(
            [_single_bounce_hash(0), _single_bounce_hash(1)]
        )
        values = {int(v) & 0xFFFFFFFF for v in np.asarray(mlm).reshape(-1)}
        assert values <= {v & 0xFFFFFFFF for v in allowed}

    def test_some_cells_are_hit(self, mlm) -> None:
        assert (np.asarray(mlm) != 0).sum() > 50

    def test_same_structure_cells_share_hash(self, mlm) -> None:
        # With only two triangles plus the LOS crossing, the map must
        # contain at most 7 distinct nonzero values (OR-combinations of 3
        # recordable hashes), each shared by many cells.
        flat = np.asarray(mlm).reshape(-1)
        nonzero = flat[flat != 0]
        assert 1 <= len(np.unique(nonzero)) <= 7


class TestSplitScene:
    """Two disjoint ground planes: hashes must not leak across the gap."""

    def test_disjoint_hash_sets(self) -> None:
        left = Mesh.plane(
            jnp.array([-6.0, 0.0, 0.0]),
            normal=jnp.array([0.0, 0.0, 1.0]),
            side_length=8.0,
        )
        right = Mesh.plane(
            jnp.array([6.0, 0.0, 0.0]),
            normal=jnp.array([0.0, 0.0, 1.0]),
            side_length=8.0,
        )
        scene = Scene(
            transmitters=jnp.array([[0.0, 0.0, 5.0]]),
            mesh=left + right,
        )
        mlm = np.asarray(
            scene.compute_tx_mlm(
                num_rays=40000,
                order=1,
                receiver_plane_z=1.0,
                grid_bounds=jnp.array([[-12.0, -6.0], [12.0, 6.0]]),
                grid_size=(24, 12),
            )
        )[0]
        # Left triangles are 0/1, right are 2/3. A ray bouncing off the
        # left plane keeps moving left (specular reflection off +z flips
        # only dz), so left-half cells may only carry left-plane hashes.
        left_allowed = _expected_or_closure(
            [_single_bounce_hash(0), _single_bounce_hash(1)]
        )
        right_allowed = _expected_or_closure(
            [_single_bounce_hash(2), _single_bounce_hash(3)]
        )
        m = mlm.shape[0]
        left_values = {int(v) & 0xFFFFFFFF for v in mlm[: m // 2].reshape(-1)}
        right_values = {int(v) & 0xFFFFFFFF for v in mlm[m // 2 :].reshape(-1)}
        assert left_values <= {v & 0xFFFFFFFF for v in left_allowed}
        assert right_values <= {v & 0xFFFFFFFF for v in right_allowed}
        assert any(v != 0 for v in left_values | right_values)


class TestVsExhaustiveTracing:
    def test_nonzero_cells_have_valid_image_method_path(self) -> None:
        """Every MLM-hit cell is reachable by a valid order-1 traced path."""
        mesh = Mesh.plane(
            jnp.zeros(3), normal=jnp.array([0.0, 0.0, 1.0]), side_length=30.0
        )
        tx = jnp.array([[0.0, 0.0, 5.0]])
        plane_z = 1.5
        bounds = jnp.array([[-8.0, -8.0], [8.0, 8.0]])
        grid = (8, 8)
        scene = Scene(transmitters=tx, mesh=mesh)
        mlm = np.asarray(
            scene.compute_tx_mlm(
                num_rays=30000,
                order=1,
                receiver_plane_z=plane_z,
                grid_bounds=bounds,
                grid_size=grid,
            )
        )[0]
        assert (mlm != 0).any()

        # Cell centers of every nonzero cell become receivers. The 0.463 /
        # 0.521 offsets keep reflection points off the plane's exact
        # triangle diagonal (x = -y), where a point lying exactly on the
        # shared edge can fail the inside-triangle test of BOTH triangles
        # by one ulp (non-watertight shared edges, as in the reference).
        ii, jj = np.nonzero(mlm)
        step = (np.asarray(bounds[1]) - np.asarray(bounds[0])) / np.asarray(grid)
        centers = np.stack(
            (
                np.asarray(bounds[0, 0]) + (ii + 0.463) * step[0],
                np.asarray(bounds[0, 1]) + (jj + 0.521) * step[1],
                np.full(ii.shape, plane_z),
            ),
            axis=-1,
        )
        traced = Scene(
            transmitters=tx, receivers=jnp.asarray(centers), mesh=mesh
        ).trace_paths(order=1)
        # [tx=1, rx, candidates]: each nonzero cell has a valid reflection.
        valid_per_rx = np.asarray(traced.mask).reshape(len(centers), -1)
        assert valid_per_rx.any(axis=-1).all()
