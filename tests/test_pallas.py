"""Validate the Pallas TPU kernels against the pure-JAX oracles.

On CPU these run in Pallas interpreter mode — same kernel code path that
compiles on TPU, checked against :mod:`differt_tpu.rt`.
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.geometry import Mesh, fibonacci_lattice
from differt_tpu.ops._pallas_rt import (
    pallas_first_triangle_hit_by_ray,
    pallas_ray_intersect_any_triangle,
)
from differt_tpu.rt import first_triangle_hit_by_ray, ray_intersect_any_triangle


@pytest.fixture(scope="module")
def box_rays():
    mesh = Mesh.box(2.0, 1.5, 1.0, with_top=True)
    key = jax.random.key(0)
    origins = jax.random.uniform(key, (200, 3), minval=-0.3, maxval=0.3)
    directions = fibonacci_lattice(200) * 3.0
    return mesh, origins, directions


def test_anyhit_matches_oracle(box_rays) -> None:
    mesh, origins, directions = box_rays
    tv = mesh.triangle_vertices
    got = pallas_ray_intersect_any_triangle(origins, directions, tv)
    expected = ray_intersect_any_triangle(origins, directions, tv, hit_tol=0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_anyhit_threshold(box_rays) -> None:
    mesh, origins, directions = box_rays
    tv = mesh.triangle_vertices
    got = pallas_ray_intersect_any_triangle(
        origins, directions, tv, hit_threshold=0.05
    )
    expected = ray_intersect_any_triangle(origins, directions, tv, hit_tol=0.95)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_closest_hit_matches_oracle(box_rays) -> None:
    mesh, origins, directions = box_rays
    tv = mesh.triangle_vertices
    idx_got, t_got = pallas_first_triangle_hit_by_ray(origins, directions, tv)
    idx_exp, t_exp = first_triangle_hit_by_ray(origins, directions, tv)
    np.testing.assert_array_equal(np.asarray(idx_got), np.asarray(idx_exp))
    chex.assert_trees_all_close(t_got, t_exp, atol=1e-6)


def test_closest_hit_active_mask(box_rays) -> None:
    mesh, origins, directions = box_rays
    tv = mesh.triangle_vertices
    active = jnp.arange(mesh.num_triangles) % 3 != 0
    idx_got, t_got = pallas_first_triangle_hit_by_ray(
        origins, directions, tv, active
    )
    idx_exp, t_exp = first_triangle_hit_by_ray(origins, directions, tv, active)
    np.testing.assert_array_equal(np.asarray(idx_got), np.asarray(idx_exp))
    chex.assert_trees_all_close(t_got, t_exp, atol=1e-6)


def test_many_triangles_multi_tile() -> None:
    # More triangles than one tile (TILE_T = 512) exercises the grid
    # accumulation across triangle tiles.
    key = jax.random.key(3)
    meshes = [Mesh.box(1.0 + 0.1 * i, 1.0, 1.0, with_top=True) for i in range(60)]
    mesh = meshes[0]
    for m in meshes[1:]:
        mesh = mesh + m
    assert mesh.num_triangles > 512
    origins = jax.random.uniform(key, (64, 3), minval=-0.3, maxval=0.3)
    directions = fibonacci_lattice(64) * 3.0
    tv = mesh.triangle_vertices
    idx_got, t_got = pallas_first_triangle_hit_by_ray(origins, directions, tv)
    idx_exp, t_exp = first_triangle_hit_by_ray(origins, directions, tv)
    chex.assert_trees_all_close(t_got, t_exp, atol=1e-5)
    # This mesh stacks many exactly-coincident wall triangles, so the
    # chosen index may legitimately differ between tie-breaking orders; the
    # chosen triangle must be an actual hit at the same distance.
    from differt_tpu.rt import ray_intersect_triangle

    t_direct, hit_direct = ray_intersect_triangle(
        origins, directions, tv[idx_got.clip(min=0)]
    )
    valid = np.asarray(idx_got) >= 0
    assert np.asarray(hit_direct)[valid].all()
    chex.assert_trees_all_close(
        t_direct[valid], t_got[valid], atol=1e-5
    )


class TestMXUWoopPrototype:
    """The Woop/MXU closest-hit prototype must agree with the VPU kernels."""

    def test_matches_reference_scan(self) -> None:
        import jax
        from differt_tpu.ops._mxu_mt import mxu_first_triangle_hit_by_ray
        from differt_tpu.rt import first_triangle_hit_by_ray
        from differt_tpu.scenes import street_canyon_scene

        key = jax.random.key(7)
        tv = street_canyon_scene().mesh.triangle_vertices
        k1, k2 = jax.random.split(key)
        o = jax.random.uniform(k1, (513, 3), minval=-40.0, maxval=40.0)
        o = o.at[:, 2].set(jnp.abs(o[:, 2]) + 1.0)
        d = jax.random.normal(k2, (513, 3)) * 30.0
        active = (jnp.arange(tv.shape[0]) % 5) != 2

        i_m, t_m = mxu_first_triangle_hit_by_ray(o, d, tv, active, ray_chunk=128)
        i_x, t_x = first_triangle_hit_by_ray(o, d, tv, active, batch_size=64)
        i_m, t_m, i_x, t_x = map(np.asarray, (i_m, t_m, i_x, t_x))
        # Allow coincident-surface ties (equal-distance, both active), as
        # in the smoke matrix.
        same = i_m == i_x
        tie = (
            np.isfinite(t_m)
            & np.isfinite(t_x)
            & (np.abs(t_m - t_x) <= 1e-5 + 1e-4 * np.abs(t_x))
        )
        assert np.all(same | tie)
        np.testing.assert_allclose(
            np.where(np.isfinite(t_m), t_m, -1.0),
            np.where(np.isfinite(t_x), t_x, -1.0),
            rtol=1e-4,
            atol=1e-4,
        )
