"""Allclose vs the reference: geometry utils + ray-tracing kernels.

Each test calls this repo's function and the reference's function
(imported in place from ``/root/reference/differt/src``) on identical
inputs and asserts the outputs match. Oracle functions:
``differt/geometry/_utils.py`` (vectors, lattice, frustum, MT kernels)
and ``differt/geometry/_solver_image_method.py``.
"""

import chex
import jax
import jax.numpy as jnp
import pytest

import differt_tpu.geometry as g
import differt_tpu.rt as rt
from tests.utils import corridor_setup


@pytest.fixture
def key():
    return jax.random.key(1234)


def test_normalize(ref, key):
    vecs = jax.random.normal(key, (64, 3))
    vecs = vecs.at[0].set(0.0)  # zero-safe branch
    mine, mine_len = g.normalize(vecs)
    theirs, theirs_len = ref["geometry_utils"].normalize(vecs)
    chex.assert_trees_all_close(mine, theirs, rtol=1e-6)
    chex.assert_trees_all_close(mine_len, theirs_len, rtol=1e-6)
    mine_k = g.normalize(vecs, keepdims=True)[1]
    theirs_k = ref["geometry_utils"].normalize(vecs, keepdims=True)[1]
    chex.assert_trees_all_close(mine_k, theirs_k, rtol=1e-6)


def test_perpendicular_vector_and_basis(ref, key):
    vecs = g.normalize(jax.random.normal(key, (128, 3)))[0]
    chex.assert_trees_all_close(
        g.perpendicular_vector(vecs),
        ref["geometry_utils"].perpendicular_vector(vecs),
        rtol=1e-6,
        atol=1e-7,
    )
    mine_u, mine_v = g.orthogonal_basis(vecs)
    theirs_u, theirs_v = ref["geometry_utils"].orthogonal_basis(vecs)
    chex.assert_trees_all_close(mine_u, theirs_u, rtol=1e-6, atol=1e-7)
    chex.assert_trees_all_close(mine_v, theirs_v, rtol=1e-6, atol=1e-7)


def test_path_length(ref, key):
    paths = jax.random.normal(key, (10, 5, 3))
    chex.assert_trees_all_close(
        g.path_length(paths), ref["geometry_utils"].path_length(paths), rtol=1e-6
    )


@pytest.mark.parametrize("axis", ["x", "y", "z"])
def test_rotation_matrices(ref, key, axis):
    angles = jax.random.uniform(key, (7,), minval=-3.0, maxval=3.0)
    mine_fn = getattr(g, f"rotation_matrix_along_{axis}_axis")
    theirs_fn = getattr(ref["geometry_utils"], f"rotation_matrix_along_{axis}_axis")
    for a in angles:
        chex.assert_trees_all_close(mine_fn(a), theirs_fn(a), rtol=1e-6, atol=1e-7)


def test_rotation_matrix_along_axis(ref, key):
    k1, k2 = jax.random.split(key)
    axis = g.normalize(jax.random.normal(k1, (3,)))[0]
    angle = jax.random.uniform(k2, (), minval=-3.0, maxval=3.0)
    chex.assert_trees_all_close(
        g.rotation_matrix_along_axis(angle, axis),
        ref["geometry_utils"].rotation_matrix_along_axis(angle, axis),
        rtol=1e-6,
        atol=1e-6,
    )


def test_spherical_roundtrip(ref, key):
    vecs = jax.random.normal(key, (50, 3))
    chex.assert_trees_all_close(
        g.cartesian_to_spherical(vecs),
        ref["geometry_utils"].cartesian_to_spherical(vecs),
        rtol=1e-5,
        atol=1e-6,
    )
    sph = ref["geometry_utils"].cartesian_to_spherical(vecs)
    chex.assert_trees_all_close(
        g.spherical_to_cartesian(sph),
        ref["geometry_utils"].spherical_to_cartesian(sph),
        rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.parametrize("n", [17, 1000, 2**20 + 3])
def test_fibonacci_lattice(ref, n):
    # Both sides fight float32 rounding in frac(i/phi), with *different*
    # precision schemes (Fibonacci-ladder reduction here vs the reference's
    # power-of-two mixed radix, _utils.py:426-462). The reference's own
    # quantization error reaches ~6e-5 of a turn (its final mod-1 operates on
    # sums up to ~540, whose float32 ulp is 2^-15), so agreement beyond
    # ~4e-4 rad of azimuth is not meaningful; tests/test_lattice.py pins the
    # tighter bar of absolute accuracy vs the exact float64 formula instead.
    chex.assert_trees_all_close(
        g.fibonacci_lattice(n),
        ref["geometry_utils"].fibonacci_lattice(n),
        rtol=1e-4,
        atol=1e-3,
    )


def test_fibonacci_lattice_frustum(ref, key):
    frustum = jnp.array([[0.3, -1.1], [1.2, 0.9]])
    chex.assert_trees_all_close(
        g.fibonacci_lattice(500, frustum=frustum),
        ref["geometry_utils"].fibonacci_lattice(500, frustum=frustum),
        rtol=1e-4,
        atol=1e-3,
    )


def test_viewing_frustum(ref, key):
    k1, k2 = jax.random.split(key)
    viewer = jax.random.normal(k1, (3,)) * 0.1
    world = jax.random.normal(k2, (200, 3)) * 5.0 + jnp.array([10.0, 0.0, 0.0])
    chex.assert_trees_all_close(
        g.viewing_frustum(viewer, world),
        ref["geometry_utils"].viewing_frustum(viewer, world),
        rtol=1e-5,
        atol=1e-5,
    )


def test_assemble_path(ref, key):
    k1, k2, k3 = jax.random.split(key, 3)
    start = jax.random.normal(k1, (4, 1, 3))
    mid = jax.random.normal(k2, (4, 6, 5, 3))
    end = jax.random.normal(k3, (6, 3))
    chex.assert_trees_all_close(
        g.assemble_path(start, mid, end),
        ref["geometry_utils"].assemble_path(start, mid, end),
    )


def test_min_distance_between_cells(ref, key):
    k1, k2 = jax.random.split(key)
    verts = jax.random.normal(k1, (40, 3))
    ids = jax.random.randint(k2, (40,), 0, 5)
    chex.assert_trees_all_close(
        g.min_distance_between_cells(verts, ids),
        ref["geometry_utils"].min_distance_between_cells(verts, ids),
        rtol=1e-6,
    )


def _random_soup(key, num_triangles: int = 64, spread: float = 2.0):
    k1, k2 = jax.random.split(key)
    centers = jax.random.normal(k1, (num_triangles, 1, 3)) * spread
    offsets = jax.random.normal(k2, (num_triangles, 3, 3)) * 0.7
    return centers + offsets


class TestRayIntersectTriangle:
    def test_hard(self, ref, key):
        k1, k2, k3 = jax.random.split(key, 3)
        tris = _random_soup(k1, 256)
        origins = jax.random.normal(k2, (256, 3)) * 3.0
        directions = jax.random.normal(k3, (256, 3)) * 4.0
        t_mine, hit_mine = rt.ray_intersect_triangle(origins, directions, tris)
        t_ref, hit_ref = ref["geometry_utils"].ray_intersect_triangle(
            origins, directions, tris
        )
        chex.assert_trees_all_equal(hit_mine, hit_ref)
        chex.assert_trees_all_close(t_mine, t_ref, rtol=1e-5, atol=1e-5)

    def test_epsilon(self, ref, key):
        k1, k2, k3 = jax.random.split(key, 3)
        tris = _random_soup(k1, 128)
        origins = jax.random.normal(k2, (128, 3)) * 3.0
        directions = jax.random.normal(k3, (128, 3)) * 4.0
        for epsilon in (1e-2, -1e-2):
            _, hit_mine = rt.ray_intersect_triangle(
                origins, directions, tris, epsilon=epsilon
            )
            _, hit_ref = ref["geometry_utils"].ray_intersect_triangle(
                origins, directions, tris, epsilon=epsilon
            )
            chex.assert_trees_all_equal(hit_mine, hit_ref)

    def test_smoothed(self, ref, key):
        k1, k2, k3 = jax.random.split(key, 3)
        tris = _random_soup(k1, 128)
        origins = jax.random.normal(k2, (128, 3)) * 3.0
        directions = jax.random.normal(k3, (128, 3)) * 4.0
        t_mine, hit_mine = rt.ray_intersect_triangle(
            origins, directions, tris, smoothing_factor=10.0
        )
        t_ref, hit_ref = ref["geometry_utils"].ray_intersect_triangle(
            origins, directions, tris, smoothing_factor=10.0
        )
        chex.assert_trees_all_close(hit_mine, hit_ref, rtol=1e-5, atol=1e-5)
        chex.assert_trees_all_close(t_mine, t_ref, rtol=1e-5, atol=1e-5)


class TestScanKernels:
    @pytest.fixture
    def scene_soup(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        tris = _random_soup(k1, 100)
        origins = jax.random.normal(k2, (64, 3)) * 3.0
        directions = jax.random.normal(k3, (64, 3)) * 4.0
        return tris, origins, directions

    @pytest.mark.parametrize("batch_size", [16, 512])
    def test_any_triangle_hard(self, ref, scene_soup, batch_size):
        tris, origins, directions = scene_soup
        mine = rt.ray_intersect_any_triangle(
            origins, directions, tris, batch_size=batch_size
        )
        theirs = ref["geometry_utils"].ray_intersect_any_triangle(
            origins, directions, tris, batch_size=batch_size
        )
        chex.assert_trees_all_equal(mine, theirs)

    def test_any_triangle_active_mask(self, ref, scene_soup, key):
        tris, origins, directions = scene_soup
        active = jax.random.bernoulli(key, 0.6, (tris.shape[0],))
        mine = rt.ray_intersect_any_triangle(origins, directions, tris, active)
        theirs = ref["geometry_utils"].ray_intersect_any_triangle(
            origins, directions, tris, active
        )
        chex.assert_trees_all_equal(mine, theirs)

    def test_any_triangle_smoothed(self, ref, scene_soup):
        tris, origins, directions = scene_soup
        mine = rt.ray_intersect_any_triangle(
            origins, directions, tris, smoothing_factor=5.0
        )
        theirs = ref["geometry_utils"].ray_intersect_any_triangle(
            origins, directions, tris, smoothing_factor=5.0
        )
        chex.assert_trees_all_close(mine, theirs, rtol=1e-5, atol=1e-5)

    def test_first_triangle_hit(self, ref, scene_soup):
        tris, origins, directions = scene_soup
        idx_mine, t_mine = rt.first_triangle_hit_by_ray(origins, directions, tris)
        idx_ref, t_ref = ref["geometry_utils"].first_triangle_hit_by_ray(
            origins, directions, tris
        )
        chex.assert_trees_all_equal(idx_mine, idx_ref)
        chex.assert_trees_all_close(t_mine, t_ref, rtol=1e-5, atol=1e-5)

    def test_triangles_visible_from_vertex(self, ref, key):
        tris = _random_soup(key, 48, spread=3.0)
        vertex = jnp.array([0.0, 0.0, 0.0])
        mine = rt.triangles_visible_from_vertex(vertex, tris, num_rays=4000)
        theirs = ref["geometry_utils"].triangles_visible_from_vertex(
            vertex, tris, num_rays=4000
        )
        chex.assert_trees_all_equal(mine, theirs)


class TestImageMethod:
    def test_corridor(self, ref):
        setup = corridor_setup()
        mine = rt.image_method(
            setup.from_vertices,
            setup.to_vertices,
            setup.mirror_vertices,
            setup.mirror_normals,
        )
        theirs = ref["image_method"].image_method(
            setup.from_vertices,
            setup.to_vertices,
            setup.mirror_vertices,
            setup.mirror_normals,
        )
        chex.assert_trees_all_close(mine, theirs, rtol=1e-6, atol=1e-6)

    def test_random_batch(self, ref, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        from_v = jax.random.normal(k1, (32, 3))
        to_v = jax.random.normal(k2, (32, 3))
        mv = jax.random.normal(k3, (32, 3, 3)) * 2.0
        mn = g.normalize(jax.random.normal(k4, (32, 3, 3)))[0]
        mine = rt.image_method(from_v, to_v, mv, mn)
        theirs = ref["image_method"].image_method(from_v, to_v, mv, mn)
        chex.assert_trees_all_close(mine, theirs, rtol=2e-4, atol=2e-4)

    def test_image_of_vertex(self, ref, key):
        k1, k2, k3 = jax.random.split(key, 3)
        v = jax.random.normal(k1, (16, 3))
        mv = jax.random.normal(k2, (16, 3))
        mn = g.normalize(jax.random.normal(k3, (16, 3)))[0]
        chex.assert_trees_all_close(
            rt.image_of_vertex_with_respect_to_mirror(v, mv, mn),
            ref["image_method"].image_of_vertex_with_respect_to_mirror(v, mv, mn),
            rtol=1e-6,
            atol=1e-6,
        )

    def test_intersection_of_ray_with_plane(self, ref, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        origins = jax.random.normal(k1, (16, 3))
        directions = jax.random.normal(k2, (16, 3))
        pv = jax.random.normal(k3, (16, 3))
        pn = g.normalize(jax.random.normal(k4, (16, 3)))[0]
        chex.assert_trees_all_close(
            rt.intersection_of_ray_with_plane(origins, directions, pv, pn),
            ref["image_method"].intersection_of_ray_with_plane(
                origins, directions, pv, pn
            ),
            rtol=1e-4,
            atol=1e-4,
        )

    @pytest.mark.parametrize("smoothing_factor", [None, 4.0])
    def test_same_side_of_mirror(self, ref, key, smoothing_factor):
        k1, k2, k3 = jax.random.split(key, 3)
        vertices = jax.random.normal(k1, (16, 5, 3))
        mv = jax.random.normal(k2, (16, 3, 3))
        mn = g.normalize(jax.random.normal(k3, (16, 3, 3)))[0]
        mine = rt.consecutive_vertices_are_on_same_side_of_mirror(
            vertices, mv, mn, smoothing_factor=smoothing_factor
        )
        theirs = ref["image_method"].consecutive_vertices_are_on_same_side_of_mirror(
            vertices, mv, mn, smoothing_factor=smoothing_factor
        )
        if smoothing_factor is None:
            chex.assert_trees_all_equal(mine, theirs)
        else:
            chex.assert_trees_all_close(mine, theirs, rtol=1e-5, atol=1e-5)


class TestSharedUtils:
    def test_safe_divide(self, ref, key):
        k1, k2 = jax.random.split(key)
        num = jax.random.normal(k1, (32,))
        den = jax.random.normal(k2, (32,)).at[:8].set(0.0)
        from differt_tpu.utils import safe_divide

        chex.assert_trees_all_close(
            safe_divide(num, den), ref["utils"].safe_divide(num, den), rtol=1e-6
        )

    def test_smoothing_function(self, ref, key):
        x = jax.random.normal(key, (32,)) * 3.0
        from differt_tpu.utils import smoothing_function

        chex.assert_trees_all_close(
            smoothing_function(x, 2.5),
            ref["utils"].smoothing_function(x, 2.5),
            rtol=1e-6,
        )
