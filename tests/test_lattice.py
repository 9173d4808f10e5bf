"""Tests for the Fibonacci lattice and viewing frustum."""

import chex
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.geometry import (
    cartesian_to_spherical,
    fibonacci_lattice,
    viewing_frustum,
)


class TestFibonacciLattice:
    def test_unit_vectors(self) -> None:
        xyz = fibonacci_lattice(1000)
        chex.assert_trees_all_close(
            jnp.linalg.norm(xyz, axis=-1), jnp.ones(1000), atol=1e-5
        )

    def test_uniformity(self) -> None:
        # Each octant receives roughly 1/8 of the points.
        xyz = np.asarray(fibonacci_lattice(8000))
        for sx in (1, -1):
            for sy in (1, -1):
                for sz in (1, -1):
                    count = (
                        (np.sign(xyz[:, 0]) == sx)
                        & (np.sign(xyz[:, 1]) == sy)
                        & (np.sign(xyz[:, 2]) == sz)
                    ).sum()
                    assert 800 < count < 1200

    def test_large_n_precision(self) -> None:
        # The mixed-radix decomposition of (i / phi) mod 1 preserves float32
        # precision for very large i: azimuths in the tail must not collapse
        # onto a handful of values (the "hatching" artifact).
        n = 2**24
        xyz = fibonacci_lattice(n)[-10_000:]
        azimuths = np.asarray(jnp.arctan2(xyz[:, 1], xyz[:, 0]))
        unique = len(np.unique(np.round(azimuths, 4)))
        assert unique > 9000

    def test_invalid_args(self) -> None:
        with pytest.raises(ValueError, match="strictly positive"):
            fibonacci_lattice(0)
        with pytest.raises(ValueError, match="floating dtype"):
            fibonacci_lattice(10, dtype=jnp.int32)

    def test_golden_fraction_absolute_accuracy(self) -> None:
        # The Fibonacci-ladder reduction must track the exact float64 value
        # of frac(i/phi) to ~1e-6 across the whole index range — a far
        # stronger bar than parity with any other float32 implementation
        # (whose own quantization is ~6e-5 at large i).
        from differt_tpu.geometry._lattice import _INV_PHI, _golden_fractions

        n = 2**22 + 5
        idx = np.arange(0, n, 97, dtype=np.float64)
        exact = (idx * _INV_PHI) % 1.0
        mine = np.asarray(_golden_fractions(jnp.asarray(idx, dtype=jnp.float32)))
        circular = np.abs(mine - exact)
        circular = np.minimum(circular, 1.0 - circular)
        assert circular.max() < 2e-6

    def test_frustum_restriction(self) -> None:
        frustum = jnp.array([
            [0.0, 0.25 * jnp.pi, -0.3],
            [1.0, 0.5 * jnp.pi, 0.7],
        ])
        xyz = fibonacci_lattice(500, frustum=frustum)
        rpa = cartesian_to_spherical(xyz)
        p, a = np.asarray(rpa[:, 1]), np.asarray(rpa[:, 2])
        assert (p >= 0.25 * np.pi - 1e-4).all()
        assert (p <= 0.5 * np.pi + 1e-4).all()
        assert (a >= -0.3 - 1e-4).all()
        assert (a <= 0.7 + 1e-4).all()


class TestViewingFrustum:
    def test_contains_all_points(self, key) -> None:
        import jax

        viewer = jnp.zeros(3)
        world = jax.random.uniform(key, (200, 3), minval=1.0, maxval=3.0)
        frustum = viewing_frustum(viewer, world)
        rpa = cartesian_to_spherical(world)
        lo, hi = np.asarray(frustum[0]), np.asarray(frustum[1])
        vals = np.asarray(rpa)
        assert (vals >= lo - 1e-5).all()
        assert (vals <= hi + 1e-5).all()

    def test_azimuth_wraparound(self) -> None:
        # Points straddling the +-pi azimuth seam: the frustum must use the
        # narrow wrapped interval (span ~20 deg), not ~340 deg.
        a = jnp.deg2rad(jnp.array([170.0, -170.0, 175.0, -175.0]))
        world = jnp.stack(
            (jnp.cos(a), jnp.sin(a), jnp.zeros_like(a)), axis=-1
        ) * 2.0
        frustum = viewing_frustum(jnp.zeros(3), world)
        width = float(frustum[1, 2] - frustum[0, 2])
        assert width < jnp.deg2rad(30.0)

    def test_full_circle_fallback(self, key) -> None:
        import jax

        # Points all around the viewer: azimuth must fall back to [-pi, pi].
        angles = jnp.linspace(-jnp.pi, jnp.pi, 64, endpoint=False)
        world = jnp.stack(
            (jnp.cos(angles), jnp.sin(angles), jnp.zeros_like(angles)), axis=-1
        )
        frustum = viewing_frustum(jnp.zeros(3), world)
        width = float(frustum[1, 2] - frustum[0, 2])
        assert width == pytest.approx(2 * np.pi, rel=1e-5)

    def test_batched(self, key) -> None:
        import jax

        viewers = jax.random.normal(key, (5, 3))
        world = jax.random.uniform(key, (5, 50, 3), minval=2.0, maxval=4.0)
        frustum = viewing_frustum(viewers, world)
        assert frustum.shape == (5, 2, 3)
