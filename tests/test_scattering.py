"""Tests for diffuse scattering paths and effective-roughness fields."""

import jax
import chex
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.coverage import power_map
from differt_tpu.em import InteractionType, z_0
from differt_tpu.geometry import Mesh, Scene
from differt_tpu.rt import (
    ScatteringPathTracer,
    scattering_amplitudes,
    triangle_sample_points,
)

FREQUENCY = 2.4e9
ETA_R = jnp.array([5.24])
CONDUCTIVITY = jnp.array([0.1])


@pytest.fixture
def ground_scene() -> Scene:
    mesh = Mesh.plane(
        jnp.array([0.0, 0.0, 0.0]),
        normal=jnp.array([0.0, 0.0, 1.0]),
        side_length=20.0,
    ).set_materials("Concrete")
    return Scene(
        transmitters=jnp.array([[-3.0, 0.0, 2.0]]),
        receivers=jnp.array([[3.0, 0.0, 2.0]]),
        mesh=mesh,
    )


class TestSamplePoints:
    def test_centroid(self) -> None:
        tv = jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
        pts, w = triangle_sample_points(tv, 1)
        np.testing.assert_allclose(
            np.asarray(pts)[0, 0], [1 / 3, 1 / 3, 0.0], atol=1e-6
        )
        np.testing.assert_allclose(float(w[0, 0]), 0.5, atol=1e-6)

    def test_many_samples_inside_and_weighted(self) -> None:
        tv = jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
        pts, w = triangle_sample_points(tv, 32)
        p = np.asarray(pts)[0]
        assert ((p[:, 0] >= 0) & (p[:, 1] >= 0) & (p[:, 0] + p[:, 1] <= 1)).all()
        np.testing.assert_allclose(float(w.sum()), 0.5, atol=1e-6)


class TestScatteringTracer:
    def test_paths_shape_and_types(self, ground_scene: Scene) -> None:
        paths = ground_scene.trace_scattering_paths(num_samples=4)
        num_tri = ground_scene.mesh.num_triangles
        assert paths.mask.shape == (1, 1, 4 * num_tri)
        assert (
            np.asarray(paths.interaction_types)
            == int(InteractionType.SCATTERING)
        ).all()
        assert int(paths.mask.sum()) == 4 * num_tri  # all visible

    def test_backside_invalid(self, ground_scene: Scene) -> None:
        import differt_tpu.treekit as tk

        below = tk.tree_at(
            lambda s: s.receivers, ground_scene, jnp.array([[3.0, 0.0, -2.0]])
        )
        paths = below.trace_scattering_paths()
        assert int(paths.mask.sum()) == 0

    def test_blockage(self) -> None:
        ground = Mesh.plane(
            jnp.array([0.0, 0.0, 0.0]),
            normal=jnp.array([0.0, 0.0, 1.0]),
            side_length=4.0,
        )
        # A wide slab fully covering the ground patch, between it and TX/RX.
        lid = Mesh.plane(
            jnp.array([0.0, 0.0, 1.0]),
            normal=jnp.array([0.0, 0.0, 1.0]),
            side_length=40.0,
        )
        scene = Scene(
            transmitters=jnp.array([[-3.0, 0.0, 2.0]]),
            receivers=jnp.array([[3.0, 0.0, 2.0]]),
            mesh=ground + lid,
        )
        paths = scene.trace_scattering_paths()
        tri = np.asarray(paths.objects[..., 1]).ravel()
        mask = np.asarray(paths.mask).ravel()
        # Ground triangles (0, 1) are occluded by the lid.
        assert not mask[tri < 2].any()


class TestScatteringAmplitudes:
    def _amp(self, scene, paths, **kwargs):
        return scattering_amplitudes(
            paths,
            scene,
            FREQUENCY,
            eta_r=ETA_R,
            conductivity=CONDUCTIVITY,
            **kwargs,
        )

    def test_lambertian_cosine_shape(self) -> None:
        """Power ratio between two RX follows the Lambertian cos(theta_s)."""
        import differt_tpu.treekit as tk

        mesh = Mesh.plane(
            jnp.array([0.0, 0.0, 0.0]),
            normal=jnp.array([0.0, 0.0, 1.0]),
            side_length=0.2,
        ).set_materials("Concrete")
        r = 10.0
        theta_a, theta_b = 0.0, 1.0
        scene = Scene(
            transmitters=jnp.array([[0.0, 0.0, 5.0]]),  # normal incidence
            receivers=jnp.array(
                [
                    [r * np.sin(theta_a), 0.0, r * np.cos(theta_a)],
                    [r * np.sin(theta_b), 0.0, r * np.cos(theta_b)],
                ]
            ),
            mesh=mesh,
        )
        paths = scene.trace_scattering_paths()
        a = self._amp(scene, paths, scattering_coefficient=1.0)
        p = np.asarray(jnp.sum(jnp.abs(a) ** 2, axis=-1)).ravel()
        # Both RX at the same distance from the (tiny) patch: the power
        # ratio is cos(theta_b)/cos(theta_a).
        np.testing.assert_allclose(p[1] / p[0], np.cos(theta_b), rtol=5e-3)

    def test_directive_peaks_at_specular(self) -> None:
        mesh = Mesh.plane(
            jnp.array([0.0, 0.0, 0.0]),
            normal=jnp.array([0.0, 0.0, 1.0]),
            side_length=0.2,
        ).set_materials("Concrete")
        r = 10.0
        # 45-degree incidence; specular direction is +x at 45 degrees.
        scene = Scene(
            transmitters=jnp.array([[-5.0, 0.0, 5.0]]),
            receivers=jnp.array(
                [
                    [r / np.sqrt(2), 0.0, r / np.sqrt(2)],  # specular
                    [0.0, 0.0, r],  # normal
                    [-r / np.sqrt(2), 0.0, r / np.sqrt(2)],  # backscatter
                ]
            ),
            mesh=mesh,
        )
        paths = scene.trace_scattering_paths()
        a = self._amp(scene, paths, scattering_coefficient=1.0, alpha_r=6)
        p = np.asarray(jnp.sum(jnp.abs(a) ** 2, axis=-1)).ravel()
        assert p[0] > p[1] > p[2]

    def test_scattered_much_weaker_than_specular(self, ground_scene: Scene) -> None:
        base = power_map(ground_scene, FREQUENCY, order=1)
        both = power_map(
            ground_scene,
            FREQUENCY,
            order=1,
            with_scattering=True,
            scattering_coefficient=0.3,
        )
        assert float(both.sum()) > float(base.sum())
        # S=0.3 scattering from a ground patch is far below the specular.
        assert float((both - base).sum()) < 0.3 * float(base.sum())

    @pytest.mark.slow
    def test_grad_wrt_scattering_coefficient(self, ground_scene: Scene) -> None:
        paths = ground_scene.trace_scattering_paths(num_samples=4)

        def total_power(s):
            a = self._amp(
                ground_scene, paths, scattering_coefficient=s, num_samples=4
            )
            return jnp.sum(jnp.abs(a) ** 2) / z_0

        value, grad = jax.value_and_grad(total_power)(0.4)
        assert value > 0.0
        assert bool(jnp.isfinite(grad))
        # Power scales as S^2 -> d/dS = 2 P / S.
        np.testing.assert_allclose(float(grad), 2 * float(value) / 0.4, rtol=1e-4)


class TestEnergyConservation:
    def test_zero_coefficient_matches_plain_power_map(self, ground_scene: Scene) -> None:
        """S=0: no scattered field and no specular reduction."""
        base = power_map(ground_scene, FREQUENCY, order=1)
        with_s0 = power_map(
            ground_scene,
            FREQUENCY,
            order=1,
            with_scattering=True,
            scattering_coefficient=0.0,
        )
        chex.assert_trees_all_close(with_s0, base, rtol=1e-6)

    def test_specular_reduced_by_one_minus_s_squared(self, ground_scene: Scene) -> None:
        """The specular part of the map scales by (1 - S^2) per bounce.

        Scattered power is incoherent and separable: map(S) - S^2-scaled
        scatter equals (1 - S^2) * map(0) for a single-bounce scene.
        """
        base = power_map(ground_scene, FREQUENCY, order=1, coherent=False)

        def total(s):
            return power_map(
                ground_scene,
                FREQUENCY,
                order=1,
                coherent=False,
                with_scattering=True,
                scattering_coefficient=s,
            )

        s1, s2 = 0.3, 0.6
        # scattered(S) = S^2 * scattered_unit; recover it at s1, predict s2.
        scattered_unit = (total(s1) - (1.0 - s1**2) * base) / s1**2
        expected = (1.0 - s2**2) * base + s2**2 * scattered_unit
        chex.assert_trees_all_close(total(s2), expected, rtol=1e-3, atol=1e-18)
