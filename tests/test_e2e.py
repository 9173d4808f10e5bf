"""End-to-end two-ray model (BASELINE config 1).

A single ground plane, one TX, a line of RX positions: trace LOS + one
ground reflection, compose the EM pipeline into received power, and check
against the textbook two-ray formula (computed independently here). Then
check autodiff gradients of the power map against finite differences.
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.coverage import complex_amplitudes, received_power
from differt_tpu.em import c, epsilon_0, reflection_coefficients, z_0
from differt_tpu.geometry import Mesh, Scene
from differt_tpu.plugins import deepmimo

FREQUENCY = 2.4e9
TX = jnp.array([0.0, 0.0, 10.0])

ETA_R = jnp.array([5.24])  # Concrete at 2.4 GHz (b = 0).
SIGMA = jnp.array([0.0462 * 2.4**0.7822])


def make_scene(rx):
    ground = Mesh.plane(
        jnp.zeros(3), normal=jnp.array([0.0, 0.0, 1.0]), side_length=2000.0
    ).set_materials("Concrete")
    return Scene(transmitters=TX, receivers=rx, mesh=ground)


def analytic_two_ray(rx: np.ndarray) -> float:
    """Independent two-ray power (V-pol, isotropic, coherent)."""
    tx = np.asarray(TX)
    d_los = np.linalg.norm(rx - tx)
    # Image of TX under the ground plane.
    tx_image = tx * np.array([1.0, 1.0, -1.0])
    d_ref = np.linalg.norm(rx - tx_image)
    k_wave = 2 * np.pi * FREQUENCY / c
    wavelength = c / FREQUENCY

    # Vertical polarization: the E field lies in the plane of incidence
    # (p polarization for the ground reflection).
    n_sq = ETA_R[0] - 1j * SIGMA[0] / (2 * np.pi * FREQUENCY * epsilon_0)
    n = np.sqrt(complex(n_sq))
    # Grazing geometry: cos(theta_i) w.r.t. ground normal.
    cos_theta = (tx[2] + rx[2]) / d_ref
    _, r_p = reflection_coefficients(complex(n), float(cos_theta))
    r_p = complex(r_p)

    # Antenna pattern factor: the V-pol TX excites theta_hat; the projection
    # onto the receiver's V-pol is cos of the angle between theta frames =
    # theta_hat(k) . theta_hat(-k) which equals -1 up to the pattern terms;
    # for this test TX and RX are at different heights so evaluate exactly.
    def vpol_factor(k):
        # theta_hat(k) . theta_hat_of(-k): both evaluated from the formula.
        def theta_hat(v):
            v = v / np.linalg.norm(v)
            theta = np.arccos(np.clip(v[2], -1, 1))
            phi = np.arctan2(v[1], v[0])
            return np.array([
                np.cos(theta) * np.cos(phi),
                np.cos(theta) * np.sin(phi),
                -np.sin(theta),
            ])

        return float(np.dot(theta_hat(k), theta_hat(-k)))

    a_los = vpol_factor(rx - tx) / d_los * np.exp(-1j * k_wave * d_los)
    # Reflected path: p-pol coefficient applies along the whole V branch.
    a_ref = (
        vpol_factor(rx - tx_image) * r_p / d_ref * np.exp(-1j * k_wave * d_ref)
    )
    a = (a_los + a_ref) * wavelength / (4 * np.pi)
    return float(np.abs(a) ** 2 / z_0)


@pytest.mark.parametrize("x", [30.0, 100.0, 300.0])
def test_two_ray_power_matches_analytic(x: float) -> None:
    rx = jnp.array([x, 0.0, 1.5])
    scene = make_scene(rx)

    los = scene.trace_paths(order=0)
    reflection = scene.trace_paths(order=1)
    assert bool(los.mask.all())
    assert int(reflection.num_valid_paths) >= 1

    a = jnp.concatenate(
        [
            complex_amplitudes(
                p, scene, FREQUENCY, eta_r=ETA_R, conductivity=SIGMA
            ).reshape(-1)
            for p in (los, reflection)
        ]
    )
    power = float(jnp.abs(a.sum()) ** 2 / z_0)
    expected = analytic_two_ray(np.array([x, 0.0, 1.5]))
    assert power == pytest.approx(expected, rel=2e-2)


def test_reflection_point_matches_image_solution() -> None:
    rx = jnp.array([100.0, 0.0, 1.5])
    scene = make_scene(rx)
    paths = scene.trace_paths(order=1).masked()
    bounce = np.asarray(paths.vertices[0, 1, :])
    # Analytic specular point: x* = x_rx * h_tx / (h_tx + h_rx).
    x_star = 100.0 * 10.0 / (10.0 + 1.5)
    np.testing.assert_allclose(bounce, [x_star, 0.0, 0.0], atol=1e-3)


def test_power_gradient_matches_finite_differences() -> None:
    def power_at(x):
        rx = jnp.array([x, 0.0, 1.5])
        scene = make_scene(rx)
        paths = scene.trace_paths(order=1)
        return received_power(
            paths, scene, FREQUENCY, eta_r=ETA_R, conductivity=SIGMA
        ).reshape(())

    x0 = 80.0
    g = jax.grad(power_at)(jnp.asarray(x0))
    eps = 1e-3
    fd = (power_at(jnp.asarray(x0 + eps)) - power_at(jnp.asarray(x0 - eps))) / (
        2 * eps
    )
    # Loose tolerance: power values are ~1e-10 W here, so the float32
    # central difference itself carries a few percent of noise.
    chex.assert_trees_all_close(g, fd, rtol=1e-1)
    assert float(jnp.abs(g)) > 0.0


def test_permittivity_gradient_is_finite_and_nonzero() -> None:
    rx = jnp.array([60.0, 0.0, 1.5])
    scene = make_scene(rx)
    paths = scene.trace_paths(order=1)

    def power_of_eps(eta_r):
        return received_power(
            paths, scene, FREQUENCY, eta_r=eta_r, conductivity=SIGMA
        ).reshape(())

    g = jax.grad(power_of_eps)(ETA_R)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_deepmimo_export_two_ray() -> None:
    rx = jnp.array([50.0, 0.0, 1.5])
    scene = make_scene(rx)
    paths = [scene.trace_paths(order=0), scene.trace_paths(order=1)]
    out = deepmimo.export(paths=paths, scene=scene, frequency=FREQUENCY)
    assert out.num_tx == 1
    assert out.num_rx == 1
    assert out.num_paths == 1 + 2  # LOS + 2 triangle candidates.
    valid = np.asarray(out.mask[0, 0])
    powers = np.asarray(out.power[0, 0])
    delays = np.asarray(out.delay[0, 0])
    assert valid.sum() == 2  # LOS + one reflection.
    d_los = float(jnp.linalg.norm(rx - TX))
    assert delays[0] == pytest.approx(d_los / c, rel=1e-5)
    # FSPL sanity: LOS power in a plausible dB range.
    assert -120 < powers[0] < -30
