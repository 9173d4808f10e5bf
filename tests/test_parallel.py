"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.coverage import power_map
from differt_tpu.geometry import Mesh, Scene
from differt_tpu.parallel import (
    make_device_mesh,
    sharded_power_map,
    sharded_trace_paths,
    training_step,
)

FREQUENCY = 2.4e9


@pytest.fixture(scope="module")
def scene() -> Scene:
    mesh = Mesh.box(length=80.0, width=30.0, height=20.0, with_top=False)
    mesh = mesh.set_materials("Concrete")
    scene = Scene(
        transmitters=jnp.array([-20.0, 0.0, 5.0]),
        mesh=mesh,
    )
    return scene.with_receivers_grid(6, 4, height=1.5)


def test_mesh_has_8_devices() -> None:
    mesh = make_device_mesh()
    assert mesh.devices.size == 8


def test_sharded_power_map_matches_single_device(scene: Scene) -> None:
    mesh = make_device_mesh()
    sharded = sharded_power_map(scene, FREQUENCY, mesh, order=1)
    single = power_map(scene, FREQUENCY, order=1)
    assert sharded.shape == single.shape
    chex.assert_trees_all_close(sharded, single, rtol=1e-4)


def test_sharded_trace_matches_single_device(scene: Scene) -> None:
    mesh = make_device_mesh()
    sharded = sharded_trace_paths(scene, 1, mesh)
    single = scene.trace_paths(order=1)
    num = single.vertices.shape[-3]
    chex.assert_trees_all_close(
        sharded.vertices[..., :num, :, :],
        single.vertices.reshape(sharded.vertices[..., :num, :, :].shape),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.mask[..., :num]).reshape(-1),
        np.asarray(single.mask).reshape(-1),
    )
    # Padded candidates (to a multiple of 8 devices) must be masked out.
    assert not np.asarray(sharded.mask[..., num:]).any()


def test_training_step_runs_and_descends(scene: Scene) -> None:
    mesh = make_device_mesh()
    eta_r = jnp.array([5.24])
    sigma = jnp.array([0.1])
    target = 10.0 * jnp.log10(
        jnp.maximum(sharded_power_map(scene, FREQUENCY, mesh, order=1), 1e-30)
    )
    # Start from a perturbed permittivity: one step must reduce the loss.
    eta_start = eta_r + 2.0
    new_eta, loss0 = training_step(
        scene,
        FREQUENCY,
        mesh,
        order=1,
        eta_r=eta_start,
        conductivity=sigma,
        target_power=target,
        learning_rate=1e-2,
    )
    assert np.isfinite(float(loss0))
    _, loss1 = training_step(
        scene,
        FREQUENCY,
        mesh,
        order=1,
        eta_r=new_eta,
        conductivity=sigma,
        target_power=target,
        learning_rate=1e-2,
    )
    assert float(loss1) <= float(loss0)
