"""Multi-chip sharded coverage + training step (BASELINE config 5 pattern).

Runs on whatever devices are present — test without hardware via:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/multichip_sharding.py
"""

import jax
import jax.numpy as jnp

from differt_tpu.parallel import make_device_mesh, sharded_power_map, training_step
from differt_tpu.scenes import street_canyon_scene
from differt_tpu import treekit as tk

FREQUENCY = 2.4e9


def main() -> None:
    mesh = make_device_mesh()
    print(f"devices: {mesh.devices.size} x {jax.default_backend()}")

    scene = street_canyon_scene()
    scene = tk.tree_at(
        lambda s: s.transmitters, scene, jnp.array([-30.0, 0.0, 20.0])
    )
    scene = scene.with_receivers_grid(32, 32, height=1.5)

    coverage = sharded_power_map(scene, FREQUENCY, mesh, order=2)
    print(f"sharded coverage map: {coverage.shape}, "
          f"mean {float(coverage.mean()):.3e} W")

    sigma = jnp.array([0.1])
    target = 10.0 * jnp.log10(
        jnp.maximum(sharded_power_map(scene, FREQUENCY, mesh, order=1), 1e-30)
    )
    eta = jnp.array([2.0])
    for step in range(5):
        eta, loss = training_step(
            scene, FREQUENCY, mesh, order=1,
            eta_r=eta, conductivity=sigma, target_power=target,
            learning_rate=1e-2,
        )
        print(f"step {step}: loss {float(loss):.4f} eta {float(eta[0]):.3f}")


if __name__ == "__main__":
    main()
