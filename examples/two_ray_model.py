"""Two-ray ground-reflection model (BASELINE config 1).

Traces LOS + one ground reflection over a sweep of distances, computes
received power through the EM pipeline, and differentiates it with respect
to the receiver position and the ground permittivity.

Run: ``python examples/two_ray_model.py``
"""

import jax
import jax.numpy as jnp

from differt_tpu.coverage import complex_amplitudes, received_power
from differt_tpu.em import z_0
from differt_tpu.geometry import Mesh, Scene

FREQUENCY = 2.4e9
TX = jnp.array([0.0, 0.0, 10.0])
ETA_R = jnp.array([5.24])  # Concrete.
SIGMA = jnp.array([0.0462 * 2.4**0.7822])

ground = Mesh.plane(
    jnp.zeros(3), normal=jnp.array([0.0, 0.0, 1.0]), side_length=2000.0
).set_materials("Concrete")


def power_at(rx: jax.Array) -> jax.Array:
    scene = Scene(transmitters=TX, receivers=rx, mesh=ground)
    los = scene.trace_paths(order=0)
    reflection = scene.trace_paths(order=1)
    a = jnp.concatenate([
        complex_amplitudes(
            p, scene, FREQUENCY, eta_r=ETA_R, conductivity=SIGMA
        ).reshape(-1)
        for p in (los, reflection)
    ])
    return jnp.abs(a.sum()) ** 2 / z_0


def main() -> None:
    print("distance_m  power_dBW")
    for x in (10.0, 30.0, 100.0, 300.0, 1000.0):
        p = power_at(jnp.array([x, 0.0, 1.5]))
        print(f"{x:9.1f}  {10 * jnp.log10(p):8.2f}")

    grad_rx = jax.grad(lambda x: power_at(jnp.array([x, 0.0, 1.5])))(100.0)
    print(f"\nd(power)/d(rx_x) at 100 m: {grad_rx:.3e} W/m")

    def power_of_eps(eta):
        scene = Scene(
            transmitters=TX, receivers=jnp.array([100.0, 0.0, 1.5]), mesh=ground
        )
        paths = scene.trace_paths(order=1)
        return received_power(
            paths, scene, FREQUENCY, eta_r=eta, conductivity=SIGMA
        ).reshape(())

    grad_eps = jax.grad(power_of_eps)(ETA_R)
    print(f"d(power)/d(eta_r):         {float(grad_eps[0]):.3e} W")


if __name__ == "__main__":
    main()
