"""Differentiable coverage map with reflections + diffraction.

Computes an order-2 coverage map over a street canyon, adds first-order
UTD edge diffraction, and runs a few gradient-descent steps recovering the
ground-truth permittivity from a target map (BASELINE configs 2 and 4).

Run: ``python examples/coverage_map.py``
"""

import jax
import jax.numpy as jnp

from differt_tpu.coverage import power_map
from differt_tpu.scenes import street_canyon_scene
from differt_tpu import treekit as tk

FREQUENCY = 2.4e9


def main() -> None:
    scene = street_canyon_scene()
    scene = tk.tree_at(
        lambda s: s.transmitters, scene, jnp.array([-30.0, 0.0, 20.0])
    )
    scene = scene.with_receivers_grid(32, 32, height=1.5)

    coverage = power_map(scene, FREQUENCY, order=2)
    db = 10 * jnp.log10(jnp.maximum(coverage, 1e-30))
    print(f"order-2 coverage: {db.shape}, {float(db.min()):.1f} dBW "
          f"to {float(db.max()):.1f} dBW")

    with_diff = power_map(scene, FREQUENCY, order=1, with_diffraction=True)
    print(f"with diffraction: mean {float(with_diff.mean()):.3e} W")

    # Inverse problem: recover permittivity by gradient descent.
    sigma = jnp.array([0.1])
    true_eta = jnp.array([5.24])
    target = power_map(
        scene, FREQUENCY, order=1, eta_r=true_eta, conductivity=sigma
    )

    @jax.jit
    def loss_fn(eta):
        pred = power_map(
            scene, FREQUENCY, order=1, eta_r=eta, conductivity=sigma
        )
        return jnp.mean((jnp.log10(pred + 1e-30) - jnp.log10(target + 1e-30)) ** 2)

    eta = jnp.array([2.0])
    for step in range(30):
        loss, grad = jax.value_and_grad(loss_fn)(eta)
        eta = eta - 20.0 * grad
        if step % 10 == 0:
            print(f"step {step:2d}: loss {float(loss):.5f} eta {float(eta[0]):.3f}")
    print(f"recovered eta_r = {float(eta[0]):.3f} (true {float(true_eta[0]):.2f})")


if __name__ == "__main__":
    main()
