"""All propagation mechanisms on one NLoS link.

A box obstacle on a ground plane blocks the direct TX-RX path; this
example enumerates every mechanism the framework models and compares
their contributions to the received power:

- pure specular reflections (image method),
- first-order edge diffraction (closed-form Keller points + UTD),
- mixed chains (reflect off the ground, then diffract over the roof —
  Fermat solver),
- double diffraction over the roof (two edges),
- diffuse scattering (Degli-Esposti effective roughness),
- and a directive TX antenna pattern on top.

Run: ``python examples/propagation_mechanisms.py``
"""

import jax.numpy as jnp
import numpy as np

from differt_tpu.coverage import complex_amplitudes, received_power
from differt_tpu.em import HWDipolePattern, InteractionType, z_0
from differt_tpu.geometry import Mesh, Scene
from differt_tpu.rt import (
    MixedPathTracer,
    diffraction_amplitudes,
    mixed_amplitudes,
    scattering_amplitudes,
)

FREQUENCY = 2.4e9
ETA_R = jnp.array([5.24])
SIGMA = jnp.array([0.1])
R = InteractionType.REFLECTION
D = InteractionType.DIFFRACTION


def power_of(amplitudes, mask) -> float:
    a = jnp.where(jnp.asarray(mask), amplitudes, 0.0)
    return float(jnp.abs(a.sum()) ** 2 / z_0)


def main() -> None:
    ground = Mesh.plane(
        jnp.array([0.0, 0.0, 0.0]),
        normal=jnp.array([0.0, 0.0, 1.0]),
        side_length=40.0,
    )
    box = Mesh.box(2.0, 6.0, 3.0, with_top=True).translate(
        jnp.array([0.0, 0.0, 1.5])
    )
    mesh = (ground + box).dedup_vertices().set_materials("Concrete")
    # A deep-shadow receiver: LoS, ground bounce, and even single
    # diffraction are all blocked — only double diffraction over the roof
    # and diffuse scattering reach it. (Raise it to z = 5 and single
    # diffraction + reflect->diffract take over instead.)
    scene = Scene(
        transmitters=jnp.array([[-8.0, 0.0, 1.6]]),
        receivers=jnp.array([[8.0, 0.0, 1.4]]),
        mesh=mesh,
    )
    high = Scene(
        transmitters=scene.transmitters,
        receivers=jnp.array([[8.0, 0.0, 5.0]]),
        mesh=mesh,
    )
    edges, adjacent, wedge_n = scene.mesh._diffraction_edges_info()
    common = dict(
        edges=edges, adjacent_triangles=adjacent, wedge_n=wedge_n,
        eta_r=ETA_R, conductivity=SIGMA,
    )

    print("deep-shadow receiver (z = 1.4):")
    los = scene.trace_paths(order=0)
    print(f"  LoS blocked: {int(los.mask.sum()) == 0}")

    tracer = MixedPathTracer()
    dd = tracer.trace_paths(scene, [D, D])
    a_dd = mixed_amplitudes(dd, scene, FREQUENCY, **common)
    print(f"  double diffraction: {int(dd.mask.sum()):3d} paths, "
          f"{power_of(a_dd, dd.mask):.3e} W")
    v = np.asarray(dd.vertices[np.asarray(dd.mask)])
    top = v[(np.abs(v[:, 1, 2] - 3) < 1e-3) & (np.abs(v[:, 2, 2] - 3) < 1e-3)]
    print(f"  over-the-roof path: {np.round(top[0], 3).tolist()}")

    scat = scene.trace_scattering_paths(num_samples=4)
    a_scat = scattering_amplitudes(
        scat, scene, FREQUENCY, eta_r=ETA_R, conductivity=SIGMA,
        scattering_coefficient=0.3, num_samples=4,
    )
    p_scat = float(jnp.sum(jnp.abs(a_scat) ** 2) / z_0)  # incoherent sum
    print(f"  diffuse scattering: {int(scat.mask.sum()):3d} paths, {p_scat:.3e} W")

    print("elevated receiver (z = 5):")
    diff = high.trace_diffraction_paths()
    a_diff = diffraction_amplitudes(diff, high, FREQUENCY, **common)
    print(f"  single diffraction: {int(diff.mask.sum()):3d} paths, "
          f"{power_of(a_diff, diff.mask):.3e} W")

    rd = tracer.trace_paths(high, [R, D])
    a_rd = mixed_amplitudes(rd, high, FREQUENCY, **common)
    print(f"  reflect->diffract : {int(rd.mask.sum()):3d} paths, "
          f"{power_of(a_rd, rd.mask):.3e} W")

    spec = high.trace_paths(order=1)
    a_spec = complex_amplitudes(
        spec, high, FREQUENCY, eta_r=ETA_R, conductivity=SIGMA
    )
    print(f"  order-1 reflection: {int(spec.mask.sum()):3d} paths, "
          f"{power_of(a_spec, spec.mask):.3e} W")

    # Directive TX on a free-space-like high link (diffraction paths).
    pattern = HWDipolePattern(
        frequency=FREQUENCY, center=jnp.zeros(3), direction=jnp.array([0.0, 0.0, 1.0])
    )
    p_iso = received_power(
        scat, scene, FREQUENCY, eta_r=ETA_R, conductivity=SIGMA, coherent=False
    )
    p_dip = received_power(
        scat, scene, FREQUENCY, eta_r=ETA_R, conductivity=SIGMA,
        coherent=False, tx_pattern=pattern,
    )
    print(f"half-wave dipole TX: scattered power x"
          f"{float((p_dip / p_iso)[0, 0]):.3f} vs isotropic")


if __name__ == "__main__":
    main()
