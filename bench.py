"""Benchmark: order-2 coverage map on a street-canyon scene (1 chip).

Measures the BASELINE.md primary metric — path candidates traced per second
(trace + EM pipeline, end-to-end) and coverage pixels per second — on the
real accelerator. ``vs_baseline`` is the speedup of the active (Pallas on
TPU) ray-casting backend over the portable pure-JAX XLA backend on the same
chip, i.e. the measured value of the TPU-native kernel design.

Prints exactly one JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.
"""

import json
import time

import jax
import jax.numpy as jnp

from differt_tpu.coverage import received_power
from differt_tpu.geometry import Mesh, Scene, count_path_candidates
from differt_tpu.ops import set_backend
from differt_tpu import treekit as tk

GRID = 64
ORDER = 2
FREQUENCY = 2.4e9


def make_scene() -> Scene:
    mesh = Mesh.box(length=80.0, width=30.0, height=20.0, with_top=False)
    mesh = mesh.set_materials("Concrete")
    scene = Scene(transmitters=jnp.array([-20.0, 0.0, 5.0]), mesh=mesh)
    return scene.with_receivers_grid(GRID, GRID, height=1.5)


def run_once(scene: Scene, eta_r, conductivity):
    paths = scene.trace_paths(order=ORDER)
    return received_power(
        paths, scene, FREQUENCY, eta_r=eta_r, conductivity=conductivity
    )


def timed(scene: Scene, repeats: int = 3) -> float:
    eta_r = jnp.array([5.24])
    conductivity = jnp.array([0.1])
    out = run_once(scene, eta_r, conductivity)
    float(out.sum())  # Warm-up + compile, forced to completion.
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        out = run_once(scene, eta_r, conductivity)
        float(out.sum())  # Host fetch: real completion barrier.
        best = min(best, time.perf_counter() - start)
    return best


def main() -> None:
    scene = make_scene()
    num_candidates = count_path_candidates(scene.mesh.num_primitives, ORDER)
    num_rx = scene.num_receivers
    paths_per_run = num_candidates * num_rx * scene.num_transmitters

    elapsed = timed(scene)
    paths_per_s = paths_per_run / elapsed
    px_per_s = num_rx / elapsed

    set_backend("jax")
    try:
        elapsed_xla = timed(scene)
    finally:
        set_backend("auto")
    vs_baseline = elapsed_xla / elapsed

    print(
        json.dumps({
            "metric": "order2_coverage_path_candidates_traced_per_s",
            "value": round(paths_per_s, 1),
            "unit": "paths/s/chip",
            "vs_baseline": round(vs_baseline, 3),
            "extra": {
                "coverage_px_per_s": round(px_per_s, 1),
                "grid": [GRID, GRID],
                "order": ORDER,
                "num_candidates": num_candidates,
                "elapsed_s": round(elapsed, 4),
                "elapsed_xla_backend_s": round(elapsed_xla, 4),
                "backend": jax.default_backend(),
            },
        })
    )


if __name__ == "__main__":
    main()
