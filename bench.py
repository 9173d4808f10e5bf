"""Benchmark on the real accelerator (one chip). Prints ONE JSON line.

Two workloads matching BASELINE.md:

1. Config 2 — street canyon, order-2 exhaustive trace + EM pipeline over a
   64x64 RX coverage grid: the primary metric, path candidates traced per
   second per chip (end to end, including the Jones-chain EM stage).
2. Config 3 scale — ~10k-triangle procedural city, 1M-ray closest-hit
   (the SBR/visibility workhorse): rays/s with the Pallas kernel, plus its
   speedup over the portable pure-JAX XLA backend on the same chip
   (reported as ``vs_baseline`` — the measured value of the TPU-native
   kernel design; the reference itself publishes no absolute numbers and
   does not run on TPU at all).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

from differt_tpu.coverage import received_power
from differt_tpu.geometry import count_path_candidates, fibonacci_lattice
from differt_tpu.ops import set_backend
from differt_tpu.ops._pallas_rt import pallas_first_triangle_hit_by_ray
from differt_tpu.rt import first_triangle_hit_by_ray
from differt_tpu.scenes import street_canyon_scene, urban_scene

GRID = 64
ORDER = 2
FREQUENCY = 2.4e9
NUM_RAYS = 1_000_000


def _sync(x) -> float:
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def bench_coverage() -> dict:
    # Triangle (non-quad) scene: the trace dispatches to the fused Pallas
    # megakernel on TPU.
    scene = street_canyon_scene()
    import differt_tpu.treekit as tk

    scene = tk.tree_at(
        lambda s: s.transmitters, scene, jnp.array([-30.0, 0.0, 20.0])
    )
    scene = scene.with_receivers_grid(GRID, GRID, height=1.5)

    eta_r = jnp.array([5.24])
    conductivity = jnp.array([0.1])

    def run(megakernel=None, eta=eta_r):
        paths = scene.trace_paths(order=ORDER, megakernel=megakernel)
        return received_power(
            paths, scene, FREQUENCY, eta_r=eta, conductivity=conductivity
        )

    try:
        _sync(run())
        megakernel = None
    except Exception:  # noqa: BLE001 - the benchmark must always report.
        # Megakernel compile issue on this toolchain: XLA fallback.
        megakernel = False
        _sync(run(megakernel))

    # Steady-state throughput: queue REPEAT async iterations (distinct
    # inputs, so nothing collapses to a cached value) and fetch once — the
    # host-fetch round trip (tens of ms through the device tunnel) is
    # amortized instead of being billed to every map.
    REPEAT = 8

    def run_many():
        total = None
        for i in range(REPEAT):
            out = run(megakernel, eta_r + 1e-6 * i)
            total = out if total is None else total + out
        return total

    _sync(run_many())
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        _sync(run_many())
        best = min(best, (time.perf_counter() - start) / REPEAT)

    num_candidates = count_path_candidates(scene.mesh.num_primitives, ORDER)
    num_rx = scene.num_receivers
    return {
        "paths_per_s": num_candidates * num_rx / best,
        "px_per_s": num_rx / best,
        "num_candidates": num_candidates,
        "elapsed_s": best,
        "num_primitives": scene.mesh.num_primitives,
    }


def bench_raycast() -> dict:
    scene = urban_scene(8, 8)
    tv = scene.mesh.triangle_vertices
    num_triangles = scene.mesh.num_triangles
    origins = jnp.broadcast_to(jnp.array([0.0, 0.0, 30.0]), (NUM_RAYS, 3))
    directions = fibonacci_lattice(NUM_RAYS) * 500.0

    REPEAT = 4

    def timed(fn) -> float:
        """Steady-state per-call time: REPEAT queued calls, one fetch."""
        _sync(fn(0)[1])
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            total = None
            for i in range(REPEAT):
                t = fn(i)[1]
                total = t if total is None else total + t
            _sync(total)
            best = min(best, (time.perf_counter() - start) / REPEAT)
        return best

    t_pallas = timed(
        lambda i: pallas_first_triangle_hit_by_ray(
            origins + 1e-4 * i, directions, tv
        )
    )
    # batch_size=256 keeps the XLA path's [num_rays, tile] temporaries
    # within HBM at 1M rays (bigger tiles OOM the 16G chip).
    jitted = jax.jit(
        lambda o, d, t: first_triangle_hit_by_ray(o, d, t, batch_size=256)
    )
    t_xla = timed(lambda i: jitted(origins + 1e-4 * i, directions, tv))
    return {
        "num_triangles": num_triangles,
        "rays_per_s_pallas": NUM_RAYS / t_pallas,
        "rays_per_s_xla": NUM_RAYS / t_xla,
        "tests_per_s_pallas": NUM_RAYS * num_triangles / t_pallas,
        "pallas_speedup_vs_xla": t_xla / t_pallas,
    }


def bench_config3() -> dict:
    """BASELINE config 3: ~10k-triangle urban mesh, order-3 SBR launch +
    first-order UTD diffraction paths (the exhaustive candidate space at
    order 3 is ~1e12 — ray launching is the production approach there)."""
    scene = urban_scene(16, 16)
    import differt_tpu.treekit as tk

    scene = tk.tree_at(
        lambda s: s.transmitters, scene, jnp.array([[0.0, 0.0, 40.0]])
    )
    scene = scene.with_receivers_grid(8, 8, height=1.5)
    num_tris = scene.mesh.num_triangles
    num_rays = 250_000
    order = 3

    def launch(i):
        return scene.launch_paths(
            order=order, solver="sbr", num_rays=num_rays + 8 * i
        ).masks

    _sync(launch(0).sum())
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        _sync(launch(1).sum())
        best = min(best, time.perf_counter() - start)
    sbr_bounce_rays_per_s = num_rays * (order + 1) / best

    # Edge extraction (dedup + connectivity) is host-side preprocessing:
    # run it on the CPU backend, then measure only the on-device tracing.
    cpu = jax.devices("cpu")[0]
    to_cpu = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jax.device_put(x, cpu) if isinstance(x, jax.Array) else x, t
    )
    with jax.default_device(cpu):
        mesh_cpu = to_cpu(scene.mesh).dedup_vertices()
        edges_cpu, _, _ = mesh_cpu._diffraction_edges_info()
    device = jax.devices()[0]
    to_dev = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jax.device_put(x, device) if isinstance(x, jax.Array) else x, t
    )
    mesh = to_dev(mesh_cpu)
    edges = jax.device_put(edges_cpu, device)
    num_edges = edges.shape[0]

    from differt_tpu.rt._diffraction import _trace_diffraction

    def diff(i):
        # min_len varies per call so repeats cannot collapse to a cache hit.
        return _trace_diffraction(
            mesh,
            scene.transmitters.reshape(-1, 3),
            scene.receivers.reshape(-1, 3),
            edges,
            epsilon=None,
            hit_tol=None,
            min_len=1e-6 * (i + 1),
        ).mask

    _sync(diff(0).sum())
    best_d = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        _sync(diff(1).sum())
        best_d = min(best_d, time.perf_counter() - start)
    num_rx = scene.num_receivers
    return {
        "num_triangles": num_tris,
        "num_edges": num_edges,
        "sbr_order3_bounce_rays_per_s": sbr_bounce_rays_per_s,
        "diffraction_paths_per_s": num_rx * num_edges / best_d,
    }


def main() -> None:
    set_backend("auto")
    coverage = bench_coverage()
    raycast = bench_raycast()
    config3 = bench_config3()
    print(
        json.dumps({
            "metric": "order2_coverage_path_candidates_traced_per_s",
            "value": round(coverage["paths_per_s"], 1),
            "unit": "paths/s/chip",
            "vs_baseline": round(raycast["pallas_speedup_vs_xla"], 3),
            "extra": {
                "coverage": {k: round(v, 2) for k, v in coverage.items()},
                "raycast": {k: round(v, 2) for k, v in raycast.items()},
                "config3_urban10k": {
                    k: round(v, 2) for k, v in config3.items()
                },
                "backend": jax.default_backend(),
            },
        })
    )


if __name__ == "__main__":
    main()
