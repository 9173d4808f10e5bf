"""Benchmark on the real accelerator (one chip). Prints ONE JSON line.

Workloads matching BASELINE.md:

1. CITY SCALE (primary, BASELINE config 4 class) — bruxelles.obj, a real
   14.2k-triangle city mesh (the reference's own "medium" benchmark scene,
   read in place from /root/reference): order-2 candidates streamed
   through ``power_map_chunked`` (trace + Jones-chain EM + coherent pixel
   sum). Reports paths/s/chip at >=1e5 candidates and px/s at >=1e5 RX
   pixels, both with elapsed >= 1 s.
2. Config 2 — street canyon, order-2 exhaustive trace + EM pipeline over a
   64x64 RX coverage grid.
3. Config 3 scale — ~10k-triangle procedural city, order-3 SBR launch +
   first-order diffraction, and the 1M-ray closest-hit kernel
   (Pallas vs XLA on the same chip).

``vs_baseline`` is repo-on-TPU vs DiffeRT-on-CPU: the same city-scale
workload (same mesh, order, candidate decode, EM chain) measured on the
reference's own pipeline by ``baseline_measure.py`` and recorded in
``BASELINE_MEASURED.json`` (the reference publishes no numbers of its own
and has no TPU path at all — docs/source/limitations.md).
"""

import functools
import json
import pathlib
import time

import jax
import jax.numpy as jnp

from differt_tpu.coverage import power_map_chunked, received_power
from differt_tpu.geometry import count_path_candidates, fibonacci_lattice
from differt_tpu.ops import set_backend
from differt_tpu.ops._pallas_rt import pallas_first_triangle_hit_by_ray
from differt_tpu.rt import first_triangle_hit_by_ray
from differt_tpu.scenes import street_canyon_scene, urban_scene

GRID = 64
ORDER = 2
FREQUENCY = 2.4e9
NUM_RAYS = 1_000_000
BRUXELLES = pathlib.Path("/root/reference/docs/source/notebooks/bruxelles.obj")


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


def _city_scene():
    """Load the real city mesh (host prep on CPU, arrays to the device)."""
    import numpy as np

    from differt_tpu.geometry import Scene
    import differt_tpu.treekit as tk

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if BRUXELLES.is_file():
            from differt_tpu.io import load_obj

            mesh = load_obj(BRUXELLES)
        else:  # fallback when the reference assets are absent
            mesh = urban_scene(24, 24).mesh
    device = jax.devices()[0]
    mesh = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, device) if isinstance(x, jax.Array) else x,
        mesh,
    )
    scene = Scene(mesh=mesh)
    scene = tk.tree_at(
        lambda s: s.transmitters, scene, jnp.array([[0.0, 0.0, 40.0]])
    )
    return scene


def bench_cityscale() -> dict:
    """PRIMARY: order-2 coverage on a real 14.2k-triangle city mesh.

    (a) paths/s at 131 072 candidates x 128 RX (1.7e7 traced paths/run);
    (b) px/s at 102 400 RX pixels x 256 candidates (2.6e7 paths/run).
    Both stream through power_map_chunked. Per-path cost is dominated by
    the blockage sweep (~43k MT tests/path at 14.2k triangles before
    culling); the two-level AABB culling with Morton-ordered RX tiles
    recovers ~2.5x on (b), while (a)'s 128 city-wide receivers per tile
    are inherently incoherent and gain only ~5% (docs/performance.md).
    """
    import numpy as np

    from differt_tpu.geometry import generate_path_candidates
    import differt_tpu.treekit as tk

    scene = _city_scene()
    num_triangles = scene.mesh.num_triangles
    CAND_CHUNK, RX_CHUNK = 4096, 128

    def grid(m, n):
        (min_x, min_y, _), (max_x, max_y, _) = scene.mesh.bounding_box
        x, y = jnp.meshgrid(
            jnp.linspace(min_x, max_x, m), jnp.linspace(min_y, max_y, n)
        )
        return jnp.stack((x, y, jnp.full_like(x, 1.5)), axis=-1)

    def run(scene, candidates, megakernel):
        return power_map_chunked(
            scene,
            FREQUENCY,
            path_candidates=candidates,
            eta_r=jnp.array([5.24]),
            conductivity=jnp.array([0.12]),
            candidate_chunk=CAND_CHUNK,
            rx_chunk=RX_CHUNK,
            megakernel=megakernel,
        )

    def timed(scene, candidates, megakernel, repeats=1):
        _sync(run(scene, candidates, megakernel))
        best = float("inf")
        for _ in range(repeats):
            start = time.perf_counter()
            _sync(run(scene, candidates, megakernel))
            best = min(best, time.perf_counter() - start)
        return best

    # Decode candidate shards on the device (closed-form index mapping).
    cands_a = generate_path_candidates(num_triangles, 2, size=131072)
    scene_a = tk.tree_at(lambda s: s.receivers, scene, grid(16, 8))
    try:
        elapsed_a = timed(scene_a, cands_a, None)
        megakernel = None
    except Exception:  # noqa: BLE001 - the benchmark must always report.
        megakernel = False
        elapsed_a = timed(scene_a, cands_a, megakernel)
    paths_a = int(cands_a.shape[0]) * 128

    cands_b = generate_path_candidates(num_triangles, 2, size=256)
    scene_b = tk.tree_at(lambda s: s.receivers, scene, grid(320, 320))
    elapsed_b = timed(scene_b, cands_b, megakernel, repeats=1)

    return {
        "num_triangles": int(num_triangles),
        "paths_per_s": paths_a / elapsed_a,
        "num_candidates": int(cands_a.shape[0]),
        "num_rx_a": 128,
        "elapsed_a_s": elapsed_a,
        "px_per_s": 102400 / elapsed_b,
        "num_px_b": 102400,
        "num_candidates_b": int(cands_b.shape[0]),
        "elapsed_b_s": elapsed_b,
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

    # MLM (multipath lifetime map): SBR bounce scan + bit-planed hash
    # scatter, the pure-XLA re-design of the reference's Warp atomic-OR
    # kernel (_scene.py:62-302).
    mlm_rays = 500_000
    mlm_order = 2

    def mlm(i):
        return scene.compute_tx_mlm(
            num_rays=mlm_rays + 8 * i,
            order=mlm_order,
            grid_size=(128, 128),
            receiver_plane_z=1.5,
        )

    _sync(mlm(0).sum())
    best_m = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        _sync(mlm(1).sum())
        best_m = min(best_m, time.perf_counter() - start)

    return {
        "num_triangles": num_tris,
        "num_edges": num_edges,
        "sbr_order3_bounce_rays_per_s": sbr_bounce_rays_per_s,
        "diffraction_paths_per_s": num_rx * num_edges / best_d,
        "mlm_order2_bounce_rays_per_s": mlm_rays * (mlm_order + 1) / best_m,
    }


def _load_cpu_baseline() -> dict:
    path = pathlib.Path(__file__).parent / "BASELINE_MEASURED.json"
    if path.is_file():
        return json.loads(path.read_text())
    return {}


def main() -> None:
    set_backend("auto")
    cityscale = bench_cityscale()
    coverage = bench_coverage()
    raycast = bench_raycast()
    config3 = bench_config3()

    baseline = _load_cpu_baseline()
    ref_city = baseline.get("cityscale_bruxelles", {}).get("paths_per_s")
    ref_canyon = baseline.get("config2_canyon", {})
    vs_baseline = (
        cityscale["paths_per_s"] / ref_city if ref_city else float("nan")
    )
    print(
        json.dumps({
            "metric": "cityscale_order2_paths_traced_per_s",
            "value": round(cityscale["paths_per_s"], 1),
            "unit": "paths/s/chip",
            "vs_baseline": round(vs_baseline, 1),
            "extra": {
                "vs_baseline_meaning": (
                    "repo-on-TPU / DiffeRT-on-CPU, same bruxelles order-2 "
                    "trace+EM workload (BASELINE_MEASURED.json)"
                ),
                "cityscale_bruxelles": {
                    k: round(v, 2) for k, v in cityscale.items()
                },
                "canyon_vs_cpu_baseline": {
                    "paths": round(
                        coverage["paths_per_s"] / ref_canyon["paths_per_s"], 1
                    )
                    if ref_canyon
                    else None,
                    "px": round(coverage["px_per_s"] / ref_canyon["px_per_s"], 1)
                    if ref_canyon
                    else None,
                },
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
