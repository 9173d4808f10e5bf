"""Focused megakernel iteration harness for the Munich-class XL workload.

Times ONLY the fused Pallas trace megakernel (plus the EM chain it feeds,
exactly as bench_cityscale_xl does) so kernel iterations measure in ~1 min
instead of bench.py's full matrix. Not part of the bench surface.

Usage: python tools/xl_kernel_bench.py [--small] [--trace-only]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from differt_tpu.coverage import power_map_chunked
from differt_tpu.geometry import generate_path_candidates
from differt_tpu.ops import set_backend
from differt_tpu.scenes import urban_scene
import differt_tpu.treekit as tk

FREQUENCY = 2.4e9


def _sync(x) -> float:
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))


def main() -> None:
    set_backend("auto")
    small = "--small" in sys.argv
    trace_only = "--trace-only" in sys.argv
    n = 24 if small else 56
    scene = urban_scene(n, n)
    scene = tk.tree_at(
        lambda s: s.transmitters, scene, jnp.array([[0.0, 0.0, 60.0]])
    )
    num_triangles = int(scene.mesh.num_triangles)

    import os
    rx_n = int(os.environ.get("XLB_RX", "128"))
    side = {128: (16, 8), 512: (32, 16), 1024: (32, 32)}[rx_n]
    (min_x, min_y, _), (max_x, max_y, _) = scene.mesh.bounding_box
    x, y = jnp.meshgrid(
        jnp.linspace(min_x, max_x, side[0]), jnp.linspace(min_y, max_y, side[1])
    )
    rx = jnp.stack((x, y, jnp.full_like(x, 1.5)), axis=-1)
    scene = tk.tree_at(lambda s: s.receivers, scene, rx)
    num_rx = rx_n

    num_cands = 16384 if small else 65536
    cands = generate_path_candidates(num_triangles, 2, size=num_cands)

    eta0 = jnp.array([5.24])

    if trace_only:
        def run(shift):
            paths = scene.trace_paths(
                path_candidates=cands, megakernel=True, min_len=1e-6 + shift
            )
            return paths.mask.sum()
    else:
        # Vary a TRACED input (eta is a jnp array) between reps: varying
        # the Python-float frequency instead recompiles the jitted tile
        # every rep (floats are static under filter_jit) — the round-4
        # XL numbers were inflated ~13x by exactly that.
        def run(shift):
            return power_map_chunked(
                scene,
                FREQUENCY,
                path_candidates=cands,
                eta_r=eta0 + shift,
                conductivity=jnp.array([0.12]),
                candidate_chunk=4096,
                rx_chunk=rx_n,
                megakernel=True,
            )

    t0 = time.perf_counter()
    _sync(run(0.0))
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for rep in range(3):
        start = time.perf_counter()
        _sync(run(1e-5 * (rep + 1)))
        best = min(best, time.perf_counter() - start)
        print(f"  rep {rep}: {time.perf_counter() - start:.2f}s", flush=True)
    paths = num_cands * num_rx
    print(
        f"tris={num_triangles} cands={num_cands} rx={num_rx} "
        f"best={best:.2f}s paths/s={paths / best:,.0f}"
    )


if __name__ == "__main__":
    main()
