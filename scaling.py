"""Multi-device scaling harness (BASELINE config 5 pattern).

Measures sharded coverage-map throughput (paths/s) at 1, 2, 4, ... devices
and reports scaling efficiency. Runs on whatever devices are available —
real TPU chips on a pod slice, or virtual CPU devices for validation:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scaling.py

On a multi-host pod, call ``jax.distributed.initialize()`` first (pass
``--distributed``); each host runs the same program SPMD.
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp

# Some accelerator plugins ignore JAX_PLATFORMS from the environment; the
# config update makes the CPU request stick (required for the virtual
# multi-device mesh: XLA_FLAGS=--xla_force_host_platform_device_count=N).
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--grid", type=int, default=32)
    parser.add_argument("--order", type=int, default=2)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="Call jax.distributed.initialize() (multi-host pods).",
    )
    args = parser.parse_args()

    if args.distributed:
        jax.distributed.initialize()

    import differt_tpu.treekit as tk
    from differt_tpu.geometry import count_path_candidates
    from differt_tpu.parallel import make_device_mesh, sharded_power_map
    from differt_tpu.profiling import timeit
    from differt_tpu.scenes import street_canyon_scene

    scene = street_canyon_scene().set_assume_quads()
    scene = tk.tree_at(
        lambda s: s.transmitters, scene, jnp.array([-30.0, 0.0, 20.0])
    )
    scene = scene.with_receivers_grid(args.grid, args.grid, height=1.5)

    num_candidates = count_path_candidates(
        scene.mesh.num_primitives, args.order
    )
    paths_per_run = num_candidates * scene.num_receivers

    num_devices = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= num_devices]

    results = []
    base_rate = None
    for n in counts:
        mesh = make_device_mesh(n)
        stats = timeit(
            lambda mesh=mesh: sharded_power_map(
                scene, 2.4e9, mesh, order=args.order
            ),
            repeats=args.repeats,
        )
        rate = paths_per_run / stats["min"]
        if base_rate is None:
            base_rate = rate
        efficiency = rate / (base_rate * n)
        results.append({
            "devices": n,
            "paths_per_s": round(rate, 1),
            "elapsed_s": round(stats["min"], 4),
            "scaling_efficiency": round(efficiency, 3),
        })
        print(json.dumps(results[-1]))

    # Virtual host-platform devices all share the same physical CPU cores:
    # throughput cannot scale there (the run validates sharding correctness
    # + compilation only); real scaling numbers require real chips.
    virtual = (
        jax.default_backend() == "cpu"
        and "host_platform_device_count" in os.environ.get("XLA_FLAGS", "")
    )
    print(
        json.dumps({
            "summary": results,
            "backend": jax.default_backend(),
            "paths_per_run": paths_per_run,
            "virtual_devices": virtual,
            "note": (
                "virtual devices share one physical CPU; efficiency is "
                "meaningful on real chips only"
            )
            if virtual
            else None,
        })
    )


if __name__ == "__main__":
    main()
