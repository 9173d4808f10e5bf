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


def run_config5(out: str | None) -> dict:
    """BASELINE config 5 at spec scale on the available device(s).

    16 TX x 1M RX (1024 x 1024 grid), order-3 reflections on the street
    canyon, with the candidate axis streamed as a decoded shard (the full
    order-3 space is 16 250 candidates; a 256-candidate shard is one
    slice of the same closed-form index decode every chip uses — the
    workload per (tx, rx, candidate) is identical). Also times ONE
    TX-placement + permittivity gradient step (sharded over all devices)
    at a reduced RX grid. Timed runs follow a warmup call so compilation
    is excluded from the reported throughput.
    """
    import time

    import differt_tpu.treekit as tk
    from differt_tpu.coverage import power_map_chunked
    from differt_tpu.geometry import generate_path_candidates
    from differt_tpu.parallel import make_device_mesh, placement_training_step
    from differt_tpu.scenes import street_canyon_scene

    # shard=256 keeps the per-chunk path-vertex buffer
    # [16 tx, 256 cand, 16 rows, 8192 rx] around 2 GB on a 16 GB chip.
    num_tx, grid = 16, 1024
    order, shard = 3, 256
    scene = street_canyon_scene()
    xs = jnp.linspace(-35.0, 35.0, 4)
    ys = jnp.linspace(-6.0, 6.0, 4)
    tx = jnp.stack(
        jnp.meshgrid(xs, ys, indexing="ij"), axis=-1
    ).reshape(-1, 2)
    tx = jnp.concatenate((tx, jnp.full((num_tx, 1), 15.0)), axis=-1)
    scene = tk.tree_at(lambda s: s.transmitters, scene, tx)
    scene = scene.with_receivers_grid(grid, grid, height=1.5)

    candidates = generate_path_candidates(
        scene.mesh.num_primitives, order, size=shard
    )

    def run():
        out = power_map_chunked(
            scene,
            2.4e9,
            order=order,
            path_candidates=candidates,
            eta_r=jnp.array([5.24]),
            conductivity=jnp.array([0.1]),
            candidate_chunk=shard,
            rx_chunk=8192,
        )
        return float(jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)))

    run()  # Warmup: compile everything outside the timed run.
    start = time.perf_counter()
    run()
    elapsed = time.perf_counter() - start
    paths = num_tx * grid * grid * shard

    # One sharded TX-placement + permittivity gradient step.
    mesh = make_device_mesh()
    small = tk.tree_at(lambda s: s.transmitters, scene, tx)
    small = small.with_receivers_grid(128, 128, height=1.5)
    eta = jnp.array([5.24])

    def grad_step():
        return placement_training_step(
            small,
            2.4e9,
            mesh,
            order=1,
            tx=tx,
            eta_r=eta,
            conductivity=jnp.array([0.1]),
        )

    out_warm = grad_step()  # Warmup: compile outside the timed step.
    jax.block_until_ready(out_warm[0])
    float(jnp.sum(out_warm[0]))
    start = time.perf_counter()
    new_tx, new_eta, loss = placement_training_step(
        small,
        2.4e9,
        mesh,
        order=1,
        tx=tx,
        eta_r=eta,
        conductivity=jnp.array([0.1]),
    )
    jax.block_until_ready(new_tx)
    float(jnp.sum(new_tx))
    grad_elapsed = time.perf_counter() - start

    result = {
        "config5": {
            "num_tx": num_tx,
            "num_rx": grid * grid,
            "order": order,
            "candidate_shard": shard,
            "paths_per_run": paths,
            "elapsed_s": round(elapsed, 2),
            "paths_per_s": round(paths / elapsed, 1),
            "backend": jax.default_backend(),
            "num_devices": len(jax.devices()),
            "tx_grad_step_s_128x128": round(grad_elapsed, 2),
            "tx_moved": bool(jnp.any(new_tx != tx)),
            "loss": float(loss),
        }
    }
    print(json.dumps(result))
    if out:
        _merge_json(out, result)
    return result


def _merge_json(path: str, update: dict) -> None:
    import pathlib

    p = pathlib.Path(path)
    data = json.loads(p.read_text()) if p.is_file() else {}
    data.update(update)
    p.write_text(json.dumps(data, indent=1))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--grid", type=int, default=32)
    parser.add_argument("--order", type=int, default=2)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument(
        "--config5",
        action="store_true",
        help="Run BASELINE config 5 (16 TX x 1M RX, order 3) instead.",
    )
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="Call jax.distributed.initialize() (multi-host pods).",
    )
    args = parser.parse_args()

    if args.distributed:
        jax.distributed.initialize()

    if args.config5:
        run_config5(args.out)
        return

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
    summary = {
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
    }
    print(json.dumps(summary))
    if args.out:
        _merge_json(args.out, {"device_scaling": summary})


if __name__ == "__main__":
    main()
