"""Worker for the 2-process ``jax.distributed`` CPU test.

Launched by tests/test_parallel.py as two separate processes, each with 4
virtual CPU devices (8 global). Builds a global device mesh, shards the
RX axis across BOTH processes, and computes the coverage loss and the
permittivity + TX-position gradients — the gradients of replicated
parameters must come out identical on every process (XLA all-reduces
them across the process boundary). This is the real multi-process SPMD
pattern of SURVEY.md section 4 that single-process virtual-device tests
cannot exercise.

Usage: python tests/_distributed_worker.py <coordinator_port> <process_id>
Prints one line: ``RESULT loss=<f> gtx0=<f> geta=<f>`` or ``INIT_FAILED: ...``.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    port, process_id = sys.argv[1], int(sys.argv[2])
    try:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2,
            process_id=process_id,
        )
    except Exception as exc:  # noqa: BLE001
        print(f"INIT_FAILED: {type(exc).__name__}: {exc}")
        return 3

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) != 8 or len(jax.local_devices()) != 4:
        print(
            f"INIT_FAILED: expected 8 global / 4 local devices, got "
            f"{len(jax.devices())}/{len(jax.local_devices())}"
        )
        return 3

    import differt_tpu.treekit as tk
    from differt_tpu.coverage import received_power
    from differt_tpu.geometry import Mesh as GeoMesh, Scene

    geo = GeoMesh.box(length=80.0, width=30.0, height=20.0, with_top=False)
    geo = geo.set_materials("Concrete")
    scene = Scene(transmitters=jnp.array([[-20.0, 0.0, 5.0]]), mesh=geo)
    scene = scene.with_receivers_grid(8, 2, height=1.5)  # 16 RX, 2/device

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), axis_names=("rx",))
    rx_global = np.asarray(scene.receivers.reshape(-1, 3))
    rx_sharding = NamedSharding(mesh, P("rx", None))
    local = rx_global.reshape(8, -1, 3)[
        process_id * 4 : (process_id + 1) * 4
    ].reshape(-1, 3)
    rx = jax.make_array_from_process_local_data(rx_sharding, local)

    replicated = NamedSharding(mesh, P())
    tx0 = jax.make_array_from_process_local_data(
        replicated, np.asarray([[-20.0, 0.0, 5.0]], dtype=np.float32)
    )
    eta0 = jax.make_array_from_process_local_data(
        replicated, np.asarray([5.24], dtype=np.float32)
    )
    conductivity = jnp.array([0.1])

    @jax.jit
    def loss_fn(tx, eta, rx):
        s = tk.tree_at(
            lambda sc: (sc.transmitters, sc.receivers), scene, (tx, rx)
        )
        paths = s.trace_paths(order=1)
        power = received_power(
            paths, s, 2.4e9, eta_r=eta, conductivity=conductivity
        )
        return -jnp.mean(10.0 * jnp.log10(jnp.maximum(power, 1e-30)))

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(tx0, eta0, rx)
    g_tx, g_eta = grads
    # Fetch only addressable shards (replicated outputs are addressable).
    print(
        "RESULT "
        f"loss={float(loss):.8e} "
        f"gtx0={float(np.asarray(jax.device_get(g_tx))[0, 0]):.8e} "
        f"geta={float(np.asarray(jax.device_get(g_eta))[0]):.8e}"
    )
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
