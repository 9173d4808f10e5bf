"""Sharding helpers and sharded end-to-end ops."""

from collections.abc import Sequence
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jaxtyping import Array, ArrayLike, Float

from ..coverage import received_power
from ..geometry import Scene, TracedPaths, generate_path_candidates
from ..rt._solvers import trace_path_candidates as _trace_path_candidates


def make_device_mesh(
    num_devices: int | None = None,
    axis_name: str = "rx",
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """A 1-D device mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=(axis_name,))


def shard_along(x: ArrayLike, mesh: Mesh, axis: int = 0) -> Array:
    """Place ``x`` sharded along ``axis`` over the mesh's (single) axis."""
    axis_name = mesh.axis_names[0]
    spec = [None] * jnp.ndim(x)
    spec[axis] = axis_name
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(*spec)))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every array leaf of a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())

    def put(x: Any) -> Any:
        if isinstance(x, (jax.Array, np.ndarray)):
            return jax.device_put(jnp.asarray(x), sharding)
        return x

    return jax.tree_util.tree_map(put, tree)


def sharded_trace_paths(
    scene: Scene,
    order: int,
    mesh: Mesh,
    *,
    shard_candidates: bool = True,
    **solver_kwargs: Any,
) -> TracedPaths:
    """Exhaustive trace with the candidate axis sharded across chips.

    Because candidates are decoded from a closed-form index mapping, each
    chip could decode its own index range locally; with ``jax.sharding``
    the same effect falls out of sharding the candidate array and letting
    XLA partition the (embarrassingly parallel) trace. Geometry and TX/RX
    are replicated.
    """
    num_primitives = scene.mesh.num_primitives
    candidates = generate_path_candidates(num_primitives, order)
    if scene.mesh.assume_quads:
        candidates = 2 * candidates

    n = mesh.devices.size
    num_candidates = candidates.shape[0]
    pad = (-num_candidates) % n
    if pad and shard_candidates:
        # Pad with repeats of candidate 0; padded rows are masked out below.
        candidates = jnp.concatenate(
            (candidates, jnp.broadcast_to(candidates[:1], (pad, order))), axis=0
        )
    if shard_candidates:
        candidates = shard_along(candidates, mesh, axis=0)

    scene = replicate(scene, mesh)

    paths = _trace_path_candidates(
        scene.mesh,
        scene.transmitters.reshape(-1, 3),
        scene.receivers.reshape(-1, 3),
        candidates,
        **solver_kwargs,
    )
    if pad and shard_candidates:
        # Mask out the padded duplicates (shape stays sharding-friendly).
        valid = jnp.arange(candidates.shape[0]) < num_candidates
        import differt_tpu.treekit as tk

        paths = tk.tree_at(lambda p: p.mask, paths, paths.mask & valid)
    return paths


def sharded_power_map(
    scene: Scene,
    frequency: Float[ArrayLike, ""],
    mesh: Mesh,
    *,
    order: int = 1,
    eta_r: Float[ArrayLike, " num_materials"] | None = None,
    conductivity: Float[ArrayLike, " num_materials"] | None = None,
    thickness: Float[ArrayLike, " num_materials"] | None = None,
    coherent: bool = True,
) -> Float[Array, "..."]:
    """Coverage map with the RX axis sharded across chips.

    Receivers are flattened, padded to a multiple of the mesh size, and
    sharded; the whole trace + EM pipeline runs SPMD with geometry
    replicated; the output map keeps the RX sharding.
    """
    from ..em import materials as itu_materials

    if eta_r is None or conductivity is None:
        names = scene.mesh.material_names or ("Vacuum",)
        eta_r = jnp.array([
            itu_materials[name].relative_permittivity(frequency) for name in names
        ])
        conductivity = jnp.array([
            itu_materials[name].conductivity(frequency) for name in names
        ])
        thickness = jnp.array([
            itu_materials[name].thickness
            if itu_materials[name].thickness is not None
            else -1.0
            for name in names
        ])

    rx_batch = scene.receivers.shape[:-1]
    rx_flat = scene.receivers.reshape(-1, 3)
    num_rx = rx_flat.shape[0]
    n = mesh.devices.size
    pad = (-num_rx) % n
    if pad:
        rx_flat = jnp.concatenate(
            (rx_flat, jnp.broadcast_to(rx_flat[:1], (pad, 3))), axis=0
        )
    rx_flat = shard_along(rx_flat, mesh, axis=0)

    import differt_tpu.treekit as tk

    scene = replicate(scene, mesh)
    scene = tk.tree_at(lambda s: s.receivers, scene, rx_flat)

    paths = scene.trace_paths(order=order)
    power = received_power(
        paths,
        scene,
        frequency,
        eta_r=eta_r,
        conductivity=conductivity,
        thickness=thickness,
        coherent=coherent,
    )
    tx_batch = scene.transmitters.shape[:-1]
    power = power.reshape(*tx_batch, -1)[..., :num_rx]
    return power.reshape(*tx_batch, *rx_batch)


def training_step(
    scene: Scene,
    frequency: Float[ArrayLike, ""],
    mesh: Mesh,
    *,
    order: int,
    eta_r: Float[Array, " num_materials"],
    conductivity: Float[Array, " num_materials"],
    target_power: Float[Array, "..."],
    learning_rate: float = 1e-2,
) -> tuple[Float[Array, " num_materials"], Float[Array, ""]]:
    """One SPMD gradient-descent step on material permittivity.

    The RX axis is sharded; ``eta_r`` is replicated, so XLA all-reduces its
    gradient over ICI as part of the backward pass (the "config 4" pattern:
    differentiable coverage map -> gradient descent on permittivity).
    """

    def loss_fn(eta: Array) -> Array:
        power = sharded_power_map(
            scene,
            frequency,
            mesh,
            order=order,
            eta_r=eta,
            conductivity=conductivity,
        )
        power_db = 10.0 * jnp.log10(jnp.maximum(power, 1e-30))
        return jnp.mean((power_db - target_power) ** 2)

    loss, grad = jax.value_and_grad(loss_fn)(eta_r)
    return eta_r - learning_rate * grad, loss


def placement_training_step(
    scene: Scene,
    frequency: Float[ArrayLike, ""],
    mesh: Mesh,
    *,
    order: int,
    tx: Float[Array, "num_tx 3"],
    eta_r: Float[Array, " num_materials"],
    conductivity: Float[Array, " num_materials"],
    target_power: Float[Array, "..."] | None = None,
    tx_learning_rate: float = 1e-1,
    eta_learning_rate: float = 1e-2,
) -> tuple[Float[Array, "num_tx 3"], Float[Array, " num_materials"], Float[Array, ""]]:
    """One SPMD gradient step on TX positions AND material permittivity.

    The BASELINE config-5 pattern: the RX axis is sharded across the
    device mesh; TX positions and ``eta_r`` are replicated, so XLA
    all-reduces their gradients over ICI as part of the backward pass.
    Gradients flow into the TX coordinates through the image method (path
    geometry depends on TX) and the EM chain (departure directions,
    spreading, phase); path-validity masks are boolean and act as frozen
    selectors, exactly as in the reference's differentiability contract.

    With ``target_power`` (dB), minimizes the dB MSE; without it,
    maximizes mean received power over the RX grid (coverage-optimal TX
    placement).
    """

    def loss_fn(params: dict[str, Array]) -> Array:
        import differt_tpu.treekit as tk

        s = tk.tree_at(lambda sc: sc.transmitters, scene, params["tx"])
        power = sharded_power_map(
            s,
            frequency,
            mesh,
            order=order,
            eta_r=params["eta_r"],
            conductivity=conductivity,
        )
        power_db = 10.0 * jnp.log10(jnp.maximum(power, 1e-30))
        if target_power is not None:
            return jnp.mean((power_db - target_power) ** 2)
        return -jnp.mean(power_db)

    params = {"tx": tx, "eta_r": eta_r}
    loss, grads = jax.value_and_grad(loss_fn)(params)
    return (
        tx - tx_learning_rate * grads["tx"],
        eta_r - eta_learning_rate * grads["eta_r"],
        loss,
    )
