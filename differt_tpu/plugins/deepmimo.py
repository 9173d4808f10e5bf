"""DeepMIMO export: traced paths + scene materials -> complex channel data.

Reference parity: differt/src/differt/plugins/deepmimo.py. The per-bounce
Jones chain is delegated to the first-class
:func:`differt_tpu.em.transition_matrix` op; everything after the material
table lookup is jit-able and differentiable (the basis of differentiable
coverage maps).
"""

__all__ = ("DeepMIMO", "export")

from collections.abc import Iterable, Mapping
from dataclasses import KW_ONLY, asdict
from typing import Any, Generic, Literal, TypeVar

from differt_tpu import treekit as eqx
import jax
import jax.numpy as jnp
from jaxtyping import Array, ArrayLike, Bool, Float, Int, Shaped

from ..em import (
    InteractionType,
    Material,
    c,
    epsilon_0,
    materials,
    spherical_basis,
    transition_apply,
    z_0,
)
from ..geometry import Scene, TracedPaths, cartesian_to_spherical, normalize
from ..utils import safe_divide

ArrayType = TypeVar("ArrayType")


def _pad_and_concat(
    left: Shaped[Array, "num_tx num_rx num_paths_left num_inter_left ..."],
    right: Shaped[Array, "num_tx num_rx num_paths_right num_inter_right ..."],
    fill_value: Any,
) -> Array:
    """Concatenate along the paths axis, padding interactions to the max."""
    max_inter = max(left.shape[3], right.shape[3])
    extra = [(0, 0)] * (left.ndim - 4)
    left = jnp.pad(
        left,
        ((0, 0), (0, 0), (0, 0), (0, max_inter - left.shape[3]), *extra),
        constant_values=fill_value,
    )
    right = jnp.pad(
        right,
        ((0, 0), (0, 0), (0, 0), (0, max_inter - right.shape[3]), *extra),
        constant_values=fill_value,
    )
    return jnp.concatenate((left, right), axis=2)


class DeepMIMO(eqx.Module, Generic[ArrayType]):
    """DeepMIMO-format channel data (one entry per path).

    Reference parity: plugins/deepmimo.py:85-332.
    """

    _: KW_ONLY
    power: Float[ArrayType, "num_tx num_rx num_paths"]
    """Received power per path (dBW, 0 dBW transmitted)."""
    phase: Float[ArrayType, "num_tx num_rx num_paths"]
    """Received phase per path (degrees)."""
    delay: Float[ArrayType, "num_tx num_rx num_paths"]
    """Propagation delay per path (seconds)."""
    aoa_az: Float[ArrayType, "num_tx num_rx num_paths"]
    """Angle of arrival, azimuth (degrees)."""
    aoa_el: Float[ArrayType, "num_tx num_rx num_paths"]
    """Angle of arrival, elevation (degrees)."""
    aod_az: Float[ArrayType, "num_tx num_rx num_paths"]
    """Angle of departure, azimuth (degrees)."""
    aod_el: Float[ArrayType, "num_tx num_rx num_paths"]
    """Angle of departure, elevation (degrees)."""
    primitives: Int[ArrayType, "num_tx num_rx num_paths max_inter"] | None = None
    """Optional primitive indices along each path (-1 = none)."""
    inter: Int[ArrayType, "num_tx num_rx num_paths max_inter"] = None
    """Interaction types along each path (-1 = none)."""
    inter_pos: Float[ArrayType, "num_tx num_rx num_paths max_inter 3"] = None
    """Interaction point coordinates (m)."""
    rx_pos: Float[ArrayType, "num_rx 3"] = None
    """Receiver positions (m)."""
    tx_pos: Float[ArrayType, "num_tx 3"] = None
    """Transmitter positions (m)."""
    mask: Bool[ArrayType, "num_tx num_rx num_paths"] = None
    """Valid-path mask."""

    @property
    def num_tx(self) -> int:
        """Number of transmitters."""
        return self.mask.shape[0]

    @property
    def num_rx(self) -> int:
        """Number of receivers."""
        return self.mask.shape[1]

    @property
    def num_paths(self) -> int:
        """Number of paths."""
        return self.mask.shape[2]

    def asdict(self) -> dict[str, ArrayType]:
        """Convert to a plain dictionary."""
        return asdict(self)

    def numpy(self) -> "DeepMIMO":
        """Convert all arrays to NumPy."""
        import numpy as np

        return jax.tree.map(lambda x: np.asarray(x), self)

    def jax(self) -> "DeepMIMO[Array]":
        """Convert all arrays to JAX arrays."""
        return jax.tree.map(jnp.asarray, self)

    def sort_by_vertices(
        self,
        vertices: Float[ArrayLike, "num_tx num_rx num_paths max_inter 3"],
        interactions: Int[ArrayLike, "num_tx num_rx num_paths max_inter"],
    ) -> "DeepMIMO[Array]":
        """Reorder paths to match an external path ordering.

        For each external path (given by its interaction positions and
        types), the closest matching internal path is found and paths are
        permuted accordingly — useful for comparing against another ray
        tracer (e.g., Sionna RT) whose path order differs.
        Reference parity: plugins/deepmimo.py:160-220 (``_sort``),
        generalized to plain arrays instead of ``sionna.rt.Paths``.
        """
        vertices = jnp.asarray(vertices)
        interactions = jnp.asarray(interactions)
        if vertices.shape != self.inter_pos.shape:
            msg = (
                "Cannot sort based on provided paths: shape mismatch, got "
                f"{vertices.shape!r} but expected {self.inter_pos.shape!r}."
            )
            raise ValueError(msg)

        max_inter = self.inter.shape[-1]
        distances = jnp.linalg.norm(
            self.inter_pos.reshape(-1, 1, max_inter, 3)
            - vertices.reshape(1, -1, max_inter, 3),
            axis=3,
        )
        type_mismatch = ~(
            self.inter.reshape(-1, 1, max_inter)
            == interactions.reshape(1, -1, max_inter)
        ).all(axis=-1)
        cost = distances.sum(
            axis=2,
            initial=jnp.where(type_mismatch, jnp.inf, 0.0),
            where=self.inter.reshape(-1, 1, max_inter) != -1,
        )
        indices = cost.argmin(axis=1)

        prefix = (self.num_tx, self.num_rx, self.num_paths)

        def sort_fn(x: Array) -> Array:
            if x is None or getattr(x, "shape", ())[: len(prefix)] != prefix:
                return x
            y = x.reshape(-1, *x.shape[len(prefix):])
            return y[indices, ...].reshape(x.shape)

        return jax.tree.map(sort_fn, self.jax())

    def iter_paths(self):
        """Iterate over valid path vertex arrays grouped by interaction count."""
        from ..geometry import SizedIterator

        max_inter = self.inter.shape[-1]

        def it():
            num_interactions = jnp.min(
                jnp.broadcast_to(jnp.arange(max_inter), self.inter.shape),
                initial=max_inter,
                where=self.inter == -1,
                axis=-1,
            )
            for num in range(max_inter + 1):
                where = (self.mask & (num_interactions == num)).reshape(-1)
                tx = jnp.broadcast_to(
                    self.tx_pos[:, None, None, :],
                    (self.num_tx, self.num_rx, self.num_paths, 3),
                ).reshape(-1, 3)[where, :]
                rx = jnp.broadcast_to(
                    self.rx_pos[None, :, None, :],
                    (self.num_tx, self.num_rx, self.num_paths, 3),
                ).reshape(-1, 3)[where, :]
                mid = self.inter_pos.reshape(-1, max_inter, 3)[where, :num, :]
                yield jnp.concatenate(
                    (tx[..., None, :], mid, rx[..., None, :]), axis=-2
                )

        return SizedIterator(it(), size=max_inter + 1)

    def plot_paths(self, **kwargs: Any):
        """Plot all valid paths."""
        from ..plotting import draw_paths, reuse

        with reuse(**kwargs, pass_all_kwargs=True) as output:
            for paths in self.iter_paths():
                draw_paths(paths)
        return output


def export(
    *,
    paths: TracedPaths | Iterable[TracedPaths],
    scene: Scene,
    radio_materials: Mapping[str, Material] | None = None,
    frequency: Float[ArrayLike, ""],
    include_primitives: bool = False,
    polarization: (
        Literal["V", "H"]
        | Float[ArrayLike, "3"]
        | tuple[Any, Any]
    ) = "V",
) -> DeepMIMO[Array]:
    """Export traced paths to the DeepMIMO format.

    Assumes far-field propagation in free space and isotropic antennas.
    Reference parity: plugins/deepmimo.py:408-724.
    """
    if scene.mesh.face_materials is None:
        msg = "Scene must contain information about face materials."
        raise ValueError(msg)
    if radio_materials is None:
        radio_materials = materials

    if isinstance(polarization, tuple) and len(polarization) == 2:
        tx_polarization, rx_polarization = polarization
    else:
        tx_polarization = rx_polarization = polarization

    paths_iter = [paths] if isinstance(paths, TracedPaths) else list(paths)

    eta_r = jnp.array([
        radio_materials[name].relative_permittivity(frequency)
        for name in scene.mesh.material_names
    ])
    conductivity = jnp.array([
        radio_materials[name].conductivity(frequency)
        for name in scene.mesh.material_names
    ])
    thickness = jnp.array([
        radio_materials[name].thickness
        if radio_materials[name].thickness is not None
        else -1.0
        for name in scene.mesh.material_names
    ])
    omega = 2.0 * jnp.pi * frequency
    epsilon_complex = eta_r - 1j * conductivity / (omega * epsilon_0)
    n_complex = jnp.sqrt(epsilon_complex)
    wavelength = c / frequency

    tx_pos = scene.transmitters.reshape(-1, 3)
    rx_pos = scene.receivers.reshape(-1, 3)
    num_tx = tx_pos.shape[0]
    num_rx = rx_pos.shape[0]

    a_all = jnp.zeros((num_tx, num_rx, 0), dtype=complex)
    k_d = jnp.zeros((num_tx, num_rx, 0, 3))
    k_a = jnp.zeros_like(k_d)
    lengths = jnp.zeros((num_tx, num_rx, 0))
    primitives = (
        jnp.zeros((num_tx, num_rx, 0, 0), dtype=int) if include_primitives else None
    )
    inter = jnp.zeros((num_tx, num_rx, 0, 0), dtype=int)
    inter_pos = jnp.zeros((num_tx, num_rx, 0, 0, 3))
    mask = jnp.zeros((num_tx, num_rx, 0), dtype=bool)

    for batch in paths_iter:
        batch = batch.reshape(num_tx, num_rx, -1)
        segments = jnp.diff(batch.vertices, axis=-2)
        k, s = normalize(segments, keepdims=True)

        if primitives is not None:
            primitives = _pad_and_concat(
                primitives, batch.objects[..., 1:-1], fill_value=-1
            )
        inter = _pad_and_concat(
            inter,
            batch.interaction_types
            if batch.interaction_types is not None
            else jnp.full_like(
                batch.objects[..., 1:-1], InteractionType.REFLECTION
            ),
            fill_value=-1,
        )
        inter_pos = _pad_and_concat(
            inter_pos, batch.vertices[..., 1:-1, :], fill_value=0.0
        )
        k_d = jnp.concatenate((k_d, k[..., 0, :]), axis=-2)
        k_a = jnp.concatenate((k_a, -k[..., -1, :]), axis=-2)

        theta_hat_0, phi_hat_0 = spherical_basis(k[..., 0, :])

        # Field components carried as scalar (theta, phi) arrays; trailing
        # [..., 2] axes are pathological on TPU (lane padding).
        shape = theta_hat_0.shape[:-1]
        if tx_polarization == "V":
            e_theta = jnp.ones(shape, dtype=complex)
            e_phi = jnp.zeros(shape, dtype=complex)
        elif tx_polarization == "H":
            e_theta = jnp.zeros(shape, dtype=complex)
            e_phi = jnp.ones(shape, dtype=complex)
        else:
            p = jnp.asarray(tx_polarization, dtype=complex)
            e_theta = jnp.sum(p * theta_hat_0, axis=-1)
            e_phi = jnp.sum(p * phi_hat_0, axis=-1)

        if batch.order > 0:
            obj_indices = batch.objects[..., 1:-1]
            mat_indices = jnp.take(scene.mesh.face_materials, obj_indices, axis=0)
            obj_normals = jnp.take(scene.mesh.normals, obj_indices, axis=0)
            n_r_val = jnp.take(n_complex, mat_indices, axis=0)
            thickness_val = jnp.take(thickness, mat_indices, axis=0)

            e_theta, e_phi = transition_apply(
                batch.vertices,
                obj_normals,
                n_r_val,
                thickness_val,
                wavelength,
                e_theta,
                e_phi,
                interaction_types=batch.interaction_types,
            )

        theta_hat_last, phi_hat_last = spherical_basis(k[..., -1, :])
        if rx_polarization in ("V", "H"):
            theta_hat_neg = spherical_basis(-k[..., -1, :])[0]
            a_coeff = jnp.sum(theta_hat_last * theta_hat_neg, axis=-1)
            if rx_polarization == "V":
                a_r = a_coeff * e_theta
            else:
                a_r = -a_coeff * e_phi
        else:
            p = jnp.asarray(rx_polarization)
            a_r = (
                jnp.sum(p * theta_hat_last, axis=-1) * e_theta
                + jnp.sum(p * phi_hat_last, axis=-1) * e_phi
            )

        s_tot = s.sum(axis=-2)
        spreading = safe_divide(1.0, s_tot)
        phase_val = -2.0 * jnp.pi * frequency * s_tot / c
        phase_shift = jax.lax.complex(jnp.cos(phase_val), jnp.sin(phase_val))
        a_r = a_r * (spreading * phase_shift)[..., 0]

        a_all = jnp.concatenate((a_all, a_r), axis=-1)
        lengths = jnp.concatenate((lengths, s_tot[..., 0]), axis=-1)
        mask = jnp.concatenate(
            (
                mask,
                batch.mask
                if batch.mask is not None
                else jnp.ones(
                    (num_tx, num_rx, batch.vertices.shape[2]), dtype=bool
                ),
            ),
            axis=-1,
        )

    a = a_all * (wavelength / (4 * jnp.pi))
    power = 10 * jnp.log10(jnp.abs(a) ** 2 / z_0)
    phase = jnp.angle(a, deg=True)
    delay = lengths / c

    _, aoa_el, aoa_az = jnp.split(cartesian_to_spherical(k_a), 3, axis=-1)
    _, aod_el, aod_az = jnp.split(cartesian_to_spherical(k_d), 3, axis=-1)

    return DeepMIMO(
        power=power,
        phase=phase,
        delay=delay,
        aoa_az=jnp.rad2deg(aoa_az).squeeze(axis=-1),
        aoa_el=jnp.rad2deg(aoa_el).squeeze(axis=-1),
        aod_az=jnp.rad2deg(aod_az).squeeze(axis=-1),
        aod_el=jnp.rad2deg(aod_el).squeeze(axis=-1),
        inter=inter,
        inter_pos=inter_pos,
        rx_pos=rx_pos,
        tx_pos=tx_pos,
        mask=mask,
        primitives=primitives,
    )
