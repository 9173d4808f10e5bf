"""Path containers: :class:`TracedPaths` and :class:`LaunchedPaths`.

Reference parity: differt/src/differt/geometry/_paths.py. Paths are stored
with full, fixed batch shapes plus a validity mask (boolean or float
confidence), the JIT- and sharding-stable representation: invalid paths are
masked, never dropped, so every chip holds identical shapes.
"""

from collections.abc import Callable, Iterator, Sequence
from itertools import zip_longest
from typing import Any

from differt_tpu import treekit as eqx
import jax
import jax.numpy as jnp
from jaxtyping import Array, ArrayLike, Bool, Float, Int, Num, Shaped


@jax.jit
def _cell_ids(array: Shaped[Array, "batch n"]) -> Int[Array, " batch"]:
    """Assign each row the index of its last duplicate (scan-based group ids)."""

    def body(indices: Array, row_and_index: tuple[Array, Array]) -> tuple[Array, None]:
        row, index = row_and_index
        indices = jnp.where((array == row).all(axis=-1), index, indices)
        return indices, None

    return jax.lax.scan(
        body,
        jnp.empty(array.shape[0], dtype=jnp.int32),
        (array, jnp.arange(array.shape[0])),
        reverse=True,
    )[0]


@jax.jit
def merge_cell_ids(
    cell_ids_a: Int[ArrayLike, " *batch"],
    cell_ids_b: Int[ArrayLike, " *batch"],
) -> Int[Array, " *batch"]:
    """Merge two cell-index arrays: equal output ids iff both input ids match.

    Reference parity: _paths.py:40-74.
    """
    cell_ids_a = jnp.asarray(cell_ids_a)
    cell_ids_b = jnp.asarray(cell_ids_b)
    batch = cell_ids_a.shape
    return _cell_ids(
        jnp.stack((cell_ids_a, cell_ids_b), axis=-1).reshape(-1, 2)
    ).reshape(batch)


class TracedPaths(eqx.Module):
    """Paths produced by exact tracing (image method / Fermat solvers).

    Reference parity: _paths.py:77-492.
    """

    vertices: Float[Array, "*batch path_length 3"]
    """Path vertex coordinates."""
    objects: Int[Array, "*batch path_length"]
    """Object index per vertex (-1 for TX/RX placeholders)."""
    mask: Bool[Array, " *batch"] | Float[Array, " *batch"]
    """Validity mask, or float confidence compared to :attr:`confidence_threshold`."""
    interaction_types: Int[Array, "*batch path_length-2"]
    """Per-bounce :class:`InteractionType<differt_tpu.em.InteractionType>` values (-1 = padded)."""
    confidence_threshold: Float[ArrayLike, ""] = 0.5
    """Threshold above which a float confidence counts as valid."""

    @property
    def shape(self) -> tuple[int, ...]:
        """Batch shape."""
        return self.vertices.shape[:-2]

    @property
    def path_length(self) -> int:
        """Number of vertices per path."""
        return self.objects.shape[-1]

    @property
    def order(self) -> int:
        """Number of interactions per path."""
        return self.path_length - 2

    def _bool_mask(self) -> Bool[Array, " *batch"]:
        if self.mask.dtype == jnp.bool_:
            return self.mask
        return self.mask >= self.confidence_threshold

    @property
    def num_valid_paths(self) -> Int[Array, ""]:
        """Traceable count of valid paths."""
        return self._bool_mask().sum()

    def reshape(self, *batch: int) -> "TracedPaths":
        """Reshape batch dimensions."""
        vertices = self.vertices.reshape(*batch, self.path_length, 3)
        resolved = vertices.shape[:-2]
        return eqx.tree_at(
            lambda p: (p.vertices, p.objects, p.mask, p.interaction_types),
            self,
            (
                vertices,
                self.objects.reshape(*resolved, self.path_length),
                self.mask.reshape(*resolved),
                self.interaction_types.reshape(*resolved, self.path_length - 2),
            ),
        )

    def squeeze(self, axis: int | Sequence[int] | None = None) -> "TracedPaths":
        """Squeeze batch dimensions."""
        ndim = self.vertices.ndim - 2
        if axis is not None and ndim == 0:
            msg = "Cannot squeeze a 0-dimensional batch!"
            raise ValueError(msg)
        if isinstance(axis, int):
            axis = (axis,)
        if isinstance(axis, Sequence):
            axis = tuple(a + ndim if a < 0 else a for a in axis)
            if any(a >= ndim or a < 0 for a in axis):
                msg = "One of the provided axes is out-of-bounds!"
                raise ValueError(msg)
        return eqx.tree_at(
            lambda p: (p.vertices, p.objects, p.mask, p.interaction_types),
            self,
            (
                self.vertices.squeeze(axis),
                self.objects.squeeze(axis),
                self.mask.squeeze(axis),
                self.interaction_types.squeeze(axis),
            ),
        )

    @eqx.filter_jit
    def mask_duplicate_objects(self, axis: int = -1) -> "TracedPaths":
        """Mask paths whose object sequence duplicates an earlier one (JIT-safe).

        Reference parity: _paths.py:195-252.
        """
        ndim = self.objects.ndim - 1
        batch = self.objects.shape[:-1]
        if not -ndim <= axis < ndim:
            msg = f"The provided axis {axis} is out-of-bounds for batch of dimensions {ndim}!"
            raise ValueError(msg)

        size = batch[axis]
        objects = jnp.moveaxis(self.objects, axis if axis >= 0 else axis - 1, -2)
        indices = jnp.arange(size, dtype=objects.dtype)

        def keep_first(rows: Int[Array, "axis_length path_length"]) -> Array:
            _, index = jnp.unique(rows, axis=0, size=size, return_index=True)
            return jnp.isin(indices, index)

        f = keep_first
        for _ in range(max(ndim - 1, 0)):
            f = jax.vmap(f)

        non_duplicates = jnp.moveaxis(f(objects), -1, axis)
        return eqx.tree_at(lambda p: p.mask, self, self.mask * non_duplicates)

    @property
    def masked_vertices(self) -> Float[Array, "num_valid_paths path_length 3"]:
        """Flattened vertices of valid paths only (not jittable)."""
        vertices = self.vertices.reshape(-1, self.path_length, 3)
        return vertices[self._bool_mask().reshape(-1), ...]

    @property
    def masked_objects(self) -> Int[Array, "num_valid_paths path_length"]:
        """Flattened objects of valid paths only (not jittable)."""
        objects = self.objects.reshape(-1, self.path_length)
        return objects[self._bool_mask().reshape(-1), ...]

    def masked(self) -> "TracedPaths":
        """Flatten batch dimensions and keep only valid paths (not jittable)."""
        paths = self.reshape(-1)
        mask = paths._bool_mask()
        return eqx.tree_at(
            lambda p: (p.vertices, p.objects, p.mask, p.interaction_types),
            paths,
            (
                paths.vertices[mask, ...],
                paths.objects[mask, ...],
                mask[mask],
                paths.interaction_types[mask, ...],
            ),
        )

    @eqx.filter_jit
    def multipath_cells(self, axis: int = -1) -> Int[Array, " *partial_batch"]:
        """Group batch entries sharing an identical validity pattern.

        Reference parity: _paths.py:330-375.
        """
        mask = jnp.moveaxis(self._bool_mask(), axis, -1)
        *partial_batch, last = mask.shape
        return _cell_ids(mask.reshape(-1, last)).reshape(partial_batch)

    @jax.jit
    def group_by_objects(self) -> Int[Array, " *batch"]:
        """Group paths undergoing the same object interactions.

        Reference parity: _paths.py:377-421.
        """
        *batch, path_length = self.objects.shape
        return _cell_ids(self.objects.reshape(-1, path_length)).reshape(batch)

    def reduce(
        self,
        fun: Callable[[Num[Array, "*batch path_length 3"]], Num[Array, " *batch"]],
        axis: int | Sequence[int] | None = None,
    ) -> Num[Array, "..."]:
        """Masked sum of ``fun(vertices)`` over (some) batch axes.

        With a float confidence mask, contributions are weighted by the
        confidence, keeping the result differentiable through the mask.
        Reference parity: _paths.py:461-479.
        """
        if self.mask.dtype != jnp.bool_:
            return jnp.sum(fun(self.vertices) * self.mask, axis=axis)
        return jnp.sum(fun(self.vertices), axis=axis, where=self.mask)

    def __iter__(self) -> Iterator["TracedPaths"]:
        """Iterate over individually-masked valid paths."""
        masked = self.masked()
        for vertices, objects, interaction_types in zip_longest(
            masked.vertices, masked.objects, masked.interaction_types
        ):
            yield TracedPaths(
                vertices=vertices,
                objects=objects,
                mask=jnp.ones((), dtype=jnp.bool_),
                interaction_types=interaction_types,
                confidence_threshold=masked.confidence_threshold,
            )

    def plot(self, **kwargs: Any):
        """Plot the valid paths. See :func:`differt_tpu.plotting.draw_paths`."""
        from ..plotting import draw_paths

        return draw_paths(self.masked_vertices, **kwargs)


class Paths(TracedPaths):
    """Deprecated alias for :class:`TracedPaths` (reference parity: _paths.py:496-510)."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        import warnings

        warnings.warn(
            "Paths is deprecated, use TracedPaths instead.",
            DeprecationWarning,
            stacklevel=2,
        )
        super().__init__(*args, **kwargs)


class LaunchedPaths(eqx.Module):
    """Paths produced by ray launching (SBR), with per-order masks.

    Reference parity: _paths.py:513-714.
    """

    vertices: Float[Array, "*batch path_length 3"]
    """Path vertex coordinates."""
    objects: Int[Array, "*batch path_length"]
    """Object index per vertex."""
    masks: Bool[Array, "*batch path_length-1"]
    """One validity mask per path order."""
    interaction_types: Int[Array, "*batch path_length-2"]
    """Per-bounce interaction types."""
    confidence_threshold: Float[ArrayLike, ""] = 0.5
    """Confidence threshold (kept for symmetry with :class:`TracedPaths`)."""

    @property
    def shape(self) -> tuple[int, ...]:
        """Batch shape."""
        return self.vertices.shape[:-2]

    @property
    def path_length(self) -> int:
        """Number of vertices per path."""
        return self.objects.shape[-1]

    @property
    def order(self) -> int:
        """Number of interactions per path."""
        return self.path_length - 2

    @property
    def mask(self) -> Bool[Array, " *batch"]:
        """Alias for the highest-order mask."""
        return self.masks[..., -1]

    def get_paths(self, order: int) -> TracedPaths:
        """Extract the :class:`TracedPaths` of a given order."""
        if order < 0 or order > self.order:
            msg = (
                f"Paths order must be strictly between 0 and {self.order} (incl.), "
                f"but you provided {order}."
            )
            raise ValueError(msg)
        vertices = jnp.concatenate(
            (self.vertices[..., : order + 1, :], self.vertices[..., -1:, :]), axis=-2
        )
        objects = jnp.concatenate(
            (self.objects[..., : order + 1], self.objects[..., -1:]), axis=-1
        )
        return TracedPaths(
            vertices=vertices,
            objects=objects,
            mask=self.masks[..., order],
            interaction_types=self.interaction_types[..., :order],
            confidence_threshold=self.confidence_threshold,
        )

    def reshape(self, *batch: int) -> "LaunchedPaths":
        """Reshape batch dimensions."""
        vertices = self.vertices.reshape(*batch, self.path_length, 3)
        resolved = vertices.shape[:-2]
        return eqx.tree_at(
            lambda p: (p.vertices, p.objects, p.masks, p.interaction_types),
            self,
            (
                vertices,
                self.objects.reshape(*resolved, self.path_length),
                self.masks.reshape(*resolved, self.masks.shape[-1]),
                self.interaction_types.reshape(*resolved, self.path_length - 2),
            ),
        )

    def squeeze(self, axis: int | Sequence[int] | None = None) -> "LaunchedPaths":
        """Squeeze batch dimensions."""
        ndim = self.vertices.ndim - 2
        if axis is not None and ndim == 0:
            msg = "Cannot squeeze a 0-dimensional batch!"
            raise ValueError(msg)
        if isinstance(axis, int):
            axis = (axis,)
        if isinstance(axis, Sequence):
            axis = tuple(a + ndim if a < 0 else a for a in axis)
            if any(a >= ndim or a < 0 for a in axis):
                msg = "One of the provided axes is out-of-bounds!"
                raise ValueError(msg)
        return eqx.tree_at(
            lambda p: (p.vertices, p.objects, p.masks, p.interaction_types),
            self,
            (
                self.vertices.squeeze(axis),
                self.objects.squeeze(axis),
                self.masks.squeeze(axis),
                self.interaction_types.squeeze(axis),
            ),
        )

    def masked(self) -> TracedPaths:
        """Flattened highest-order valid paths."""
        return self.get_paths(self.order).masked()

    @property
    def masked_vertices(self) -> Float[Array, "num_valid_paths path_length 3"]:
        """Flattened vertices of valid highest-order paths."""
        return self.get_paths(self.order).masked_vertices

    @property
    def masked_objects(self) -> Int[Array, "num_valid_paths path_length"]:
        """Flattened objects of valid highest-order paths."""
        return self.get_paths(self.order).masked_objects

    def __iter__(self) -> Iterator[TracedPaths]:
        """Iterate over highest-order masked paths."""
        yield from self.get_paths(self.order)

    def plot(self, **kwargs: Any):
        """Plot paths of every order."""
        from ..plotting import reuse

        with reuse(**kwargs, pass_all_kwargs=True) as output:
            for order in range(self.order + 1):
                self.get_paths(order).plot()
        return output


class SBRPaths(LaunchedPaths):
    """Deprecated alias for :class:`LaunchedPaths` (reference parity: _paths.py:718-732)."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        import warnings

        warnings.warn(
            "SBRPaths is deprecated, use LaunchedPaths instead.",
            DeprecationWarning,
            stacklevel=2,
        )
        super().__init__(*args, **kwargs)
