"""Minimal pytree-module toolkit (dataclasses as JAX pytrees).

The containers of this framework (Mesh, Scene, TracedPaths, solvers,
antennas, materials) are immutable dataclasses registered as JAX pytrees:
array-valued fields are children that ``jit`` / ``grad`` / ``vmap`` /
``shard_map`` trace through, while fields declared ``static=True`` go into
the treedef (hashed, trigger recompilation on change).

Provides the four primitives the framework needs:

- :class:`Module` — dataclass + pytree registration base class.
- :func:`field` — like :func:`dataclasses.field` with a ``static`` flag.
- :func:`tree_at` — out-of-place attribute update via a path-recording
  proxy (supports nested attribute chains and tuples of targets).
- :func:`filter_jit` — ``jax.jit`` that partitions arguments by value:
  array leaves are traced, everything else is auto-static.
"""

import dataclasses
from typing import Any, Callable, Generic, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

_T = TypeVar("_T")


class _AbstractVarMarker:
    """Sentinel annotation produced by ``AbstractVar[...]``."""

    __slots__ = ()


class _AbstractVarMeta(type):
    def __getitem__(cls, item: Any) -> Any:
        return _AbstractVarMarker()


class AbstractVar(Generic[_T], metaclass=_AbstractVarMeta):
    """Marker annotation for fields that concrete subclasses must define."""


def field(
    *,
    default: Any = dataclasses.MISSING,
    default_factory: Any = dataclasses.MISSING,
    static: bool = False,
    **kwargs: Any,
) -> Any:
    """Dataclass field with a ``static`` (treedef vs child) flag."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = static
    if default is not dataclasses.MISSING:
        return dataclasses.field(default=default, metadata=metadata, **kwargs)
    if default_factory is not dataclasses.MISSING:
        return dataclasses.field(
            default_factory=default_factory, metadata=metadata, **kwargs
        )
    return dataclasses.field(metadata=metadata, **kwargs)


def _is_abstract_annotation(annotation: Any) -> bool:
    if isinstance(annotation, _AbstractVarMarker) or annotation is AbstractVar:
        return True
    return isinstance(annotation, str) and "AbstractVar" in annotation


class _ModuleMeta(type):
    def __new__(mcs, name, bases, namespace, **kwargs):
        cls = super().__new__(mcs, name, bases, namespace, **kwargs)
        # Strip AbstractVar annotations: they are declarations, not fields.
        annotations = dict(cls.__dict__.get("__annotations__", {}))
        for key, annotation in list(annotations.items()):
            if _is_abstract_annotation(annotation):
                del annotations[key]
        cls.__annotations__ = annotations

        has_custom_init = "__init__" in namespace
        cls = dataclasses.dataclass(eq=False, repr="__repr__" not in namespace, init=not has_custom_init)(cls)

        static_names = tuple(
            f.name for f in dataclasses.fields(cls) if f.metadata.get("static", False)
        )
        dynamic_names = tuple(
            f.name
            for f in dataclasses.fields(cls)
            if not f.metadata.get("static", False)
        )
        cls.__static_field_names__ = static_names
        cls.__dynamic_field_names__ = dynamic_names

        def flatten_with_keys(obj):
            children = tuple(
                (jax.tree_util.GetAttrKey(k), getattr(obj, k)) for k in dynamic_names
            )
            aux = tuple(getattr(obj, k) for k in static_names)
            return children, aux

        def flatten(obj):
            return (
                tuple(getattr(obj, k) for k in dynamic_names),
                tuple(getattr(obj, k) for k in static_names),
            )

        def unflatten(aux, children):
            obj = object.__new__(cls)
            for k, v in zip(dynamic_names, children):
                object.__setattr__(obj, k, v)
            for k, v in zip(static_names, aux):
                object.__setattr__(obj, k, v)
            return obj

        jax.tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten_func=flatten
        )

        # Run dataclass __post_init__-style checks after generated init.
        if "__check_init__" in namespace or any(
            hasattr(base, "__check_init__") for base in bases
        ):
            original_init = cls.__init__

            def init_with_check(self, *args: Any, **kw: Any) -> None:
                original_init(self, *args, **kw)
                check = getattr(self, "__check_init__", None)
                if check is not None:
                    check()

            cls.__init__ = init_with_check
        return cls


class Module(metaclass=_ModuleMeta):
    """Base class: a dataclass registered as a JAX pytree.

    Fields are children unless declared with ``field(static=True)``.
    Subclasses may define a custom ``__init__`` and a ``__check_init__``
    validation hook.
    """


def _resolve(pytree: Any) -> Any:
    return pytree


class _PathProxy:
    """Records attribute-access chains for :func:`tree_at` targeting."""

    __slots__ = ("_path",)

    def __init__(self, path: tuple[str, ...] = ()) -> None:
        object.__setattr__(self, "_path", path)

    def __getattr__(self, name: str) -> "_PathProxy":
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return _PathProxy((*object.__getattribute__(self, "_path"), name))


def _replace_at(obj: Any, path: tuple[str, ...], value: Any) -> Any:
    if not path:
        return value
    head, *rest = path
    child = getattr(obj, head)
    new_child = _replace_at(child, tuple(rest), value)
    clone = object.__new__(type(obj))
    for f in dataclasses.fields(obj):
        object.__setattr__(clone, f.name, getattr(obj, f.name))
    object.__setattr__(clone, head, new_child)
    return clone


def tree_at(
    where: Callable[[Any], Any],
    pytree: _T,
    replace: Any = dataclasses.MISSING,
    *,
    is_leaf: Callable[[Any], bool] | None = None,
) -> _T:
    """Out-of-place update of the attribute(s) selected by ``where``.

    ``where`` must select attributes via plain attribute chains on its
    argument (e.g. ``lambda m: m.vertices`` or
    ``lambda s: (s.mesh.vertices, s.transmitters)``). ``replace`` is the new
    value, or a tuple of values matching a tuple of targets.

    Examples:
        >>> from differt_tpu import treekit as tk
        >>> class Point(tk.Module):
        ...     x: float
        ...     y: float
        >>> p = Point(1.0, 2.0)
        >>> tk.tree_at(lambda q: q.y, p, 5.0)
        Point(x=1.0, y=5.0)
        >>> p.y  # immutable: the original is unchanged
        2.0
    """
    del is_leaf
    selected = where(_PathProxy())
    if isinstance(selected, tuple):
        paths = [object.__getattribute__(p, "_path") for p in selected]
        values = list(replace)
    else:
        paths = [object.__getattribute__(selected, "_path")]
        values = [replace]
    out = pytree
    for path, value in zip(paths, values):
        out = _replace_at(out, path, value)
    return out


def _is_array(x: Any) -> bool:
    return isinstance(x, (jax.Array, np.ndarray)) or hasattr(x, "aval")


class _Static:
    """Hashable wrapper for the static side of a partitioned pytree."""

    __slots__ = ("value",)

    def __init__(self, value: Any) -> None:
        self.value = value

    def __hash__(self) -> int:
        return hash(_hashable(self.value))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _Static) and _hashable(self.value) == _hashable(
            other.value
        )


def _hashable(value: Any) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(value)
    return (tuple(id(x) if isinstance(x, np.ndarray) else x for x in leaves), treedef)


_SENTINEL = object()


def filter_jit(fun: Callable[..., Any]) -> Callable[..., Any]:
    """``jax.jit`` with value-driven partitioning: arrays traced, rest static.

    Mirrors the semantics the reference relies on from
    ``equinox.filter_jit``: module fields holding arrays participate in
    tracing, scalar/None/str/callable fields become static without manual
    ``static_argnums`` bookkeeping.
    """

    def _inner(dynamic_leaves, structure, static_leaves):
        markers, treedef = structure
        static_iter = iter(static_leaves.value)
        dynamic_iter = iter(dynamic_leaves)
        leaves = [
            next(dynamic_iter) if marker else next(static_iter)
            for marker in markers
        ]
        args, kwargs = jax.tree_util.tree_unflatten(treedef, leaves)
        return fun(*args, **kwargs)

    jitted_inner = jax.jit(_inner, static_argnums=(1, 2))

    def wrapper(*args: Any, **kwargs: Any) -> Any:
        leaves, treedef = jax.tree_util.tree_flatten(
            (args, kwargs), is_leaf=lambda x: x is None
        )
        dynamic = [x for x in leaves if _is_array(x)]
        static = [x for x in leaves if not _is_array(x)]
        markers = tuple(_is_array(x) for x in leaves)
        return jitted_inner(dynamic, (markers, treedef), _Static(tuple(static)))

    wrapper.__name__ = getattr(fun, "__name__", "filter_jit")
    wrapper.__doc__ = fun.__doc__
    wrapper.__wrapped__ = fun
    return wrapper


def _npz_path(path) -> str:
    """Normalize to a ``.npz`` suffix: ``np.savez`` appends it on save, so
    the loader must look for the same name."""
    import os

    path = os.fspath(path)
    return path if path.endswith(".npz") else path + ".npz"


def tree_serialise_leaves(path, pytree) -> None:
    """Save every array leaf of a pytree to ``path`` (.npz).

    Mirrors ``equinox.tree_serialise_leaves``: only array leaves are
    written (in flatten order); static fields stay in code. Use
    :func:`tree_deserialise_leaves` with a template of the same structure
    to restore — the checkpoint/resume story for solver/optimizer state
    (the reference never persists state; SURVEY.md section 5).
    """
    path = _npz_path(path)
    leaves = [
        np.asarray(leaf)
        for leaf in jax.tree_util.tree_leaves(pytree)
        if _is_array(leaf)
    ]
    np.savez(path, **{f"leaf_{i}": leaf for i, leaf in enumerate(leaves)})


def tree_deserialise_leaves(path, like):
    """Load array leaves saved by :func:`tree_serialise_leaves` into ``like``.

    ``like`` provides the pytree structure (and the static fields); every
    array leaf is replaced by the stored value (shapes are checked; values
    are cast to the template leaf's dtype).
    """
    with np.load(_npz_path(path)) as data:
        stored = [data[f"leaf_{i}"] for i in range(len(data.files))]

    leaves, treedef = jax.tree_util.tree_flatten(like)
    it = iter(stored)
    new_leaves = []
    for leaf in leaves:
        if _is_array(leaf):
            loaded = next(it)
            if tuple(loaded.shape) != tuple(jnp.shape(leaf)):
                msg = (
                    f"Shape mismatch deserialising leaf: stored "
                    f"{loaded.shape}, template {jnp.shape(leaf)}."
                )
                raise ValueError(msg)
            new_leaves.append(jnp.asarray(loaded, dtype=jnp.asarray(leaf).dtype))
        else:
            new_leaves.append(leaf)
    remaining = sum(1 for _ in it)
    if remaining:
        msg = f"Checkpoint has {remaining} extra leaves for this template."
        raise ValueError(msg)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
