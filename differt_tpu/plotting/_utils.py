"""Backend dispatch, defaults registry, and figure-reuse context.

Reference parity: differt/src/differt/plotting/_utils.py (simplified to the
two backends that make sense headless: plotly and matplotlib).
"""

import contextlib
from contextvars import ContextVar
from typing import Any

PlotOutput = Any
"""A backend-specific figure object."""

SUPPORTED_BACKENDS = ("plotly", "matplotlib")


def _pick_default_backend() -> str:
    import importlib.util

    if importlib.util.find_spec("plotly") is not None:
        return "plotly"
    return "matplotlib"


_DEFAULT_BACKEND: str = _pick_default_backend()
_DEFAULT_KWARGS: dict[str, dict[str, Any]] = {b: {} for b in SUPPORTED_BACKENDS}

_CURRENT_FIGURE: ContextVar[Any] = ContextVar("differt_tpu_current_figure", default=None)
_CURRENT_BACKEND: ContextVar[str | None] = ContextVar(
    "differt_tpu_current_backend", default=None
)


def set_backend(backend: str) -> None:
    """Set the process-global default plotting backend."""
    if backend not in SUPPORTED_BACKENDS:
        msg = (
            f"Unsupported backend {backend!r}, "
            f"allowed values are: {', '.join(SUPPORTED_BACKENDS)}."
        )
        raise ValueError(msg)
    global _DEFAULT_BACKEND
    _DEFAULT_BACKEND = backend


def get_backend(backend: str | None = None) -> str:
    """Resolve the active backend name."""
    if backend is not None:
        if backend not in SUPPORTED_BACKENDS:
            msg = (
                f"Unsupported backend {backend!r}, "
                f"allowed values are: {', '.join(SUPPORTED_BACKENDS)}."
            )
            raise ValueError(msg)
        return backend
    return _CURRENT_BACKEND.get() or _DEFAULT_BACKEND


def set_defaults(backend: str, **kwargs: Any) -> None:
    """Replace default kwargs for a backend."""
    _DEFAULT_KWARGS[get_backend(backend)] = kwargs


def update_defaults(backend: str, **kwargs: Any) -> None:
    """Update (merge) default kwargs for a backend."""
    _DEFAULT_KWARGS[get_backend(backend)].update(kwargs)


def merged_kwargs(backend: str, kwargs: dict[str, Any]) -> dict[str, Any]:
    """Backend defaults overridden by per-call kwargs."""
    return {**_DEFAULT_KWARGS.get(backend, {}), **kwargs}


@contextlib.contextmanager
def use(backend: str):
    """Temporarily switch the default backend."""
    token = _CURRENT_BACKEND.set(get_backend(backend))
    try:
        yield
    finally:
        _CURRENT_BACKEND.reset(token)


def current_figure() -> Any:
    """The figure currently being reused, if any."""
    return _CURRENT_FIGURE.get()


@contextlib.contextmanager
def reuse(backend: str | None = None, pass_all_kwargs: bool = False, **kwargs: Any):
    """Context reusing a single figure across multiple ``draw_*`` calls.

    Yields the figure object (created lazily by the first draw call).
    """
    del pass_all_kwargs, kwargs
    resolved = get_backend(backend)
    backend_token = _CURRENT_BACKEND.set(resolved)
    if resolved == "plotly":
        import plotly.graph_objects as go

        fig = go.Figure()
    else:
        import matplotlib.pyplot as plt

        fig = plt.figure()
    fig_token = _CURRENT_FIGURE.set(fig)
    try:
        yield fig
    finally:
        _CURRENT_FIGURE.reset(fig_token)
        _CURRENT_BACKEND.reset(backend_token)
