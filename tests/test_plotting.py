"""Smoke tests for the plotting layer (matplotlib backend, headless)."""

import jax.numpy as jnp
import matplotlib
import numpy as np
import pytest

matplotlib.use("Agg")

from differt_tpu.geometry import Mesh
from differt_tpu.plotting import (
    draw_image,
    draw_markers,
    draw_mesh,
    draw_paths,
    draw_rays,
    draw_surface,
    get_backend,
    reuse,
    set_backend,
    use,
)


@pytest.fixture(autouse=True)
def mpl_backend():
    old = get_backend()
    set_backend("matplotlib")
    yield
    set_backend(old)


def test_backend_dispatch() -> None:
    assert get_backend() == "matplotlib"
    with pytest.raises(ValueError, match="Unsupported backend"):
        set_backend("vispy3d")
    with use("matplotlib"):
        assert get_backend() == "matplotlib"


def test_draw_mesh() -> None:
    fig = draw_mesh(Mesh.box(with_top=True))
    assert fig.axes


def test_draw_paths_and_rays() -> None:
    paths = jnp.zeros((4, 3, 3)).at[:, 1, 2].set(1.0)
    fig = draw_paths(paths)
    assert fig.axes
    fig = draw_rays(jnp.zeros((5, 3)), jnp.ones((5, 3)))
    assert fig.axes


def test_draw_markers_with_labels() -> None:
    fig = draw_markers(jnp.zeros((2, 3)), labels=["tx", "rx"])
    assert fig.axes


def test_draw_image_and_surface() -> None:
    data = np.random.default_rng(0).random((8, 8))
    fig = draw_image(data)
    assert fig.axes
    x, y = np.meshgrid(np.arange(8.0), np.arange(8.0))
    fig = draw_surface(x=x, y=y, z=data)
    assert fig.axes


def test_reuse_accumulates() -> None:
    with reuse(backend="matplotlib") as fig:
        draw_markers(jnp.zeros((1, 3)))
        draw_paths(jnp.zeros((1, 2, 3)))
    assert fig.axes
    assert len(fig.axes[0].lines) >= 1


def test_reuse_constructor_kwargs() -> None:
    # Without pass_all_kwargs, extra kwargs configure the figure itself.
    with reuse(backend="matplotlib", figsize=(3.0, 2.0)) as fig:
        draw_markers(jnp.zeros((1, 3)))
    assert tuple(fig.get_size_inches()) == (3.0, 2.0)


def test_reuse_pass_all_kwargs_forwards_to_draws() -> None:
    # With pass_all_kwargs=True, kwargs reach every draw call inside the
    # context (Scene.plot relies on this to forward user kwargs).
    with reuse(backend="matplotlib", pass_all_kwargs=True, color="red") as fig:
        draw_paths(jnp.zeros((1, 2, 3)).at[:, 1, 0].set(1.0))
    line = fig.axes[0].lines[0]
    assert line.get_color() == "red"


def test_reuse_kwargs_do_not_leak_outside_context() -> None:
    with reuse(backend="matplotlib", pass_all_kwargs=True, color="red"):
        draw_paths(jnp.zeros((1, 2, 3)))
    fig = draw_paths(jnp.zeros((1, 2, 3)).at[:, 1, 1].set(1.0))
    assert fig.axes[0].lines[0].get_color() != "red"


def test_per_call_kwargs_override_reuse_kwargs() -> None:
    with reuse(backend="matplotlib", pass_all_kwargs=True, color="red") as fig:
        draw_paths(jnp.zeros((1, 2, 3)), color="blue")
    assert fig.axes[0].lines[0].get_color() == "blue"


def test_defaults_registry() -> None:
    from differt_tpu.plotting import set_defaults, update_defaults
    from differt_tpu.plotting._utils import merged_kwargs

    set_defaults("matplotlib", color="green")
    try:
        assert merged_kwargs("matplotlib", {}) == {"color": "green"}
        update_defaults("matplotlib", linewidth=2)
        assert merged_kwargs("matplotlib", {}) == {
            "color": "green",
            "linewidth": 2,
        }
        # Per-call kwargs win over defaults.
        assert merged_kwargs("matplotlib", {"color": "black"})["color"] == "black"
    finally:
        set_defaults("matplotlib")


def test_scene_plot_forwards_kwargs() -> None:
    from differt_tpu.geometry import Scene

    scene = Scene(
        transmitters=jnp.array([-1.0, 0.0, 0.0]),
        mesh=Mesh.box(with_top=True),
    )
    # An invalid forwarded kwarg must actually reach the backend call.
    with pytest.raises(Exception):  # noqa: B017 - backend-specific error type.
        scene.plot(backend="matplotlib", not_a_real_kwarg=object())


def test_mesh_scene_paths_plot_methods() -> None:
    from differt_tpu.geometry import Scene

    mesh = Mesh.box(4.0, 4.0, 4.0, with_top=True)
    scene = Scene(
        transmitters=jnp.array([-1.0, 0.0, 0.0]),
        receivers=jnp.array([1.0, 0.0, 0.0]),
        mesh=mesh,
    )
    fig = scene.plot(backend="matplotlib")
    assert fig is not None
    paths = scene.trace_paths(order=1)
    assert paths.plot() is not None


class TestVispyBackend:
    def test_vispy_is_a_supported_backend(self) -> None:
        from differt_tpu.plotting import _utils

        assert "vispy" in _utils.SUPPORTED_BACKENDS
        # Selecting it never raises at resolution time.
        assert _utils.get_backend("vispy") == "vispy"

    def test_vispy_without_package_raises_import_error(self) -> None:
        import importlib.util

        import pytest as _pytest

        from differt_tpu.plotting import draw_markers

        if importlib.util.find_spec("vispy") is not None:
            _pytest.skip("vispy installed; covered by test_vispy_draws")
        with _pytest.raises(ImportError):
            draw_markers([[0.0, 0.0, 0.0]], backend="vispy")

    def test_vispy_draws(self) -> None:
        import pytest as _pytest

        _pytest.importorskip("vispy")
        import numpy as np

        from differt_tpu.geometry import Mesh
        from differt_tpu.plotting import (
            draw_markers,
            draw_mesh,
            draw_paths,
            reuse,
        )

        with reuse(backend="vispy") as canvas:
            draw_mesh(Mesh.box(1.0, 1.0, 1.0))
            draw_paths(np.zeros((2, 3, 3)))
            draw_markers(np.zeros((1, 3)), labels=["tx"])
        assert canvas is not None
