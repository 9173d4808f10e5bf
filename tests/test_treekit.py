"""Tests for the pytree-module toolkit itself."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu import treekit as tk


class Inner(tk.Module):
    data: jax.Array
    name: str = tk.field(default="inner", static=True)


class Outer(tk.Module):
    inner: Inner
    weight: jax.Array
    flag: bool = tk.field(default=False, static=True)


def make_outer() -> Outer:
    return Outer(inner=Inner(data=jnp.arange(3.0)), weight=jnp.ones(2))


class TestModule:
    def test_is_pytree(self) -> None:
        outer = make_outer()
        leaves = jax.tree_util.tree_leaves(outer)
        assert len(leaves) == 2  # data + weight; statics in treedef.

    def test_static_fields_trigger_recompilation_key(self) -> None:
        a = make_outer()
        b = tk.tree_at(lambda o: o.flag, a, True)
        _, treedef_a = jax.tree_util.tree_flatten(a)
        _, treedef_b = jax.tree_util.tree_flatten(b)
        assert treedef_a != treedef_b

    def test_jit_through_module(self) -> None:
        outer = make_outer()

        @jax.jit
        def f(o: Outer):
            return o.inner.data.sum() + o.weight.sum()

        assert float(f(outer)) == 5.0

    def test_grad_through_module(self) -> None:
        outer = make_outer()
        g = jax.grad(lambda o: (o.inner.data ** 2).sum())(outer)
        np.testing.assert_allclose(np.asarray(g.inner.data), [0.0, 2.0, 4.0])

    def test_check_init_runs(self) -> None:
        class Checked(tk.Module):
            x: int = 0

            def __check_init__(self) -> None:
                if self.x < 0:
                    raise ValueError("negative")

        Checked(x=1)
        with pytest.raises(ValueError, match="negative"):
            Checked(x=-1)


class TestTreeAt:
    def test_single_attribute(self) -> None:
        outer = make_outer()
        new = tk.tree_at(lambda o: o.weight, outer, jnp.zeros(2))
        assert float(new.weight.sum()) == 0.0
        assert float(outer.weight.sum()) == 2.0  # Original untouched.

    def test_nested_attribute(self) -> None:
        outer = make_outer()
        new = tk.tree_at(lambda o: o.inner.data, outer, jnp.zeros(3))
        assert float(new.inner.data.sum()) == 0.0
        assert new.inner.name == "inner"

    def test_tuple_of_targets(self) -> None:
        outer = make_outer()
        new = tk.tree_at(
            lambda o: (o.weight, o.inner.data),
            outer,
            (jnp.zeros(2), jnp.full(3, 7.0)),
        )
        assert float(new.weight.sum()) == 0.0
        assert float(new.inner.data[0]) == 7.0


class TestFilterJit:
    def test_static_none_and_strings(self) -> None:
        calls = []

        @tk.filter_jit
        def f(x, mode=None):
            calls.append(1)
            if mode == "double":  # Static: concrete inside.
                return x * 2
            return x

        x = jnp.ones(3)
        np.testing.assert_allclose(np.asarray(f(x)), 1.0)
        np.testing.assert_allclose(np.asarray(f(x, mode="double")), 2.0)
        # Same static args -> cache hit (no retrace).
        before = len(calls)
        f(x, mode="double")
        assert len(calls) == before

    def test_modules_as_arguments(self) -> None:
        outer = make_outer()

        @tk.filter_jit
        def f(o: Outer):
            return o.inner.data * o.weight.sum()

        np.testing.assert_allclose(np.asarray(f(outer)), [0.0, 2.0, 4.0])

    def test_python_scalars_are_static(self) -> None:
        @tk.filter_jit
        def f(x, n):
            return x * n  # n concrete: usable in Python context too.

        assert float(f(jnp.asarray(2.0), 3)) == 6.0


import chex


class TestSerialisation:
    def test_roundtrip_scene(self, tmp_path) -> None:
        import jax.numpy as jnp

        from differt_tpu import treekit as tk
        from differt_tpu.geometry import Mesh, Scene

        scene = Scene(
            transmitters=jnp.array([[1.0, 2.0, 3.0]]),
            receivers=jnp.array([[4.0, 5.0, 6.0]]),
            mesh=Mesh.box(2.0, 3.0, 4.0).set_materials("Concrete"),
        )
        path = tmp_path / "scene.npz"
        tk.tree_serialise_leaves(path, scene)

        template = Scene(
            transmitters=jnp.zeros((1, 3)),
            receivers=jnp.zeros((1, 3)),
            mesh=Mesh.box(1.0, 1.0, 1.0).set_materials("Concrete"),
        )
        restored = tk.tree_deserialise_leaves(path, template)
        chex.assert_trees_all_close(restored.transmitters, scene.transmitters)
        chex.assert_trees_all_close(restored.mesh.vertices, scene.mesh.vertices)
        # Static fields come from the template/code, not the checkpoint.
        assert restored.mesh.material_names == scene.mesh.material_names

    def test_shape_mismatch_raises(self, tmp_path) -> None:
        import jax.numpy as jnp
        import pytest as _pytest

        from differt_tpu import treekit as tk

        path = tmp_path / "x.npz"
        tk.tree_serialise_leaves(path, {"a": jnp.zeros((3,))})
        with _pytest.raises(ValueError, match="Shape mismatch"):
            tk.tree_deserialise_leaves(path, {"a": jnp.zeros((4,))})

    def test_optimizer_state_roundtrip(self, tmp_path) -> None:
        """Checkpoint/resume of a real optimizer state (optax)."""
        import jax
        import jax.numpy as jnp
        import optax

        from differt_tpu import treekit as tk

        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
        opt = optax.adam(1e-2)
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        _, state = opt.update(grads, state, params)

        path = tmp_path / "opt.npz"
        tk.tree_serialise_leaves(path, state)
        restored = tk.tree_deserialise_leaves(path, opt.init(params))
        chex.assert_trees_all_close(restored, state)

    def test_roundtrip_bare_path_without_extension(self, tmp_path) -> None:
        """np.savez appends '.npz'; the loader must find the same file."""
        import jax.numpy as jnp

        from differt_tpu import treekit as tk

        path = tmp_path / "ckpt"  # no extension
        tree = {"a": jnp.arange(5.0), "b": jnp.ones((2, 2))}
        tk.tree_serialise_leaves(path, tree)
        restored = tk.tree_deserialise_leaves(path, jax.tree.map(jnp.zeros_like, tree))
        chex.assert_trees_all_close(restored, tree)
