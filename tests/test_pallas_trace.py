"""Validate the fused trace megakernel against the XLA trace pipeline."""

import chex
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.geometry import Mesh, Scene, generate_all_path_candidates
from differt_tpu.ops._pallas_trace import pallas_trace_specular
from differt_tpu.rt import trace_path_candidates


def run_both(scene: Scene, order: int):
    # The megakernel runs through the public trace entry point (forced on,
    # interpret mode on CPU) against the XLA pipeline (forced off).
    mesh = scene.mesh
    tx = scene.transmitters.reshape(-1, 3)
    rx = scene.receivers.reshape(-1, 3)
    candidates = generate_all_path_candidates(mesh.num_primitives, order)
    types = jnp.zeros_like(candidates, dtype=jnp.int32)

    oracle = trace_path_candidates(
        mesh, tx, rx, candidates, types, megakernel=False
    )
    fused = trace_path_candidates(
        mesh, tx, rx, candidates, types, megakernel=True
    )
    return oracle, fused.vertices, fused.mask


@pytest.mark.parametrize("order", [1, 2])
def test_matches_xla_pipeline(order: int) -> None:
    mesh = Mesh.box(length=10.0, width=3.0, height=2.0, with_top=True)
    scene = Scene(
        transmitters=jnp.array([[-4.0, 0.0, 0.0]]),
        receivers=jnp.array([[4.0, 0.0, 0.0], [3.0, 0.5, 0.3]]),
        mesh=mesh,
    )
    oracle, verts, mask = run_both(scene, order)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(oracle.mask))
    valid = np.asarray(oracle.mask)
    chex.assert_trees_all_close(
        jnp.asarray(np.asarray(verts)[valid]),
        jnp.asarray(np.asarray(oracle.vertices)[valid]),
        atol=1e-4,
    )


def test_matches_with_masked_mesh() -> None:
    mesh = Mesh.box(length=10.0, width=3.0, height=2.0, with_top=True)
    mask = jnp.ones(mesh.num_triangles, dtype=bool).at[:2].set(False)
    scene = Scene(
        transmitters=jnp.array([[-4.0, 0.0, 0.0]]),
        receivers=jnp.array([[4.0, 0.0, 0.0]]),
        mesh=mesh.set_mask(mask),
    )
    oracle, verts, mask_out = run_both(scene, 1)
    np.testing.assert_array_equal(
        np.asarray(mask_out), np.asarray(oracle.mask)
    )


def test_multi_tx_multi_rx_grid() -> None:
    mesh = Mesh.box(length=20.0, width=8.0, height=6.0, with_top=True)
    scene = Scene(
        transmitters=jnp.array([[-6.0, 0.0, 0.0], [6.0, 1.0, 1.0]]),
        receivers=jnp.array(
            [[x, y, 0.0] for x in (-3.0, 0.0, 3.0) for y in (-1.0, 1.0)]
        ),
        mesh=mesh,
    )
    oracle, verts, mask = run_both(scene, 1)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(oracle.mask))
    valid = np.asarray(oracle.mask)
    assert valid.sum() > 0
    chex.assert_trees_all_close(
        jnp.asarray(np.asarray(verts)[valid]),
        jnp.asarray(np.asarray(oracle.vertices)[valid]),
        atol=1e-4,
    )


def test_gradient_through_megakernel_matches_xla() -> None:
    """TX-position gradients flow through the fused kernel's custom VJP.

    The backward pass recomputes the geometry phase in XLA; gradients must
    match differentiating the XLA trace pipeline directly.
    """
    import jax

    mesh = Mesh.box(length=10.0, width=3.0, height=2.0, with_top=True)
    rx = jnp.array([[4.0, 0.0, 0.0], [3.0, 0.5, 0.3]])
    candidates = generate_all_path_candidates(mesh.num_primitives, 1)
    types = jnp.zeros_like(candidates, dtype=jnp.int32)

    def total_length(tx, megakernel):
        paths = trace_path_candidates(
            mesh, tx.reshape(-1, 3), rx, candidates, types,
            megakernel=megakernel,
        )
        seg = jnp.diff(paths.vertices, axis=-2)
        lengths = jnp.sqrt(jnp.sum(seg * seg, axis=-1) + 1e-12).sum(axis=-1)
        return jnp.sum(jnp.where(paths.mask, lengths, 0.0))

    tx = jnp.array([-4.0, 0.1, 0.2])
    g_fused = jax.grad(lambda t: total_length(t, True))(tx)
    g_xla = jax.grad(lambda t: total_length(t, False))(tx)
    assert bool(jnp.isfinite(g_fused).all())
    assert float(jnp.abs(g_fused).max()) > 0.0
    chex.assert_trees_all_close(g_fused, g_xla, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("order", [1, 2])
def test_matches_xla_pipeline_with_quads(order: int) -> None:
    # Quad meshes hand the kernel TWO candidate triangles per mirror; a
    # reflection point may land inside either one.
    mesh = Mesh.box(length=10.0, width=3.0, height=2.0, with_top=True)
    scene = Scene(
        transmitters=jnp.array([[-4.0, 0.0, 0.0], [0.0, 1.0, 0.5]]),
        receivers=jnp.array([[4.0, 0.0, 0.0], [3.0, 0.5, 0.3]]),
        mesh=mesh.set_assume_quads(),
    )
    oracle, verts, mask = run_both(scene, order)
    assert int(np.asarray(oracle.mask).sum()) > 0
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(oracle.mask))
    valid = np.asarray(oracle.mask)
    chex.assert_trees_all_close(
        jnp.asarray(np.asarray(verts)[valid]),
        jnp.asarray(np.asarray(oracle.vertices)[valid]),
        atol=1e-4,
    )


def test_tile_and_slot_pickers() -> None:
    """VMEM-budget pickers stay in bounds across scales and orders."""
    from differt_tpu.ops._pallas_trace import (
        MAX_C_TILE,
        MAX_TILE_T,
        T_SUB,
        _pick_c_tile,
        _pick_tile_t,
        _VMEM_BUDGET_BYTES,
    )

    # Tile size: multiple of T_SUB, bounded, covers tiny meshes exactly.
    for n in (1, 26, 512, 2306, 14206, 112898, 500000):
        t = _pick_tile_t(n)
        assert t % T_SUB == 0
        assert t <= MAX_TILE_T
        assert t >= min(
            -(-n // T_SUB) * T_SUB, 512
        )  # never smaller than the mesh needs (up to the 512 floor)
    assert _pick_tile_t(14206) == 512  # bruxelles keeps fine tiles
    assert _pick_tile_t(112898) == 2048  # Munich-class grows them

    # Slot count: fits the budget for every (order, rx-tile) combo.
    for k in (1, 2, 3, 4):
        for tile_r in (256, 512, 1024):
            vert_rows = -(-3 * (k + 2) // 8) * 8
            c = _pick_c_tile(k, tile_r, 2048, vert_rows)
            assert c in (8, 16, 32, MAX_C_TILE)
            used = (
                c * vert_rows * tile_r * 4 * 2
                + c * 8 * tile_r * 2
                + 6 * (k + 1) * c * tile_r * 4
                + 2 * c * tile_r
                + (9 * 2048 * 4 + 2048 * 4) * 2
                + 4 * tile_r * 4 * 2
            )
            assert c == 8 or used <= _VMEM_BUDGET_BYTES
