"""Tests for edge extraction, diffraction tracing, and UTD fields."""

import chex
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.coverage import complex_amplitudes
from differt_tpu.em import z_0
from differt_tpu.geometry import Mesh, Scene
from differt_tpu.rt import diffraction_amplitudes, diffraction_point_on_edge

FREQUENCY = 2.4e9


class TestEdgeExtraction:
    def test_box_edges(self) -> None:
        mesh = Mesh.box(2.0, 2.0, 2.0, with_top=True)
        edges = mesh.diffraction_edges
        # A closed box has exactly 12 geometric edges; face diagonals are
        # coplanar and excluded.
        assert edges.shape == (12, 2, 3)
        lengths = np.linalg.norm(
            np.asarray(edges[:, 1, :] - edges[:, 0, :]), axis=-1
        )
        np.testing.assert_allclose(lengths, 2.0, atol=1e-6)

    def test_box_wedge_parameters(self) -> None:
        mesh = Mesh.box(2.0, 2.0, 2.0, with_top=True)
        n = np.asarray(mesh.wedge_parameters)
        # Every box edge is a 90-degree convex wedge: exterior angle
        # 270 deg = 1.5 pi.
        np.testing.assert_allclose(n, 1.5, atol=1e-5)

    def test_adjacent_triangles(self) -> None:
        mesh = Mesh.box(2.0, 2.0, 2.0, with_top=True)
        adj = np.asarray(mesh.diffraction_edges_to_triangles)
        assert (adj >= 0).all()  # Closed box: every edge is manifold.
        assert (adj[:, 0] != adj[:, 1]).all()

    def test_open_box_has_boundary_edges_excluded(self) -> None:
        mesh = Mesh.box(2.0, 2.0, 2.0, with_top=False, with_bottom=False)
        edges = mesh.diffraction_edges
        # Only the 4 vertical edges are manifold; top/bottom rims are
        # boundary edges (single face) and excluded.
        assert edges.shape[0] == 4

    def test_plane_has_no_diffraction_edges(self) -> None:
        mesh = Mesh.plane(jnp.zeros(3), normal=jnp.array([0.0, 0.0, 1.0]))
        assert mesh.diffraction_edges.shape[0] == 0


class TestDiffractionPoint:
    def test_keller_cone(self) -> None:
        tx = jnp.array([-1.0, -0.3, 0.8])
        rx = jnp.array([1.0, 0.9, 0.4])
        origin = jnp.array([0.0, -5.0, 0.0])
        vector = jnp.array([0.0, 10.0, 0.0])
        point, t = diffraction_point_on_edge(tx, rx, origin, vector)
        e = jnp.array([0.0, 1.0, 0.0])
        k_in = (point - tx) / jnp.linalg.norm(point - tx)
        k_out = (rx - point) / jnp.linalg.norm(rx - point)
        chex.assert_trees_all_close(
            jnp.dot(k_in, e), jnp.dot(k_out, e), atol=1e-5
        )
        assert 0.0 < float(t) < 1.0

    def test_symmetric_case(self) -> None:
        tx = jnp.array([-1.0, 0.0, 1.0])
        rx = jnp.array([1.0, 0.0, 1.0])
        origin = jnp.array([-5.0, 0.0, 0.0])
        vector = jnp.array([10.0, 0.0, 0.0])
        point, _ = diffraction_point_on_edge(tx, rx, origin, vector)
        chex.assert_trees_all_close(point, jnp.zeros(3), atol=1e-5)


@pytest.fixture(scope="module")
def occluder_scene_factory():
    # Elevated TX looking down past the far-top edge of a box: the classic
    # single-wedge configuration. The geometric shadow boundary at
    # x = 10 is z_b = 5 - (4/11) * 20 = -2.2727.
    mesh = Mesh.box(2.0, 6.0, 2.0, with_top=True).set_materials("Metal")

    def factory(rx):
        return Scene(
            transmitters=jnp.array([-10.0, 0.0, 5.0]), receivers=rx, mesh=mesh
        )

    return factory


class TestDiffractionTracing:
    def test_shadowed_rx_diffracts_over_and_under(
        self, occluder_scene_factory
    ) -> None:
        scene = occluder_scene_factory(jnp.array([10.0, 0.0, -3.0]))
        paths = scene.trace_diffraction_paths()
        masked = paths.masked()
        qd = np.round(np.asarray(masked.vertices[:, 1, :]), 3)
        # Over the far top edge and under the near bottom edge.
        assert [1.0, 0.0, 1.0] in qd.tolist()
        assert [-1.0, 0.0, -1.0] in qd.tolist()

    def test_lit_rx_single_top_edge(self, occluder_scene_factory) -> None:
        scene = occluder_scene_factory(jnp.array([10.0, 0.0, 0.0]))
        paths = scene.trace_diffraction_paths()
        assert int(paths.num_valid_paths) == 1

    def test_high_rx_sees_both_top_edges(self, occluder_scene_factory) -> None:
        scene = occluder_scene_factory(jnp.array([10.0, 0.0, 8.0]))
        paths = scene.trace_diffraction_paths()
        qd = np.round(np.asarray(paths.masked().vertices[:, 1, :]), 3)
        assert [1.0, 0.0, 1.0] in qd.tolist()
        assert [-1.0, 0.0, 1.0] in qd.tolist()

    def test_symmetric_thick_box_has_no_single_diffraction(self) -> None:
        # TX and RX at mid-height on opposite sides of a thick box: any
        # single-diffraction path would have to pass through the box, so
        # the tracer must find none (double diffraction would be needed).
        mesh = Mesh.box(2.0, 6.0, 2.0, with_top=True).set_materials("Metal")
        scene = Scene(
            transmitters=jnp.array([-10.0, 0.0, 0.0]),
            receivers=jnp.array([10.0, 0.0, 0.0]),
            mesh=mesh,
        )
        paths = scene.trace_diffraction_paths()
        assert int(paths.num_valid_paths) == 0


class TestUTDField:
    def _total_power(self, factory, rx) -> float:
        scene = factory(rx)
        # Edge indices in the traced paths refer to this same mesh's edge
        # enumeration (the mesh already has unique vertices).
        edges, adj, wedge_n = scene.mesh._diffraction_edges_info()

        los = scene.trace_paths(order=0)
        a_los = complex_amplitudes(
            los,
            scene,
            FREQUENCY,
            eta_r=jnp.array([1.0]),
            conductivity=jnp.array([1e7]),
        ).reshape(-1)

        dif = scene.trace_diffraction_paths()
        a_dif = diffraction_amplitudes(
            dif,
            scene,
            FREQUENCY,
            edges=edges,
            adjacent_triangles=adj,
            wedge_n=wedge_n,
        ).reshape(-1)

        total = jnp.sum(a_los) + jnp.sum(a_dif)
        return float(jnp.abs(total) ** 2 / z_0)

    def test_shadow_boundary_continuity(self, occluder_scene_factory) -> None:
        # Sweep the receiver height across the geometric shadow boundary
        # (z_b = 20/11 at x = 10): the total field must not jump by more
        # than a few dB between fine steps — the whole point of UTD.
        z_boundary = 5.0 - (4.0 / 11.0) * 20.0
        zs = np.linspace(z_boundary - 0.4, z_boundary + 0.4, 41)
        powers = [
            self._total_power(
                occluder_scene_factory, jnp.array([10.0, 0.0, float(z)])
            )
            for z in zs
        ]
        db = 10.0 * np.log10(np.maximum(np.asarray(powers), 1e-30))
        assert np.isfinite(db).all()
        jumps = np.abs(np.diff(db))
        assert jumps.max() < 3.0, f"max jump {jumps.max():.2f} dB at steps {jumps}"

    def test_deep_shadow_decay(self, occluder_scene_factory) -> None:
        # Power decreases monotonically (roughly) deeper into the shadow.
        p_shallow = self._total_power(
            occluder_scene_factory, jnp.array([10.0, 0.0, -3.0])
        )
        p_deep = self._total_power(
            occluder_scene_factory, jnp.array([10.0, 0.0, -6.0])
        )
        assert p_deep < p_shallow

    def test_diffracted_weaker_than_los(self, occluder_scene_factory) -> None:
        # Far above the shadow boundary, LOS dominates the diffracted
        # contributions.
        rx = jnp.array([10.0, 0.0, 10.0])
        scene = occluder_scene_factory(rx)
        los = scene.trace_paths(order=0)
        a_los = complex_amplitudes(
            los,
            scene,
            FREQUENCY,
            eta_r=jnp.array([1.0]),
            conductivity=jnp.array([1e7]),
        )
        edges, adj, wedge_n = scene.mesh._diffraction_edges_info()
        dif = scene.trace_diffraction_paths()
        a_dif = diffraction_amplitudes(
            dif, scene, FREQUENCY, edges=edges, adjacent_triangles=adj,
            wedge_n=wedge_n,
        )
        assert float(jnp.abs(a_los).max()) > 3.0 * float(jnp.abs(a_dif).max())


class TestLuebbersLossyWedge:
    def _amp(self, eta_r=None, sigma=None):
        mesh = Mesh.box(2.0, 6.0, 2.0, with_top=True).set_materials("Metal")
        scene = Scene(
            transmitters=jnp.array([-10.0, 0.0, 5.0]),
            receivers=jnp.array([10.0, 0.0, -4.0]),  # Deep shadow.
            mesh=mesh,
        )
        edges, adj, wn = scene.mesh._diffraction_edges_info()
        paths = scene.trace_diffraction_paths()
        a = diffraction_amplitudes(
            paths, scene, FREQUENCY,
            edges=edges, adjacent_triangles=adj, wedge_n=wn,
            eta_r=jnp.asarray(eta_r) if eta_r is not None else None,
            conductivity=jnp.asarray(sigma) if sigma is not None else None,
        )
        return float(jnp.abs(jnp.asarray(a)).max())

    def test_metal_matches_pec(self) -> None:
        pec = self._amp()
        metal = self._amp(eta_r=[1.0], sigma=[1e9])
        assert metal == pytest.approx(pec, rel=0.05)

    def test_lossy_differs_from_pec(self) -> None:
        pec = self._amp()
        lossy = self._amp(eta_r=[5.0], sigma=[0.05])
        assert lossy != pytest.approx(pec, rel=1e-3)
        assert np.isfinite(lossy)
