"""Tests for procedural benchmark scenes and the MLM map."""

import jax.numpy as jnp
import numpy as np

from differt_tpu.scenes import street_canyon_scene, urban_scene


def test_street_canyon_structure() -> None:
    scene = street_canyon_scene()
    assert scene.mesh.num_triangles == 26  # Two closed boxes + ground.
    assert scene.mesh.material_names == ("Concrete",)


def test_urban_scene_scale() -> None:
    scene = urban_scene(8, 8)
    assert scene.mesh.num_triangles > 2000
    bbox = np.asarray(scene.mesh.bounding_box)
    assert bbox[1, 2] > 10.0  # Buildings have height.


def test_urban_scene_deterministic() -> None:
    import jax

    a = urban_scene(2, 2, key=jax.random.key(42))
    b = urban_scene(2, 2, key=jax.random.key(42))
    np.testing.assert_array_equal(
        np.asarray(a.mesh.vertices), np.asarray(b.mesh.vertices)
    )


def test_mlm_map_runs() -> None:
    import differt_tpu.treekit as tk

    scene = street_canyon_scene()
    scene = tk.tree_at(
        lambda s: s.transmitters, scene, jnp.array([[0.0, 0.0, 20.0]])
    )
    mlm = scene.compute_tx_mlm(
        num_rays=2000, order=2, receiver_plane_z=1.5, grid_size=(32, 32)
    )
    assert mlm.shape == (1, 32, 32)
    values = np.asarray(mlm)
    # The map must show multipath structure: several distinct cell hashes.
    assert len(np.unique(values)) > 3
