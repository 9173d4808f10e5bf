"""Procedural benchmark scenes.

The BASELINE configs reference downloadable Sionna scenes (street canyon,
Munich); in network-less environments these deterministic procedural scenes
stand in at matching scales: a two-building street canyon and a
Manhattan-grid city of ~10k triangles.
"""

import jax
import jax.numpy as jnp

from .geometry import Mesh, Scene


def street_canyon_scene(
    *,
    street_width: float = 20.0,
    building_height: float = 25.0,
    building_depth: float = 15.0,
    length: float = 100.0,
    with_ground: bool = True,
) -> Scene:
    """A street canyon: two building rows facing each other plus ground.

    Stands in for the Sionna ``simple_street_canyon`` scene.
    """
    half = street_width / 2.0
    left = (
        Mesh.box(length, building_depth, building_height, with_top=True)
        .translate(
            jnp.array([0.0, -(half + building_depth / 2.0), building_height / 2.0])
        )
    )
    right = (
        Mesh.box(length, building_depth, building_height, with_top=True)
        .translate(
            jnp.array([0.0, half + building_depth / 2.0, building_height / 2.0])
        )
    )
    mesh = left + right
    if with_ground:
        ground = Mesh.plane(
            jnp.zeros(3),
            normal=jnp.array([0.0, 0.0, 1.0]),
            side_length=2.0 * length,
        )
        mesh = mesh + ground
    return Scene(mesh=mesh.set_materials("Concrete"))


def urban_scene(
    num_blocks_x: int = 8,
    num_blocks_y: int = 8,
    *,
    block_size: float = 50.0,
    street_width: float = 15.0,
    min_height: float = 10.0,
    max_height: float = 60.0,
    subdivisions: int = 3,
    with_ground: bool = True,
    key: jax.Array | None = None,
) -> Scene:
    """A Manhattan grid of buildings with random heights (~10k triangles).

    ``subdivisions`` splits each building into a stack of boxes so the
    triangle count reaches city-mesh scales (config 3 of BASELINE.md) while
    keeping a realistic skyline. Deterministic given ``key``.
    """
    if key is None:
        key = jax.random.key(0)

    heights = jax.random.uniform(
        key,
        (num_blocks_x, num_blocks_y),
        minval=min_height,
        maxval=max_height,
    )

    footprint = block_size - street_width
    meshes = []
    extent_x = num_blocks_x * block_size
    extent_y = num_blocks_y * block_size
    for i in range(num_blocks_x):
        for j in range(num_blocks_y):
            h = float(heights[i, j])
            cx = (i + 0.5) * block_size - extent_x / 2.0
            cy = (j + 0.5) * block_size - extent_y / 2.0
            # A stack of shrinking boxes: more triangles + varied facades.
            z0 = 0.0
            for level in range(subdivisions):
                frac = 1.0 - 0.25 * level
                level_h = h / subdivisions
                box = Mesh.box(
                    footprint * frac,
                    footprint * frac,
                    level_h,
                    with_top=True,
                ).translate(jnp.array([cx, cy, z0 + level_h / 2.0]))
                meshes.append(box)
                z0 += level_h

    mesh = meshes[0]
    for m in meshes[1:]:
        mesh = mesh + m
    if with_ground:
        ground = Mesh.plane(
            jnp.zeros(3),
            normal=jnp.array([0.0, 0.0, 1.0]),
            side_length=2.0 * max(extent_x, extent_y),
        )
        mesh = mesh + ground
    return Scene(mesh=mesh.set_materials("Concrete"))
