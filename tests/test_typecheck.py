"""Runtime jaxtyping validation of the public API (reference parity:
``--jaxtyping-packages=differt,beartype`` in differt/pyproject.toml:190).

beartype is not available here; typeguard is, and jaxtyping's import hook
supports it. The hook must be installed BEFORE the package is imported,
so the checked run happens in a subprocess: it imports differt_tpu under
the hook and drives representative pipelines (geometry utils, tracing,
EM chain, coverage). Any annotation drift (wrong shapes/dtypes in
signatures) raises in that subprocess and fails this test.
"""

import subprocess
import sys

import pytest

_CHECKED_RUN = r"""
import jax
jax.config.update("jax_platforms", "cpu")

from jaxtyping import install_import_hook

with install_import_hook("differt_tpu", "typeguard.typechecked"):
    import differt_tpu.geometry as g
    import differt_tpu.rt as rt
    import differt_tpu.em as em
    from differt_tpu.coverage import power_map
    from differt_tpu.geometry import Mesh, Scene

import jax.numpy as jnp

# Geometry utils.
v, n = g.normalize(jnp.ones((4, 3)))
g.orthogonal_basis(v)
g.fibonacci_lattice(64)
g.viewing_frustum(jnp.zeros(3), jnp.ones((10, 3)))

# Ray kernels.
tris = jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
t, hit = rt.ray_intersect_triangle(
    jnp.array([0.2, 0.2, 1.0]), jnp.array([0.0, 0.0, -2.0]), tris[0]
)
rt.ray_intersect_any_triangle(
    jnp.array([0.2, 0.2, 1.0]), jnp.array([0.0, 0.0, -2.0]), tris
)

# EM chain.
em.fresnel_coefficients(jnp.sqrt(jnp.array(5.24 - 0.3j)), jnp.array(0.7))
em.materials["itu_concrete"].relative_permittivity(3e9)
em.fspl(jnp.array([10.0]), jnp.array([2.4e9]), dB=True)

# End to end: trace + coverage on a tiny scene.
mesh = Mesh.box(10.0, 6.0, 4.0, with_top=False).set_materials("Concrete")
scene = Scene(transmitters=jnp.array([[-3.0, 0.0, 1.0]]), mesh=mesh)
scene = scene.with_receivers_grid(3, 2, height=1.0)
paths = scene.trace_paths(order=1)
out = power_map(scene, 2.4e9, order=1)
assert out.shape == (1, 2, 3)
print("TYPECHECK_OK")
"""


@pytest.mark.slow
def test_public_api_under_jaxtyping_typeguard():
    result = subprocess.run(
        [sys.executable, "-c", _CHECKED_RUN],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(__import__("pathlib").Path(__file__).parent.parent),
    )
    assert "TYPECHECK_OK" in result.stdout, (
        f"typechecked run failed\nstdout:\n{result.stdout}\n"
        f"stderr:\n{result.stderr[-4000:]}"
    )
