"""Allclose vs the reference: EM chain (Fresnel, materials, UTD, utils).

Oracles: ``differt/em/_fresnel.py``, ``_material.py``, ``_utils.py``,
``_utd.py`` and ``differt/plugins/deepmimo.py`` (slab coefficients).
These pin down the convention-sensitive parts (polarization signs,
complex-n branch cuts, ITU frequency branches) that self-derived tests
cannot catch.
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import differt_tpu.em as em
import differt_tpu.geometry as g


@pytest.fixture
def key():
    return jax.random.key(99)


def _random_n_r(key, shape):
    k1, k2 = jax.random.split(key)
    eta = jax.random.uniform(k1, shape, minval=1.2, maxval=9.0)
    loss = jax.random.uniform(k2, shape, minval=0.0, maxval=1.5)
    return jnp.sqrt(eta - 1j * loss)


class TestFresnel:
    def test_refractive_index(self, ref, key):
        eps = jax.random.uniform(key, (16,), minval=1.0, maxval=10.0) - 0.3j
        chex.assert_trees_all_close(
            em.refractive_index(eps),
            ref["em_fresnel"].refractive_index(eps),
            rtol=1e-6,
        )

    def test_fresnel_coefficients(self, ref, key):
        k1, k2 = jax.random.split(key)
        n_r = _random_n_r(k1, (64,))
        cos_ti = jax.random.uniform(k2, (64,), minval=0.01, maxval=1.0)
        (rs_m, rp_m), (ts_m, tp_m) = em.fresnel_coefficients(n_r, cos_ti)
        (rs_r, rp_r), (ts_r, tp_r) = ref["em_fresnel"].fresnel_coefficients(
            n_r, cos_ti
        )
        chex.assert_trees_all_close(rs_m, rs_r, rtol=1e-5, atol=1e-6)
        chex.assert_trees_all_close(rp_m, rp_r, rtol=1e-5, atol=1e-6)
        chex.assert_trees_all_close(ts_m, ts_r, rtol=1e-5, atol=1e-6)
        chex.assert_trees_all_close(tp_m, tp_r, rtol=1e-5, atol=1e-6)

    def test_fresnel_total_internal_reflection(self, ref, key):
        # n_r < 1 (going from dense to light medium): TIR branch.
        n_r = jnp.linspace(0.3, 0.95, 16)
        cos_ti = jnp.linspace(0.05, 0.99, 16)
        (rs_m, rp_m), _ = em.fresnel_coefficients(n_r, cos_ti)
        (rs_r, rp_r), _ = ref["em_fresnel"].fresnel_coefficients(n_r, cos_ti)
        chex.assert_trees_all_close(rs_m, rs_r, rtol=1e-5, atol=1e-6)
        chex.assert_trees_all_close(rp_m, rp_r, rtol=1e-5, atol=1e-6)

    def test_reflection_refraction_coefficients(self, ref, key):
        k1, k2 = jax.random.split(key)
        n_r = _random_n_r(k1, (32,))
        cos_ti = jax.random.uniform(k2, (32,), minval=0.01, maxval=1.0)
        chex.assert_trees_all_close(
            em.reflection_coefficients(n_r, cos_ti),
            ref["em_fresnel"].reflection_coefficients(n_r, cos_ti),
            rtol=1e-5,
            atol=1e-6,
        )
        chex.assert_trees_all_close(
            em.refraction_coefficients(n_r, cos_ti),
            ref["em_fresnel"].refraction_coefficients(n_r, cos_ti),
            rtol=1e-5,
            atol=1e-6,
        )

    def test_slab_reflection_coefficients(self, ref, key):
        # Oracle: deepmimo._get_reflection_coefficients (slab-aware,
        # multi-bounce; plugins/deepmimo.py:366-405), incl. the
        # negative-thickness = semi-infinite branch.
        k1, k2 = jax.random.split(key)
        n_r = _random_n_r(k1, (48,))
        cos_ti = jax.random.uniform(k2, (48,), minval=0.05, maxval=1.0)
        thickness = jnp.concatenate([
            jnp.full((16,), -1.0),
            jnp.linspace(0.01, 0.5, 32),
        ])
        wavelength = 0.1
        rs_m, rp_m = em.slab_reflection_coefficients(
            n_r, cos_ti, thickness, wavelength
        )
        rs_r, rp_r = ref["deepmimo"]._get_reflection_coefficients(
            n_r, cos_ti, thickness, wavelength
        )
        chex.assert_trees_all_close(rs_m, rs_r, rtol=1e-4, atol=1e-5)
        chex.assert_trees_all_close(rp_m, rp_r, rtol=1e-4, atol=1e-5)


class TestMaterials:
    def test_registry_names_match(self, ref):
        assert set(em.materials.keys()) == set(ref["em_material"].materials.keys())

    @pytest.mark.parametrize("freq", np.geomspace(1e9, 100e9, 21).tolist())
    def test_itu_properties_all_materials(self, ref, freq):
        for name, theirs in ref["em_material"].materials.items():
            mine = em.materials[name]
            eps_m, sig_m = mine.relative_permittivity(freq), mine.conductivity(freq)
            eps_r, sig_r = theirs.relative_permittivity(freq), theirs.conductivity(
                freq
            )
            chex.assert_trees_all_close(eps_m, eps_r, rtol=1e-5, atol=1e-7)
            chex.assert_trees_all_close(sig_m, sig_r, rtol=1e-5, atol=1e-7)

    def test_out_of_range_is_minus_one(self, ref):
        # ITU ranges: out-of-validity frequencies report -1 in both.
        mine = em.materials["itu_concrete"]
        theirs = ref["em_material"].materials["itu_concrete"]
        for freq in (1e3, 1e15):
            chex.assert_trees_all_close(
                mine.relative_permittivity(freq),
                theirs.relative_permittivity(freq),
            )

    def test_thickness_and_aliases(self, ref):
        for name, theirs in ref["em_material"].materials.items():
            mine = em.materials[name]
            if theirs.thickness is None:
                assert mine.thickness is None
            else:
                chex.assert_trees_all_close(mine.thickness, theirs.thickness)
            assert tuple(mine.aliases) == tuple(theirs.aliases)

    def test_aliases_resolve(self, ref):
        # MaterialsDict alias resolution (e.g. Sionna names).
        for alias_holder in ref["em_material"].materials.values():
            for alias in alias_holder.aliases:
                assert em.materials[alias].name == (
                    ref["em_material"].materials[alias].name
                )


class TestEmUtils:
    def test_sp_directions(self, ref, key):
        k1, k2 = jax.random.split(key)
        k_i = g.normalize(jax.random.normal(k1, (64, 3)))[0]
        normals = g.normalize(jax.random.normal(k2, (64, 3)))[0]
        # make k_r the specular reflection of k_i
        k_r = k_i - 2.0 * jnp.sum(k_i * normals, axis=-1, keepdims=True) * normals
        (eis_m, eip_m), (ers_m, erp_m) = em.sp_directions(k_i, k_r, normals)
        (eis_r, eip_r), (ers_r, erp_r) = ref["em_utils"].sp_directions(
            k_i, k_r, normals
        )
        chex.assert_trees_all_close(eis_m, eis_r, rtol=1e-5, atol=1e-5)
        chex.assert_trees_all_close(eip_m, eip_r, rtol=1e-5, atol=1e-5)
        chex.assert_trees_all_close(ers_m, ers_r, rtol=1e-5, atol=1e-5)
        chex.assert_trees_all_close(erp_m, erp_r, rtol=1e-5, atol=1e-5)

    def test_sp_directions_normal_incidence(self, ref):
        k_i = jnp.array([[0.0, 0.0, -1.0]])
        normals = jnp.array([[0.0, 0.0, 1.0]])
        k_r = jnp.array([[0.0, 0.0, 1.0]])
        mine = em.sp_directions(k_i, k_r, normals)
        theirs = ref["em_utils"].sp_directions(k_i, k_r, normals)
        chex.assert_trees_all_close(mine, theirs, rtol=1e-6, atol=1e-6)

    def test_sp_rotation_matrix(self, ref, key):
        k1, k2 = jax.random.split(key)
        e_a_s = g.normalize(jax.random.normal(k1, (32, 3)))[0]
        rand = g.normalize(jax.random.normal(k2, (32, 3)))[0]
        e_a_p = g.normalize(jnp.cross(e_a_s, rand))[0]
        # second orthonormal pair in the same plane: rotate by the plane normal
        e_b_s = g.normalize(e_a_s + 0.5 * e_a_p)[0]
        e_b_p = jnp.cross(jnp.cross(e_a_s, e_a_p), e_b_s)
        e_b_p = g.normalize(e_b_p)[0]
        chex.assert_trees_all_close(
            em.sp_rotation_matrix(e_a_s, e_a_p, e_b_s, e_b_p),
            ref["em_utils"].sp_rotation_matrix(e_a_s, e_a_p, e_b_s, e_b_p),
            rtol=1e-5,
            atol=1e-5,
        )

    def test_fspl(self, ref, key):
        d = jax.random.uniform(key, (16,), minval=1.0, maxval=1e4)
        f = jnp.full((16,), 2.4e9)
        chex.assert_trees_all_close(em.fspl(d, f), ref["em_utils"].fspl(d, f), rtol=1e-6)
        chex.assert_trees_all_close(
            em.fspl(d, f, dB=True), ref["em_utils"].fspl(d, f, dB=True), rtol=1e-6
        )

    def test_delays(self, ref, key):
        paths = jax.random.normal(key, (8, 4, 3)) * 10.0
        chex.assert_trees_all_close(
            em.path_delay(paths), ref["em_utils"].path_delay(paths), rtol=1e-6
        )
        lengths = g.path_length(paths)
        chex.assert_trees_all_close(
            em.length_to_delay(lengths),
            ref["em_utils"].length_to_delay(lengths),
            rtol=1e-6,
        )

    def test_constants(self, ref):
        assert em.c == ref["em_constants"].c
        assert em.mu_0 == ref["em_constants"].mu_0
        assert em.epsilon_0 == ref["em_constants"].epsilon_0
        assert em.z_0 == ref["em_constants"].z_0

    def test_interaction_types(self, ref):
        theirs = ref["em_interaction_type"].InteractionType
        assert em.InteractionType.REFLECTION == theirs.REFLECTION
        assert em.InteractionType.DIFFRACTION == theirs.DIFFRACTION
        assert em.InteractionType.SCATTERING == theirs.SCATTERING


class TestUtd:
    def test_transition_function(self, ref, key):
        z = jnp.geomspace(1e-4, 50.0, 64)
        chex.assert_trees_all_close(
            em.F(z), ref["em_utd"].F(z), rtol=1e-4, atol=1e-5
        )

    def test_L_i_plane_wave(self, ref, key):
        k1, k2 = jax.random.split(key)
        s_d = jax.random.uniform(k1, (16,), minval=0.5, maxval=100.0)
        sin_2_beta_0 = jax.random.uniform(k2, (16,), minval=0.1, maxval=1.0)
        chex.assert_trees_all_close(
            em.L_i(s_d, sin_2_beta_0),
            ref["em_utd"].L_i(s_d, sin_2_beta_0),
            rtol=1e-5,
        )

    def test_L_i_spherical_wave(self, ref, key):
        k1, k2, k3 = jax.random.split(key, 3)
        s_d = jax.random.uniform(k1, (16,), minval=0.5, maxval=100.0)
        sin_2_beta_0 = jax.random.uniform(k2, (16,), minval=0.1, maxval=1.0)
        s_i = jax.random.uniform(k3, (16,), minval=0.5, maxval=100.0)
        chex.assert_trees_all_close(
            em.L_i(s_d, sin_2_beta_0, s_i=s_i),
            ref["em_utd"].L_i(s_d, sin_2_beta_0, s_i=s_i),
            rtol=1e-5,
        )


class TestAntennaVsReference:
    """Dipole near+far fields and directivity vs differt.em._antenna."""

    def _pair(self, ref, **kwargs):
        from differt_tpu.em import Dipole

        return Dipole(**kwargs), ref["em_antenna"].Dipole(**kwargs)

    def test_derived_properties(self, ref) -> None:
        ours, theirs = self._pair(ref, frequency=2.4e9)
        chex.assert_trees_all_close(ours.wavelength, theirs.wavelength)
        chex.assert_trees_all_close(ours.wavenumber, theirs.wavenumber)
        chex.assert_trees_all_close(ours.aperture, theirs.aperture)
        chex.assert_trees_all_close(ours.length, theirs.length)
        chex.assert_trees_all_close(ours.moment, theirs.moment, atol=1e-12)

    def test_fields_near_and_far(self, ref, key) -> None:
        ours, theirs = self._pair(
            ref, frequency=1e9, num_wavelengths=0.25, current=0.5
        )
        # Points spanning near field (< lambda) to far field (>> lambda).
        r = jax.random.uniform(key, (64, 1), minval=0.05, maxval=50.0)
        directions = jax.random.normal(jax.random.key(7), (64, 3))
        directions = directions / jnp.linalg.norm(
            directions, axis=-1, keepdims=True
        )
        points = r * directions
        e_ours, b_ours = ours.fields(points)
        e_ref, b_ref = theirs.fields(points)
        chex.assert_trees_all_close(e_ours, e_ref, rtol=2e-5, atol=1e-8)
        chex.assert_trees_all_close(b_ours, b_ref, rtol=2e-5, atol=1e-12)

    def test_fields_with_charge(self, ref) -> None:
        kwargs = dict(
            frequency=3e9,
            charge=2e-11,
            center=jnp.array([1.0, -2.0, 0.5]),
        )
        ours, theirs = self._pair(ref, **kwargs)
        points = jnp.array([[5.0, 1.0, 0.0], [1.2, -1.8, 0.9]])
        e_ours, b_ours = ours.fields(points)
        e_ref, b_ref = theirs.fields(points)
        chex.assert_trees_all_close(e_ours, e_ref, rtol=2e-5, atol=1e-10)
        chex.assert_trees_all_close(b_ours, b_ref, rtol=2e-5, atol=1e-14)

    def test_look_at_orientation(self, ref) -> None:
        # look_at must be tested with a unit-scale moment: the reference's
        # spherical round-trip adds the float32 rounding of norm(unit) - 1
        # (~6e-8) to the moment's radial coordinate, so for any physical
        # moment (~1e-12 C m) its look_at output is pure floating-point
        # noise and only a bit-identical transcription could match it.
        kwargs = dict(
            frequency=3e9,
            moment=jnp.array([0.3, -0.1, 2.0]),
            current=None,
            center=jnp.array([1.0, -2.0, 0.5]),
            look_at=jnp.array([4.0, 0.0, 1.0]),
        )
        ours, theirs = self._pair(ref, **kwargs)
        chex.assert_trees_all_close(ours.moment, theirs.moment, rtol=1e-5)
        points = jnp.array([[5.0, 1.0, 0.0], [1.2, -1.8, 0.9]])
        e_ours, b_ours = ours.fields(points)
        e_ref, b_ref = theirs.fields(points)
        chex.assert_trees_all_close(e_ours, e_ref, rtol=1e-4, atol=1e-8)
        chex.assert_trees_all_close(b_ours, b_ref, rtol=1e-4, atol=1e-12)

    def test_poynting_vector(self, ref, key) -> None:
        ours, theirs = self._pair(ref, frequency=2.4e9)
        points = 3.0 + jax.random.uniform(key, (16, 3))
        chex.assert_trees_all_close(
            ours.poynting_vector(points),
            theirs.poynting_vector(points),
            rtol=2e-5,
            atol=1e-10,
        )

    def test_directivity(self, ref) -> None:
        ours, theirs = self._pair(ref, frequency=1e9)
        phi_o, theta_o, d_o = ours.directivity(32)
        phi_r, theta_r, d_r = theirs.directivity(32)
        chex.assert_trees_all_close(phi_o, phi_r)
        chex.assert_trees_all_close(theta_o, theta_r)
        # The reference returns per-Poynting-component directivity
        # [..., 3]; our scalar equals its component sum.
        chex.assert_trees_all_close(d_o, d_r.sum(axis=-1), rtol=1e-4)

    def test_directive_gain(self, ref) -> None:
        ours, theirs = self._pair(ref, frequency=1e9)
        chex.assert_trees_all_close(
            ours.directive_gain(64), theirs.directive_gain(64), rtol=1e-4
        )
