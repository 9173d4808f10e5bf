"""Tests for the EM physics modules."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.em import (
    Dipole,
    F,
    HWDipolePattern,
    InteractionType,
    L_i,
    ShortDipolePattern,
    c,
    diffraction_coefficients,
    fresnel_coefficients,
    fspl,
    materials,
    path_delay,
    poynting_vector,
    reflection_coefficients,
    refractive_index,
    sp_directions,
    sp_rotation_matrix,
    transition_matrix,
)


class TestFresnel:
    def test_normal_incidence_air_glass(self) -> None:
        n = 1.5
        (r_s, r_p), (t_s, t_p) = fresnel_coefficients(n, 1.0)
        chex.assert_trees_all_close(jnp.real(r_s), (1 - n) / (1 + n), atol=1e-6)
        chex.assert_trees_all_close(jnp.real(r_p), (n - 1) / (n + 1), atol=1e-6)
        chex.assert_trees_all_close(jnp.real(t_s), 2 / (1 + n), atol=1e-6)

    def test_brewster_angle(self) -> None:
        n = 1.5
        theta_b = jnp.arctan(n)
        r_s, r_p = reflection_coefficients(n, jnp.cos(theta_b))
        assert abs(complex(r_p)) < 1e-6
        assert abs(complex(r_s)) > 0.1

    def test_total_internal_reflection(self) -> None:
        n = 1 / 1.5
        theta_c = jnp.arcsin(n)
        r_s, _ = reflection_coefficients(n, jnp.cos(theta_c + 0.1))
        # Beyond the critical angle, |r| = 1 (all reflected).
        assert abs(abs(complex(r_s)) - 1.0) < 1e-5

    def test_grazing_incidence(self) -> None:
        r_s, r_p = reflection_coefficients(1.5, 0.0)
        chex.assert_trees_all_close(jnp.abs(r_s), 1.0, atol=1e-6)
        chex.assert_trees_all_close(jnp.abs(r_p), 1.0, atol=1e-6)

    def test_refractive_index(self) -> None:
        chex.assert_trees_all_close(refractive_index(4.0), 2.0)
        chex.assert_trees_all_close(refractive_index(2.0, 2.0), 2.0)


class TestMaterials:
    def test_concrete_at_10ghz(self) -> None:
        mat = materials["Concrete"]
        eps = float(mat.relative_permittivity(10e9))
        sigma = float(mat.conductivity(10e9))
        assert eps == pytest.approx(5.24, rel=1e-6)
        assert sigma == pytest.approx(0.0462 * 10**0.7822, rel=1e-5)

    def test_alias_lookup(self) -> None:
        assert materials["itu_concrete"] is materials["Concrete"]
        assert "itu_metal" in materials
        assert "itu_wet_ground" in materials

    def test_out_of_range(self) -> None:
        mat = materials["Metal"]  # Valid 1-100 GHz.
        assert float(mat.relative_permittivity(500e9)) == -1.0

    def test_multi_range_selection(self) -> None:
        mat = materials["Concrete"]
        # 200 GHz falls in the 110-330 range (second row).
        assert float(mat.relative_permittivity(200e9)) == pytest.approx(5.17)

    def test_vacuum_everywhere(self) -> None:
        mat = materials["Vacuum"]
        for f in (1e6, 1e9, 1e12):
            assert float(mat.relative_permittivity(f)) == 1.0
            assert float(mat.conductivity(f)) == 0.0

    def test_all_itu_materials_present(self) -> None:
        expected = {
            "Vacuum", "Concrete", "Brick", "Plasterboard", "Wood", "Glass",
            "Clear Acrylic", "Ceiling board", "Chipboard", "Plywood",
            "Marble", "Floorboard", "Vinyl tile", "Carpet tile",
            "Asphalt concrete", "Metal", "Very dry ground",
            "Medium dry ground", "Wet ground",
        }
        assert expected <= set(materials.keys())


class TestSPDirections:
    def test_orthogonality(self, key) -> None:
        k_i = jax.random.normal(key, (20, 3))
        k_i = k_i / jnp.linalg.norm(k_i, axis=-1, keepdims=True)
        normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (20, 3))
        cos = jnp.sum(k_i * normal, axis=-1, keepdims=True)
        k_r = k_i - 2 * cos * normal
        (e_i_s, e_i_p), (e_r_s, e_r_p) = sp_directions(k_i, k_r, normal)
        for e, k in ((e_i_s, k_i), (e_i_p, k_i), (e_r_s, k_r), (e_r_p, k_r)):
            chex.assert_trees_all_close(
                jnp.sum(e * k, axis=-1), jnp.zeros(20), atol=1e-5
            )

    def test_rotation_matrix_is_rotation(self, key) -> None:
        k = jnp.array([0.0, 0.0, 1.0])
        e_a_s = jnp.array([1.0, 0.0, 0.0])
        e_a_p = jnp.array([0.0, 1.0, 0.0])
        angle = 0.6
        e_b_s = jnp.array([jnp.cos(angle), jnp.sin(angle), 0.0])
        e_b_p = jnp.array([-jnp.sin(angle), jnp.cos(angle), 0.0])
        rot = sp_rotation_matrix(e_a_s, e_a_p, e_b_s, e_b_p)
        chex.assert_trees_all_close(
            rot @ rot.T, jnp.eye(2), atol=1e-6
        )
        del k


class TestTransitionMatrix:
    def test_metal_normal_incidence(self) -> None:
        # Straight down-and-back off a metal-like plate: |r| ~ 1.
        vertices = jnp.array([
            [0.0, 0.0, 1.0],
            [0.1, 0.0, 0.0],
            [0.2, 0.0, 1.0],
        ])
        normals = jnp.array([[0.0, 0.0, 1.0]])
        n_r = jnp.array([1000.0 + 1000.0j])
        thickness = jnp.array([-1.0])
        mat = transition_matrix(
            vertices, normals, n_r, thickness, 0.125,
            interaction_types=jnp.array([InteractionType.REFLECTION]),
        )
        s = jnp.linalg.svd(mat, compute_uv=False)
        assert float(s.max()) == pytest.approx(1.0, abs=1e-2)

    def test_identity_for_los(self) -> None:
        vertices = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        mat = transition_matrix(
            vertices,
            jnp.zeros((0, 3)),
            jnp.zeros((0,), dtype=complex),
            jnp.zeros((0,)),
            0.125,
        )
        chex.assert_trees_all_close(jnp.abs(mat), jnp.eye(2), atol=1e-6)


class TestUTD:
    def test_transition_function_limits(self) -> None:
        # F(x) -> 1 as x -> inf; |F| is small for small x.
        big = F(jnp.array(50.0))
        assert abs(complex(big) - 1.0) < 0.05
        small = F(jnp.array(1e-4))
        assert abs(complex(small)) < 0.05

    def test_L_i_forms(self) -> None:
        chex.assert_trees_all_close(
            L_i(jnp.array(10.0), jnp.array(0.5)), 5.0
        )
        chex.assert_trees_all_close(
            L_i(jnp.array(10.0), jnp.array(1.0), s_i=jnp.array(10.0)), 5.0
        )
        with pytest.raises(ValueError, match="must be left to 'None'"):
            L_i(
                jnp.array(1.0),
                jnp.array(1.0),
                rho_1_i=jnp.array(1.0),
                rho_2_i=jnp.array(1.0),
                rho_e_i=jnp.array(1.0),
                s_i=jnp.array(1.0),
            )

    def test_diffraction_coefficients_finite(self) -> None:
        k = 2 * jnp.pi / 0.125
        d_s, d_h = diffraction_coefficients(
            k=k,
            n=jnp.array(1.5),
            phi_i=jnp.array(0.8),
            phi_d=jnp.array(2.5),
            sin_beta_0=jnp.array(1.0),
            length_i=jnp.array(10.0),
        )
        assert np.isfinite(complex(d_s).real)
        assert np.isfinite(complex(d_h).real)

    def test_diffraction_deep_shadow_decay(self) -> None:
        # Far from any boundary, |D| decreases with k (higher frequency
        # diffracts less).
        args = dict(
            n=jnp.array(1.9),
            phi_i=jnp.array(0.5),
            phi_d=jnp.array(4.0),
            sin_beta_0=jnp.array(1.0),
            length_i=jnp.array(50.0),
        )
        d_lo = diffraction_coefficients(k=jnp.array(10.0), **args)[1]
        d_hi = diffraction_coefficients(k=jnp.array(1000.0), **args)[1]
        assert abs(complex(d_hi)) < abs(complex(d_lo))

    def test_continuity_across_shadow_boundary(self) -> None:
        # D_h must stay bounded when crossing the incident shadow boundary
        # (phi_d = phi_i + pi): that is the point of the transition function.
        k = 500.0
        eps_angles = jnp.array([-1e-2, -1e-3, 0.0, 1e-3, 1e-2])
        vals = []
        for da in eps_angles:
            _, d_h = diffraction_coefficients(
                k=jnp.array(k),
                n=jnp.array(1.5),
                phi_i=jnp.array(0.6),
                phi_d=jnp.array(0.6 + jnp.pi + da),
                sin_beta_0=jnp.array(1.0),
                length_i=jnp.array(20.0),
            )
            vals.append(abs(complex(d_h)))
        vals = np.asarray(vals)
        assert np.isfinite(vals).all()
        assert vals.max() < 10.0  # Bounded, no cotangent blow-up.


class TestAntennas:
    def test_dipole_far_field_impedance(self) -> None:
        ant = Dipole(frequency=1e9)
        r = jnp.array([[200.0, 0.0, 0.0]])
        e, b = ant.fields(r)
        # In the far field |E| / |B| = c.
        ratio = float(jnp.linalg.norm(e) / jnp.linalg.norm(b))
        assert ratio == pytest.approx(c, rel=1e-3)

    def test_dipole_gain(self) -> None:
        ant = Dipole(frequency=1e9)
        assert float(ant.directive_gain()) == pytest.approx(1.5)

    def test_dipole_null_on_axis(self) -> None:
        ant = Dipole(frequency=1e9)
        s_axis = ant.poynting_vector(jnp.array([0.0, 0.0, 50.0]))
        s_side = ant.poynting_vector(jnp.array([50.0, 0.0, 0.0]))
        assert float(jnp.linalg.norm(jnp.real(s_axis))) < 1e-3 * float(
            jnp.linalg.norm(jnp.real(s_side))
        )

    def test_poynting_direction(self) -> None:
        # Time-averaged Poynting vector (E x conj(B)) points radially
        # outward; the instantaneous complex product's sign oscillates with
        # distance, so conjugate explicitly here.
        ant = Dipole(frequency=1e9)
        r = jnp.array([10.0, 0.0, 0.0])
        e, b = ant.fields(r)
        s = jnp.real(poynting_vector(e, jnp.conj(b)))
        s = s / jnp.linalg.norm(s)
        chex.assert_trees_all_close(s, jnp.array([1.0, 0.0, 0.0]), atol=1e-3)

    def test_pattern_gains(self) -> None:
        hw = HWDipolePattern(
            frequency=jnp.asarray(1e9), direction=jnp.array([0.0, 0.0, 1.0])
        )
        assert float(hw.directive_gain()) == pytest.approx(1.64, abs=0.01)
        sd = ShortDipolePattern(
            frequency=jnp.asarray(1e9), direction=jnp.array([0.0, 0.0, 1.0])
        )
        assert float(sd.directive_gain()) == pytest.approx(1.5, abs=0.01)

    def test_poynting_vector_free_function(self) -> None:
        e = jnp.array([1.0, 0.0, 0.0])
        b = jnp.array([0.0, 1.0, 0.0])
        s = poynting_vector(e, b)
        assert float(s[2]) > 0


def test_fspl_db_vs_linear() -> None:
    d, f = jnp.array(1000.0), jnp.array(2.4e9)
    linear = fspl(d, f)
    db = fspl(d, f, dB=True)
    chex.assert_trees_all_close(10 * jnp.log10(linear), db, atol=1e-3)


def test_path_delay() -> None:
    path = jnp.array([[0.0, 0.0, 0.0], [c, 0.0, 0.0]])
    chex.assert_trees_all_close(path_delay(path), 1.0)
