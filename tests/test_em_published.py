"""Validation of the beyond-reference EM against published results.

The reference stubs UTD diffraction coefficients and the transition matrix
(em/_utd.py:225-302, em/_utils.py:305-341), so they cannot serve as oracles
here. Instead each test pins the implementation to a published, independent
result:

- ``TestExactWedgeSeries``: the UTD total field of a PEC wedge against the
  exact eigenfunction (Macdonald) series solution for plane-wave incidence
  — Macdonald, "Electric Waves" (1902); Bowman, Senior & Uslenghi,
  "Electromagnetic and Acoustic Scattering by Simple Shapes", ch. 6;
  Balanis, "Advanced Engineering Electromagnetics", sec. 13.3 (the series
  reduces to incident + image for n = 1, verified in-test).
- ``TestKnifeEdgeITU``: the half-plane (n = 2) deep-shadow loss against the
  Fresnel-integral knife-edge diffraction loss of ITU-R P.526-15 sec. 4.1
  (eq. 29) and its published approximation J(v) = 6.9 + 20 log10(
  sqrt((v - 0.1)^2 + 1) + v - 0.1) (eq. 31).
- ``TestSlabPublished``: the slab reflection (Airy) formula against the
  standard thin-film results — quarter-wave reflectance ((n^2-1)/(n^2+1))^2
  and the half-wave absentee layer (Hecht, "Optics", sec. 9.7.1), plus the
  Brewster-angle null (r_p = 0 at atan(n)).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from differt_tpu.em import diffraction_coefficients
from differt_tpu.em._fresnel import slab_reflection_coefficients


def exact_wedge_field(
    k: float,
    n: float,
    rho: np.ndarray,
    phi: np.ndarray,
    phi0: float,
    polarization: str,
    num_terms: int = 400,
) -> np.ndarray:
    """Exact total field of a PEC wedge under plane-wave incidence.

    Eigenfunction series (Macdonald 1902; Bowman/Senior/Uslenghi ch. 6)
    for a wedge occupying the region outside ``0 <= phi <= n*pi``, unit
    incident wave ``exp(j k rho cos(phi - phi0))``:

    - soft (E parallel to edge, Dirichlet):
      ``u = (4/n) sum_{m>=1} e^{j pi m/(2n)} J_{m/n}(k rho)
      sin(m phi0/n) sin(m phi/n)``
    - hard (H parallel to edge, Neumann):
      ``u = (2/n) sum_{m>=0} eps_m e^{j pi m/(2n)} J_{m/n}(k rho)
      cos(m phi0/n) cos(m phi/n)``, ``eps_0 = 1`` else 2.
    """
    m = np.arange(num_terms + 1)
    nu = m / n
    bessel = scipy.special.jv(nu[None, :], (k * rho)[..., None])
    phase = np.exp(1j * np.pi * nu / 2.0)
    if polarization == "soft":
        terms = (
            (4.0 / n)
            * phase[None, :]
            * bessel
            * np.sin(m[None, :] * phi0 / n)
            * np.sin(m[None, :] * phi[..., None] / n)
        )
        return terms[..., 1:].sum(axis=-1)
    eps = np.where(m == 0, 1.0, 2.0)
    terms = (
        (2.0 / n)
        * eps[None, :]
        * phase[None, :]
        * bessel
        * np.cos(m[None, :] * phi0 / n)
        * np.cos(m[None, :] * phi[..., None] / n)
    )
    return terms.sum(axis=-1)


def utd_wedge_field(
    k: float, n: float, rho: np.ndarray, phi: np.ndarray, phi0: float
) -> tuple[np.ndarray, np.ndarray]:
    """UTD total field (soft, hard) for the same geometry.

    GO terms (e^{+j omega t} convention, unit amplitude at the edge):
    incident ``exp(j k rho cos(phi - phi0))`` inside the shadow boundary
    ``phi < pi + phi0``; o-face reflection ``R exp(j k rho cos(phi +
    phi0))`` for ``phi < pi - phi0`` with R = -1 (soft) / +1 (hard). The
    n-face must not be illuminated (requires ``phi0 < (n - 1) pi``).
    Diffracted: ``D exp(-j k rho)/sqrt(rho)`` with plane-wave distance
    parameter L = rho. Magnitudes are convention-free; the comparison uses
    them.
    """
    assert phi0 < (n - 1.0) * np.pi, "geometry must keep the n-face dark"
    d_s, d_h = diffraction_coefficients(
        k,
        n,
        jnp.asarray(phi0),
        jnp.asarray(phi),
        1.0,  # normal incidence: sin(beta_0) = 1
        jnp.asarray(k * 0.0 + rho),  # L = rho for plane waves
    )
    spread = np.exp(-1j * k * rho) / np.sqrt(rho)

    def go_step(boundary: float) -> np.ndarray:
        # The GO field is a step across its boundary; exactly ON the
        # boundary it takes the mean value 1/2 (the UTD transition term's
        # singular limit compensates precisely that convention).
        return np.where(
            phi < boundary, 1.0, np.where(phi == boundary, 0.5, 0.0)
        )

    incident = np.exp(1j * k * rho * np.cos(phi - phi0)) * go_step(
        np.pi + phi0
    )
    reflected = np.exp(1j * k * rho * np.cos(phi + phi0)) * go_step(
        np.pi - phi0
    )
    u_soft = incident - reflected + np.asarray(d_s) * spread
    u_hard = incident + reflected + np.asarray(d_h) * spread
    return u_soft, u_hard


class TestExactWedgeSeries:
    def test_series_reduces_to_image_theory_for_ground_plane(self) -> None:
        """Sanity-pin the oracle itself: n = 1 is a flat PEC ground plane,
        where the exact answer is incident +- image (image theory)."""
        k, phi0 = 2.0 * np.pi, np.deg2rad(50.0)
        rho = np.full((5,), 3.0)
        phi = np.deg2rad(np.array([10.0, 30.0, 60.0, 90.0, 130.0]))
        soft = exact_wedge_field(k, 1.0, rho, phi, phi0, "soft")
        hard = exact_wedge_field(k, 1.0, rho, phi, phi0, "hard")
        inc = np.exp(1j * k * rho * np.cos(phi - phi0))
        ref = np.exp(1j * k * rho * np.cos(phi + phi0))
        np.testing.assert_allclose(soft, inc - ref, atol=1e-8)
        np.testing.assert_allclose(hard, inc + ref, atol=1e-8)

    @pytest.mark.parametrize(
        ("n", "phi0_deg", "phi_deg"),
        [
            # Right-angle (90 deg interior) wedge: RB at 120, SB at 240.
            (1.5, 60.0, [40.0, 80.0, 100.0, 140.0, 170.0, 200.0, 255.0]),
            # Half-plane: RB at 135, SB at 225.
            (2.0, 45.0, [60.0, 110.0, 160.0, 200.0, 250.0, 300.0, 340.0]),
        ],
    )
    def test_utd_total_field_matches_exact_series(
        self, n: float, phi0_deg: float, phi_deg: list[float]
    ) -> None:
        """|UTD total| vs |exact series| away from the boundaries.

        kL = 30, where the UTD asymptotic error is O((kL)^{-3/2}) ~ 1e-2.
        The angle lists stay >= 10 deg away from the reflection/shadow
        boundaries; magnitudes range over [0, 2] (deep interference
        fringes), so agreement to 0.035 pins both |D| and its phase
        relative to the GO terms.
        """
        k = 2.0 * np.pi  # wavelength 1
        rho = np.full((len(phi_deg),), 30.0 / k)  # k rho = 30
        phi = np.deg2rad(np.asarray(phi_deg))
        phi0 = np.deg2rad(phi0_deg)

        exact_s = exact_wedge_field(k, n, rho, phi, phi0, "soft")
        exact_h = exact_wedge_field(k, n, rho, phi, phi0, "hard")
        utd_s, utd_h = utd_wedge_field(k, n, rho, phi, phi0)

        np.testing.assert_allclose(
            np.abs(utd_s), np.abs(exact_s), atol=0.035
        )
        np.testing.assert_allclose(
            np.abs(utd_h), np.abs(exact_h), atol=0.035
        )

    def test_utd_continuous_and_close_at_shadow_boundary(self) -> None:
        """Straddling the SB the exact field magnitude is smooth; UTD must
        be finite, continuous across the GO step, and within 5% of the
        series. (The measure-zero point exactly ON the boundary is a
        convention choice — GO half-step vs one-sided D limit — and is not
        sampled.)"""
        k, n, phi0 = 2.0 * np.pi, 1.5, np.deg2rad(60.0)
        rho = np.full((2,), 30.0 / k)
        sb = np.pi + phi0
        phi = np.array([sb - 1e-3, sb + 1e-3])
        exact_h = exact_wedge_field(k, n, rho, phi, phi0, "hard")
        _, utd_h = utd_wedge_field(k, n, rho, phi, phi0)
        assert np.all(np.isfinite(utd_h))
        np.testing.assert_allclose(np.abs(utd_h), np.abs(exact_h), rtol=0.05)
        # Continuity of UTD across the GO discontinuity.
        assert abs(abs(utd_h[0]) - abs(utd_h[1])) < 0.05


def knife_edge_loss_db_exact(v: np.ndarray) -> np.ndarray:
    """Exact knife-edge loss, ITU-R P.526-15 eq. 29:
    J(v) = -20 log10(|F(v)|), F(v) = (1/2)(1+j) integral_v^inf
    exp(-j pi s^2 / 2) ds."""
    s_int, c_int = scipy.special.fresnel(v)  # integrals 0..v of sin/cos
    # F(v) = ((1+j)/2) * integral_v^inf e^{-j pi s^2/2} ds
    #      = ((1+j)/2) * ((1/2 - C(v)) - j (1/2 - S(v)))
    f_v = 0.5 * (1.0 + 1j) * ((0.5 - c_int) - 1j * (0.5 - s_int))
    return -20.0 * np.log10(np.abs(f_v))


def knife_edge_loss_db_itu_approx(v: np.ndarray) -> np.ndarray:
    """Published approximation, ITU-R P.526-15 eq. 31 (v > -0.78)."""
    return 6.9 + 20.0 * np.log10(np.sqrt((v - 0.1) ** 2 + 1.0) + v - 0.1)


class TestKnifeEdgeITU:
    def test_itu_approximation_matches_exact(self) -> None:
        """Pin the two published forms against each other first."""
        v = np.array([0.5, 1.0, 1.5, 2.0, 2.4])
        np.testing.assert_allclose(
            knife_edge_loss_db_itu_approx(v),
            knife_edge_loss_db_exact(v),
            atol=0.3,
        )

    def test_half_plane_shadow_matches_knife_edge(self) -> None:
        """UTD half-plane deep-shadow loss vs ITU knife-edge J(v).

        Plane wave grazing a screen (n = 2), receiver an angle theta into
        the shadow at distance rho: the knife-edge parameter is
        v = h sqrt(2/(lambda d)) with h = rho sin(theta),
        d = rho cos(theta). Small angles keep the parabolic knife-edge
        approximation within a few tenths of a dB of the exact half-plane
        solution.
        """
        lam = 1.0
        k = 2.0 * np.pi / lam
        rho_val = 100.0 * lam
        n, phi0 = 2.0, np.deg2rad(45.0)
        sb = np.pi + phi0
        theta = np.deg2rad(np.array([2.0, 4.0, 7.0]))
        phi = sb + theta
        rho = np.full(theta.shape, rho_val)

        utd_s, utd_h = utd_wedge_field(k, n, rho, phi, phi0)
        # The scalar knife-edge model keeps only the incident-side Fresnel
        # integral; the half-plane solutions are u_s = A - B, u_h = A + B
        # with B the reflection-boundary (D3 + D4) part, so their average
        # recovers the knife-edge field A exactly. Individually, s and h
        # straddle the scalar curve by the +-B polarization term.
        loss_avg = -20.0 * np.log10(np.abs(0.5 * (utd_s + utd_h)))
        loss_s = -20.0 * np.log10(np.abs(utd_s))
        loss_h = -20.0 * np.log10(np.abs(utd_h))

        h_clear = rho_val * np.sin(theta)
        d_dist = rho_val * np.cos(theta)
        v = h_clear * np.sqrt(2.0 / (lam * d_dist))
        expected = knife_edge_loss_db_exact(v)

        np.testing.assert_allclose(loss_avg, expected, atol=0.2)
        np.testing.assert_allclose(loss_s, expected, atol=1.2)
        np.testing.assert_allclose(loss_h, expected, atol=1.2)
        # Just inside the boundary the field is half the free-space value
        # (-6.02 dB), the textbook knife-edge anchor point.
        utd_s_sb, _ = utd_wedge_field(
            k, n, np.array([rho_val]), np.array([sb + 1e-6]), phi0
        )
        np.testing.assert_allclose(
            -20.0 * np.log10(np.abs(utd_s_sb)), 6.02, atol=0.15
        )


class TestSlabPublished:
    def test_quarter_wave_reflectance(self) -> None:
        """Hecht sec. 9.7.1: an n-index quarter-wave film on an n = 1
        substrate reflects |(n^2-1)/(n^2+1)|^2 at normal incidence."""
        for n_index in (1.5, 2.0, 2.5):
            lam = 0.125
            r_s, r_p = slab_reflection_coefficients(
                n_index, 1.0, lam / (4.0 * n_index), lam
            )
            expected = (n_index**2 - 1.0) / (n_index**2 + 1.0)
            np.testing.assert_allclose(abs(complex(r_s)), expected, rtol=1e-6)
            np.testing.assert_allclose(abs(complex(r_p)), expected, rtol=1e-6)

    def test_half_wave_absentee_layer(self) -> None:
        """A half-wave layer is optically absent: zero reflection."""
        n_index, lam = 1.8, 0.3
        r_s, r_p = slab_reflection_coefficients(
            n_index, 1.0, lam / (2.0 * n_index), lam
        )
        assert abs(complex(r_s)) < 1e-6
        assert abs(complex(r_p)) < 1e-6

    def test_brewster_null_through_slab(self) -> None:
        """r_p vanishes at atan(n) for a lossless slab: both interfaces sit
        at Brewster incidence simultaneously."""
        n_index = np.sqrt(5.24)  # lossless concrete-like permittivity
        theta_b = np.arctan(n_index)
        r_s, r_p = slab_reflection_coefficients(
            n_index, np.cos(theta_b), 0.3, 0.125
        )
        assert abs(complex(r_p)) < 1e-6
        assert abs(complex(r_s)) > 0.1

    def test_thick_lossy_slab_approaches_semi_infinite(self) -> None:
        """With strong absorption the slab forgets its back face (the
        multi-bounce sum converges to the plain Fresnel coefficient)."""
        n_lossy = 2.0 - 1.5j
        from differt_tpu.em._fresnel import reflection_coefficients

        r_s_slab, r_p_slab = slab_reflection_coefficients(
            n_lossy, 0.8, 50.0, 0.125
        )
        r_s_inf, r_p_inf = reflection_coefficients(n_lossy, 0.8)
        np.testing.assert_allclose(
            complex(r_s_slab), complex(r_s_inf), atol=1e-6
        )
        np.testing.assert_allclose(
            complex(r_p_slab), complex(r_p_inf), atol=1e-6
        )


def _lossy_utd_wedge_field(
    k: float,
    n: float,
    rho: np.ndarray,
    phi: np.ndarray,
    phi0: float,
    n_r: complex,
) -> tuple[np.ndarray, np.ndarray]:
    """UTD total field with the Luebbers finitely-conducting heuristic.

    Luebbers, "Finite conductivity uniform GTD versus knife edge
    diffraction in prediction of propagation path loss", IEEE Trans. AP-32,
    Jan 1984: ``D = D_1 + D_2 + R_n D_3 + R_o D_4`` with per-face Fresnel
    reflection coefficients evaluated at the grazing angles ``phi'``
    (o-face, incidence side) and ``n pi - phi`` (n-face, diffraction side).
    The GO reflected term uses the same o-face coefficient. Reflection
    coefficients are computed HERE with the textbook Fresnel formulas in
    numpy (independent of differt_tpu.em._fresnel).
    """

    def fresnel_rs_rp(n_sq: complex, grazing: float) -> tuple[complex, complex]:
        # Grazing angle psi from the face; incidence angle from the normal
        # is pi/2 - psi: cos(theta_i) = sin(psi), sin^2(theta_i) = cos^2.
        s = np.sin(grazing)
        root = np.sqrt(n_sq - np.cos(grazing) ** 2 + 0j)
        r_s = (s - root) / (s + root)
        r_p = (n_sq * s - root) / (n_sq * s + root)
        return r_s, r_p

    n_sq = complex(n_r) ** 2
    r_o_s, r_o_p = fresnel_rs_rp(n_sq, phi0)
    # One field point per call keeps the n-face angle scalar.
    r_n_s = np.empty_like(phi, dtype=complex)
    r_n_p = np.empty_like(phi, dtype=complex)
    for i, p in enumerate(np.atleast_1d(phi)):
        r_n_s[i], r_n_p[i] = fresnel_rs_rp(n_sq, n * np.pi - p)

    d_s, d_h = diffraction_coefficients(
        k,
        n,
        jnp.asarray(phi0),
        jnp.asarray(phi),
        1.0,
        jnp.asarray(k * 0.0 + rho),
        r_o=(jnp.asarray(r_o_s), jnp.asarray(r_o_p)),
        r_n=(jnp.asarray(r_n_s), jnp.asarray(r_n_p)),
    )
    spread = np.exp(-1j * k * rho) / np.sqrt(rho)

    def go_step(boundary: float) -> np.ndarray:
        return np.where(
            phi < boundary, 1.0, np.where(phi == boundary, 0.5, 0.0)
        )

    incident = np.exp(1j * k * rho * np.cos(phi - phi0)) * go_step(
        np.pi + phi0
    )
    reflected = np.exp(1j * k * rho * np.cos(phi + phi0)) * go_step(
        np.pi - phi0
    )
    u_soft = incident + r_o_s * reflected + np.asarray(d_s) * spread
    u_hard = incident + r_o_p * reflected + np.asarray(d_h) * spread
    return u_soft, u_hard


class TestLuebbersLossyWedgePublished:
    """Published pins for the Luebbers finitely-conducting wedge heuristic.

    No exact closed form exists for the lossy wedge (that is why Luebbers
    1984 proposes the heuristic), so the pins are the published limits the
    formula must reproduce, each against an independent oracle:

    - conductivity -> infinity: the exact PEC Macdonald eigenfunction
      series (same oracle as TestExactWedgeSeries) through the lossy
      ``r_o``/``r_n`` code path with in-test numpy Fresnel coefficients;
    - absorbing faces (R = 0): only ``D_1 + D_2`` survive — checked against
      an independent numpy/scipy re-evaluation of the published
      McNamara/Kouyoumjian-Pathak incident-boundary terms (eqs. 6.21-6.22,
      F from scipy's Fresnel integrals);
    - |R| < 1: near the reflection boundary the transition-term magnitude
      must drop below the PEC value (the RB transition scales with R —
      Luebbers 1984, sec. III).
    """

    K = 2.0 * np.pi
    N = 1.5  # 90-degree wedge
    PHI0 = np.deg2rad(75.0)

    def test_metal_limit_matches_exact_series(self) -> None:
        k, n, phi0 = self.K, self.N, self.PHI0
        # Copper-class conductivity at 2.4 GHz: |n_r| ~ 2e4.
        n_r = np.sqrt(1.0 - 1j * 6.0e7 / (2.0 * np.pi * 2.4e9 * 8.854e-12))
        phi = np.deg2rad(np.array([30.0, 95.0, 160.0, 200.0, 240.0]))
        rho = np.full_like(phi, 30.0 / k)

        exact_s = exact_wedge_field(k, n, rho, phi, phi0, "soft")
        exact_h = exact_wedge_field(k, n, rho, phi, phi0, "hard")
        u_s, u_h = _lossy_utd_wedge_field(k, n, rho, phi, phi0, n_r)

        np.testing.assert_allclose(np.abs(u_s), np.abs(exact_s), atol=0.04)
        np.testing.assert_allclose(np.abs(u_h), np.abs(exact_h), atol=0.04)

    def test_absorbing_faces_reduce_to_incident_terms(self) -> None:
        """R = 0: independent scipy evaluation of D_1 + D_2 only."""
        k, n, phi0 = self.K, self.N, self.PHI0
        phi = np.deg2rad(np.array([150.0, 200.0, 250.0]))
        rho = np.full_like(phi, 30.0 / k)

        d_s, d_h = diffraction_coefficients(
            k,
            n,
            jnp.asarray(phi0),
            jnp.asarray(phi),
            1.0,
            jnp.asarray(rho),
            r_o=(jnp.asarray(0.0 + 0j), jnp.asarray(0.0 + 0j)),
            r_n=(jnp.asarray(0.0 + 0j), jnp.asarray(0.0 + 0j)),
        )
        # Soft == hard when the reflection terms are killed.
        np.testing.assert_allclose(
            np.asarray(d_s), np.asarray(d_h), rtol=1e-6
        )

        # Independent D1 + D2 (McNamara eqs. 6.21-6.22) in numpy/scipy.
        def a_pm(beta: np.ndarray, sign: float) -> np.ndarray:
            n_round = np.round((sign * np.pi + beta) / (2.0 * n * np.pi))
            return 2.0 * np.cos((2.0 * n * np.pi * n_round - beta) / 2.0) ** 2

        def transition(x: np.ndarray) -> np.ndarray:
            # McNamara eq. 4.72: F(x) = 2j sqrt(x) e^{jx} int_sqrt(x)^inf
            # e^{-ju^2} du, with the complementary Fresnel integral
            # int_a^inf = sqrt(pi/2) [(1-j)/2 - C(a~) + j S(a~)].
            arg = np.sqrt(x / (np.pi / 2.0))
            s_int, c_int = scipy.special.fresnel(arg)
            integral = np.sqrt(np.pi / 2.0) * (
                (1.0 - 1j) / 2.0 - c_int + 1j * s_int
            )
            return 2j * np.sqrt(x) * np.exp(1j * x) * integral

        beta = phi - phi0
        factor = -np.exp(-1j * np.pi / 4.0) / (
            2.0 * n * np.sqrt(2.0 * np.pi * k)
        )
        d12 = factor * (
            1.0
            / np.tan((np.pi + beta) / (2.0 * n))
            * transition(k * rho * a_pm(beta, +1.0))
            + 1.0
            / np.tan((np.pi - beta) / (2.0 * n))
            * transition(k * rho * a_pm(beta, -1.0))
        )
        np.testing.assert_allclose(np.asarray(d_s), d12, rtol=2e-5, atol=1e-8)

    def test_partial_reflection_weakens_reflection_boundary(self) -> None:
        """|D| near the RB: lossy brick < PEC (transition term scales w/ R).

        5 degrees inside the o-face reflection boundary (RB at
        ``pi - phi0`` = 105 deg) the reflection transition term ``D_4``
        dominates the coefficient; Luebbers scales it by ``R_o`` with
        ``|R_o| < 1`` for any finitely-conducting face, so the lossy
        coefficient magnitude must drop below the PEC one (Luebbers 1984,
        sec. III — the mechanism that removes the PEC over-prediction)."""
        k, n, phi0 = self.K, self.N, self.PHI0
        phi = np.deg2rad(np.array([100.0]))  # 5 deg from RB at 105 deg
        rho = np.full_like(phi, 30.0 / k)

        d_pec_s, d_pec_h = diffraction_coefficients(
            k, n, jnp.asarray(phi0), jnp.asarray(phi), 1.0, jnp.asarray(rho)
        )
        # ITU-R P.2040 brick at 2.4 GHz: eta ~ 3.91, sigma ~ 0.024 S/m.
        n_sq = 3.91 - 1j * 0.024 / (2.0 * np.pi * 2.4e9 * 8.854e-12)

        def fresnel_rs_rp(grazing: float) -> tuple[complex, complex]:
            s_g = np.sin(grazing)
            root = np.sqrt(n_sq - np.cos(grazing) ** 2 + 0j)
            return (s_g - root) / (s_g + root), (
                n_sq * s_g - root
            ) / (n_sq * s_g + root)

        r_o = fresnel_rs_rp(phi0)
        r_n = fresnel_rs_rp(n * np.pi - float(phi[0]))
        d_lossy_s, d_lossy_h = diffraction_coefficients(
            k,
            n,
            jnp.asarray(phi0),
            jnp.asarray(phi),
            1.0,
            jnp.asarray(rho),
            r_o=(jnp.asarray(r_o[0]), jnp.asarray(r_o[1])),
            r_n=(jnp.asarray(r_n[0]), jnp.asarray(r_n[1])),
        )
        assert np.abs(np.asarray(d_lossy_s)) < np.abs(np.asarray(d_pec_s))
        assert np.abs(np.asarray(d_lossy_h)) < np.abs(np.asarray(d_pec_h))


class TestDegliEspostiPublished:
    """Published pins for the effective-roughness scattering model.

    Degli-Esposti, Fuschini, Vitucci & Falciasecca, "Measurement and
    modelling of scattering from buildings", IEEE Trans. AP 55(1), 2007:
    the directive lobe ``((1 + cos psi)/2)^alpha_R`` must be divided by its
    hemisphere integral ``F_alpha`` (eqs. 9-11) so the scattered power is
    exactly the ``S^2`` energy budget at every incidence angle. The oracle
    here is INDEPENDENT numerical quadrature of the lobe over the
    hemisphere (scipy.integrate), compared to the closed-form implemented
    in differt_tpu.rt.directive_pattern_normalization.
    """

    @pytest.mark.parametrize("alpha_r", [1, 2, 3, 4, 7])
    @pytest.mark.parametrize("theta_i_deg", [0.0, 30.0, 60.0])
    def test_normalization_matches_quadrature(
        self, alpha_r: int, theta_i_deg: float
    ) -> None:
        import scipy.integrate

        from differt_tpu.rt import directive_pattern_normalization

        theta_i = np.deg2rad(theta_i_deg)
        # Lobe axis = specular direction, tilted theta_i from the normal.
        s_hat = np.array([np.sin(theta_i), 0.0, np.cos(theta_i)])

        def integrand(theta: float, phi: float) -> float:
            w = np.array(
                [
                    np.sin(theta) * np.cos(phi),
                    np.sin(theta) * np.sin(phi),
                    np.cos(theta),
                ]
            )
            return ((1.0 + float(s_hat @ w)) / 2.0) ** alpha_r * np.sin(
                theta
            )

        quad, _ = scipy.integrate.dblquad(
            integrand, 0.0, 2.0 * np.pi, 0.0, np.pi / 2.0, epsabs=1e-9
        )
        closed = float(
            directive_pattern_normalization(
                alpha_r, jnp.asarray(np.cos(theta_i))
            )
        )
        np.testing.assert_allclose(closed, quad, rtol=1e-5)

    def test_normal_incidence_closed_form(self) -> None:
        """F_alpha(0) = (4 pi / (alpha+1)) (1 - 2^-(alpha+1)) (eq. 11)."""
        from differt_tpu.rt import directive_pattern_normalization

        for alpha in (1, 3, 5, 10):
            expected = (
                4.0 * np.pi / (alpha + 1.0) * (1.0 - 0.5 ** (alpha + 1))
            )
            got = float(directive_pattern_normalization(alpha, jnp.asarray(1.0)))
            np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_lambertian_hemisphere_integral_is_one(self) -> None:
        """cos(theta)/pi integrates to exactly 1 over the hemisphere."""
        import scipy.integrate

        quad, _ = scipy.integrate.dblquad(
            lambda theta, phi: np.cos(theta) / np.pi * np.sin(theta),
            0.0,
            2.0 * np.pi,
            0.0,
            np.pi / 2.0,
        )
        np.testing.assert_allclose(quad, 1.0, rtol=1e-8)

    def test_scattered_power_budget_through_api(self) -> None:
        """Sum of |a|^2 over a dense RX hemisphere ~= the S^2 budget.

        A tiny patch with S = 1, |R|^2 ~ gamma_sq at normal incidence:
        total scattered power collected over the hemisphere must equal the
        incident-power budget (r_i = 1 m so the incident field factor is
        the free-space amplitude), within quadrature error of the RX grid.
        """
        import differt_tpu.treekit as tk
        from differt_tpu.geometry import Mesh, Scene
        from differt_tpu.rt import scattering_amplitudes

        side = 0.05
        mesh = Mesh.plane(
            jnp.array([0.0, 0.0, 0.0]),
            normal=jnp.array([0.0, 0.0, 1.0]),
            side_length=side,
        ).set_materials("Concrete")
        # Dense hemisphere of receivers at radius 10 m.
        r = 10.0
        thetas = np.linspace(0.02, np.pi / 2.0 - 0.02, 24)
        phis = np.linspace(0.0, 2.0 * np.pi, 48, endpoint=False)
        tt, pp = np.meshgrid(thetas, phis, indexing="ij")
        rx = np.stack(
            (
                r * np.sin(tt) * np.cos(pp),
                r * np.sin(tt) * np.sin(pp),
                r * np.cos(tt),
            ),
            axis=-1,
        ).reshape(-1, 3)
        scene = Scene(
            transmitters=jnp.array([[0.0, 0.0, 1.0]]),
            receivers=jnp.asarray(rx),
            mesh=mesh,
        )
        paths = scene.trace_scattering_paths()
        for alpha_r in (None, 4):
            a = scattering_amplitudes(
                paths,
                scene,
                2.4e9,
                eta_r=jnp.array([5.24]),
                conductivity=jnp.array([0.0]),
                scattering_coefficient=1.0,
                alpha_r=alpha_r,
            )
            # Power through each RX direction's solid-angle cell.
            p = np.asarray(jnp.sum(jnp.abs(a) ** 2, axis=-1)).reshape(
                1, tt.shape[0], tt.shape[1]
            )
            d_theta = thetas[1] - thetas[0]
            d_phi = phis[1] - phis[0]
            cell = (r**2) * np.sin(tt) * d_theta * d_phi
            total = float((p[0] * cell).sum())

            # Expected: (lambda/4pi)^2 * gamma_sq * cos(theta_i) * dA / r_i^2
            # with r_i = 1, theta_i = 0, dA = side^2 (pattern integrates
            # to 1 by the published normalization).
            wavelength = 299792458.0 / 2.4e9
            n_sq = 5.24
            root = np.sqrt(n_sq)
            r_s = (1.0 - root) / (1.0 + root)
            gamma_sq = r_s**2  # s == p at normal incidence (power).
            expected = (wavelength / (4.0 * np.pi)) ** 2 * gamma_sq * side**2
            np.testing.assert_allclose(total, expected, rtol=0.05)
