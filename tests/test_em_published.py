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
