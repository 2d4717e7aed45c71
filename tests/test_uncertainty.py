"""Uncertainty quantification for the inverse suite (uncertainty.py).

The reference validates its inverse result only by plotting epsilon against
truth (AdvDiff.py:544-545).  Here the error bars themselves are tested:
closed-form lstsq covariance on synthetic problems with KNOWN noise (where
coverage is exact math, not luck), the Gauss-Newton scalar CI on the real
benchmark (measured calibration: sigma_est tracks the injected noise and the
95% CI covers truth — 6/6 seeds x noise levels in the round-3 study), and
the Fisher band of the differentiable field route.
"""

import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu import uncertainty as uq


def test_lstsq_covariance_matches_monte_carlo():
    """On a synthetic linear model with known Gaussian noise, the closed-form
    covariance must match the Monte-Carlo covariance of repeated fits."""
    rng = np.random.default_rng(0)
    M, J, sigma = 400, 5, 0.03
    A = rng.normal(size=(M, J))
    c_true = rng.normal(size=J)
    # closed form from ONE realization
    b1 = A @ c_true + sigma * rng.normal(size=M)
    c1, *_ = np.linalg.lstsq(A, b1, rcond=None)
    cov, sigma2 = uq.lstsq_covariance(A, b1, c1)
    assert abs(np.sqrt(sigma2) - sigma) / sigma < 0.15
    # Monte-Carlo
    fits = []
    for _ in range(400):
        b = A @ c_true + sigma * rng.normal(size=M)
        c, *_ = np.linalg.lstsq(A, b, rcond=None)
        fits.append(c)
    cov_mc = np.cov(np.stack(fits).T)
    np.testing.assert_allclose(np.diag(cov), np.diag(cov_mc), rtol=0.35)


def test_lstsq_covariance_regularized_shrinks():
    """Tikhonov regularization shrinks the estimator's variance (bias-variance
    trade): the sandwich covariance must reflect it."""
    rng = np.random.default_rng(1)
    M, J = 60, 8
    A = rng.normal(size=(M, J)) @ np.diag(1.0 / (1 + np.arange(J)) ** 2)
    b = A @ rng.normal(size=J) + 0.05 * rng.normal(size=M)
    c0, *_ = np.linalg.lstsq(A, b, rcond=None)
    cov0, _ = uq.lstsq_covariance(A, b, c0)
    G = 1e-2 * np.trace(A.T @ A) / J * np.eye(J)
    c1 = np.linalg.solve(A.T @ A + G, A.T @ b)
    cov1, _ = uq.lstsq_covariance(A, b, c1, reg_gram=G)
    assert np.trace(cov1) < np.trace(cov0)


def test_legendre_field_band_shapes_and_zero_cov():
    coef = np.array([1.0, 0.5, 0.25])
    std_fn = uq.legendre_field_band(coef, np.zeros((3, 3)))
    x = np.linspace(-1, 1, 7)
    np.testing.assert_allclose(std_fn(x), 0.0)
    std_fn2 = uq.legendre_field_band(coef, 0.01 * np.eye(3))
    assert std_fn2(x).shape == x.shape
    assert np.all(std_fn2(x) > 0)


@pytest.mark.slow
def test_reduced_scalar_ci_covers_truth_and_tracks_noise():
    """The round-3 calibration study in miniature: with injected sensor noise
    1e-3, sigma_est must recover the noise level and the 95% CI must cover
    the true epsilon (measured 6/6 across seeds x noise in MEASUREMENTS.md)."""
    from dataclasses import replace

    from hpvpinns_tpu.inverse import reduced_identify

    cfg = replace(hv.advdiff_of_record(), dtype="float64", sensor_noise_std=1e-3)
    prob = hv.build(cfg)
    coef, _, info = reduced_identify(prob)
    ci = uq.reduced_scalar_ci(prob, coef)
    et = prob.extras["eps_true"]
    lo, hi = ci["ci95"][0]
    assert lo <= et <= hi
    assert 0.3e-3 < ci["sigma"] < 3e-3, f"sigma_est {ci['sigma']} vs noise 1e-3"
    # CRLB mode: with the noise level GIVEN, the bound is close to the
    # residual-estimated one (the residuals are noise-dominated here)
    crlb = uq.reduced_scalar_ci(prob, coef, noise_std=1e-3)
    assert crlb["crlb"]
    assert 0.2 < crlb["std"][0] / ci["std"][0] < 5.0


def test_reduced_scalar_ci2d_covers_truth_and_tracks_noise():
    """2D analog of the scalar CI: with injected noise 1e-3 the GN interval
    for (eps, vx, vy) at the TRUTH must cover the true epsilon and the
    residual-based sigma must recover the injected level (identification
    itself is covered by test_cli/identify; the CI is evaluated at the true
    coefficients to keep the test fast — 7 forward solves)."""
    from dataclasses import replace

    cfg = replace(hv.AdvDiff2DConfig(), dtype="float64", sensor_noise_std=1e-3)
    prob = hv.build(cfg)
    truth = [prob.extras["eps_true"], *cfg.velocity]
    ci = uq.reduced_scalar_ci2d(prob, truth)
    assert ci["params"] == ["epsilon", "vx", "vy"]
    et = prob.extras["eps_true"]
    lo, hi = ci["ci95"][0]
    assert lo <= et <= hi
    assert 0.3e-3 < ci["sigma"] < 3e-3, f"sigma_est {ci['sigma']} vs noise 1e-3"
    assert all(s > 0 for s in ci["std"])
    crlb = uq.reduced_scalar_ci2d(prob, truth, noise_std=1e-3)
    assert crlb["crlb"]
    assert 0.2 < crlb["std"][0] / ci["std"][0] < 5.0


@pytest.mark.slow
def test_profile_eps_ci2d_structure():
    """Profile-likelihood interval for the 2D route (the measured control
    behind the Wald-interval calibration finding): ordered, positive, and
    bracketing the estimate; CRLB-mode threshold honored (known sigma)."""
    from dataclasses import replace

    cfg = replace(hv.AdvDiff2DConfig(), dtype="float64", sensor_noise_std=1e-3)
    prob = hv.build(cfg)
    truth = [prob.extras["eps_true"], *cfg.velocity]
    prof = uq.profile_eps_ci2d(prob, truth, p=8, noise_std=1e-3, max_expand=3)
    lo, hi = prof["eps_ci95"]
    assert 0.0 <= lo < truth[0] < hi
    assert prof["sigma"] == pytest.approx(1e-3)
    assert prof["n_profile"] > 10


@pytest.mark.slow
def test_reduced_field_ci_band():
    """Fisher band of the differentiable log-field route: positive, finite,
    and scaled to the injected noise."""
    from dataclasses import replace

    from hpvpinns_tpu.inverse import reduced_identify_field

    cfg = replace(
        hv.advdiff_of_record(), dtype="float64", sensor_noise_std=1e-3,
        sensor_stations=tuple(np.linspace(-0.95, 0.95, 7)),
    )
    prob = hv.build(cfg)
    s_coef, eps_fn, info = reduced_identify_field(prob, eps_order=4, maxiter=150)
    ci = uq.reduced_field_ci(s_coef, info, domain=cfg.domain_x)
    xs = np.linspace(-0.9, 0.9, 33)
    band = ci["std_fn"](xs)
    assert band.shape == xs.shape
    assert np.all(band > 0) and np.all(np.isfinite(band))
    assert ci["sigma"] < 5e-3  # residual sigma ~ noise scale
