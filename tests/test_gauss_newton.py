"""Gauss-Newton / Levenberg-Marquardt residual optimizer
(training/gauss_newton.py).

Covers: the residual-vector identity sum(r^2) == loss for every problem
family (including regularized field-epsilon inversion), LM monotonic
descent + its decisive advantage over an equal-wall-clock first-order
budget, the trainer's gn_iterations third phase, and the inverse problem
(epsilon rides the same parameter vector through the LM step).
"""

import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.training.gauss_newton import gauss_newton, make_residual_vector

import jax


def _resvec_identity(prob, seed=0):
    params = prob.init_params(jax.random.key(seed))
    r = make_residual_vector(prob)(params, prob.data)
    loss = float(prob.loss_fn(params, prob.data)[0])
    np.testing.assert_allclose(float(np.sum(np.asarray(r) ** 2)), loss, rtol=1e-10)


def test_resvec_identity_poisson1d():
    _resvec_identity(hv.build(hv.Poisson1DConfig(
        dtype="float64", n_test=5, n_quad=10, layers=(1, 8, 8, 1))))


def test_resvec_identity_poisson1d_ragged_hard_bc():
    # p-nonuniform test counts (masked residual) + composite hard-BC ansatz
    _resvec_identity(hv.build(hv.Poisson1DConfig(
        dtype="float64", grid=(-1.0, 0.2, 1.0), n_elements=2,
        n_test_per_elem=(4, 6), n_quad=10, layers=(1, 8, 8, 1), hard_bc=True)))


def test_resvec_identity_poisson2d():
    _resvec_identity(hv.build(hv.Poisson2DConfig(
        dtype="float64", n_elements_x=2, n_elements_y=2, n_quad=5,
        n_test_x=3, n_test_y=3, layers=(2, 8, 8, 1))))


def test_resvec_identity_poisson3d():
    _resvec_identity(hv.build(hv.Poisson3DConfig(
        dtype="float64", n_elements_x=1, n_elements_y=1, n_elements_z=1,
        n_quad=4, n_test_x=3, n_test_y=3, n_test_z=3, layers=(3, 8, 1))))


def test_resvec_identity_advdiff_field_eps_reg():
    # neural-field epsilon + Tikhonov reg: the reg_resvec_fn block must make
    # the identity exact (not just the unregularized part)
    from hpvpinns_tpu.problems import advdiff

    cfg = hv.AdvDiffConfig(
        dtype="float64", n_quad=6, n_test_x=3, n_test_t=3,
        layers=(2, 8, 8, 1), epsilon_model="mlp", epsilon_reg=1e-3, var_form=1,
    )
    _resvec_identity(advdiff.build(cfg))


def test_resvec_identity_burgers():
    _resvec_identity(hv.build(hv.BurgersConfig(
        dtype="float64", n_elements_x=2, n_elements_t=1, n_quad=6,
        n_test_x=3, n_test_t=3, layers=(2, 8, 8, 1))))


def test_resvec_identity_advdiff2d():
    from hpvpinns_tpu.problems import advdiff2d

    cfg = hv.AdvDiff2DConfig(
        dtype="float64", n_quad=4, n_test_x=3, n_test_y=3, n_test_t=3,
        layers=(3, 8, 1),
    )
    _resvec_identity(advdiff2d.build(cfg))


def test_resvec_identity_advdiff2d_forward():
    """Forward mode (inverse=False) — the advdiff2d_precision preset's path
    (config.advdiff2d_precision: eps frozen at truth, no sensor term in the
    trainable set)."""
    from hpvpinns_tpu.problems import advdiff2d

    cfg = hv.AdvDiff2DConfig(
        dtype="float64", n_quad=4, n_test_x=3, n_test_y=3, n_test_t=3,
        layers=(3, 8, 1), inverse=False,
    )
    _resvec_identity(advdiff2d.build(cfg))


def test_trainer_gn_phase_advdiff2d_forward_qr():
    """Tiny-budget end-to-end pass through the advdiff2d_precision path:
    forward build -> Adam -> QR-kernel LM phase, loss improves in the GN
    rows (the full-budget measured point is 1.86e-3 on chip —
    MEASUREMENTS.md)."""
    cfg = hv.AdvDiff2DConfig(
        dtype="float64", n_quad=4, n_test_x=3, n_test_y=3, n_test_t=3,
        layers=(3, 8, 1), inverse=False,
        train=hv.TrainConfig(
            iterations=60, check_every=30, gn_iterations=5, gn_solve="qr"
        ),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    assert res.iterations_run > 60
    its = res.history["iteration"]
    adam_rows = its <= 60
    assert np.nanmin(res.history["loss"][~adam_rows]) < np.nanmin(
        res.history["loss"][adam_rows]
    )


def test_pinns_scheme_rejected():
    prob = hv.build(hv.Poisson2DConfig(
        dtype="float64", scheme="PINNs", n_quad=5, n_test_x=3, n_test_y=3,
        layers=(2, 8, 1)))
    with pytest.raises(ValueError, match="variational scheme"):
        make_residual_vector(prob)


@pytest.fixture(scope="module")
def f64_warm():
    """Shared f64 warm start (poisson1d, Adam-300) for the LM solver
    variants — one training run instead of one per test."""
    cfg = hv.Poisson1DConfig(
        dtype="float64", n_test=10, n_quad=20, layers=(1, 12, 12, 1),
        train=hv.TrainConfig(iterations=300, check_every=100),
    )
    prob = hv.build(cfg)
    return prob, hv.train(prob, verbose=False)


@pytest.fixture(scope="module")
def f32_warm():
    """Shared f32 warm start (the chip-regime conditioning fixture)."""
    cfg = hv.Poisson1DConfig(
        dtype="float32", n_test=8, n_quad=16, layers=(1, 10, 10, 1),
        train=hv.TrainConfig(iterations=200, check_every=100),
    )
    prob = hv.build(cfg)
    return prob, hv.train(prob, verbose=False)


def test_lm_monotone_descent_and_beats_first_order(f64_warm):
    """LM accepts only loss decreases (monotone history) and lands orders of
    magnitude below an Adam run of the same problem."""
    prob, adam = f64_warm
    gn = gauss_newton(prob, adam.params, iterations=30, verbose=False)
    losses = gn.history["loss"]
    assert len(losses) == gn.accepted
    assert np.all(np.diff(losses) <= 0), "LM accepted an uphill step"
    assert gn.final_aux["loss"] < 1e-3 * adam.final_aux["loss"], (
        f"GN {gn.final_aux['loss']:.3e} vs Adam {adam.final_aux['loss']:.3e}"
    )


def test_trainer_gn_phase():
    """gn_iterations wires the LM polish as the trainer's third phase, with
    history rows continuing the iteration axis."""
    cfg = hv.Poisson1DConfig(
        dtype="float64", n_test=8, n_quad=16, layers=(1, 10, 10, 1),
        train=hv.TrainConfig(iterations=100, check_every=50, gn_iterations=10),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    assert res.iterations_run > 100
    its = res.history["iteration"]
    assert np.all(np.diff(its) > 0)
    assert "damping" in res.history
    adam_rows = its <= 100
    assert np.nanmin(res.history["loss"][~adam_rows]) < np.nanmin(
        res.history["loss"][adam_rows]
    )


@pytest.mark.slow
def test_gn_inverse_epsilon():
    """The trainable PDE coefficient is just another leaf of theta: LM on the
    reference's own configuration shapes (AdvDiff.py:35-53) identifies
    epsilon to sub-percent where the equal-warmstart Adam run is ~100% off
    (measured: Adam-1500 eps err 1.5; +GN-150 eps err 1.5e-3)."""
    cfg = hv.AdvDiffConfig(
        dtype="float64",
        train=hv.TrainConfig(iterations=1500, check_every=300,
                             best_snapshot_fraction=None),
    )
    prob = hv.build(cfg)
    adam = hv.train(prob, verbose=False)
    gn = gauss_newton(prob, adam.params, iterations=150, verbose=False)
    eps_true = prob.extras["eps_true"]
    err_gn = abs(gn.final_aux["epsilon"] - eps_true) / eps_true
    err_adam = abs(adam.final_aux["epsilon"] - eps_true) / eps_true
    assert err_gn < err_adam
    assert err_gn < 0.01, f"GN epsilon rel err {err_gn:.3e}"


def test_host_solve_variant_f32(f32_warm):
    """host_solve=True (the f32-chip conditioning fix) solves the damped
    normal equations on the host in f64; it must auto-enable for f32
    parameters and match-or-beat the on-device f32 solve."""
    prob, res = f32_warm
    g_dev = gauss_newton(prob, res.params, iterations=25, verbose=False,
                         host_solve=False)
    g_host = gauss_newton(prob, res.params, iterations=25, verbose=False)
    # both reach the ~1e-11 deep-convergence regime on this small fixture;
    # a single-digit factor between them is roundoff luck, not a stall
    # (same rationale as the qr variant below)
    assert g_host.final_aux["loss"] <= 10.0 * g_dev.final_aux["loss"]
    assert g_host.final_aux["loss"] < 1e-3 * res.final_aux["loss"]


def test_qr_step_matches_normal_equations_f64():
    """The augmented-system QR kernel must produce the SAME damped step as
    the normal-equations solve (they minimize the identical quadratic); in
    f64 on a healthy Jacobian the two agree to roundoff, in both the
    overdetermined (M >= P) and min-norm (M < P) regimes."""
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from hpvpinns_tpu.training.gauss_newton import _build_kernels, make_residual_vector

    for layers in ((1, 4, 1), (1, 14, 14, 1)):  # P=13 < M; P=239 > M
        prob = hv.build(hv.Poisson1DConfig(
            dtype="float64", n_test=8, n_quad=16, layers=layers))
        resvec = make_residual_vector(prob)
        params = prob.init_params(jax.random.key(2))
        theta, unravel = ravel_pytree(params)
        r = resvec(params, prob.data)
        rJ, _, steps = _build_kernels(
            resvec, unravel, prob.data, int(theta.size), int(r.size))
        _, J = rJ(theta, prob.data)
        lam = jnp.asarray(1e-4, dtype=theta.dtype)
        d_ne, p_ne, g_ne = steps["normal"](r, J, lam)
        d_qr, p_qr, g_qr = steps["qr"](r, J, lam)
        np.testing.assert_allclose(np.asarray(d_qr), np.asarray(d_ne),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(float(p_qr), float(p_ne), rtol=1e-8)
        np.testing.assert_allclose(float(g_qr), float(g_ne), rtol=1e-10)


def test_qr_solve_variant_f32(f32_warm):
    """solve='qr' (the pure-on-device f32 conditioning fix — no host pull)
    must, like the host-f64 solve, keep LM productive where the f32 normal
    equations stall: match-or-beat the on-device normal solve and cut the
    warm-start loss by orders of magnitude."""
    prob, res = f32_warm
    g_dev = gauss_newton(prob, res.params, iterations=25, verbose=False,
                         solve="normal")
    g_qr = gauss_newton(prob, res.params, iterations=25, verbose=False,
                        solve="qr")
    # both reach the ~1e-11 deep-convergence regime on this small fixture;
    # a single-digit factor between them is roundoff luck, not a stall
    assert g_qr.final_aux["loss"] <= 10.0 * g_dev.final_aux["loss"]
    assert g_qr.final_aux["loss"] < 1e-3 * res.final_aux["loss"]


def test_host_lm_step_failed_cholesky_rejects_not_crashes():
    """A numerically indefinite damped normal matrix (ill-conditioned or
    non-finite f32 chip Jacobian) must surface as a REJECTED step
    (delta=None -> the loop inflates lam), not a LinAlgError crash —
    the on-chip `--seeds 8 --gn-iterations 60` regression."""
    import jax.numpy as jnp

    from hpvpinns_tpu.training.gauss_newton import _build_kernels, make_residual_vector

    prob = hv.build(hv.Poisson1DConfig(
        dtype="float64", n_test=4, n_quad=8, layers=(1, 6, 1)))
    resvec = make_residual_vector(prob)
    params = prob.init_params(jax.random.key(0))
    from jax.flatten_util import ravel_pytree

    theta, unravel = ravel_pytree(params)
    r = resvec(params, prob.data)
    *_, steps = _build_kernels(
        resvec, unravel, prob.data, int(theta.size), int(r.size))
    lm_step_host = steps["host"]
    # A NaN Jacobian poisons the factorization outright
    J_bad = jnp.full((int(r.size), int(theta.size)), jnp.nan)
    delta, pred_dec, grad_inf = lm_step_host(r, J_bad, 1e-3)
    assert delta is None and pred_dec == 0.0 and grad_inf == float("inf")
    # and a healthy Jacobian still solves
    J_ok = jnp.eye(int(r.size), int(theta.size))
    delta, pred_dec, grad_inf = lm_step_host(r, J_ok, 1e-3)
    assert delta is not None and np.all(np.isfinite(np.asarray(delta)))


def test_chunked_jacobian_matches_whole_vmap():
    """The memory-bounded lax.map Jacobian (jac_chunk) must equal the
    whole-Jacobian vmap build exactly, in both fwd (P<=M) and rev (M<P)
    regimes — the poisson3d-quality OOM fix must not change the math."""
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from hpvpinns_tpu.training.gauss_newton import _build_kernels, make_residual_vector

    # rev regime: params ~ 139 > residuals
    prob = hv.build(hv.Poisson1DConfig(
        dtype="float64", n_test=4, n_quad=8, layers=(1, 10, 1)))
    resvec = make_residual_vector(prob)
    params = prob.init_params(jax.random.key(1))
    theta, unravel = ravel_pytree(params)
    r = resvec(params, prob.data)
    M, P = int(r.size), int(theta.size)
    rJ_full, *_ = _build_kernels(resvec, unravel, prob.data, P, M)
    rJ_chunk, *_ = _build_kernels(resvec, unravel, prob.data, P, M, jac_chunk=3)
    _, J_full = rJ_full(theta, prob.data)
    _, J_chunk = rJ_chunk(theta, prob.data)
    assert J_full.shape == (M, P)
    np.testing.assert_allclose(np.asarray(J_chunk), np.asarray(J_full), atol=1e-13)

    # fwd regime: tiny net, rich test space -> P < M
    prob2 = hv.build(hv.Poisson1DConfig(
        dtype="float64", n_test=30, n_quad=40, layers=(1, 3, 1)))
    resvec2 = make_residual_vector(prob2)
    params2 = prob2.init_params(jax.random.key(2))
    theta2, unravel2 = ravel_pytree(params2)
    r2 = resvec2(params2, prob2.data)
    M2, P2 = int(r2.size), int(theta2.size)
    assert P2 < M2
    rJ_full2, *_ = _build_kernels(resvec2, unravel2, prob2.data, P2, M2)
    rJ_chunk2, *_ = _build_kernels(resvec2, unravel2, prob2.data, P2, M2, jac_chunk=4)
    _, Jf = rJ_full2(theta2, prob2.data)
    _, Jc = rJ_chunk2(theta2, prob2.data)
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(Jf), atol=1e-13)


def test_cg_step_matches_normal_equations_f64():
    """The matrix-free CG kernel must reproduce the dense damped step when
    solved tightly (cg_tol ~ 0 forces CG to convergence; maxiter >= P makes
    that reachable): same quadratic, same minimizer, in both M >= P and
    M < P regimes (with damping the solution is unique either way)."""
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from hpvpinns_tpu.training.gauss_newton import _build_kernels, make_residual_vector

    for layers in ((1, 4, 1), (1, 14, 14, 1)):
        prob = hv.build(hv.Poisson1DConfig(
            dtype="float64", n_test=8, n_quad=16, layers=layers))
        resvec = make_residual_vector(prob)
        params = prob.init_params(jax.random.key(2))
        theta, unravel = ravel_pytree(params)
        r = resvec(params, prob.data)
        M, P = int(r.size), int(theta.size)
        rJ, _, steps = _build_kernels(
            resvec, unravel, prob.data, P, M, cg_maxiter=4 * (M + P),
            cg_tol=1e-14)
        _, J = rJ(theta, prob.data)
        lam = jnp.asarray(1e-4, dtype=theta.dtype)
        d_ne, p_ne, g_ne = steps["normal"](r, J, lam)
        d_cg, p_cg, g_cg, k = steps["cg"](theta, lam, prob.data)
        np.testing.assert_allclose(np.asarray(d_cg), np.asarray(d_ne),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(float(p_cg), float(p_ne), rtol=1e-8)
        np.testing.assert_allclose(float(g_cg), float(g_ne), rtol=1e-10)
        assert int(k) <= 4 * (M + P)


def test_cg_solve_variant_deep_convergence(f64_warm):
    """solve='cg' end-to-end: the matrix-free LM must keep pace with the
    dense normal-equations solve on an f64 polish (measured: cg_tol=1e-3
    reaches 3.4e-12 where 'normal' reaches 8e-12 — same deep-convergence
    regime) and record its CG iteration counts."""
    prob, adam = f64_warm
    g_ne = gauss_newton(prob, adam.params, iterations=20, verbose=False,
                        solve="normal")
    g_cg = gauss_newton(prob, adam.params, iterations=20, verbose=False,
                        solve="cg")
    assert g_cg.final_aux["loss"] < 1e-6 * adam.final_aux["loss"]
    assert g_cg.final_aux["loss"] <= 1e3 * g_ne.final_aux["loss"]
    ci = g_cg.history["cg_iters"]
    assert len(ci) == g_cg.accepted and np.all(ci >= 1)


def test_lsqr_step_matches_normal_equations_f64():
    """The matrix-free LSQR kernel (Golub-Kahan on the damped system through
    jvp/vjp — the cond(J)-stable twin of 'qr' with 'cg' memory) must
    reproduce the dense damped step when solved tightly, in both regimes."""
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from hpvpinns_tpu.training.gauss_newton import _build_kernels, make_residual_vector

    for layers in ((1, 4, 1), (1, 14, 14, 1)):
        prob = hv.build(hv.Poisson1DConfig(
            dtype="float64", n_test=8, n_quad=16, layers=layers))
        resvec = make_residual_vector(prob)
        params = prob.init_params(jax.random.key(2))
        theta, unravel = ravel_pytree(params)
        r = resvec(params, prob.data)
        M, P = int(r.size), int(theta.size)
        rJ, _, steps = _build_kernels(
            resvec, unravel, prob.data, P, M, cg_maxiter=8 * (M + P),
            cg_tol=1e-12)
        _, J = rJ(theta, prob.data)
        lam = jnp.asarray(1e-4, dtype=theta.dtype)
        d_ne, p_ne, g_ne = steps["normal"](r, J, lam)
        d_ls, p_ls, g_ls, k = steps["lsqr"](theta, lam, prob.data)
        np.testing.assert_allclose(np.asarray(d_ls), np.asarray(d_ne),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(float(p_ls), float(p_ne), rtol=1e-8)
        np.testing.assert_allclose(float(g_ls), float(g_ne), rtol=1e-10)
        # exhausts well under the Krylov bound (the sign-flip stopping bug
        # of the first implementation terminated at k=2 with garbage)
        assert 3 <= int(k) <= M + P


def test_lsqr_solve_variant_f32(f32_warm):
    """solve='lsqr' end-to-end in f32 (the chip regime): like qr/host it
    must stay productive where the f32 normal equations stall."""
    prob, res = f32_warm
    g_qr = gauss_newton(prob, res.params, iterations=25, verbose=False,
                        solve="qr")
    g_ls = gauss_newton(prob, res.params, iterations=25, verbose=False,
                        solve="lsqr")
    assert g_ls.final_aux["loss"] <= 10.0 * g_qr.final_aux["loss"]
    assert g_ls.final_aux["loss"] < 1e-3 * res.final_aux["loss"]


def test_cg_precond_same_solution():
    """Jacobi-preconditioned CG (Hutchinson-estimated diag(J^T J)) changes
    the iterate PATH, never the solution: solved tightly it must match the
    dense damped step like plain CG does."""
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from hpvpinns_tpu.training.gauss_newton import _build_kernels, make_residual_vector

    prob = hv.build(hv.Poisson1DConfig(
        dtype="float64", n_test=8, n_quad=16, layers=(1, 14, 14, 1)))
    resvec = make_residual_vector(prob)
    params = prob.init_params(jax.random.key(2))
    theta, unravel = ravel_pytree(params)
    r = resvec(params, prob.data)
    M, P = int(r.size), int(theta.size)
    rJ, _, steps = _build_kernels(
        resvec, unravel, prob.data, P, M, cg_maxiter=8 * (M + P),
        cg_tol=1e-13, cg_precond=8)
    _, J = rJ(theta, prob.data)
    lam = jnp.asarray(1e-4, dtype=theta.dtype)
    d_ne, *_ = steps["normal"](r, J, lam)
    d_pc, _, _, k = steps["cg"](theta, lam, prob.data)
    np.testing.assert_allclose(np.asarray(d_pc), np.asarray(d_ne),
                               rtol=1e-6, atol=1e-8)
