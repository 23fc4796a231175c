"""Depth filter: tau geometry, Bayesian seed updates, and the
degenerate-motion replay (the mono-drift failure mode).

The reference ships the Seed machinery vestigially (depth_filter.cpp:35-60,
never constructed); here it is live, so it gets the test pyramid the
reference never had: unit tests of the uncertainty geometry and the
posterior update, plus the frozen turn-apex replay that measures the fix.
"""

import numpy as np
import pytest

from sp_orb_slam_tpu.slam.depth_filter import SeedBank


def test_depth_and_tau_geometry():
    """tau shrinks with baseline growth and grows toward degeneracy."""
    import jax.numpy as jnp

    from sp_orb_slam_tpu.geometry.triangulation import depth_and_tau

    X = jnp.array([[0.0, 0.0, 5.0]])
    O1 = jnp.zeros(3)
    px_angle = 2.0 * np.arctan(1.0 / (2.0 * 260.0))
    taus = []
    for b in (0.01, 0.1, 0.5, 2.0):
        z, tau = depth_and_tau(X, O1, jnp.array([b, 0.0, 0.0]), px_angle)
        assert float(z[0]) == pytest.approx(5.0, rel=1e-5)
        taus.append(float(tau[0]))
    assert taus[0] > taus[1] > taus[2] > taus[3]
    # near-zero baseline: relative depth uncertainty is huge
    assert taus[0] / 5.0 > 0.5
    # healthy baseline: small
    assert taus[3] / 5.0 < 0.02


def test_depth_and_tau_degenerate_is_inf():
    """Point along the baseline direction (gamma <= 0) -> tau = inf."""
    import jax.numpy as jnp

    from sp_orb_slam_tpu.geometry.triangulation import depth_and_tau

    X = jnp.array([[0.0, 0.0, 5.0]])
    _, tau = depth_and_tau(X, jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]),
                           0.004)
    assert not np.isfinite(float(tau[0]))


def test_seed_converges_with_consistent_measurements():
    bank = SeedBank(8)
    idx = np.array([3])
    z_true = 5.0
    bank.init_slots(idx, np.array([z_true * 1.1]), min_depth=1.0, born_kf=0)
    x_true = 1.0 / z_true
    tau2 = np.array([(0.1 * x_true) ** 2])
    rng = np.random.default_rng(0)
    for _ in range(12):
        x = np.array([x_true + rng.normal(0, 0.1 * x_true)])
        bank.update(idx, x, tau2)
    assert bank.converged(30.0, 0.12)[3]
    assert 1.0 / bank.mu[3] == pytest.approx(z_true, rel=0.15)
    # inlier evidence grew
    assert bank.a[3] / (bank.a[3] + bank.b[3]) > 0.5


def test_seed_outliers_grow_beta_b():
    """Measurements far outside the posterior feed the Beta outlier count
    and barely move the depth (the Vogiatzis robustness property)."""
    bank = SeedBank(4)
    idx = np.array([0])
    bank.init_slots(idx, np.array([5.0]), min_depth=1.0, born_kf=0)
    # tighten the posterior with consistent data first
    for _ in range(5):
        bank.update(idx, np.array([0.2]), np.array([(0.02 * 0.2) ** 2]))
    mu_before = float(bank.mu[0])
    b_before = float(bank.b[0])
    for _ in range(5):
        bank.update(idx, np.array([0.9]), np.array([(0.02 * 0.2) ** 2]))
    assert bank.b[0] > b_before          # outlier evidence accumulated
    assert abs(float(bank.mu[0]) - mu_before) < 0.25 * mu_before


def test_seed_update_numerically_safe():
    """NaN/degenerate inputs must not corrupt the bank."""
    bank = SeedBank(4)
    idx = np.array([0, 1])
    bank.init_slots(idx, np.array([5.0, 2.0]), min_depth=1.0, born_kf=0)
    mu0 = bank.mu.copy()
    bank.update(idx, np.array([np.nan, 0.5]),
                np.array([1e-30, np.inf]))
    assert np.isfinite(bank.mu[idx]).all()
    assert np.isfinite(bank.sigma2[idx]).all()
    assert (bank.sigma2[idx] > 0).all()
    assert bank.mu[0] == mu0[0]  # NaN measurement rejected


@pytest.mark.slow
def test_degenerate_replay_depth_filter_improves():
    """The frozen turn-apex replay (VERDICT round-1 item 6): near-zero
    baseline keyframe pairs poison triangulated depths; the depth filter
    (uncertainty gate + rescue floor + relocalization) must keep tracking
    alive and beat the unfiltered ATE on the failing seeds."""
    import sys
    sys.path.insert(0, "scripts")
    from replay_degenerate import run_one

    # seeds chosen by the round-2 sweep: 1 drifts AND wedges LOST without
    # the filter (rmse ~1.05, 37 lost frames)
    r_off = run_one(1, False, 80)
    r_on = run_one(1, True, 80)
    assert r_on["n_lost"] <= r_off["n_lost"]
    assert r_on["rmse"] < max(0.6, 0.8 * r_off["rmse"])
