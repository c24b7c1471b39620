"""On-device auction assignment vs scipy Hungarian optimum."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from srfdet3d_tpu.assign import auction_assign


@pytest.mark.parametrize("seed,n_p,g", [(0, 50, 8), (1, 120, 20),
                                        (2, 30, 30)])
def test_auction_matches_scipy_cost(seed, n_p, g):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 10, (n_p, g)).astype(np.float32)
    mask = np.ones(g, bool)
    owner = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(mask)))

    # one-to-one: every gt assigned exactly once
    assigned = owner[owner >= 0]
    assert len(assigned) == g
    assert len(np.unique(assigned)) == g

    got_cost = sum(cost[p, owner[p]] for p in range(n_p) if owner[p] >= 0)
    rows, cols = linear_sum_assignment(cost.T)     # gt -> pred
    want_cost = cost.T[rows, cols].sum()
    assert abs(got_cost - want_cost) < 1e-2 * g, (got_cost, want_cost)


def test_auction_with_padded_gts():
    rng = np.random.default_rng(3)
    cost = rng.uniform(0, 5, (40, 10)).astype(np.float32)
    mask = np.zeros(10, bool)
    mask[:4] = True
    owner = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(mask)))
    assigned = owner[owner >= 0]
    assert set(assigned) == {0, 1, 2, 3}


def test_auction_single_pred_column():
    """n_p == 1 must not crash top_k(_, 2) (padded big-neg column)."""
    cost = jnp.asarray(np.array([[3.0, 1.0, 2.0]], np.float32))  # (1, 3)
    mask = jnp.asarray(np.array([True, True, True]))
    owner = np.asarray(auction_assign(cost, mask))
    assert owner.shape == (1,)
    assert owner[0] == 1          # the cheapest gt wins the only pred


def test_auction_budget_exhaustion_still_assigns():
    """Near-tied costs can exceed the round budget; the greedy completion
    must still give every valid GT an owner (never silently unassigned)."""
    rng = np.random.default_rng(7)
    g = 12
    base = rng.uniform(0, 1e-6, (g,))              # near-identical columns
    cost = np.tile(base[None, :], (g, 1)).astype(np.float32)
    owner = np.asarray(auction_assign(jnp.asarray(cost),
                                      jnp.ones(g, bool), max_rounds=2))
    assigned = owner[owner >= 0]
    assert len(np.unique(assigned)) == g           # all GTs assigned
