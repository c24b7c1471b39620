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
