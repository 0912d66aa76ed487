"""Monotonic alignment search vs a brute-force numpy oracle implementing the
same DP as the reference's Cython `monotonic_align` kernel
(used at /root/reference/train_STEP1.py:344)."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitspeech_tpu.ops.mas import maximum_path


def _oracle_single(lp, t_x, t_y):
    """Direct DP + backtrack, one sample."""
    neg = -1e9
    value = np.full((t_y, t_x), neg, dtype=np.float64)
    value[0, 0] = lp[0, 0]
    for y in range(1, t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            stay = value[y - 1, x] if x < y else neg  # x == y cannot stay
            adv = value[y - 1, x - 1] if x > 0 else neg
            value[y, x] = lp[x, y] + max(stay, adv)
    path = np.zeros((t_x, t_y), dtype=np.float32)
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1.0
        if index != 0 and (index == y or value[y - 1, index - 1] >= value[y - 1, index]):
            index -= 1
    return path


def _make_case(rng, t_x, t_y, b=1):
    lp = rng.standard_normal((b, t_x, t_y)).astype(np.float32)
    return lp


@pytest.mark.parametrize("seed,t_x,t_y", [(0, 4, 9), (1, 6, 20), (2, 10, 11), (3, 1, 5)])
def test_maximum_path_matches_oracle(seed, t_x, t_y):
    rng = np.random.default_rng(seed)
    lp = _make_case(rng, t_x, t_y)
    mask = np.ones((1, t_x, t_y), dtype=np.float32)
    got = np.asarray(maximum_path(jnp.asarray(lp), jnp.asarray(mask)))
    want = _oracle_single(lp[0].astype(np.float64), t_x, t_y)[None]
    np.testing.assert_array_equal(got, want)


def test_maximum_path_variable_lengths_in_batch():
    rng = np.random.default_rng(4)
    b, t_x, t_y = 3, 6, 15
    lp = _make_case(rng, t_x, t_y, b)
    x_lens = [6, 4, 2]
    y_lens = [15, 9, 5]
    mask = np.zeros((b, t_x, t_y), dtype=np.float32)
    for i in range(b):
        mask[i, : x_lens[i], : y_lens[i]] = 1.0
    got = np.asarray(maximum_path(jnp.asarray(lp), jnp.asarray(mask)))
    for i in range(b):
        want = _oracle_single(
            lp[i, : x_lens[i], : y_lens[i]].astype(np.float64), x_lens[i], y_lens[i]
        )
        np.testing.assert_array_equal(got[i, : x_lens[i], : y_lens[i]], want)
        # nothing outside the mask
        assert got[i, x_lens[i] :].sum() == 0
        assert got[i, :, y_lens[i] :].sum() == 0


def test_maximum_path_properties():
    """Every valid frame assigned to exactly one token; monotonic; endpoints."""
    rng = np.random.default_rng(5)
    lp = _make_case(rng, 5, 12)
    mask = np.ones((1, 5, 12), dtype=np.float32)
    path = np.asarray(maximum_path(jnp.asarray(lp), jnp.asarray(mask)))[0]
    np.testing.assert_array_equal(path.sum(axis=0), np.ones(12))
    assert path[0, 0] == 1 and path[-1, -1] == 1
    tokens = path.argmax(axis=0)
    assert (np.diff(tokens) >= 0).all() and (np.diff(tokens) <= 1).all()
