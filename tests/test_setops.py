"""Set-algebra vocabulary tests — both backends vs numpy reference."""
import numpy as np
import jax.numpy as jnp
import pytest

from graphminer_tpu.ops import setops
from graphminer_tpu.types import SENTINEL


def random_rows(rng, b, w, hi=1000, frac=0.7):
    """Sorted SENTINEL-padded rows with random lengths."""
    out = np.full((b, w), SENTINEL, dtype=np.int32)
    lens = rng.integers(0, int(w * frac) + 1, b)
    for i, l in enumerate(lens):
        vals = np.sort(rng.choice(hi, size=l, replace=False)).astype(np.int32)
        out[i, :l] = vals
    return out


@pytest.mark.parametrize("backend", ["bc", "bs"])
@pytest.mark.parametrize("w", [8, 16, 100, 128])
def test_intersect_count(backend, w):
    rng = np.random.default_rng(42)
    a = random_rows(rng, 32, w)
    b = random_rows(rng, 32, w)
    got = np.asarray(setops.intersect_count(jnp.asarray(a), jnp.asarray(b),
                                            backend=backend))
    want = [len(np.intersect1d(a[i][a[i] != SENTINEL], b[i][b[i] != SENTINEL]))
            for i in range(32)]
    assert got.tolist() == want


@pytest.mark.parametrize("backend", ["bc", "bs"])
def test_intersect_count_bounded(backend):
    rng = np.random.default_rng(7)
    a = random_rows(rng, 16, 32)
    b = random_rows(rng, 16, 32)
    upper = rng.integers(0, 1000, 16).astype(np.int32)
    got = np.asarray(setops.intersect_count(jnp.asarray(a), jnp.asarray(b),
                                            upper=jnp.asarray(upper), backend=backend))
    want = [len([x for x in np.intersect1d(a[i][a[i] != SENTINEL],
                                           b[i][b[i] != SENTINEL]) if x < upper[i]])
            for i in range(16)]
    assert got.tolist() == want


@pytest.mark.parametrize("backend", ["bc", "bs"])
def test_difference_and_intersect_sets(backend):
    rng = np.random.default_rng(3)
    a = random_rows(rng, 16, 24)
    b = random_rows(rng, 16, 24)
    inter = np.asarray(setops.intersect(jnp.asarray(a), jnp.asarray(b), backend=backend))
    diff = np.asarray(setops.difference(jnp.asarray(a), jnp.asarray(b), backend=backend))
    for i in range(16):
        av = a[i][a[i] != SENTINEL]
        bv = b[i][b[i] != SENTINEL]
        assert set(inter[i][inter[i] != SENTINEL]) == set(av) & set(bv)
        assert set(diff[i][diff[i] != SENTINEL]) == set(av) - set(bv)
        # slot alignment preserved
        keep = inter[i] != SENTINEL
        assert np.array_equal(inter[i][keep], a[i][keep])


def test_exclude_and_connected():
    rng = np.random.default_rng(5)
    a = random_rows(rng, 8, 16)
    anc = rng.integers(0, 1000, (8, 3)).astype(np.int32)
    # force known members
    anc[0, 0] = a[0, 0]
    out = np.asarray(setops.exclude(jnp.asarray(a), jnp.asarray(anc)))
    for i in range(8):
        av = set(a[i][a[i] != SENTINEL])
        assert set(out[i][out[i] != SENTINEL]) == av - set(anc[i])

    b = random_rows(rng, 8, 16)
    x = b[:, 0].copy()  # first element (may be SENTINEL for empty rows)
    got = np.asarray(setops.connected(jnp.asarray(x), jnp.asarray(b)))
    want = [(x[i] != SENTINEL) and x[i] in b[i] for i in range(8)]
    assert got.tolist() == want


def test_empty_rows_all_zero():
    a = jnp.full((4, 8), SENTINEL, dtype=jnp.int32)
    b = jnp.full((4, 8), SENTINEL, dtype=jnp.int32)
    assert np.asarray(setops.intersect_count(a, b)).tolist() == [0] * 4
    assert np.asarray(setops.difference_count(a, b)).tolist() == [0] * 4
    assert np.asarray(setops.count_valid(a)).tolist() == [0] * 4
