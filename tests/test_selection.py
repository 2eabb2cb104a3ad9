"""Distributed exact selection (functions/selection.py) vs numpy."""

import numpy as np
import pyarrow as pa
import pytest

from dataxray.functions.selection import exact_order_stats


@pytest.mark.parametrize("dist", ["uniform", "skewed", "constant"])
@pytest.mark.parametrize("collect_limit", [50, 2_000_000])
def test_exact_order_stats(ray_session, dist, collect_limit):
    import ray.data

    rng = np.random.default_rng(5)
    if dist == "uniform":
        v = rng.integers(-10_000, 10_000_000, 20_001).astype(np.int64)
    elif dist == "skewed":
        v = np.concatenate([np.full(15_000, 42, dtype=np.int64),
                            rng.integers(0, 100, 5_001).astype(np.int64)])
    else:
        v = np.full(20_001, -7, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"x": v})).repartition(16)
    n = len(v)
    ks = [0, (n - 1) // 2, n // 2, n - 1]
    got = exact_order_stats(ds, "x", ks, collect_limit=collect_limit)
    s = np.sort(v)
    assert got == {k: int(s[k]) for k in ks}


def test_exact_order_stats_validates(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2, 3],
                                                     pa.int64())}))
    with pytest.raises(ValueError):
        exact_order_stats(ds, "x", [3])
