"""Derivation cache: cache hits return the SAME values the uncached build
produces, the cache actually shares work (one entry per key), and disabling
it via GRAFT_NO_DERIVATION_CACHE bypasses it entirely."""

import os

import pandas as pd

from osm_lump_ways_ray.state import derivation_cache as dc


SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_cached_vs_uncached_identical(ray_session):
    from osm_lump_ways_ray.pipelines.queries import q_flow_upstream

    dc.clear()
    cached = _canon(q_flow_upstream(SF).to_pandas())
    # second call: served from the primed cache
    again = _canon(q_flow_upstream(SF).to_pandas())
    os.environ["GRAFT_NO_DERIVATION_CACHE"] = "1"
    try:
        dc.clear()
        plain = _canon(q_flow_upstream(SF).to_pandas())
    finally:
        del os.environ["GRAFT_NO_DERIVATION_CACHE"]
    pd.testing.assert_frame_equal(cached, plain)
    pd.testing.assert_frame_equal(again, plain)


def test_cache_shares_one_build(ray_session):
    dc.clear()
    calls = []

    def build():
        import ray.data

        calls.append(1)
        return ray.data.range(5)

    a = dc.cached_ds(("t", "x"), build)
    b = dc.cached_ds(("t", "x"), build)
    assert len(calls) == 1
    assert a.count() == b.count() == 5
    dc.clear()


def test_cache_disabled_rebuilds(ray_session):
    dc.clear()
    calls = []

    def build():
        import ray.data

        calls.append(1)
        return ray.data.range(3)

    os.environ["GRAFT_NO_DERIVATION_CACHE"] = "1"
    try:
        dc.cached_ds(("t", "y"), build)
        dc.cached_ds(("t", "y"), build)
    finally:
        del os.environ["GRAFT_NO_DERIVATION_CACHE"]
    assert len(calls) == 2
