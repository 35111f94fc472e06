"""J4 relation-tag overwrite and J6 ends-membership tests."""

import numpy as np
import pyarrow as pa
import pytest

from osm_lump_ways_ray.functions.tagfilter import parse_tag_filter
from osm_lump_ways_ray.stages.relations import ends_membership, relation_tags_overwrite


@pytest.fixture(scope="module")
def mk(ray_session):
    import ray.data

    return ray.data.from_arrow


def test_relation_tags_biggest_wins(mk):
    # way 1 in rel 10 (3 members) and rel 20 (2 members) → rel 10's tag wins
    m = pa.table({
        "way_id": pa.array([1, 2, 3, 1, 4], pa.int64()),
        "rel_id": pa.array([10, 10, 10, 20, 20], pa.int64()),
        "rel_tag": pa.array(["big", "big", "big", "small", "small"], pa.string()),
    })
    out = {r["way_id"]: (r["rel_tag"], r["n_members"])
           for r in relation_tags_overwrite(mk(m), num_partitions=4).take_all()}
    assert out[1] == ("big", 3)
    assert out[4] == ("small", 2)


def test_relation_tags_tie_breaks_max_rel(mk):
    m = pa.table({
        "way_id": pa.array([1, 1], pa.int64()),
        "rel_id": pa.array([10, 20], pa.int64()),
        "rel_tag": pa.array(["a", "b"], pa.string()),
    })
    out = relation_tags_overwrite(mk(m), num_partitions=4).take_all()
    assert out[0]["rel_tag"] == "b" and out[0]["rel_id"] == 20


def test_ends_membership_flags(mk):
    ends = mk(pa.table({"node": pa.array([5, 9], pa.int64())}))
    wn = mk(pa.table({
        "node": pa.array([5, 5, 9], pa.int64()),
        "lang": pa.array(["en", "de", "fr"], pa.string()),
    }))
    filters = [("en", parse_tag_filter("lang=en")),
               ("de", parse_tag_filter("lang=de"))]
    out = {r["node"]: (r["is_in:en"], r["is_in:de"], r["is_in_count"])
           for r in ends_membership(ends, wn, filters, num_partitions=4).take_all()}
    assert out[5] == (1, 1, 2)
    assert out[9] == (0, 0, 0)
