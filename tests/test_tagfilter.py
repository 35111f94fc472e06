"""Tag-filter DSL tests — mirrors the reference's own unit suite
(src/tagfilter.rs:378-767) for parse + eval, plus vectorized-mask equivalence."""

import numpy as np
import pytest

from osm_lump_ways_ray.functions.tagfilter import (
    And,
    ColumnTagView,
    DictTagView,
    HasK,
    HasKLeftRightBoth,
    HasKnotInV,
    HasReK,
    KinV,
    KneV,
    KnotInV,
    KreV,
    KV,
    NotHasK,
    NotHasKLeftRightBoth,
    NotHasReK,
    Or,
    OSMObj,
    TagFilterFunc,
    TagFilterParseError,
    filters_mask,
    obj_pass_filters,
    parse_tag_filter,
)

PARSE_CASES = [
    ("name", HasK("name")),
    (" name", HasK("name")),
    (" name  \t", HasK("name")),
    ("∃name", HasK("name")),
    ("highway=motorway", KV("highway", "motorway")),
    ("highway≠motorway", KneV("highway", "motorway")),
    ("highway=motorway,primary", KinV("highway", ("motorway", "primary"))),
    ("~name:.*", HasReK("name:.*")),
    ("∃~name:.*", HasReK("name:.*")),
    ("∃~^name(:.+)?", HasReK("^name(:.+)?")),
    ("∄~name:.*", NotHasReK("name:.*")),
    ("∃highway∉motorway,motorway_link", HasKnotInV("highway", ("motorway", "motorway_link"))),
    ("∃(lrb)a", HasKLeftRightBoth("a")),
    ("∄(lrb)b", NotHasKLeftRightBoth("b")),
    ("w123", OSMObj(True, "w", 123)),
    ("r123", OSMObj(True, "r", 123)),
    ("!w3", OSMObj(False, "w", 3)),
    ("¬w3", OSMObj(False, "w", 3)),
    ("highway∈motorway,primary", KinV("highway", ("motorway", "primary"))),
    ("highway≠motorway,primary", KnotInV("highway", ("motorway", "primary"))),
    ("highway∉motorway,primary", KnotInV("highway", ("motorway", "primary"))),
    ("highway~motorway", KreV("highway", "motorway")),
    ("∄name", NotHasK("name")),
    ("name∨highway", Or((HasK("name"), HasK("highway")))),
    ("name∧highway", And((HasK("name"), HasK("highway")))),
]


@pytest.mark.parametrize("raw,expected", PARSE_CASES, ids=[c[0] for c in PARSE_CASES])
def test_parse(raw, expected):
    assert parse_tag_filter(raw) == expected


def test_parse_empty_errors():
    with pytest.raises(TagFilterParseError):
        parse_tag_filter("")


EVAL_CASES = [
    ("highway", {"highway": "primary"}, True),
    ("highway∈primary,seconary", {"highway": "primary"}, True),
    ("∃highway∉primary,seconary", {"highway": "primary"}, False),
    ("∃highway∉primary,seconary", {"amenity": "bar"}, False),
    ("highway∉primary,seconary", {"amenity": "bar"}, True),
    ("∃highway∉primary,seconary", {"highway": "motorway"}, True),
    ("∃(lrb)sidewalk", {}, False),
    ("∃(lrb)sidewalk", {"sidewalk": "yes"}, True),
    ("∃(lrb)sidewalk", {"sidewalk:both": "yes"}, True),
    ("∃(lrb)sidewalk", {"sidewalk:left": "yes"}, False),
    ("∃(lrb)sidewalk", {"sidewalk:left": "yes", "sidewalk:right": "yes"}, True),
    ("∄(lrb)sidewalk", {}, True),
    ("∄(lrb)sidewalk", {"sidewalk": "yes"}, False),
    ("∄(lrb)sidewalk", {"sidewalk:both": "yes"}, False),
    ("∄(lrb)sidewalk", {"sidewalk:left": "yes"}, True),
    ("∄(lrb)sidewalk", {"sidewalk:left": "yes", "sidewalk:right": "yes"}, False),
    ("highway≠motorway", {"highway": "primary"}, True),
    ("highway≠motorway", {"highway": "motorway"}, False),
    ("highway≠motorway", {}, True),
    ("name~^Sava$", {"name": "Sava"}, True),
    ("name~^Sava$", {"name": "Sava Dolinka"}, False),
    ("name~Sava", {"name": "The Sava River"}, True),
    ("waterway=canal∧lock=yes", {"waterway": "canal", "lock": "yes"}, True),
    ("waterway=canal∧lock=yes", {"waterway": "canal"}, False),
    ("waterway=river∨waterway=stream", {"waterway": "stream"}, True),
    ("waterway=river∨waterway=stream", {"waterway": "canal"}, False),
]


@pytest.mark.parametrize("raw,tags,expected", EVAL_CASES,
                         ids=[f"{c[0]}|{sorted(c[1])}" for c in EVAL_CASES])
def test_eval_row_and_vectorized(raw, tags, expected):
    tf = parse_tag_filter(raw)
    assert tf.matches(tags) is expected
    # vectorized path over a 3-row batch: [tags, {}, tags]
    view = DictTagView([tags, {}, tags])
    mask = tf.mask(view)
    assert mask.dtype == bool and len(mask) == 3
    assert bool(mask[0]) is expected and bool(mask[2]) is expected
    assert bool(mask[1]) is parse_tag_filter(raw).matches({})


def test_osmobj_filter():
    inc = parse_tag_filter("w123")
    exc = parse_tag_filter("¬w123")
    assert inc.matches({}, obj_type="w", obj_id=123) is True
    assert inc.matches({}, obj_type="w", obj_id=124) is False
    assert exc.matches({}, obj_type="w", obj_id=123) is False
    assert exc.matches({}, obj_type="w", obj_id=124) is True
    # non-int suffix falls through to HasK (reference parser behavior)
    assert parse_tag_filter("waterway") == HasK("waterway")


# ------------------------------------------------------------------ decision list
def test_tff_first_match_wins():
    tff = TagFilterFunc.parse("waterway=canal∧lock=yes→T;waterway=canal→F;waterway→T;F")
    assert tff.result({"waterway": "canal", "lock": "yes"}) is True
    assert tff.result({"waterway": "canal"}) is False
    assert tff.result({"waterway": "river"}) is True
    assert tff.result({"amenity": "bar"}) is False


def test_tff_comments_and_whitespace():
    tff = TagFilterFunc.parse("# This is a test comment\nwaterway=canal→F;waterway→T;F")
    assert tff.result({"waterway": "canal"}) is False
    assert tff.result({"waterway": "river"}) is True


def test_tff_literal_backslash_u_semicolon_is_not_an_escape():
    # src/tagfilter.rs:739-745 — the DSL has NO escape processing; `\u{3B}` stays literal
    tff = TagFilterFunc.parse(r"waterway=put_in\u{3B}egress→F;waterway→T;F")
    assert tff.result({"waterway": "canal"}) is True
    assert tff.result({"waterway": r"put_in\u{3B}egress"}) is False


def test_tff_incomplete_raises():
    # result() returns None (undecided); the raise happens at the combined gate,
    # like the reference's expect() in obj_pass_filters (src/tagfilter.rs:352-365)
    tff = TagFilterFunc.parse("waterway=canal→T")
    assert tff.result({"amenity": "bar"}) is None
    with pytest.raises(ValueError):
        obj_pass_filters({"amenity": "bar"}, [], tff)
    with pytest.raises(ValueError):
        tff.mask(DictTagView([{"amenity": "bar"}]))


def test_tff_include_file(tmp_path):
    inc = tmp_path / "common.txt"
    inc.write_text("waterway=canal→F;\n")
    main = tmp_path / "main.txt"
    main.write_text("include common.txt;\nwaterway→T;F")
    tff = TagFilterFunc.parse(f"@{main}")
    assert tff.result({"waterway": "canal"}) is False
    assert tff.result({"waterway": "river"}) is True


def test_tff_vectorized_mask():
    tff = TagFilterFunc.parse("waterway=canal∧lock=yes→T;waterway=canal→F;waterway→T;F")
    rows = [
        {"waterway": "canal", "lock": "yes"},
        {"waterway": "canal"},
        {"waterway": "river"},
        {"amenity": "bar"},
    ]
    np.testing.assert_array_equal(
        tff.mask(DictTagView(rows)), np.array([True, False, True, False])
    )


def test_obj_pass_filters_combined():
    fs = [parse_tag_filter("waterway"), parse_tag_filter("name")]
    assert obj_pass_filters({"waterway": "river", "name": "X"}, fs) is True
    assert obj_pass_filters({"waterway": "river"}, fs) is False
    assert obj_pass_filters({}, []) is True
    view = DictTagView([{"waterway": "river", "name": "X"}, {"waterway": "river"}])
    np.testing.assert_array_equal(filters_mask(view, fs), np.array([True, False]))


def test_column_tag_view():
    view = ColumnTagView(
        {"lang": np.array(["en", "de", None], dtype=object),
         "source": np.array(["web", None, "web"], dtype=object)},
        n=3,
    )
    np.testing.assert_array_equal(parse_tag_filter("lang=en").mask(view),
                                  np.array([True, False, False]))
    np.testing.assert_array_equal(parse_tag_filter("∃source").mask(view),
                                  np.array([True, False, True]))
    np.testing.assert_array_equal(parse_tag_filter("~^l").mask(view),
                                  np.array([True, True, False]))
