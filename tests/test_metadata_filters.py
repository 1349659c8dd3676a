"""Metadata filter depth: range, bool, array membership, datetime strings,
LIKE, NULL checks, IN lists, and negation — the full where-DSL surface.

Mirrors the reference's indexed-metadata coverage
(reference: tests/standard_tests/test_metadata_indexes.py:5-37) and extends
it over this repo's complete predicate grammar (lynsedb_tpu/storage/filter.py).
"""

import numpy as np
import pytest


@pytest.fixture
def coll(db, rng):
    coll = db.require_collection("meta", dim=4, drop_if_exists=True)
    ids = list(range(100, 105))
    fields = [
        {
            "order": i,
            "score": i * 1.5,
            "active": i % 2 == 0,
            "tags": ["rust", "vector"] if i % 2 == 0 else ["python"],
            "created_at": f"2026-04-{i + 1:02d}",
            "name": f"item_{i}" if i < 3 else None,
        }
        for i in range(5)
    ]
    coll.add(ids, vectors=rng.normal(size=(5, 4)).astype(np.float32), fields=fields)
    coll.commit()
    return coll


def q(coll, where):
    return list(coll.query(where=where, return_ids_only=True))


def test_numeric_range(coll):
    assert q(coll, '"order" >= 2 AND "order" < 4') == [102, 103]


def test_float_comparison(coll):
    assert q(coll, '"score" > 4.0') == [103, 104]


def test_bool_equality(coll):
    assert q(coll, '"active" = true') == [100, 102, 104]
    assert q(coll, '"active" = false') == [101, 103]


def test_bool_does_not_match_numeric_one(coll):
    # bool literals must not alias ints: order=1 is not "true"
    assert 101 not in q(coll, '"order" = true')


def test_int_literal_matches_float_stored_value(coll):
    # numbers are one family: score=3.0 (stored float) matches "= 3"
    assert q(coll, '"score" = 3') == [102]


def test_array_contains(coll):
    assert q(coll, "\"tags\" CONTAINS 'rust'") == [100, 102, 104]


def test_array_not_contains(coll):
    assert q(coll, "\"tags\" NOT CONTAINS 'rust'") == [101, 103]


def test_datetime_string_range(coll):
    assert q(coll, "\"created_at\" >= '2026-04-03' AND \"created_at\" <= '2026-04-04'") == [102, 103]


def test_between_is_inclusive(coll):
    assert q(coll, "\"created_at\" BETWEEN '2026-04-02' AND '2026-04-03'") == [101, 102]


def test_like_prefix_pattern(coll):
    assert q(coll, "\"name\" LIKE 'item%'") == [100, 101, 102]


def test_like_single_char_wildcard(coll):
    assert q(coll, "\"name\" LIKE 'item__'") == [100, 101, 102]


def test_is_null_and_is_not_null(coll):
    assert q(coll, '"name" IS NULL') == [103, 104]
    assert q(coll, '"name" IS NOT NULL') == [100, 101, 102]


def test_missing_field_is_null(coll):
    # a field absent from every row: IS NULL matches all, IS NOT NULL none
    assert q(coll, '"ghost" IS NULL') == [100, 101, 102, 103, 104]
    assert q(coll, '"ghost" IS NOT NULL') == []


def test_in_list(coll):
    assert q(coll, '"order" IN (0, 4)') == [100, 104]


def test_not_in_list(coll):
    assert q(coll, '"order" NOT IN (0, 4)') == [101, 102, 103]


def test_negation_of_predicate(coll):
    assert q(coll, 'NOT "active" = true') == [101, 103]


def test_parenthesized_or_and_precedence(coll):
    got = q(coll, '("order" = 0 OR "order" = 4) AND "active" = true')
    assert got == [100, 104]


def test_string_equality_and_inequality(coll):
    assert q(coll, "\"name\" = 'item_1'") == [101]
    # != only matches rows where the field is present and different
    assert q(coll, "\"name\" != 'item_1'") == [100, 102]


def test_type_mismatch_matches_nothing(coll):
    # comparing a string field numerically matches no rows rather than erroring
    assert q(coll, '"name" > 7') == []


def test_filters_compose_with_search(coll, rng):
    res = coll.search(
        rng.normal(size=4).astype(np.float32), k=5, where="\"tags\" CONTAINS 'python'"
    )
    assert set(res.ids.tolist()) <= {101, 103}


def test_filters_compose_with_filter_ids(coll):
    got = list(coll.query(where='"active" = true', filter_ids=[100, 101, 102]).ids)
    assert got == [100, 102]


def test_documented_grammar_rejections_raise_filter_error():
    """The filter-grammar contract (docs/tutorials/metadata_filter_cookbook.md
    'Grammar contract'): SQL the reference accepts but this grammar rejects
    must fail loudly at parse time, never silently match nothing."""
    from lynsedb_tpu.storage.filter import FilterError, parse_where

    rejected = [
        "price * quantity > 100",     # arithmetic on fields
        "LENGTH(name) > 3",           # function call
        "a = b",                      # field-to-field comparison
        "x IN (SELECT id FROM t)",    # subquery
        "CASE WHEN a = 1 THEN 1 ELSE 0 END = 1",  # CASE expression
    ]
    for expr in rejected:
        with pytest.raises(FilterError):
            parse_where(expr)
