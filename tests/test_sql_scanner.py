"""Unit tests for `_depth0_marks`, the ONE shared paren-depth walk
behind catalog.py's SQL-console scanners (round-10 advice: the router,
the WHERE finder, `_has_top_level_or`, `_top_level_keyword`, and the
clause-end scans each re-implemented the same inline walk — every new
verb grew the soundness surface; now they all route through the shared
scanner, and these tests pin ITS contract directly)."""
from __future__ import annotations

from f1_data_pipeline_spark.operators.catalog import (
    _depth0_marks,
    _has_top_level_or,
    _strip_sql_strings,
    _top_level_keyword,
)


def _marks(sql: str, pattern: str, **kw):
    return _depth0_marks(_strip_sql_strings(sql), pattern, **kw)


def test_depth0_only_reports_outside_parens():
    s = "a AND (b OR c) AND d"
    got = _marks(s, r"\b\w+\b")
    assert [t for _, t in got] == ["a", "and", "and", "d"]
    # offsets point at the original text
    for pos, tok in got:
        assert s[pos:pos + len(tok)].lower() == tok


def test_nested_parens_track_depth():
    assert _marks("((x)) y (z (w))", r"\b\w+\b") == [(6, "y")]


def test_string_literals_never_match():
    # 'WHERE' inside a literal is blanked by _strip_sql_strings first
    got = _marks("SELECT 'where or (' FROM t", r"\b(where|or|from)\b")
    assert [t for _, t in got] == ["from"]


def test_depth_tokens_never_reported_even_when_pattern_matches_them():
    # a pattern that would match parens/case/end still only yields words
    got = _marks("case when a then b end", r"\b\w+\b", case_end=True)
    assert [t for _, t in got] == []  # whole span sits inside CASE..END
    got2 = _marks("x case when a then b end y", r"\b\w+\b", case_end=True)
    assert [t for _, t in got2] == ["x", "y"]


def test_case_end_spans_count_as_nesting_only_when_asked():
    s = "WHEN CASE WHEN a THEN b END = 1 WHEN c"
    with_case = _marks(s, r"\bwhen\b", case_end=True)
    assert [p for p, _ in with_case] == [0, len(s) - len("WHEN c")]
    without = _marks(s, r"\bwhen\b")
    assert len(without) == 3  # flat scan sees the CASE's WHEN too


def test_unbalanced_close_paren_suppresses_tail():
    # conservative: tokens after an unmatched ')' sit at negative depth
    # and are not reported (the callers' refusal direction)
    assert _marks("a ) b", r"\b\w+\b") == [(0, "a")]


def test_has_top_level_or():
    assert _has_top_level_or("a = 1 OR b = 2")
    assert not _has_top_level_or("(a = 1 OR b = 2) AND c = 3")
    assert not _has_top_level_or("note = 'x or y' AND c = 3")
    assert not _has_top_level_or("orbit = 1 AND corridor = 2")  # words


def test_top_level_keyword_skips_case_spans_and_respects_start():
    s = "SET v = CASE WHEN a THEN 1 ELSE 2 END WHEN MATCHED x WHEN y"
    first = _top_level_keyword(s, "when")
    assert s[first:first + 12] == "WHEN MATCHED"
    second = _top_level_keyword(s, "when", start=first + 1)
    assert s[second:] == "WHEN y"
    assert _top_level_keyword(s, "absent") == -1
