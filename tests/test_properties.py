"""Property-based robustness: the functions that eat raw web input must be
total (never raise) and canonicalization must be idempotent."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from obp_search_engine_spark.functions.extract import extract_links, extract_text
from obp_search_engine_spark.functions.robots import disallowed, parse_robots
from obp_search_engine_spark.functions.tokenize import process_text
from obp_search_engine_spark.functions.urls import canonicalize_url


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_canonicalize_total_and_idempotent(s):
    c = canonicalize_url(s)
    if c is not None:
        assert canonicalize_url(c) == c  # idempotence
        assert "#" not in c
        assert "://" in c


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=500))
def test_extractors_total_on_garbage_bytes(b):
    links = extract_links(b)
    assert isinstance(links, list)
    t = extract_text(b)
    assert t is None or isinstance(t, str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_robots_parser_total(s):
    rules = parse_robots(s)
    assert isinstance(rules, str)
    assert isinstance(disallowed("/any/path", rules), bool)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_process_text_total(s):
    toks = process_text(s)
    assert all(" " not in t and t for t in toks)
