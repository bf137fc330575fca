"""Polymorphic seed coercion (urlcontext.go:139-219): every accepted
shape, and TypeError where the reference panics
(PanicIfInvalidSeedType, tbldef_test.go:1031-1040)."""

import pytest

from crawlspark.sources.seeds import to_seed_rows


def test_accepted_shapes():
    assert to_seed_rows("http://a/1") == [("http://a/1", None)]
    assert to_seed_rows(["http://a/1", "http://a/2"]) == [
        ("http://a/1", None),
        ("http://a/2", None),
    ]
    assert to_seed_rows({"http://a/1": 2}) == [("http://a/1", "2")]
    assert to_seed_rows({"http://a/1": "s"}) == [("http://a/1", "s")]
    assert to_seed_rows([("http://a/1", {"k": 1})]) == [
        ("http://a/1", '{"k": 1}')
    ]
    assert to_seed_rows(None) == []


def test_invalid_seed_type_raises():
    # the reference panics on e.g. an int seed (tbldef_test.go:1031-1040)
    with pytest.raises(TypeError):
        to_seed_rows(212)
    with pytest.raises(TypeError):
        to_seed_rows([212])
