"""Deterministic BPE: training reproducibility, canonical merge-scan
equivalence of the replace-based inference, and corpus behavior."""

from crawlspark.functions.bpe import (
    bpe_token_count,
    fixture_merges,
    train_bpe,
)


def test_training_deterministic():
    corpus = ["the cat sat on the mat", "the cat ate the rat"]
    assert train_bpe(corpus, 10) == train_bpe(corpus, 10)
    m = train_bpe(corpus, 5)
    assert ("t", "h") in m or ("h", "e") in m or ("a", "t") in m


def test_replace_inference_matches_canonical_scan():
    corpus = ["aaa aab abab banana bandana"]
    merges = train_bpe(corpus, 8)

    def canonical(word):
        toks = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return len(toks)

    for w in ["aaa", "aab", "abab", "banana", "bandana", "ban", "a", ""]:
        expect = canonical(w) if w else 0
        assert bpe_token_count(w, merges) == expect, w


def test_bpe_compresses_fixture_corpus():
    merges = fixture_merges()
    assert len(merges) == 30
    text = "links to page1.html and page2.html"
    n_bpe = bpe_token_count(text, merges)
    n_chars = len(text.replace(" ", ""))
    assert 0 < n_bpe < n_chars  # real subword compression
