"""Deterministic byte-pair-encoding tokenizer (public-knowledge BPE,
Sennrich et al. 2016) trained on the built-in fixture corpus.

Training is the classic loop: count adjacent symbol pairs over the
word-frequency table, merge the most frequent pair (ties broken
lexicographically so the merge list is reproducible anywhere), repeat.

Inference is expressed as PLAIN STRING REPLACEMENT so a SQL oracle can
replay it exactly: a word is rendered with every symbol wrapped in
delimiters (``§a§§b§§c§`` for "abc"), and merge ``(a, b)`` is
``replace("§a§§b§", "§ab§")``.  Because each symbol carries its OWN
delimiters, a replacement cannot span a symbol boundary or steal a
neighbor's delimiter, and left-to-right non-overlapping ``replace``
semantics (identical in Python and DuckDB) reproduce the canonical BPE
merge scan.  Token count = (#'§' in the final string) / 2.

No external vocab, no RNG — the merge list is a pure function of the
fixture corpus.
"""

from __future__ import annotations

from collections import Counter
from functools import lru_cache

DELIM = "§"


def train_bpe(texts: list[str], num_merges: int = 30) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from whitespace-split lowercased
    words.  Deterministic: ties on pair frequency break to the
    lexicographically smallest pair."""
    wc: Counter = Counter(
        w.replace(DELIM, "")
        for t in texts
        for w in t.lower().split(" ")
        if w
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in wc.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        a, b = best
        new_vocab: dict[tuple[str, ...], int] = {}
        for toks, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def _word_tokens(word: str, merges: tuple[tuple[str, str], ...]) -> int:
    s = "".join(f"{DELIM}{ch}{DELIM}" for ch in word)
    for a, b in merges:
        s = s.replace(f"{DELIM}{a}{DELIM}{DELIM}{b}{DELIM}", f"{DELIM}{a}{b}{DELIM}")
    return s.count(DELIM) // 2


# Two-level cache: the OUTER level maps a merges tuple to a per-word
# cached counter (hashing the merge table once per distinct table, not
# once per word lookup — a production-scale table is 10^4+ pairs, and
# tuples don't memoize their hash, so keying one flat cache on
# (word, merges) would pay an O(|merges|) hash/compare on every hit).
# The INNER per-word cache is what amortizes Zipf-repeated words across
# EVERY document an executor worker processes.
@lru_cache(maxsize=8)
def _word_counter_for(merges: tuple[tuple[str, str], ...]):
    @lru_cache(maxsize=65536)
    def count(word: str) -> int:
        return _word_tokens(word, merges)

    return count


def bpe_token_count(text: str, merges: list[tuple[str, str]]) -> int:
    """BPE token count of a document: sum over whitespace-split
    lowercased words (DELIM chars stripped from input first)."""
    count = _word_counter_for(tuple(merges))
    return sum(
        count(w)
        for w in text.lower().replace(DELIM, "").split(" ")
        if w
    )


def fixture_merges(num_merges: int = 30) -> list[tuple[str, str]]:
    """The repo's pinned merge list: trained on the crawl fixture
    corpus' extracted text (deterministic, no external data)."""
    from crawlspark.fixtures import fixture_pages_rows

    texts = [r["text"] for r in fixture_pages_rows() if r.get("text")]
    return train_bpe(texts, num_merges)


def merge_replace_sql(expr: str, merges: list[tuple[str, str]]) -> str:
    """Nest DuckDB ``replace`` calls replaying the merge list over a SQL
    expression that yields the delimiter-wrapped form of a word."""
    s = expr
    for a, b in merges:
        pat = f"{DELIM}{a}{DELIM}{DELIM}{b}{DELIM}"
        rep = f"{DELIM}{a}{b}{DELIM}"
        s = f"replace({s}, '{pat}', '{rep}')"
    return s
