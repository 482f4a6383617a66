"""Distributed BPE vs a pure-Python reference implementation —
the oracle for an iterative operator DuckDB's RE2 regex (no
lookahead) can't express in SQL."""

from __future__ import annotations

from collections import Counter

from datanika_core_spark.operators.bpe import build_vocab, learn_merges
from datanika_core_spark.session import read_table

SF = "/root/testdata/sf0.001"


def _python_bpe(texts: list[str], n_merges: int):
    """Textbook BPE (Sennrich et al. 2016, Algorithm 1): greedy
    left-to-right merges over a (word, count) vocabulary."""
    vocab = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                vocab[w] += 1
    symbols = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        pair_counts = Counter()
        for w, cnt in vocab.items():
            syms = symbols[w]
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += cnt
        if not pair_counts:
            break
        # same tiebreak as the operator: count desc, pair lexicographic
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        (a, b), cnt = best
        merges.append((rank, a, b, cnt))
        for w in symbols:
            syms = symbols[w]
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[w] = out
    return merges


def test_learned_merges_match_python_reference(spark):
    docs = read_table(spark, f"{SF}/documents.parquet")
    got = learn_merges(docs, n_merges=10)
    texts = [r.text for r in docs.select("text").collect()]
    want = _python_bpe(texts, n_merges=10)
    assert got == want
    assert len(got) == 10
    # merge counts are non-increasing only within equal-vocab states,
    # but every learned pair must have a positive weighted count
    assert all(cnt > 0 for (_, _, _, cnt) in got)


def test_vocab_symbols_roundtrip(spark):
    docs = read_table(spark, f"{SF}/documents.parquet")
    row = (
        build_vocab(docs)
        .orderBy("sym")
        .limit(1)
        .collect()[0]
    )
    # encoded form: leading/trailing separator, one char per symbol
    assert row.sym.startswith("\x1f") and row.sym.endswith("\x1f")
    inner = row.sym.strip("\x1f").split("\x1f")
    assert all(len(s) == 1 for s in inner)


def _python_apply(texts_by_id, merges):
    out = {}
    for doc_id, t in texts_by_id.items():
        toks = []
        for w in t.strip().lower().split():
            if not w:
                continue
            syms = list(w)
            for (_, a, b, _c) in merges:
                res, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            toks.extend(syms)
        out[doc_id] = toks
    return out


def test_apply_merges_matches_python_reference(spark):
    from datanika_core_spark.operators.bpe import apply_merges

    docs = read_table(spark, f"{SF}/documents.parquet").limit(50)
    merges = learn_merges(docs, n_merges=8)
    got = {
        r.doc_id: list(r.bpe_tokens)
        for r in apply_merges(docs, merges).collect()
    }
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    want = _python_apply(texts, merges)
    assert got == want
    # merges actually shorten the sequences
    n_chars = sum(len(w) for t in texts.values() for w in t.lower().split())
    n_toks = sum(len(v) for v in got.values())
    assert n_toks < n_chars
