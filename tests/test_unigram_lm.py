"""Unigram-LM tokenizer training parity: the distributed trainer
(operators/unigram_lm.py) must reproduce a self-contained pure-Python
reference implementation of the same Viterbi-EM algorithm exactly —
seeding, EM counts, pruning, and final encoding."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.operators.unigram_lm import (
    build_word_vocab,
    seed_pieces,
    em_step,
    prune_pieces,
    tokenize,
    train_unigram,
)
from datanika_core_spark.session import read_table

SF = "/root/testdata/sf0.001"
MAXL = 8


# -- independent pure-Python reference --------------------------------------

def _ref_vocab(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                c[w] += 1
    return dict(c)


def _ref_seed(vocab, max_seed):
    counts = Counter()
    for w, n in vocab.items():
        subs = set()
        for i in range(len(w)):
            for L in range(1, min(MAXL, len(w) - i) + 1):
                subs.add(w[i:i + L])
        for s in subs:
            counts[s] += n
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, max_seed - len(singles))]
    table = dict(singles)
    table.update(dict(multis))
    total = sum(table.values())
    return {p: c / total for p, c in sorted(table.items())}


def _ref_viterbi(word, logp):
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for end in range(1, n + 1):
        for start in range(max(0, end - MAXL), end):
            lp = logp.get(word[start:end])
            if lp is None:
                continue
            cand = best[start] + lp
            if cand > best[end] or (cand == best[end] and start < back[end]):
                best[end] = cand
                back[end] = start
    if best[n] == -math.inf:
        return list(word)
    out, end = [], n
    while end > 0:
        out.append(word[back[end]:end])
        end = back[end]
    return out[::-1]


def _ref_em(vocab, probs):
    logp = {p: math.log(q) for p, q in probs.items() if q > 0.0}
    counts = Counter()
    for w, n in vocab.items():
        for piece in _ref_viterbi(w, logp):
            counts[piece] += n
    total = sum(counts.values())
    return {p: c / total for p, c in sorted(counts.items())}


def _ref_prune(probs, vocab_size):
    singles = {p: q for p, q in probs.items() if len(p) == 1}
    multis = sorted(
        ((p, q) for p, q in probs.items() if len(p) > 1),
        key=lambda pq: (-pq[1], pq[0]),
    )[: max(0, vocab_size - len(singles))]
    kept = dict(singles)
    kept.update(dict(multis))
    total = sum(kept.values())
    return {p: q / total for p, q in sorted(kept.items())}


@pytest.fixture(scope="module")
def docs(spark):
    return (
        read_table(spark, f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
        .cache()
    )


@pytest.fixture(scope="module")
def texts(docs):
    return [r.text for r in docs.select("text").collect()]


def test_seed_matches_reference(docs, texts):
    vocab = build_word_vocab(docs)
    got = seed_pieces(vocab, max_seed=400)
    want = _ref_seed(_ref_vocab(texts), 400)
    assert got.keys() == want.keys()
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=1e-15)


def test_em_and_prune_match_reference(docs, texts):
    vocab = build_word_vocab(docs).cache()
    rvocab = _ref_vocab(texts)
    probs = seed_pieces(vocab, max_seed=400)
    want = _ref_seed(rvocab, 400)
    for _ in range(2):
        probs = em_step(vocab, probs)
        want = _ref_em(rvocab, want)
        assert probs.keys() == want.keys()
        for p in want:
            assert probs[p] == pytest.approx(want[p], abs=1e-12)
    probs = prune_pieces(probs, 150)
    want = _ref_prune(want, 150)
    assert probs.keys() == want.keys()
    # final consistency pass over the pruned vocab
    probs = em_step(vocab, probs)
    want = _ref_em(rvocab, want)
    assert probs.keys() == want.keys()
    for p in want:
        assert probs[p] == pytest.approx(want[p], abs=1e-12)


def test_tokenize_roundtrip_and_multichar_pieces(docs):
    probs = train_unigram(docs, vocab_size=150, iters=2, max_seed=400)
    toks = tokenize(docs, probs)
    joined = toks.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "piece"))),
                lambda s: s["piece"],
            ),
        ).alias("glued")
    )
    orig = docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", "").alias("ref"),
    )
    bad = joined.join(orig, "doc_id").filter(
        F.col("glued") != F.col("ref")
    )
    assert bad.count() == 0, "tokenization must losslessly cover the text"
    # training must actually discover multi-character pieces and use them
    n_multi = toks.filter(F.length("piece") > 1).count()
    assert n_multi > 0
    assert any(len(p) > 1 for p in probs)
