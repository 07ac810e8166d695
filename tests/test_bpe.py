"""BPE tokenizer training parity vs an independent pure-Python
reference implementation (greedy left-to-right merge, same argmax
tiebreak), plus edge cases: merge chains on symbol runs, punctuation
symbols, empty documents, early stop, and U+001F scrubbing."""

from __future__ import annotations

import collections
import re

import pytest

from webgraph_spark.functions.bpe import (
    bpe_token_counts,
    bpe_train,
    rules_df,
)

TOK = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def py_bpe(texts, n_merges):
    """Independent reference: dict-of-lists Sennrich BPE with greedy
    left-to-right application and (count DESC, a ASC, b ASC) argmax."""
    wc = collections.Counter(
        w for t in texts for w in TOK.findall((t or "").replace("\x1f", ""))
    )
    vocab = {w: list(w) for w in wc}
    rules = []
    for rank in range(1, n_merges + 1):
        pc = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        rules.append((rank, a, b, cnt))
        for w, syms in vocab.items():
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return rules, vocab, wc


def py_token_counts(texts, vocab):
    out = {}
    for i, t in enumerate(texts):
        ws = TOK.findall((t or "").replace("\x1f", ""))
        out[i] = (len(ws), sum(len(vocab[w]) for w in ws))
    return out


CORPUS = [
    "the cat sat on the mat, the cat!",
    "a banana bandana",
    "aaaa aaa aa a",  # symbol runs: greedy chain semantics
    "hello hello world",
    "cats cats cats",
    "",  # empty doc
    "sep\x1fchar is scrubbed",  # U+001F must not become a symbol
    "1234 12 123, punct... !!",
]


def _train(spark, texts, n):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return sdf, bpe_train(sdf, "text", n)


def test_bpe_rules_match_reference(spark):
    rules, _, _ = py_bpe(CORPUS, 10)
    _, res = _train(spark, CORPUS, 10)
    assert res.rules == rules
    rdf = rules_df(spark, res)
    assert [tuple(r) for r in rdf.orderBy("rank").collect()] == rules


def test_bpe_token_counts_match_reference(spark):
    _, vocab, _ = py_bpe(CORPUS, 10)
    sdf, res = _train(spark, CORPUS, 10)
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_token_counts(sdf, "doc_id", "text", res).collect()
    }
    assert got == py_token_counts(CORPUS, vocab)


def test_bpe_vocab_symbols_match_reference(spark):
    _, vocab, wc = py_bpe(CORPUS, 6)
    _, res = _train(spark, CORPUS, 6)
    got = {r["word"]: (list(r["syms"]), r["cnt"]) for r in res.vocab.collect()}
    assert got == {w: (vocab[w], wc[w]) for w in vocab}


def test_bpe_early_stop_single_chars(spark):
    # corpus of isolated single characters: no adjacent pairs at all
    texts = ["a b c", "d e"]
    _, res = _train(spark, texts, 5)
    assert res.rules == [] and res.n_merges == 0


def test_bpe_run_chain_greedy(spark):
    # "aaaa" must become [aa, aa] after merge (a, a) — the fold must
    # not let the merged symbol re-match the rule within one pass
    texts = ["aaaa aaaa"]
    _, res = _train(spark, texts, 1)
    assert res.rules[0][1:3] == ("a", "a")
    syms = res.vocab.collect()[0]["syms"]
    assert list(syms) == ["aa", "aa"]


def test_bpe_checkpoint_boundary(spark):
    # checkpoint_every=2 exercises the localCheckpoint path mid-loop
    rules, _, _ = py_bpe(CORPUS, 4)
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    res = bpe_train(sdf, "text", 4, checkpoint_every=2)
    assert res.rules == rules
