"""DSIR importance weights vs a pure-Python reimplementation."""

import hashlib
import math
import re
from decimal import Decimal

from pyspark.sql import functions as F

from webgraph_spark.functions.curation import (
    dsir_gumbel_topk,
    dsir_log_weights,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", True),
    (1, "the quick brown fox naps under the old tree", True),
    (2, "spark shuffles partitions across the cluster nodes", False),
    (3, "spark broadcasts small tables to every executor", False),
    (4, "quick brown fox meets spark cluster", False),
    (5, "single", False),
    (6, "the lazy dog naps", True),
]
B = 64


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    toks = re.split(r"\s+", text.strip())
    if len(toks) < 2:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]


def _py_weights():
    ct, cs = {}, {}
    feats = {}
    for did, text, tgt in DOCS:
        bs = [_md5_long(g) % B for g in _grams(text)]
        feats[did] = bs
        for b in bs:
            (ct if tgt else cs)[b] = (ct if tgt else cs).get(b, 0) + 1
    big_ct, big_cs = sum(ct.values()), sum(cs.values())
    lr = {
        b: Decimal(
            f"{round(math.log((ct.get(b, 0) + 1) * (big_cs + B) / ((cs.get(b, 0) + 1) * (big_ct + B))), 9):.9f}"
        )
        for did in feats
        for b in feats[did]
    }
    out = {}
    for did, bs in feats.items():
        s = sum((lr[b] for b in bs), Decimal(0))
        out[did] = (len(bs), round(float(s), 6))
    return out


def test_dsir_weights_vs_python(spark):
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in DOCS], "doc_id long, text string"
    )
    tgt_ids = [d for d, _, t in DOCS if t]
    w = dsir_log_weights(
        docs, "doc_id", "text", F.col("doc_id").isin(tgt_ids),
        ngram=2, n_buckets=B,
    )
    got = {r["id"]: (r["n_grams"], r["logw"]) for r in w.collect()}
    assert got == _py_weights()
    # target-ish docs should outrank the spark-jargon docs
    assert got[0][1] > got[2][1] and got[1][1] > got[3][1]


def test_dsir_gumbel_topk_deterministic(spark):
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in DOCS], "doc_id long, text string"
    )
    tgt_ids = [d for d, _, t in DOCS if t]
    w = dsir_log_weights(
        docs, "doc_id", "text", F.col("doc_id").isin(tgt_ids),
        ngram=2, n_buckets=B,
    )
    a = [r["id"] for r in dsir_gumbel_topk(w, 3).collect()]
    b = [r["id"] for r in dsir_gumbel_topk(w, 3).collect()]
    assert a == b and len(a) == 3
    c = [r["id"] for r in dsir_gumbel_topk(w, 3, salt="other").collect()]
    assert len(c) == 3  # different salt still yields a valid sample
