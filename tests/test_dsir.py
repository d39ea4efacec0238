"""DSIR importance resampling (llm/dsir.py) — weight math vs a pure-
Python reference, determinism/invariance, Gumbel-top-k selection, and
the curate_corpus stage wiring."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from my_weather_spark.llm import dsir
from my_weather_spark.llm.pipeline import curate_corpus

DIM = 64
ALPHA = 0.5

ROWS = [
    (0, "spark shuffle join broadcast plan spark join", "web"),
    (1, "gardening soil tomato compost watering sunlight", "web"),
    (2, "spark plan join shuffle spark broadcast exchange", "web"),
    (3, "soil mulch pruning compost tomato seeds water", "web"),
    (4, "spark join gardening shuffle soil plan compost", "web"),
    (5, "", "web"),
]


def _mkdocs(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


# ---------------------------------------------------------------- reference
def _bucket(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % DIM


def _feats(text: str) -> list[int]:
    ws = [w for w in re.split(r"\s+", text or "") if w]
    uni = [_bucket(w) for w in ws]
    bi = [_bucket(f"{a} {b}") for a, b in zip(ws, ws[1:])]
    return uni + bi


def _ref_weights(rows, target_ids):
    raw_c: dict[int, int] = {}
    tgt_c: dict[int, int] = {}
    per_doc = {}
    for doc_id, text, _ in rows:
        fs = _feats(text)
        per_doc[doc_id] = fs
        for b in fs:
            raw_c[b] = raw_c.get(b, 0) + 1
            if doc_id in target_ids:
                tgt_c[b] = tgt_c.get(b, 0) + 1
    rt, tt = sum(raw_c.values()), sum(tgt_c.values())

    def lr(b):
        return math.log((tgt_c.get(b, 0) + ALPHA) / (tt + ALPHA * DIM)) - math.log(
            (raw_c.get(b, 0) + ALPHA) / (rt + ALPHA * DIM)
        )

    out = {}
    for doc_id, fs in per_doc.items():
        s = 0.0
        for b in fs:  # document order, like the Spark in-row aggregate
            s += lr(b)
        out[doc_id] = (len(fs), s)
    return out


def _ticket(seed: str, doc_id: int) -> int:
    h = hashlib.md5(f"{seed}{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % 1_000_000


def _gumbel(seed: str, doc_id: int) -> float:
    u = (_ticket(seed, doc_id) + 0.5) / 1_000_000.0
    return -math.log(-math.log(u))


# ------------------------------------------------------------------- tests
def test_weights_match_pure_python_reference(spark):
    docs = _mkdocs(spark)
    target_ids = {0, 2}  # the sparky docs
    target = docs.where(F.col("doc_id").isin(*target_ids))
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir.importance_weights(docs, target, dim=DIM, alpha=ALPHA).collect()
    }
    ref = _ref_weights(ROWS, target_ids)
    assert set(got) == set(ref)
    for doc_id, (n, s) in ref.items():
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(round(s, 6), abs=1e-9)
    # direction: in-target-domain docs must outweigh off-domain docs
    assert got[0][1] > got[1][1]
    assert got[2][1] > got[3][1]
    # featureless doc: zero features, weight exactly 0.0
    assert got[5] == (0, 0.0)


def test_predicate_target_equals_dataframe_target(spark):
    # the single-scan (Column-predicate) model must produce bit-equal
    # weights to the two-scan (DataFrame) model when the target is the
    # same slice of the corpus
    docs = _mkdocs(spark)
    pred = F.col("doc_id").isin(0, 2)
    via_df = sorted(
        dsir.importance_weights(docs, docs.where(pred), dim=DIM).collect(),
        key=lambda r: r["doc_id"],
    )
    via_pred = sorted(
        dsir.importance_weights(docs, pred, dim=DIM).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in via_df] == [tuple(r) for r in via_pred]
    # loudness survives the predicate path too
    with pytest.raises(Exception, match="dsir: target corpus has no features"):
        dsir.importance_weights(docs, F.lit(False), dim=DIM).collect()


def test_weights_repartition_invariant(spark):
    docs = _mkdocs(spark)
    target = docs.where(F.col("doc_id").isin(0, 2))
    a = sorted(
        dsir.importance_weights(docs, target, dim=DIM).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        dsir.importance_weights(docs.repartition(7), target, dim=DIM).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_selection_keys_match_reference_gumbel(spark):
    docs = _mkdocs(spark)
    target = docs.where(F.col("doc_id").isin(0, 2))
    keys = {
        r["doc_id"]: r["sel_key"]
        for r in dsir.selection_keys(
            docs, target, seed="tseed", dim=DIM, alpha=ALPHA
        ).collect()
    }
    ref = _ref_weights(ROWS, {0, 2})
    for doc_id, (_, s) in ref.items():
        expect = round(round(s, 6) + _gumbel("tseed", doc_id), 6)
        assert keys[doc_id] == pytest.approx(expect, abs=1e-9)


def test_resample_is_top_k_by_key(spark):
    docs = _mkdocs(spark)
    target = docs.where(F.col("doc_id").isin(0, 2))
    keys = dsir.selection_keys(docs, target, seed="s1", dim=DIM).collect()
    order = sorted(keys, key=lambda r: (-r["sel_key"], r["doc_id"]))
    top3 = {r["doc_id"] for r in order[:3]}
    got = dsir.resample(docs, target, k=3, seed="s1", dim=DIM)
    assert {r["doc_id"] for r in got.collect()} == top3
    assert got.columns == docs.columns  # original columns survive
    # k >= N keeps everything
    assert dsir.resample(docs, target, k=100, dim=DIM).count() == len(ROWS)
    with pytest.raises(ValueError):
        dsir.resample(docs, target, k=0, dim=DIM)


def test_seed_changes_selection(spark, sf_dir):
    from my_weather_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    a = {r["doc_id"] for r in dsir.resample(docs, target, k=100, seed="a").select("doc_id").collect()}
    b = {r["doc_id"] for r in dsir.resample(docs, target, k=100, seed="b").select("doc_id").collect()}
    assert a != b  # Gumbel noise is seed-dependent
    assert len(a) == len(b) == 100


def test_empty_target_raises_loudly(spark):
    docs = _mkdocs(spark)
    target = docs.where(F.lit(False))
    with pytest.raises(Exception, match="dsir: target corpus has no features"):
        dsir.importance_weights(docs, target, dim=DIM).collect()
    # whitespace-only target has rows but no features — same failure
    wsonly = spark.createDataFrame(
        [(9, "   ", "web")], "doc_id long, text string, source string"
    )
    with pytest.raises(Exception, match="dsir: target corpus has no features"):
        dsir.importance_weights(docs, wsonly, dim=DIM).collect()


def test_curate_corpus_dsir_stage(spark):
    docs = _mkdocs(spark, ROWS[:5])  # drop the empty doc (min_words gate)
    target = docs.where(F.col("doc_id").isin(0, 2))
    out, rep = curate_corpus(
        docs, dsir_target=target, dsir_k=2, dsir_dim=DIM,
        split_weights=(1.0,), min_words=3,
    )
    assert rep.n_after_dsir == 2
    kept = {r["doc_id"] for r in out.collect()}
    assert len(kept) == 2 and kept <= {0, 1, 2, 3, 4}
    with pytest.raises(ValueError):
        curate_corpus(docs, dsir_k=2, split_weights=(1.0,), min_words=3)
