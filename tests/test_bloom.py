"""Bloom prefilter: exactness (composed results == plain semi/anti join
for any hash), the no-false-negative invariant, fpp bound, and plan/
broadcast path agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.bloom import (
    bloom_semi_join,
    build_bloom,
    decontaminate,
    might_contain,
)


def _members(spark, n=500):
    return spark.range(n).select(F.concat(F.lit("key-"), F.col("id")).alias("v"))


def _probe(spark, n=3000):
    return spark.range(n).select(F.concat(F.lit("key-"), F.col("id")).alias("v"))


def test_no_false_negatives_and_fpp(spark):
    members = _members(spark)
    bloom = build_bloom(members, "v", fpp=0.01)
    probe = _probe(spark)
    for mode in ("plan", "broadcast"):
        got = set(
            r["v"] for r in probe.where(might_contain(F.col("v"), bloom, mode=mode)).collect()
        )
        truth = set(r["v"] for r in members.collect())
        assert truth <= got, "bloom dropped a real member"
        fp = len(got - truth) / (probe.count() - len(truth))
        assert fp < 0.05, f"false-positive rate {fp} way past fpp=0.01"


def test_modes_agree(spark):
    members = _members(spark, 200)
    bloom = build_bloom(members, "v", fpp=0.02)
    probe = _probe(spark, 1000)
    a = sorted(r["v"] for r in probe.where(might_contain(F.col("v"), bloom, mode="plan")).collect())
    b = sorted(
        r["v"] for r in probe.where(might_contain(F.col("v"), bloom, mode="broadcast")).collect()
    )
    assert a == b, "plan-literal and broadcast-numpy bit tests disagree"


def test_semi_anti_exact(spark):
    members = _members(spark, 400)
    probe = _probe(spark, 2000)
    semi = sorted(r["v"] for r in bloom_semi_join(probe, members, "v").collect())
    anti = sorted(r["v"] for r in bloom_semi_join(probe, members, "v", anti=True).collect())
    want_semi = sorted(r["v"] for r in probe.join(members, "v", "left_semi").collect())
    want_anti = sorted(r["v"] for r in probe.join(members, "v", "left_anti").collect())
    assert semi == want_semi
    assert anti == want_anti
    assert len(semi) + len(anti) == 2000


def test_decontaminate_equals_exact_join(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where("source <> 'src0'")
    eval_df = docs.where("source = 'src0'")
    got = sorted(r["doc_id"] for r in decontaminate(corpus, eval_df, n=3).collect())

    # oracle: the same semantics as one exact gram anti-join, no bloom
    from aws_sdk_pandas_spark.operators.bloom import _word_ngrams

    grams = _word_ngrams(F.col("text"), 3)
    ev = eval_df.select(F.explode(grams).alias("g")).distinct()
    bad = (
        corpus.select("doc_id", F.explode(grams).alias("g"))
        .join(ev, "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    want = sorted(r["doc_id"] for r in corpus.join(bad, "doc_id", "left_anti").collect())
    assert got == want
    assert 0 < len(got) < corpus.count()  # non-trivial at every sf


def test_decontaminate_flag_mode(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where("source <> 'src0'")
    eval_df = docs.where("source = 'src0'")
    flagged = decontaminate(corpus, eval_df, n=3, flag=True)
    assert flagged.count() == corpus.count()
    n_clean = flagged.where(~F.col("contaminated")).count()
    assert n_clean == decontaminate(corpus, eval_df, n=3).count()


def test_save_load_roundtrip(spark, tmp_path):
    from aws_sdk_pandas_spark.operators.bloom import load_bloom, save_bloom

    members = _members(spark, 300)
    bloom = build_bloom(members, "v", fpp=0.01)
    p = str(tmp_path / "bloom")
    save_bloom(bloom, p)
    loaded = load_bloom(spark, p)
    assert (loaded.m_bits, loaded.k, loaded.n_items) == (bloom.m_bits, bloom.k, bloom.n_items)
    assert loaded.words == bloom.words
    probe = _probe(spark, 1500)
    a = sorted(r["v"] for r in probe.where(might_contain(F.col("v"), bloom)).collect())
    b = sorted(r["v"] for r in probe.where(might_contain(F.col("v"), loaded)).collect())
    assert a == b
