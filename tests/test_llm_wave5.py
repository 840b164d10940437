"""Wave-5 semantics beyond the oracle hash (decontamination, Gopher,
reservoir, source stats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _bucket_expr():
    return F.expr(
        "cast(conv(substring(md5(concat('contam:', cast(doc_id as string))), 1, 7),"
        " 16, 10) as bigint) % 100"
    )


def test_decontaminate_excludes_benchmark_docs(spark):
    out = all_specs()["q_text_decontaminate"].fn(spark, SF)
    rows = out.collect()
    assert rows, "decontamination must flag at least one doc at this sf"
    d = load(spark, SF, "documents").select("doc_id", _bucket_expr().alias("bucket"))
    bench_ids = {r["doc_id"] for r in d.where("bucket < 5").collect()}
    for r in rows:
        assert r["doc_id"] not in bench_ids, "benchmark split leaked into the corpus side"
        assert 0 < r["n_contaminated"] <= r["n_ngrams"]
        assert abs(r["contamination_frac"] - r["n_contaminated"] / r["n_ngrams"]) < 1e-12


def test_gopher_flags_recompute(spark):
    out = all_specs()["q_text_gopher_rules"].fn(spark, SF).collect()
    n_docs = load(spark, SF, "documents").count()
    assert len(out) == n_docs
    for r in out[:50]:
        assert r["pass_word_count"] == (50 <= r["n_words"] <= 100000)
        assert r["pass_stopwords"] == (r["stopword_count"] >= 2)
        assert r["gopher_pass"] == (
            r["pass_word_count"]
            and r["pass_mean_word_len"]
            and r["pass_stopwords"]
            and r["pass_symbols"]
        )
    # the gate must actually discriminate on this corpus
    verdicts = {r["gopher_pass"] for r in out}
    assert verdicts == {True, False}


def test_reservoir_is_deterministic_and_bounded(spark):
    fn = all_specs()["q_sample_reservoir"].fn
    a = sorted((r["lang"], r["doc_id"], r["rk"]) for r in fn(spark, SF).collect())
    b = sorted((r["lang"], r["doc_id"], r["rk"]) for r in fn(spark, SF).collect())
    assert a == b, "reservoir sample must be rerun-stable"
    per_lang: dict[str, int] = {}
    for lang, _, rk in a:
        per_lang[lang] = max(per_lang.get(lang, 0), rk)
    assert all(1 <= mx <= 10 for mx in per_lang.values())


def test_source_stats_partition_of_corpus(spark):
    out = all_specs()["q_doc_source_stats"].fn(spark, SF).collect()
    d = load(spark, SF, "documents")
    assert sum(r["n_docs"] for r in out) == d.count()
    for r in out:
        assert 0 <= r["n_exact_dups"] < r["n_docs"]
        assert abs(r["mean_chars"] - r["total_chars"] / r["n_docs"]) < 1e-9
