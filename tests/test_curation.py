"""Invariants of the curation queries (stratified sample, hash split,
sequence packing, curated corpus). Value-level correctness is covered by
the DuckDB oracle gate; these check the structural properties a pipeline
relies on."""

from pyspark.sql import functions as F

from vectordb_acc_and_speed_exp_spark.queries import load_all


def test_corpus_split_partitions_the_corpus(spark, sf_dir, documents):
    reg = load_all()
    out = reg["corpus_split"].fn(spark, sf_dir).collect()
    assert {r.split for r in out} <= {"train", "val", "test"}
    assert sum(r.n_docs for r in out) == documents.count()
    frac = sum(r.n_docs for r in out if r.split == "train") / documents.count()
    assert 0.6 < frac < 0.95  # ~0.8, hash-bucketed


def test_corpus_split_stable_under_append(spark, sf_dir, documents):
    """Membership is a pure function of doc_id: recomputing on a PREFIX of
    the corpus assigns every shared doc the same split."""
    from vectordb_acc_and_speed_exp_spark.queries.curation import _SEED
    from vectordb_acc_and_speed_exp_spark.functions.hashing import (
        portable_hash64_seeded,
    )

    bucket = (
        portable_hash64_seeded(F.col("doc_id").cast("string"), _SEED) % 100
    )
    full = documents.select("doc_id", bucket.alias("b"))
    prefix = documents.filter(F.col("doc_id") < 100).select(
        "doc_id", bucket.alias("b")
    )
    diff = full.join(prefix, "doc_id").filter(
        full["b"] != prefix["b"]
    )
    assert diff.count() == 0


def test_stratified_sample_k_per_stratum(spark, sf_dir):
    reg = load_all()
    out = reg["stratified_sample"].fn(spark, sf_dir)
    per = out.groupBy("lang").count().collect()
    assert all(r["count"] <= 20 for r in per)
    # deterministic: two runs identical
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, reg["stratified_sample"].fn(spark, sf_dir).collect()))
    assert a == b


def test_sequence_packing_conserves_tokens(spark, sf_dir, documents):
    from vectordb_acc_and_speed_exp_spark.functions.text import token_count

    reg = load_all()
    out = reg["sequence_packing"].fn(spark, sf_dir)
    packed = {
        r.source: r.tot
        for r in out.groupBy("source")
        .agg(F.sum("bin_tokens").alias("tot"))
        .collect()
    }
    truth = {
        r.source: r.tot
        for r in documents.groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).alias("tot"))
        .collect()
    }
    assert packed == truth
    # bins are contiguous from 0 per source
    for src in packed:
        bins = sorted(
            r.bin_id for r in out.filter(F.col("source") == src).collect()
        )
        assert bins == list(range(len(bins)))


def test_curated_corpus_never_exceeds_quality_counts(spark, sf_dir):
    reg = load_all()
    curated = {
        r.lang: r.n_docs for r in reg["curated_corpus"].fn(spark, sf_dir).collect()
    }
    quality = {
        r.lang: r.cnt
        for r in reg["text_quality"].fn(spark, sf_dir)
        .filter(F.col("is_quality") == 1)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert curated
    for lang, n in curated.items():
        assert n <= quality[lang]


def test_corpus_version_diff_statuses(spark, sf_dir):
    """All three statuses occur and each id classifies correctly:
    %41==0 & %43!=0 -> added; %43==0 & %41!=0 -> removed;
    %37==0 surviving in both -> changed."""
    from vectordb_acc_and_speed_exp_spark.queries.curation import (
        corpus_version_diff,
    )

    rows = {r.doc_id: r.status for r in corpus_version_diff(spark, sf_dir).collect()}
    assert set(rows.values()) == {"added", "removed", "changed"}
    for doc_id, status in rows.items():
        in_v1 = doc_id % 41 != 0
        in_v2 = doc_id % 43 != 0
        if not in_v1:
            assert status == "added" and in_v2
        elif not in_v2:
            assert status == "removed"
        else:
            assert status == "changed" and doc_id % 37 == 0


def test_training_manifest_exports_to_jsonl_shards(spark, sf_dir, tmp_path):
    """The capstone composition a pipeline actually ships: the cleaned
    training manifest written to record-bounded JSONL shards and read
    back intact — the export handoff to a tokenizer/training job."""
    from vectordb_acc_and_speed_exp_spark.queries import load_all
    from vectordb_acc_and_speed_exp_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    manifest = load_all()["training_manifest"].fn(spark, sf_dir)
    out = str(tmp_path / "train_shards")
    write_jsonl(manifest.repartition(1), out, max_records_per_file=40)

    import glob

    shards = glob.glob(out + "/*.json*")
    assert len(shards) >= 2, "record bound should force multiple shards"

    back = read_jsonl(spark, out, schema=manifest.schema)
    got = sorted(map(tuple, back.select(*manifest.columns).collect()))
    want = sorted(map(tuple, manifest.collect()))
    assert got == want and len(want) > 0
