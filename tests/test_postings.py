"""Postings artifact: the materialized inverted index must be a drop-in,
bit-identical replacement for the inline tokenize path, with pruned scans.

The equivalence proof here is the same discipline as upsert==rebuild for
the ANN code tables: collect both paths fully and compare exact values —
not approximate, not rounded."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def index_path(spark, documents, tmp_path_factory) -> str:
    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        write_postings_index,
    )

    path = str(tmp_path_factory.mktemp("lexidx") / "postings_index")
    write_postings_index(documents, path)
    return path


@pytest.fixture(scope="module")
def queries_frame(spark):
    rows = [
        (0, "spark"), (0, "join"), (0, "window"),
        (1, "fast"), (1, "scan"), (1, "dup"),
        (2, "neverappearsanywhere"),  # zero-postings term: contributes nothing
    ]
    return spark.createDataFrame(rows, "query_id long, term string")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_indexed_scores_equal_inline(spark, documents, index_path, queries_frame):
    from vectordb_acc_and_speed_exp_spark.operators.bm25 import (
        bm25_scores,
        bm25_scores_indexed,
    )

    inline = bm25_scores(documents, queries_frame)
    indexed = bm25_scores_indexed(spark, index_path, queries_frame)
    assert _sorted_rows(inline) == _sorted_rows(indexed)


def test_indexed_weighted_scores_equal_inline(
    spark, documents, index_path, queries_frame
):
    from vectordb_acc_and_speed_exp_spark.operators.bm25 import (
        bm25_scores,
        bm25_scores_indexed,
    )

    q = queries_frame.withColumn(
        "w6",
        F.when(F.col("term") == "join", F.lit(500_000))
        .otherwise(F.lit(1_000_000))
        .cast("bigint"),
    )
    inline = bm25_scores(documents, q, weight_col="w6")
    indexed = bm25_scores_indexed(spark, index_path, q, weight_col="w6")
    assert _sorted_rows(inline) == _sorted_rows(indexed)


def test_filtered_indexed_scores_equal_inline(
    spark, documents, index_path, queries_frame
):
    """Metadata-filtered BM25 from the artifact (survivor semi-join +
    eligible-set stats) must equal tokenizing the FILTERED corpus inline —
    the round-7 facade fallback this path replaces (VERDICT r07 #2).
    df/n_docs/avgdl all change under the filter, so this exercises the
    full recompute, not just row filtering."""
    from vectordb_acc_and_speed_exp_spark.operators.bm25 import (
        bm25_scores,
        bm25_scores_indexed_filtered,
        bm25_topk,
        bm25_topk_indexed_filtered,
    )

    pred = F.col("doc_id") % 3 != 0
    survivors = documents.filter(pred).select("doc_id")
    inline = bm25_scores(documents.filter(pred), queries_frame)
    indexed = bm25_scores_indexed_filtered(
        spark, index_path, queries_frame, survivors
    )
    assert _sorted_rows(inline) == _sorted_rows(indexed)
    assert _sorted_rows(
        bm25_topk(documents.filter(pred), queries_frame, k=5)
    ) == _sorted_rows(
        bm25_topk_indexed_filtered(spark, index_path, queries_frame, survivors, k=5)
    )


def test_filtered_indexed_weighted_scores_equal_inline(
    spark, documents, index_path, queries_frame
):
    """The RM3 weighted-term hook composes with the filtered path."""
    from vectordb_acc_and_speed_exp_spark.operators.bm25 import (
        bm25_scores,
        bm25_scores_indexed_filtered,
    )

    q = queries_frame.withColumn(
        "w6",
        F.when(F.col("term") == "join", F.lit(500_000))
        .otherwise(F.lit(1_000_000))
        .cast("bigint"),
    )
    pred = F.col("doc_id") % 2 == 0
    survivors = documents.filter(pred).select("doc_id")
    inline = bm25_scores(documents.filter(pred), q, weight_col="w6")
    indexed = bm25_scores_indexed_filtered(
        spark, index_path, q, survivors, weight_col="w6"
    )
    assert _sorted_rows(inline) == _sorted_rows(indexed)


def test_filtered_stats_plan_reads_doclens_not_text(
    spark, documents, index_path, queries_frame
):
    """The filtered serve plan must contain NO tokenize of corpus text —
    no Generate/explode node anywhere — and must read the O(docs) doclens
    layout for the eligible-set stats."""
    from vectordb_acc_and_speed_exp_spark.operators.bm25 import (
        bm25_topk_indexed_filtered,
    )

    survivors = documents.filter(F.col("doc_id") % 3 != 0).select("doc_id")
    df = bm25_topk_indexed_filtered(
        spark, index_path, queries_frame, survivors, k=5
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "explode" not in plan.lower()
    assert "doclens" in plan


def test_doclens_heals_for_pre_doclens_artifact(spark, documents, tmp_path):
    """An artifact built before the doclens layout existed self-heals on
    first filtered call: the layout derives from the forward index (a pure
    function of it), after which filtered stats equal the inline rollup."""
    import os
    import shutil

    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        filtered_corpus_stats,
        tokenize,
        write_postings_index,
    )

    path = str(tmp_path / "oldidx")
    write_postings_index(documents.limit(40), path)
    shutil.rmtree(os.path.join(path, "doclens"))  # simulate pre-doclens build
    sv = documents.limit(40).select("doc_id")
    got = filtered_corpus_stats(spark, path, sv).first()
    assert os.path.isdir(os.path.join(path, "doclens"))  # healed
    tok = tokenize(documents.limit(40))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    want = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    ).first()
    assert got["n_docs"] == want["n_docs"]
    assert got["avgdl"] == want["avgdl"]  # exact double equality


def test_postings_scan_is_bucket_pruned(spark, index_path):
    """The serving scan must carry a PartitionFilter on the term bucket —
    whole directories skipped, not a full-artifact read filtered later."""
    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        N_TERM_BUCKETS,
        bucket_of,
        query_term_postings,
    )

    terms = ["spark", "join"]
    df = query_term_postings(spark, index_path, terms)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    want = sorted({bucket_of(t, N_TERM_BUCKETS) for t in terms})
    # every returned row's term really lives in a requested bucket
    got_terms = {r.term for r in df.select("term").distinct().collect()}
    assert got_terms <= set(terms)
    # and the python/bucket expression twins agree (a mismatch would make
    # pruning silently drop postings — this is the load-bearing invariant)
    n_match = (
        spark.read.parquet(f"{index_path}/postings")
        .filter(F.col("term").isin(terms))
        .select("bucket", "term")
        .distinct()
        .collect()
    )
    for r in n_match:
        assert bucket_of(r.term, N_TERM_BUCKETS) == r.bucket
        assert r.bucket in want


def test_forward_index_doc_lookup(spark, documents, index_path):
    """doc_postings returns exactly the tokenize-derived term vector of the
    requested docs, through a dbucket-pruned scan."""
    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        doc_postings,
        tokenize,
    )

    ids = [r.doc_id for r in documents.select("doc_id").limit(3).collect()]
    got = _sorted_rows(doc_postings(spark, index_path, ids))
    want = _sorted_rows(
        tokenize(documents.filter(F.col("doc_id").isin(ids)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    assert got == want
    plan = (
        doc_postings(spark, index_path, ids)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "dbucket" in plan


def test_stats_and_df_match_inline_derivation(spark, documents, index_path):
    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        corpus_stats,
        term_df,
        tokenize,
    )

    tok = tokenize(documents)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    want_stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    ).first()
    got_stats = corpus_stats(spark, index_path).first()
    assert got_stats["n_docs"] == want_stats["n_docs"]
    assert got_stats["avgdl"] == want_stats["avgdl"]  # exact double equality

    want_df = _sorted_rows(
        tok.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    got_df = _sorted_rows(term_df(spark, index_path))
    assert got_df == want_df


# --------------------------------------------------------------------------
# Maintenance: upsert == rebuild, the same lockstep contract as the ANN
# layouts (EP6). Every layout — postings, forward, terms, stats — must be
# a pure function of the final document set.
# --------------------------------------------------------------------------
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _artifact_state(spark, path):
    import os

    inv = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/postings")
        .select("bucket", "term", "doc_id", "tf", "dl")
        .collect()
    )
    fwd = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/forward")
        .select("dbucket", "doc_id", "term", "tf")
        .collect()
    )
    terms = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/terms")
        .select("tbucket", "term", "df")
        .collect()
    )
    stats = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/stats")
        .select("dbucket", "n_docs", "sum_dl")
        .collect()
    )
    doclens = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/doclens")
        .select("dbucket", "doc_id", "dl")
        .collect()
    )
    dirs = sorted(
        d for d in os.listdir(f"{path}/postings") if d.startswith("bucket=")
    )
    tdirs = sorted(
        d for d in os.listdir(f"{path}/terms") if d.startswith("tbucket=")
    )
    return inv, fwd, terms, stats, doclens, dirs, tdirs


@pytest.mark.slow
def test_postings_upsert_equals_rebuild(spark, tmp_path):
    """Upsert replaces same-id docs, adds new ones, evicts terms that no
    longer occur anywhere (including their now-empty bucket directory),
    and lands on exactly the artifact a from-scratch build of the final
    document set produces."""
    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        postings_upsert,
        write_postings_index,
    )

    base = _docs(
        spark,
        [
            (1, "alpha common alpha"),
            (2, "common beta"),
            (3, "qqqquniqueterm common"),
        ],
    )
    path = str(tmp_path / "idx")
    write_postings_index(base, path)

    batch = _docs(
        spark,
        [
            (3, "common common"),       # replacement: qqqquniqueterm vanishes
            (4, "gamma alpha"),          # brand-new doc
        ],
    )
    touched = postings_upsert(spark, path, batch)
    assert touched["term_buckets"] and touched["doc_buckets"]

    final_docs = _docs(
        spark,
        [
            (1, "alpha common alpha"),
            (2, "common beta"),
            (3, "common common"),
            (4, "gamma alpha"),
        ],
    )
    rebuilt = str(tmp_path / "rebuilt")
    write_postings_index(final_docs, rebuilt)
    assert _artifact_state(spark, path) == _artifact_state(spark, rebuilt)
    # the vanished term is truly gone from the vocab table
    terms = {r.term for r in spark.read.parquet(f"{path}/terms").collect()}
    assert "qqqquniqueterm" not in terms and "gamma" in terms


def test_postings_upsert_rejects_duplicate_ids(spark, tmp_path):
    """Duplicate same-id rows in a directly-passed batch would merge their
    tokens into inflated tf/dl — the precondition is enforced loudly
    (ADVICE round 6), not silently corrupted."""
    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        postings_upsert,
        write_postings_index,
    )

    path = str(tmp_path / "idx")
    write_postings_index(_docs(spark, [(1, "a b")]), path)
    dup = _docs(spark, [(2, "c d"), (2, "c e")])
    with pytest.raises(ValueError, match="duplicate doc_id"):
        postings_upsert(spark, path, dup)


@pytest.mark.slow
def test_partial_upsert_heals_on_replay(spark, tmp_path):
    """Crash-recovery: simulate an upsert that died AFTER overwriting the
    corpus layouts (postings + forward) but BEFORE recomputing the
    sidecars — the exact hazard of the round-6 review. The leftover
    intent marker must carry the old-term buckets (unrecoverable from the
    now-new forward index) into the replay's recompute set, landing the
    artifact on the from-scratch build of the final docs."""
    import json
    import shutil

    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        postings_upsert,
        write_postings_index,
    )

    base_rows = [
        (1, "alpha common alpha"),
        (2, "common beta"),
        (3, "qqqquniqueterm common"),
    ]
    batch_rows = [(3, "common common"), (4, "gamma alpha")]
    final_rows = [
        (1, "alpha common alpha"),
        (2, "common beta"),
        (3, "common common"),
        (4, "gamma alpha"),
    ]
    # the scenario needs the lost term's bucket disjoint from every
    # new-term bucket, else the replay would touch it anyway
    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        N_TERM_BUCKETS,
        bucket_of,
    )

    lost = bucket_of("qqqquniqueterm", N_TERM_BUCKETS)
    assert lost not in {
        bucket_of(t, N_TERM_BUCKETS) for t in ("common", "gamma", "alpha")
    }

    # reference run: a COMPLETED upsert on a twin artifact gives the
    # post-batch corpus layouts and the true touched-bucket set
    done = str(tmp_path / "done")
    write_postings_index(_docs(spark, base_rows), done)
    touched = postings_upsert(spark, done, _docs(spark, batch_rows))
    assert lost in touched["term_buckets"]

    # crashed artifact: NEW corpus layouts, OLD sidecars, intent left over
    path = str(tmp_path / "crashed")
    write_postings_index(_docs(spark, base_rows), path)
    for layout in ("postings", "forward"):
        shutil.rmtree(f"{path}/{layout}")
        shutil.copytree(f"{done}/{layout}", f"{path}/{layout}")
    with open(f"{path}/_UPSERT_INTENT.json", "w") as fh:
        json.dump(touched, fh)

    # redelivered batch (foreachBatch retry) converges the whole artifact
    postings_upsert(spark, path, _docs(spark, batch_rows))
    rebuilt = str(tmp_path / "rebuilt")
    write_postings_index(_docs(spark, final_rows), rebuilt)
    assert _artifact_state(spark, path) == _artifact_state(spark, rebuilt)
    import os

    assert not os.path.exists(f"{path}/_UPSERT_INTENT.json")


@pytest.mark.slow
def test_corrupt_intent_marker_falls_back_to_full_sidecar_recompute(
    spark, tmp_path
):
    """An UNREADABLE intent marker (disk-full partial write from a
    pre-atomic-rename version) must not brick the artifact: the upsert
    treats the dead run's touched set as unknown and recomputes every
    bucket's sidecars from the layouts — converging on the from-scratch
    build instead of raising JSONDecodeError forever."""
    import shutil

    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        postings_upsert,
        write_postings_index,
    )

    base_rows = [(1, "alpha common alpha"), (2, "common beta"),
                 (3, "qqqquniqueterm common")]
    batch_rows = [(3, "common common"), (4, "gamma alpha")]
    final_rows = [(1, "alpha common alpha"), (2, "common beta"),
                  (3, "common common"), (4, "gamma alpha")]

    done = str(tmp_path / "done")
    write_postings_index(_docs(spark, base_rows), done)
    postings_upsert(spark, done, _docs(spark, batch_rows))

    # crashed artifact with a TRUNCATED marker: layouts new, sidecars old
    path = str(tmp_path / "crashed")
    write_postings_index(_docs(spark, base_rows), path)
    for layout in ("postings", "forward"):
        shutil.rmtree(f"{path}/{layout}")
        shutil.copytree(f"{done}/{layout}", f"{path}/{layout}")
    with open(f"{path}/_UPSERT_INTENT.json", "w") as fh:
        fh.write('{"term_buckets": [1,')  # mid-write crash

    postings_upsert(spark, path, _docs(spark, batch_rows))
    rebuilt = str(tmp_path / "rebuilt")
    write_postings_index(_docs(spark, final_rows), rebuilt)
    assert _artifact_state(spark, path) == _artifact_state(spark, rebuilt)


def test_term_df_scan_is_bucket_pruned(spark, index_path):
    """term_df with a term list must prune to the terms' tbucket
    directories, same discipline as the postings scan."""
    from vectordb_acc_and_speed_exp_spark.operators.postings import term_df

    df = term_df(spark, index_path, ["spark", "join"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tbucket" in plan
    got = {r.term for r in df.collect()}
    assert got <= {"spark", "join"}


@pytest.mark.slow
def test_postings_upsert_replay_is_idempotent(spark, tmp_path):
    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        postings_upsert,
        write_postings_index,
    )

    base = _docs(spark, [(1, "a b a"), (2, "b c")])
    path = str(tmp_path / "idx")
    write_postings_index(base, path)
    batch = _docs(spark, [(2, "c d"), (5, "e")])
    postings_upsert(spark, path, batch)
    once = _artifact_state(spark, path)
    postings_upsert(spark, path, batch)  # replay (at-least-once delivery)
    assert _artifact_state(spark, path) == once


@pytest.mark.slow
def test_stream_maintains_postings_index(spark, documents, tmp_path):
    """Micro-batches of documents flow through the streaming sink; after
    the stream drains the artifact equals a from-scratch build over all
    docs, and BM25 served from it equals inline scoring (end-to-end)."""
    from vectordb_acc_and_speed_exp_spark.operators.bm25 import (
        bm25_scores,
        bm25_scores_indexed,
    )
    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        write_postings_index,
    )
    from vectordb_acc_and_speed_exp_spark.streaming.index_maintenance import (
        stream_upsert_postings_index,
    )

    docs = documents.select("doc_id", "text")
    src_dir = tmp_path / "arrivals"
    for lo, hi in ((0, 150), (150, 300), (300, 10**9)):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(str(src_dir))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    idx_path = str(tmp_path / "stream_postings_idx")
    stream_upsert_postings_index(stream, idx_path)

    rebuilt = str(tmp_path / "rebuilt")
    write_postings_index(docs, rebuilt)
    assert _artifact_state(spark, idx_path) == _artifact_state(spark, rebuilt)

    q = spark.createDataFrame(
        [(0, "spark"), (0, "join"), (1, "scan")], "query_id long, term string"
    )
    got = _sorted_rows(bm25_scores_indexed(spark, idx_path, q))
    want = _sorted_rows(bm25_scores(docs, q))
    assert got == want


def test_layout_relation_caches_and_invalidates(spark, tmp_path):
    """The serve-path relation cache returns the SAME DataFrame while the
    layout is untouched (skipping the per-call listing job) and a NEW,
    fresh one after an upsert rewrites bucket files — staleness here
    would not just serve old rows, it would point the FileIndex at
    deleted files."""
    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        _layout_relation,
        postings_upsert,
        query_term_postings,
        write_postings_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    write_postings_index(docs, path)
    import os

    inv = os.path.join(path, "postings")
    a = _layout_relation(spark, inv)
    b = _layout_relation(spark, inv)
    assert a is b
    before = {
        (r.term, r.doc_id, r.tf)
        for r in query_term_postings(spark, path, ["beta", "delta"]).collect()
    }
    assert before == {("beta", 1, 1), ("beta", 2, 1)}
    batch = spark.createDataFrame(
        [(3, "delta beta")], "doc_id long, text string"
    )
    postings_upsert(spark, path, batch)
    c = _layout_relation(spark, inv)
    assert c is not a
    after = {
        (r.term, r.doc_id, r.tf)
        for r in query_term_postings(spark, path, ["beta", "delta"]).collect()
    }
    assert after == {("beta", 1, 1), ("beta", 2, 1), ("beta", 3, 1), ("delta", 3, 1)}


def test_ensure_doclens_heal_is_crash_safe(spark, documents, tmp_path):
    """ADVICE r08 (medium): the one-time doclens heal must stage+rename,
    not write into the final path — Spark creates the directory at job
    start, so a crash mid-heal would leave a partial layout that
    os.path.exists() treats as complete forever."""
    import os
    import shutil

    from vectordb_acc_and_speed_exp_spark.operators.postings import (
        ensure_doclens,
        filtered_corpus_stats,
        write_postings_index,
    )

    path = str(tmp_path / "pidx")
    docs = documents.limit(30).selectExpr("cast(doc_id as string) as doc_id", "text")
    write_postings_index(docs, path, id_col="doc_id")
    dp = os.path.join(path, "doclens")
    sv = docs.select("doc_id")
    want = filtered_corpus_stats(spark, path, sv).first()
    # simulate a pre-doclens artifact with a crashed heal: doclens gone,
    # a partial staging dir left behind
    shutil.rmtree(dp)
    os.makedirs(dp + "._heal_staged")
    with open(os.path.join(dp + "._heal_staged", "part-junk"), "w") as fh:
        fh.write("torn")
    got_dp = ensure_doclens(spark, path)
    assert got_dp == dp and os.path.exists(dp)
    assert not os.path.exists(dp + "._heal_staged")
    got = filtered_corpus_stats(spark, path, sv).first()
    assert (got.n_docs, got.avgdl) == (want.n_docs, want.avgdl)
