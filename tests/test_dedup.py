"""Dedup family: planted duplicates must be found; clean corpora must not
produce false exact-dups."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures_df,
    ngram_jaccard_join,
    simhash_fingerprints,
    simhash_neardup_pairs,
)


@pytest.fixture(scope="module")
def with_planted(spark, documents):
    """documents + an exact dup of doc 0 (id 90001) + a near dup of doc 1
    (id 90002: one word changed)."""
    rows = documents.select("doc_id", "text").limit(2).collect()
    t0, t1 = rows[0].text, rows[1].text
    words = t1.split()
    words[len(words) // 2] = "XXNEARDUPXX"
    near = " ".join(words)
    extra = spark.createDataFrame(
        [(90001, t0), (90002, near)], "doc_id bigint, text string"
    )
    return documents.select("doc_id", "text").unionByName(extra)


def test_exact_dedup_finds_planted(with_planted):
    groups = exact_dedup(with_planted, "doc_id", "text").collect()
    assert any(g.keeper_doc_id == 0 and g.n_dups == 2 for g in groups)


def test_exact_dedup_clean_on_unique(documents):
    assert exact_dedup(documents, "doc_id", "text").count() == 0


def test_minhash_signature_shape(documents):
    sig = minhash_signatures_df(documents.limit(20), "doc_id", "text", n_hashes=8)
    counts = sig.groupBy("doc_id").count().collect()
    assert all(c["count"] == 8 for c in counts)
    assert sig.filter(F.col("minhash") < 0).count() == 0


def test_minhash_lsh_finds_exact_and_near_dup(with_planted):
    pairs = minhash_lsh_pairs(
        with_planted, "doc_id", "text", jaccard_threshold=0.5
    ).collect()
    got = {(p.id_a, p.id_b) for p in pairs}
    assert (0, 90001) in got
    assert (1, 90002) in got
    exact = [p for p in pairs if (p.id_a, p.id_b) == (0, 90001)]
    assert exact[0].jaccard_r == 1.0


def test_ngram_jaccard_finds_near_dup(with_planted):
    pairs = ngram_jaccard_join(with_planted, "doc_id", "text", threshold=0.3)
    got = {(p.id_a, p.id_b): p.jaccard_r for p in pairs.collect()}
    assert got.get((0, 90001)) == 1.0
    assert (1, 90002) in got


def test_simhash_identical_docs_equal(with_planted):
    fp = simhash_fingerprints(with_planted, "doc_id", "text")
    vals = {r.doc_id: r.simhash for r in fp.collect()}
    assert vals[0] == vals[90001]
    assert 0 <= vals[0] < 2**60


def test_simhash_neardup_pairs(with_planted):
    pairs = simhash_neardup_pairs(with_planted, "doc_id", "text", max_hamming=8)
    got = {(p.id_a, p.id_b): p.hamming for p in pairs.collect()}
    assert got.get((0, 90001)) == 0


def test_connected_components_known_graph(spark):
    """Chain 1-2-3 (diameter 2, needs >1 propagation round), triangle
    10-11-12, isolated pair (20,21): labels = component minimum."""
    from vectordb_acc_and_speed_exp_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a bigint, id_b bigint",
    )
    got = {
        r.node: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_string_ids(spark):
    """Non-numeric ids exercise the changed-count convergence fallback."""
    from vectordb_acc_and_speed_exp_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], "id_a string, id_b string"
    )
    got = {
        r.node: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert got == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}


def test_prefix_jaccard_equals_bruteforce_with_fewer_candidates(spark, documents):
    """Prefix filtering is lossless (same pairs as the all-shingle join)
    and actually prunes (the prefix index is a strict subset of the
    shingle table)."""
    import pyspark.sql.functions as F

    from vectordb_acc_and_speed_exp_spark.operators.dedup import (
        _shingle_table,
        prefix_jaccard_join,
    )

    t = 0.3
    got = prefix_jaccard_join(
        documents, id_col="doc_id", text_col="text", threshold=t
    )

    sh = _shingle_table(documents, "doc_id", "text")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    common = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sb"))
    brute = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "j",
            F.col("n_common") / (F.col("sa") + F.col("sb") - F.col("n_common")),
        )
        .filter(F.col("j") >= t)
        .select("id_a", "id_b", F.round("j", 4).alias("jaccard_r"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, brute.collect()))

    # pruning evidence: prefixes hold ~ (1-t) of each doc's shingles
    n_all = sh.count()
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.asc("_df"), F.asc("sh"))
    n_pref = (
        sh.join(dfreq, "sh")
        .withColumn("_rnk", F.row_number().over(w))
        .join(sizes, "doc_id")
        .filter(F.col("_rnk") <= F.col("sz") - F.ceil(F.col("sz") * t) + 1)
        .count()
    )
    assert n_pref < n_all * 0.85, (n_pref, n_all)


def test_prefix_jaccard_exact_at_integer_boundary_threshold(spark):
    """tau=0.2: float-ceil bounds overshoot integer boundaries
    (ceil(0.2/1.2*18) gave 4 where the exact bound is 3) and silently
    dropped qualifying pairs whose shared shingles rank LAST in the
    canonical order — which they always do (shared => df 2, unique =>
    df 1, rare-first ranking). Bounds now use exact integer arithmetic."""
    import pyspark.sql.functions as F

    from vectordb_acc_and_speed_exp_spark.operators.dedup import (
        _shingle_table,
        prefix_jaccard_join,
    )

    # 1-word shingles: each doc = 6 unique + 3 shared tokens => sz 9,
    # overlap 3, J = 3/15 = 0.2 exactly
    rows = [
        (1, "a1 a2 a3 a4 a5 a6 zs1 zs2 zs3"),
        (2, "b1 b2 b3 b4 b5 b6 zs1 zs2 zs3"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = prefix_jaccard_join(
        df, id_col="doc_id", text_col="text", threshold=0.2, shingle_words=1
    ).collect()
    assert [(r.id_a, r.id_b, r.jaccard_r) for r in got] == [(1, 2, 0.2)]


def test_jaccard_verify_narrow_fallback_equals_broadcast(
    spark, documents, monkeypatch
):
    """The verify stage has two shapes chosen by measured candidate-set
    volume: broadcast array-intersect (small) and the narrow (id, sh)
    shuffle join (the 100 TB fallback). Forcing the ceiling to 0 exercises
    the narrow shape on the same corpus; outputs must be identical — the
    pair family is hash-oracled on the broadcast shape, so equality here
    extends the oracle to the fallback."""
    from vectordb_acc_and_speed_exp_spark.operators import dedup as dd

    broadcast_pairs = sorted(
        map(
            tuple,
            dd.prefix_jaccard_join(
                documents, id_col="doc_id", text_col="text", threshold=0.3
            ).collect(),
        )
    )
    monkeypatch.setattr(dd, "_BROADCAST_VERIFY_MAX_SHINGLES", 0)
    narrow_pairs = sorted(
        map(
            tuple,
            dd.prefix_jaccard_join(
                documents, id_col="doc_id", text_col="text", threshold=0.3
            ).collect(),
        )
    )
    assert broadcast_pairs == narrow_pairs
    assert len(broadcast_pairs) > 0


def test_connected_components_distributed_path_equals_driver(
    spark, monkeypatch
):
    """Small graphs resolve by collected union-find; the distributed
    min-label fixpoint remains the at-scale path. Forcing the driver
    ceiling to 0 exercises the distributed rounds on the same graph —
    the (node, min-label) result must be identical, including a
    multi-hop chain (pointer-jumping) and an isolated pair."""
    from vectordb_acc_and_speed_exp_spark.operators import dedup as dd

    # chain 1-2-3-4-5, triangle 10-11-12 (+ redundant edge), pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "id_a bigint, id_b bigint",
    )
    driver = {
        r.node: r.cluster_id
        for r in dd.connected_components(pairs).collect()
    }
    monkeypatch.setattr(dd, "_CC_DRIVER_MAX_EDGES", 0)
    dist = {
        r.node: r.cluster_id
        for r in dd.connected_components(pairs).collect()
    }
    assert driver == dist
    assert driver[5] == 1 and driver[12] == 10 and driver[21] == 20


def test_band_collision_fastpath_equals_join_path(with_planted):
    """The posting-list self-collision shape (round 13) must produce the
    identical distinct pair set as the asymmetric equi-join path run
    self-vs-self — the streaming maintenance path keeps using the join,
    so divergence would split batch and streaming candidate sets."""
    from vectordb_acc_and_speed_exp_spark.operators.dedup import (
        _band_collisions,
        _band_table,
        _minhash_from_shingles,
        _shingle_table,
    )

    sh = _shingle_table(with_planted, "doc_id", "text").persist()
    bands = _band_table(_minhash_from_shingles(sh, 16), 4).persist()
    fast = {
        (r.id_a, r.id_b) for r in _band_collisions(bands, bands).collect()
    }
    # force the join path by passing a distinct (equal-content) frame
    joined = {
        (r.id_a, r.id_b)
        for r in _band_collisions(bands, bands.select("*")).collect()
    }
    sh.unpersist(); bands.unpersist()
    assert fast == joined and fast
    # strict ordering invariant either way
    assert all(a < b for a, b in fast)


def test_ordered_pairs_within_expansion(spark):
    from vectordb_acc_and_speed_exp_spark.operators.dedup import (
        _ordered_pairs_within,
    )

    df = spark.createDataFrame(
        [([1, 2, 3],), ([7],), ([],), ([4, 9],)], "ids array<bigint>"
    )
    got = {(r.id_a, r.id_b) for r in _ordered_pairs_within(df).collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (4, 9)}
