"""Cross-engine parity on a corpus WITH empty/whitespace documents.

DuckDB's string_split yields [''] for empty text while Spark's tokens()
yields [] — the divergence class a code-review pass flagged in several
token-consuming oracles. Those oracles now guard `length(trim(text)) > 0`;
this test pins the alignment on a crafted corpus the shared testdata lacks
(its minimum document is 10 tokens)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

QUERIES = [
    "bm25_topk",
    "parent_doc_retrieval",
    "repetition_profile",
    "tfidf_top_terms",
    "simhash",
    "lang_id_votes",
    "bigram_lm_scores",
    "text_quality",
    "paragraph_dedup",
    # round-5 token consumers (retrieval_eval_metrics is excluded: it
    # needs the embeddings table this crafted dir deliberately lacks)
    "bpe_top_merges",
    "subword_tokenize_counts",
    "rm3_expanded_search",
    "frame_sample_manifest",
]

ROWS = [
    # 'hash'/'join'/'merge'/'scan' are _BM25_QUERIES terms: the BM25-family
    # entries (bm25_topk, rm3_expanded_search, parent_doc_retrieval) need
    # real postings here or their parity checks compare empty sets
    (0, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
    (1, "", "en", "web", 0),
    (2, "   ", "en", "books", 3),
    (3, "la casa es grande y el sol es de oro", "es", "web", 36),
    (4, "the dog and the fox and the dog again", "en", "books", 37),
    (5, "hash join beats merge join when the hash side fits", "en", "web", 51),
    (6, "scan the table then hash the keys then join", "en", "books", 44),
]


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_doc_corpus")
    spark.createDataFrame(
        ROWS, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def cell(v):
        if isinstance(v, float):
            return repr(round(v, 10))
        return repr(v)
    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", QUERIES)
def test_engines_agree_with_empty_docs(spark, crafted_dir, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, crafted_dir)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{crafted_dir}/documents.parquet/*.parquet'"
    )
    orows = con.execute(oracles[name]).fetchall()
    ocols = [d[0] for d in con.description]
    assert _canon(srows, sdf.columns) == _canon(orows, ocols), name
