"""EP1 ingestion pipeline: manifest normalization, binary scan, page
explosion, record shaping, checkpoint idempotence — with fake form-feed
'PDFs' exercising the real distributed plumbing (SURVEY.md §5.4)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from vectordb_acc_and_speed_exp_spark.sources.checkpoint import build_or_load
from vectordb_acc_and_speed_exp_spark.sources.manifest import (
    normalize_manifest,
    pending_downloads,
    read_manifest,
)
from vectordb_acc_and_speed_exp_spark.sources.pdf import (
    extract_pages,
    page_records,
    scan_pdf_dir,
)


@pytest.fixture(scope="module")
def pdf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdfs")
    # 3 fake pdfs: 3 pages, 2 pages (one blank), 1 page
    (d / "paper_a.pdf").write_bytes(b"page one\fpage two\fpage three")
    (d / "paper_b.pdf").write_bytes(b"only real page\f   ")
    (d / "paper_c.pdf").write_bytes("unicode éè page".encode("utf-8"))
    return str(d)


def test_manifest_normalization(spark, tmp_path):
    csv = tmp_path / "manifest.csv"
    csv.write_text("arxiv_id\n2511.11571v1\n\n1234.5678/v2x\n")
    m = normalize_manifest(read_manifest(spark, str(csv)))
    rows = {r.arxiv_id: r for r in m.collect()}
    assert set(rows) == {"2511.11571v1", "1234.5678/v2x"}  # F1 dropped the blank
    assert rows["2511.11571v1"].clean_id == "2511.11571"  # F9 version strip
    assert rows["1234.5678/v2x"].safe_filename == "1234.5678_v2x"  # X2 sanitize
    assert rows["2511.11571v1"].pdf_url == "https://arxiv.org/pdf/2511.11571v1.pdf"


def test_pending_downloads_antijoin(spark, tmp_path):
    csv = tmp_path / "m.csv"
    csv.write_text("arxiv_id\naaa\nbbb\n")
    m = normalize_manifest(read_manifest(spark, str(csv)))
    existing = spark.createDataFrame([("aaa",)], "stem string")
    left = pending_downloads(m, existing).collect()
    assert [r.arxiv_id for r in left] == ["bbb"]


def test_extract_and_shape(spark, pdf_dir):
    pages = extract_pages(scan_pdf_dir(spark, pdf_dir))
    raw = pages.collect()
    # 3 + 2 + 1 pages before filtering (blank page still present)
    assert len(raw) == 6
    docs = page_records(pages)
    rows = {r.id: r for r in docs.collect()}
    # blank page of paper_b dropped (F3)
    assert len(rows) == 5
    assert "paper_b_page_2" not in rows
    assert rows["paper_a_page_2"].text == "page two"
    assert rows["paper_a_page_2"].total_pages == 3
    # deterministic page_seq ordered by (pdf_name, page_num)
    seqs = [r.page_seq for r in sorted(rows.values(), key=lambda r: (r.pdf_name, r.page_num))]
    assert seqs == [1, 2, 3, 4, 5]
    assert "é" in rows["paper_c_page_1"].text


def test_max_files_limit(spark, pdf_dir):
    assert scan_pdf_dir(spark, pdf_dir, max_files=2).count() == 2


def test_checkpoint_idempotent(spark, pdf_dir, tmp_path):
    ckpt = str(tmp_path / "docs_ckpt")
    a = build_or_load(spark, pdf_dir, ckpt)
    assert a.count() == 5
    mtime = os.path.getmtime(os.path.join(ckpt, "_SUCCESS"))
    b = build_or_load(spark, pdf_dir, ckpt)  # second call: load, not rebuild
    assert b.count() == 5
    assert os.path.getmtime(os.path.join(ckpt, "_SUCCESS")) == mtime


def test_build_corpus_end_to_end(spark, pdf_dir, tmp_path):
    from vectordb_acc_and_speed_exp_spark.experiments import build_corpus

    out = str(tmp_path / "corpus")
    df = build_corpus(spark, pdf_dir, out, embed_dim=8, snapshot_step=2)
    rows = df.collect()
    assert len(rows) == 5
    assert all(len(r.embedding) == 8 for r in rows)
    # snapshot partition column present and prunable
    assert "snapshot" in df.columns
    part_dirs = [p for p in os.listdir(out) if p.startswith("snapshot=")]
    assert len(part_dirs) >= 2


def test_jsonl_roundtrip_sharded(spark, documents, tmp_path):
    """JSONL sink: nested columns round-trip, maxRecordsPerFile bounds
    shard size, partition_by routes shards into directories."""
    import glob
    import json

    from vectordb_acc_and_speed_exp_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )
    from pyspark.sql import functions as F

    src = documents.limit(100).select(
        "doc_id", "text", "lang", "source",
        F.array(F.length("text"), F.col("n_chars")).alias("feats"),
    )
    path = str(tmp_path / "shards")
    write_jsonl(
        src, path, max_records_per_file=20, partition_by=("source",)
    )
    # partition directories exist and no shard exceeds the record bound
    parts = glob.glob(path + "/source=*/*.json")
    assert parts and all(
        sum(1 for _ in open(p)) <= 20 for p in parts
    )
    # every line is valid standalone JSON
    with open(parts[0]) as fh:
        json.loads(next(iter(fh)))

    back = read_jsonl(
        spark, path,
        schema="doc_id bigint, text string, lang string, feats array<bigint>, source string",
    )
    a = sorted(
        (r.doc_id, r.text, r.lang, r.source, tuple(r.feats))
        for r in src.collect()
    )
    b = sorted(
        (r.doc_id, r.text, r.lang, r.source, tuple(r.feats))
        for r in back.collect()
    )
    assert a == b
