"""PDF corpus source: binaryFile scan (S3) + per-page text extraction (S4,
create_collections.py:29-53) + page-record shaping (F3/F4/F5,
create_collections.py:145-155).

The extractor is a mapInPandas UDTF: one binary file row → many page rows.
PyPDF2 is import-gated (not in this container); the fallback treats the
payload as UTF-8 text split on form-feed (\\f) page breaks — a
deterministic fake with the same row-explosion shape, so the distributed
plumbing is fully testable (SURVEY.md §5.4: fixtures replace the PDF/torch
dependencies, not the dataflow).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGE_SCHEMA = "pdf_name string, page_num int, total_pages int, text string"


def scan_pdf_dir(spark: SparkSession, pdf_dir: str, max_files: int | None = None) -> DataFrame:
    """Directory glob scan (S3, create_collections.py:98-104) with the
    optional head-limit (O2)."""
    df = spark.read.format("binaryFile").load(pdf_dir + "/*.pdf")
    if max_files is not None:
        df = df.orderBy("path").limit(max_files)
    return df


def _extract_pypdf(content: bytes) -> list[str]:  # pragma: no cover - lib absent
    import io

    from PyPDF2 import PdfReader

    pages = []
    reader = PdfReader(io.BytesIO(content))
    for page in reader.pages:
        try:
            pages.append((page.extract_text() or "").strip())
        except Exception:
            # broken page → empty placeholder (CC:41-44 keeps "" at extract
            # time; the non-empty filter drops it later)
            pages.append("")
    return pages


def _extract_fake(content: bytes) -> list[str]:
    """Deterministic stand-in: UTF-8 decode (errors ignored — the F4
    sanitize semantic), pages split on form-feed."""
    text = content.decode("utf-8", errors="ignore")
    return [p.strip() for p in text.split("\f")]


def extract_pages(binary_df: DataFrame, use_pypdf: bool | None = None) -> DataFrame:
    """(path, content) → one row per page (pdf_name, page_num 1-based,
    total_pages, text). Empty/broken pages come through as text='' and are
    dropped by ``page_records`` — mirroring extract-then-filter
    (create_collections.py:41-44 + :146-147)."""
    if use_pypdf is None:
        try:  # pragma: no cover
            import PyPDF2  # noqa: F401

            use_pypdf = True
        except ImportError:
            use_pypdf = False
    extractor = _extract_pypdf if use_pypdf else _extract_fake

    def explode_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"pdf_name": [], "page_num": [], "total_pages": [], "text": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                stem = path.rsplit("/", 1)[-1]
                stem = stem[:-4] if stem.lower().endswith(".pdf") else stem
                try:
                    pages = extractor(bytes(content))
                except Exception:
                    pages = []
                for i, text in enumerate(pages):
                    out["pdf_name"].append(stem)
                    out["page_num"].append(i + 1)
                    out["total_pages"].append(len(pages))
                    out["text"].append(text)
            yield pd.DataFrame(out)

    return binary_df.select("path", "content").mapInPandas(
        explode_pages, schema=PAGE_SCHEMA
    )


def page_records(pages: DataFrame) -> DataFrame:
    """Record shaping + filters: non-empty pages only (F3, CC:146-147),
    null-safe sanitize (F4, CC:349-379), id = '{pdf}_page_{n}' (F5,
    CC:155), deterministic page_seq over (pdf_name, page_num) — the
    documented fix for the reference's nondeterministic glob order."""
    from ..operators.embedding import sanitize_text
    from ..operators.snapshots import with_page_seq

    cleaned = (
        pages.filter(F.col("text").isNotNull())
        .withColumn("text", sanitize_text(F.col("text")))
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .withColumn(
            "id",
            F.concat(F.col("pdf_name"), F.lit("_page_"), F.col("page_num")),
        )
    )
    return with_page_seq(cleaned, order_cols=("pdf_name", "page_num"))
