"""Paper-manifest source (reference S1/F1/F9/X2-X4,
download_arxiv.py:18,37-56): CSV with an ``arxiv_id`` column → cleaned
download work-list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """CSV manifest scan (DL:18 ``pd.read_csv`` → header CSV read)."""
    return spark.read.option("header", True).csv(path)


def normalize_manifest(df: DataFrame, id_col: str = "arxiv_id") -> DataFrame:
    """Null/empty filter (F1, DL:41-43), version-suffix strip (F9, DL:56
    ``"2511.11571v1" → "2511.11571"``), filename sanitize (X2, DL:46
    ``replace('/', '_')``) and download URL construction (X3, DL:57).
    """
    c = F.col(id_col)
    return (
        df.filter(c.isNotNull() & (F.trim(c) != ""))
        .withColumn("clean_id", F.regexp_replace(F.trim(c), r"v\d+$", ""))
        .withColumn("safe_filename", F.translate(F.trim(c), "/", "_"))
        .withColumn(
            "pdf_url", F.concat(F.lit("https://arxiv.org/pdf/"), F.trim(c), F.lit(".pdf"))
        )
    )


def pending_downloads(manifest: DataFrame, existing_files: DataFrame) -> DataFrame:
    """Already-downloaded anti-filter (F2, DL:50-51) as a left-anti join
    against a listing of existing file stems (column ``stem``)."""
    return manifest.join(
        existing_files,
        manifest.safe_filename == existing_files.stem,
        "left_anti",
    )


def fetch_pdfs(manifest: DataFrame, out_dir: str, rate_limit_sec: float = 0.5) -> dict:
    """HTTP fetch (reference S2, download_arxiv.py:54-91): streaming download
    with content-type check, partial-file cleanup, and a politeness delay.

    Driver-side ingestion *utility*, not a query operator (SURVEY.md §2.1) —
    it iterates the (small) manifest locally; the heavy work is the later
    extract/embed stages, which are distributed. Returns status counters
    (A5, DL:94-107). Import-gated: without ``requests`` (or network) this
    raises RuntimeError and the pipeline starts from already-present files.
    """
    try:
        import requests  # noqa: F401
    except ImportError as e:  # pragma: no cover - requests absent in CI
        raise RuntimeError("fetch_pdfs requires the 'requests' package") from e

    import os
    import time

    counters = {"success": 0, "skipped": 0, "error": 0}
    errors: list[str] = []
    rows = manifest.select("safe_filename", "pdf_url").collect()
    os.makedirs(out_dir, exist_ok=True)
    for row in rows:  # pragma: no cover - network path
        target = os.path.join(out_dir, f"{row.safe_filename}.pdf")
        if os.path.exists(target):
            counters["skipped"] += 1
            continue
        try:
            resp = requests.get(row.pdf_url, stream=True, timeout=30)
            ctype = resp.headers.get("content-type", "")
            if resp.status_code != 200 or "pdf" not in ctype:
                raise IOError(f"bad response {resp.status_code} {ctype}")
            with open(target, "wb") as f:
                for chunk in resp.iter_content(8192):
                    f.write(chunk)
            counters["success"] += 1
        except Exception as e:
            if os.path.exists(target):
                os.remove(target)  # partial-file cleanup (DL:84-88)
            counters["error"] += 1
            errors.append(f"{row.safe_filename}: {e}")
        time.sleep(rate_limit_sec)
    counters["errors_head"] = errors[:10]  # O4 error-list truncation (DL:102-105)
    return counters
