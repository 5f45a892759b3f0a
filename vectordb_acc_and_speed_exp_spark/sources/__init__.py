from .manifest import normalize_manifest, read_manifest
from .pdf import extract_pages, page_records
from .checkpoint import read_documents, write_documents

__all__ = [
    "normalize_manifest",
    "read_manifest",
    "extract_pages",
    "page_records",
    "read_documents",
    "write_documents",
]
