"""The commit-protocol seam: single-writer atomic-publish primitives.

Every crash-safety mechanism in this engine reduces to two primitives,
and every call site routes through this module so a port off the local
filesystem swaps ONE file instead of auditing every artifact module
(VERDICT r07 #8 — the POSIX-rename assumption deserved an explicit
seam):

1. ``publish_marker(path, payload)`` / ``clear_marker(path)`` —
   atomically publish/remove a small JSON intent-or-meta file. Used by
   the postings ``_UPSERT_INTENT``, cluster ``_CLUSTERS_INTENT``, facade
   freshen marker, artifact ``_META`` files, and build memos.
2. ``swap_directory(path, write_staged)`` / ``heal_swap(path)`` —
   atomically replace a directory tree with a freshly staged one
   (compaction and OPTIMIZE/CLUSTER BY rewrites, io/catalog.py).

Local-FS contract (this implementation): POSIX ``rename(2)`` is atomic
within one filesystem, so ``os.replace`` never exposes a torn file and
the two-rename directory swap never exposes a mixed tree. The data
always exists in full under exactly one published location.

Object-store replacements (see SCALE.md "Commit protocol at 100 TB"):

- **Marker publish** -> conditional PUT (S3 ``If-None-Match``/ETag
  preconditions, GCS ``ifGenerationMatch``). A marker is one small
  object, so the conditional write IS the atomic publish; no rename
  needed. Crash semantics are unchanged: the marker either exists with
  complete content or does not exist.
- **Directory swap** -> there is no atomic directory rename on S3/GCS
  (rename = O(files) copy+delete, observable mid-flight). Stage under a
  unique prefix, then atomically flip a small pointer the readers
  resolve — a table-format commit (Delta/Iceberg log entry) or a
  ``_CURRENT`` pointer object updated by conditional PUT. That flip
  preserves exactly this module's contract: full data under exactly one
  published location, idempotent heal.
- **Dynamic-partition-overwrite atomicity** (the bucket/cell-grained
  layout upserts) rides Spark's FileCommitProtocol, not this module: on
  object stores configure a zero-rename committer (S3A magic committer)
  or commit through a table format.

Single-writer is assumed throughout (one maintenance job per artifact —
the streaming engine's exactly-once foreachBatch, or one facade
process); the markers serialize crash RECOVERY, not concurrent writers.
"""

from __future__ import annotations

import json
import os
import shutil


def publish_marker(path: str, payload: dict) -> None:
    """Atomically publish a small JSON file at ``path``: after return it
    exists with complete content; a crash before return leaves either the
    old content or nothing (never a torn file)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path + ".tmp", "w") as fh:
        json.dump(payload, fh)
    os.replace(path + ".tmp", path)


def clear_marker(path: str, missing_ok: bool = False) -> None:
    """Remove a published marker (the commit point of the protocol that
    published it)."""
    try:
        os.remove(path)
    except FileNotFoundError:
        if not missing_ok:
            raise


def _staged(path: str) -> str:
    return path.rstrip("/") + "._compact_staged"


def _backup(path: str) -> str:
    return path.rstrip("/") + "._pre_compact"


def swap_directory(path: str, write_staged) -> None:
    """Crash-safe in-place directory replacement: ``write_staged(staged)``
    produces the replacement next to the original, then two renames swap
    it in. The data always exists in full at ``path``, the backup, or the
    staging dir — never a mix. ``write_staged`` must re-scan ``path``
    lazily (a DataFrame over it is fine — the swap happens only after the
    write completes). Callers must run :func:`heal_swap` before their
    first read of ``path``: in the crashed-between-renames state the
    directory does not exist until healed."""
    heal_swap(path)
    staged, backup = _staged(path), _backup(path)
    write_staged(staged)
    os.rename(path, backup)
    os.rename(staged, path)
    shutil.rmtree(backup)


def heal_swap(path: str) -> None:
    """Roll back / clean up any state a crashed :func:`swap_directory`
    left behind. Idempotent; cheap (three stats) when there is nothing to
    heal."""
    staged, backup = _staged(path), _backup(path)
    if not os.path.exists(path) and os.path.exists(backup):
        os.rename(backup, path)  # prior run died between the two renames
    for leftover in (staged, backup):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
