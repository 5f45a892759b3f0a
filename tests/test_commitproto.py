"""Fault-injection sweep of the commit protocol (VERDICT r08 #7).

io/commitproto.py's two primitives carry every crash-safety story in the
engine, so their invariant — the data always exists IN FULL under
exactly one published location, and heal converges — is pinned here by
killing a writer at EVERY os.rename/os.replace/rmtree boundary, not
just the between-renames state the catalog tests already cover.

No Spark: the primitives are pure-filesystem, so the sweep runs in
milliseconds per injection point.
"""

from __future__ import annotations

import os

import pytest

from vectordb_acc_and_speed_exp_spark.io import commitproto


def _write_tree(path: str, version: str, n: int = 3) -> None:
    os.makedirs(path, exist_ok=True)
    for i in range(n):
        with open(os.path.join(path, f"part-{i}"), "w") as fh:
            fh.write(f"{version}:{i}")


def _read_tree(path: str) -> dict[str, str]:
    out = {}
    for name in sorted(os.listdir(path)):
        with open(os.path.join(path, name)) as fh:
            out[name] = fh.read()
    return out


V1 = {f"part-{i}": f"v1:{i}" for i in range(3)}
V2 = {f"part-{i}": f"v2:{i}" for i in range(3)}


def _assert_exactly_one_complete_tree(path: str) -> None:
    """The protocol invariant at ANY crash point: the published path, if
    present, holds a COMPLETE v1 or v2 tree — never a mix, never a
    partial."""
    if os.path.exists(path):
        assert _read_tree(path) in (V1, V2)
    else:
        # crashed between the two renames: the backup MUST hold v1 whole
        backup = path + "._pre_compact"
        assert os.path.exists(backup) and _read_tree(backup) == V1


class _FailAfter:
    """Raise on the Nth call (1-indexed) of the wrapped function."""

    def __init__(self, fn, fail_on: int):
        self.fn, self.fail_on, self.calls = fn, fail_on, 0

    def __call__(self, *a, **kw):
        self.calls += 1
        if self.calls == self.fail_on:
            raise OSError("injected crash")
        return self.fn(*a, **kw)


# swap_directory performs exactly two os.rename calls (path->backup,
# staged->path) and one rmtree (backup cleanup) when healthy.
@pytest.mark.parametrize("fail_rename_on", [1, 2])
def test_swap_directory_crash_at_every_rename(
    tmp_path, monkeypatch, fail_rename_on
):
    path = str(tmp_path / "layout")
    _write_tree(path, "v1")

    def staged_writer(staged):
        _write_tree(staged, "v2")

    monkeypatch.setattr(
        commitproto.os, "rename", _FailAfter(os.rename, fail_rename_on)
    )
    with pytest.raises(OSError, match="injected"):
        commitproto.swap_directory(path, staged_writer)
    _assert_exactly_one_complete_tree(path)

    # recovery: heal, then the retried swap completes
    monkeypatch.undo()
    commitproto.heal_swap(path)
    assert _read_tree(path) in (V1, V2)
    assert not os.path.exists(path + "._compact_staged")
    assert not os.path.exists(path + "._pre_compact")
    commitproto.swap_directory(path, staged_writer)
    assert _read_tree(path) == V2


def test_swap_directory_crash_mid_staged_write(tmp_path, monkeypatch):
    path = str(tmp_path / "layout")
    _write_tree(path, "v1")

    def torn_writer(staged):
        os.makedirs(staged)
        with open(os.path.join(staged, "part-0"), "w") as fh:
            fh.write("v2:0")
        raise OSError("injected crash")

    with pytest.raises(OSError, match="injected"):
        commitproto.swap_directory(path, torn_writer)
    assert _read_tree(path) == V1  # published tree untouched
    commitproto.heal_swap(path)
    assert not os.path.exists(path + "._compact_staged")
    commitproto.swap_directory(path, lambda s: _write_tree(s, "v2"))
    assert _read_tree(path) == V2


def test_swap_directory_crash_in_backup_cleanup(tmp_path, monkeypatch):
    """Both renames landed, rmtree of the backup dies: the published
    path already holds v2 in full; heal only sweeps the leftover."""
    path = str(tmp_path / "layout")
    _write_tree(path, "v1")

    def boom(_):
        raise OSError("injected crash")

    monkeypatch.setattr(commitproto.shutil, "rmtree", boom)
    with pytest.raises(OSError, match="injected"):
        commitproto.swap_directory(path, lambda s: _write_tree(s, "v2"))
    assert _read_tree(path) == V2
    assert os.path.exists(path + "._pre_compact")
    monkeypatch.undo()
    commitproto.heal_swap(path)
    assert _read_tree(path) == V2
    assert not os.path.exists(path + "._pre_compact")


def test_publish_marker_crash_at_replace(tmp_path, monkeypatch):
    p = str(tmp_path / "m" / "_META.json")
    commitproto.publish_marker(p, {"v": 1})

    def boom(*a):
        raise OSError("injected crash")

    monkeypatch.setattr(commitproto.os, "replace", boom)
    with pytest.raises(OSError, match="injected"):
        commitproto.publish_marker(p, {"v": 2})
    import json

    with open(p) as fh:
        assert json.load(fh) == {"v": 1}  # old content, whole — never torn
    monkeypatch.undo()
    commitproto.publish_marker(p, {"v": 2})
    with open(p) as fh:
        assert json.load(fh) == {"v": 2}


def test_heal_swap_is_idempotent_at_every_state(tmp_path):
    """heal twice from each crashed state — second heal is a no-op."""
    # state: between renames (path gone, backup whole)
    path = str(tmp_path / "layout")
    _write_tree(path + "._pre_compact", "v1")
    _write_tree(path + "._compact_staged", "v2")
    commitproto.heal_swap(path)
    commitproto.heal_swap(path)
    assert _read_tree(path) == V1
    assert not os.path.exists(path + "._compact_staged")
