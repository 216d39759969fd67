"""Catalog staging/fingerprint unit tests (no Spark session needed)."""
from __future__ import annotations

import os

import pytest

from kf_task_fhir_etl_spark import catalog


def _touch(path: str, content: bytes = b"x") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(content)


def test_content_fingerprint_sees_nested_partition_files(tmp_path):
    """Regenerating a file nested under a partition subdirectory must change
    the fingerprint even when the top-level entries' stat is unchanged
    (ADVICE r04: the old top-level listing stat'ed only the subdirectory)."""
    sf = tmp_path / "sf"
    tbl = sf / "documents.parquet"
    nested = tbl / "part=a" / "data.parquet"
    _touch(str(nested), b"one")
    before = catalog.content_fingerprint(str(sf), ["documents"])
    # rewrite the nested file with different content/size; pin the PARENT
    # directory's mtime so only a recursive walk can notice
    dir_stat = os.stat(tbl)
    _touch(str(nested), b"two-longer")
    os.utime(tbl, ns=(dir_stat.st_atime_ns, dir_stat.st_mtime_ns))
    os.utime(tbl / "part=a", ns=(dir_stat.st_atime_ns, dir_stat.st_mtime_ns))
    after = catalog.content_fingerprint(str(sf), ["documents"])
    assert before != after


def test_content_fingerprint_skips_hidden_and_marker_files(tmp_path):
    sf = tmp_path / "sf"
    tbl = sf / "documents.parquet"
    _touch(str(tbl / "data.parquet"))
    base = catalog.content_fingerprint(str(sf), ["documents"])
    _touch(str(tbl / "_SUCCESS"))
    _touch(str(tbl / ".crc"))
    assert catalog.content_fingerprint(str(sf), ["documents"]) == base


def test_staged_layout_reraises_real_rename_failure(tmp_path, monkeypatch):
    """A rename failure that is NOT a lost publish race (no winner directory
    exists) must re-raise instead of silently returning a missing path
    (ADVICE r04)."""
    sf = tmp_path / "sf"
    _touch(str(sf / "documents.parquet"))
    # staged_layout consults tempfile.gettempdir() only (it makedirs its own
    # subdir), so the monkeypatched function is the single knob needed
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path / "t"))
    os.makedirs(tmp_path / "t", exist_ok=True)

    real_rename = os.rename

    def failing_rename(src, dst):
        raise OSError(18, "Invalid cross-device link")

    monkeypatch.setattr(os, "rename", failing_rename)
    with pytest.raises(OSError):
        catalog.staged_layout(
            "unittest", str(sf), ["documents"], lambda tmp: _touch(os.path.join(tmp, "f"))
        )
    monkeypatch.setattr(os, "rename", real_rename)

    # the benign race: winner already published → loser swallows and reuses
    def racing_rename(src, dst):
        os.makedirs(dst, exist_ok=True)
        raise OSError(39, "Directory not empty")

    monkeypatch.setattr(os, "rename", racing_rename)
    path = catalog.staged_layout(
        "unittest2", str(sf), ["documents"], lambda tmp: _touch(os.path.join(tmp, "f"))
    )
    assert os.path.isdir(path)


def test_staged_layout_builds_once_and_reuses(tmp_path, monkeypatch):
    sf = tmp_path / "sf"
    _touch(str(sf / "documents.parquet"))
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path / "t"))
    os.makedirs(tmp_path / "t", exist_ok=True)
    calls = []

    def build(tmp):
        calls.append(tmp)
        _touch(os.path.join(tmp, "layout"))

    p1 = catalog.staged_layout("unittest3", str(sf), ["documents"], build)
    p2 = catalog.staged_layout("unittest3", str(sf), ["documents"], build)
    assert p1 == p2 and len(calls) == 1 and os.path.isfile(os.path.join(p1, "layout"))


def test_cached_table_invalidates_on_regeneration(spark, tmp_path):
    """cached_table fingerprint-checks its table's files on EVERY call (r06
    review: a version-less fast path would serve EVERY caller — not just
    fingerprint-threading ones — pre-regeneration DataFrames whose file
    listing points at deleted part files), while unchanged files re-serve
    the same memoized DataFrame object."""
    sf = str(tmp_path)
    spark.createDataFrame([(1, "a")], "id int, v string").write.parquet(
        os.path.join(sf, "documents.parquet")
    )
    df1 = catalog.cached_table(spark, sf, "documents")
    assert catalog.cached_table(spark, sf, "documents") is df1

    # regenerate in place (new files, old part files gone): the next call
    # must re-probe by itself — no version threading by the caller
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string").write.mode(
        "overwrite"
    ).parquet(os.path.join(sf, "documents.parquet"))
    df2 = catalog.cached_table(spark, sf, "documents")
    assert df2 is not df1
    assert df2.count() == 2  # fresh listing reads the regenerated data
    assert catalog.cached_table(spark, sf, "documents") is df2
