"""Footer-stats fast path (r17, guide §1.2): `_collect_file_stats` must
produce byte-identical manifest entries whether it reads parquet footers
driver-side (the zero-job fast path) or runs the distributed read-back
scan — and must fall back to the scan whenever a precondition fails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget


def make_target(spark, tmp_path, **kw) -> ParquetMergeTarget:
    kw.setdefault("num_buckets", 8)
    return ParquetMergeTarget(spark=spark, path=str(tmp_path / "t"), **kw)


def _entries_both_ways(t: ParquetMergeTarget):
    """(footer_entries_or_None, scan_entries) per committed version dir."""
    manifest = t._manifest()
    by_dir: dict[tuple[int, str], dict] = {}
    for e in manifest["files"]:
        by_dir.setdefault((int(e["v"]), e["d"]), {})[(e["b"], e["n"])] = e["sz"]
    out = []
    for (version, dirname), sizes in sorted(by_dir.items()):
        footer = t._footer_file_stats(version, dirname, sizes)
        orig = ParquetMergeTarget._footer_file_stats
        try:
            ParquetMergeTarget._footer_file_stats = (
                lambda self, *a, **k: None
            )
            scan = t._collect_file_stats(version, dirname)
        finally:
            ParquetMergeTarget._footer_file_stats = orig
        out.append((footer, scan))
    return out


def test_footer_stats_match_scan_for_string_keys(spark, tmp_path):
    t = make_target(spark, tmp_path)
    rows = [(f"k{i:03d}" * 2, i % 5 + 1, f"p{i}") for i in range(200)]
    rows.append((None, 9, "null-key"))
    t.merge(
        spark.createDataFrame(
            rows, "arcane_merge_key string, createdon long, payload string"
        )
    )
    pairs = _entries_both_ways(t)
    assert pairs, "no committed files"
    for footer, scan in pairs:
        assert footer is not None, "fast path must qualify for string keys"
        assert footer == scan


def test_footer_stats_truncate_long_keys_like_scan(spark, tmp_path):
    t = make_target(spark, tmp_path)
    long_rows = [("q" * 10 + f"{i:04d}" + "z" * 200, 1, "x") for i in range(50)]
    t.merge(
        spark.createDataFrame(
            long_rows, "arcane_merge_key string, createdon long, payload string"
        )
    )
    for footer, scan in _entries_both_ways(t):
        assert footer is not None
        assert footer == scan
        for e in footer:
            assert len(e["mn"]) <= 64 and len(e["mx"]) <= 65


def test_footer_stats_fall_back_for_non_ascii_keys(spark, tmp_path):
    t = make_target(spark, tmp_path)
    t.merge(
        spark.createDataFrame(
            [("é中-key", 1, "x"), ("plain", 1, "y")],
            "arcane_merge_key string, createdon long, payload string",
        )
    )
    saw_fallback = False
    for footer, scan in _entries_both_ways(t):
        if footer is None:
            saw_fallback = True
        else:
            assert footer == scan  # ascii-only files may still qualify
    assert saw_fallback, "a non-ascii min/max must force the scan path"
    # and the committed manifest (whatever path built it) matches the scan
    manifest = t._manifest()
    keys = {(e["b"], e["n"]): e for e in manifest["files"]}
    for _footer, scan in _entries_both_ways(t):
        for e in scan:
            assert keys[(e["b"], e["n"])] == e


def test_footer_stats_fall_back_for_numeric_keys(spark, tmp_path):
    t = ParquetMergeTarget(
        spark=spark, path=str(tmp_path / "tn"), key_col="k", num_buckets=4
    )
    t.merge(
        spark.createDataFrame(
            [(i, i + 1, "p") for i in range(20)],
            "k long, createdon long, payload string",
        )
    )
    for footer, scan in _entries_both_ways(t):
        assert footer is None
        # manifest entries came from the scan and are stringified bounds
        for e in scan:
            assert e["mn"] is None or isinstance(e["mn"], str)


def test_footer_stats_fall_back_when_extra_stats_requested(spark, tmp_path):
    t = make_target(spark, tmp_path, stats_cols=("createdon",))
    t.merge(
        spark.createDataFrame(
            [("a", 1, "x"), ("b", 2, "y")],
            "arcane_merge_key string, createdon long, payload string",
        )
    )
    for footer, scan in _entries_both_ways(t):
        assert footer is None
        assert all("cs" in e for e in scan)


def test_footer_stats_all_null_key_file(spark, tmp_path):
    t = make_target(spark, tmp_path, num_buckets=1)
    t.merge(
        spark.createDataFrame(
            [(None, 1, "x")],
            "arcane_merge_key string, createdon long, payload string",
        )
    )
    for footer, scan in _entries_both_ways(t):
        assert footer is not None
        assert footer == scan
        assert footer[0]["mn"] is None and footer[0]["hn"] is True
