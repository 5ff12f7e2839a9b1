"""The probe harness's Heaps-corpus redirect (round-8 advice item 7):
text/dedup families probe on the `<sf_dir>hv` variant, symlink-completed
for tables the hv generator doesn't rewrite."""

import importlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _mod():
    return importlib.import_module("tools.scale_probe")


def test_heaps_dir_passthrough_when_no_variant(tmp_path):
    base = tmp_path / "sf1.0"
    base.mkdir()
    assert _mod()._heaps_dir(str(base)) == str(base)


def test_heaps_dir_redirects_and_completes_with_symlinks(tmp_path):
    base = tmp_path / "sf1.0"
    hv = tmp_path / "sf1.0hv"
    base.mkdir()
    hv.mkdir()
    (base / "documents.parquet").write_bytes(b"base-docs")
    (base / "lineitem.parquet").write_bytes(b"base-li")
    (hv / "documents.parquet").write_bytes(b"heaps-docs")  # hv rewrites docs only
    got = _mod()._heaps_dir(str(base))
    assert got == str(hv)
    # hv's own documents win; the missing table is linked from base
    assert (hv / "documents.parquet").read_bytes() == b"heaps-docs"
    assert os.path.islink(hv / "lineitem.parquet")
    assert (hv / "lineitem.parquet").read_bytes() == b"base-li"
    # idempotent on re-entry
    assert _mod()._heaps_dir(str(base)) == str(hv)


def test_family_prefixes_cover_the_probe_families():
    hp = _mod().HEAPS_FAMILIES
    assert "dedup_minhash_lsh".startswith(hp)
    assert "link_survivorship".startswith(hp)
    assert not "g19_ohlc_bars".startswith(hp)
    assert not "q3_latest_observation".startswith(hp)
