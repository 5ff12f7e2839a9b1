"""Stale-generation reclaim for derived local stores
(plans/registry._wipe_stale_store_keys) — pure-filesystem semantics:

* alternating sf_dirs (bench at sf0.1, probe at sf3) must NOT wipe each
  other's store generations (round-8 ADVICE / round-9 verdict item 6);
* marker-less dirs are in-progress writes while young — untouched — but
  pre-marker-era debris once old, and reclaimed (round-9 ADVICE).
"""

import os
import time

from etl_healthcare_spark.plans.registry import _wipe_stale_store_keys


def _mk_key(root, name, sf_dir=None, age_s=0.0):
    kd = root / name
    kd.mkdir(parents=True)
    (kd / "part-0.parquet").write_text("x")
    if sf_dir is not None:
        (kd / "_SF_DIR").write_text(sf_dir)
    if age_s:
        t = time.time() - age_s
        os.utime(kd, (t, t))
    return kd


def test_concurrent_sf_dirs_never_wipe_each_other(tmp_path):
    root = tmp_path / "store"
    a_old = _mk_key(root, "a_gen1", "/data/sfA")
    b_live = _mk_key(root, "b_gen1", "/data/sfB")
    # writer A starts a new generation: only A's old generation (same owner)
    # and A's own new key dir are reclaimed; B's fresh-marked store survives
    new_a = root / "a_gen2"
    new_a.mkdir()
    _wipe_stale_store_keys(str(root), str(new_a), "/data/sfA")
    assert not a_old.exists(), "own stale generation must be reclaimed"
    assert b_live.exists(), "concurrent writer's marked store must survive"
    assert not new_a.exists(), "current (incomplete) key dir is cleared for rewrite"
    # ...and the mirror alternation: B rewrites, A's (new) marked gen survives
    a_live = _mk_key(root, "a_gen3", "/data/sfA")
    new_b = root / "b_gen2"
    new_b.mkdir()
    _wipe_stale_store_keys(str(root), str(new_b), "/data/sfB")
    assert a_live.exists() and not b_live.exists()


def test_markerless_young_dir_survives(tmp_path):
    root = tmp_path / "store"
    in_progress = _mk_key(root, "writing", sf_dir=None, age_s=60.0)
    cur = root / "cur"
    cur.mkdir()
    _wipe_stale_store_keys(str(root), str(cur), "/data/sfA")
    assert in_progress.exists(), "a young marker-less dir may be an in-progress write"


def test_markerless_old_dir_reclaimed(tmp_path):
    root = tmp_path / "store"
    debris = _mk_key(root, "pre_marker_era", sf_dir=None, age_s=7 * 3600.0)
    cur = root / "cur"
    cur.mkdir()
    _wipe_stale_store_keys(str(root), str(cur), "/data/sfA")
    assert not debris.exists(), "marker-less dirs past the age cut are debris"
