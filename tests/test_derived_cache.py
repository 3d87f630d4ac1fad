"""derived_cache: fingerprint-keyed /tmp caches for derived-source queries.

The driver regenerates /root/testdata between rounds; these tests prove a
regeneration (simulated by touching / rewriting the source file) forces a
rebuild, and that a crashed partial build can never leak stale files into
the rebuilt dataset (the wirelog double-count failure mode from ADVICE).
"""

from __future__ import annotations

import os

import pytest

from logflow.sources.derived import derived_cache, source_fingerprint


@pytest.fixture
def src(tmp_path, monkeypatch):
    """A fake sf_dir with one 'events.parquet' file, and an isolated tmpdir
    so the cache never collides with real query caches."""
    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "events.parquet").write_bytes(b"v1-bytes")
    cachedir = tmp_path / "cache"
    cachedir.mkdir()
    monkeypatch.setenv("TMPDIR", str(cachedir))
    import tempfile

    tempfile.tempdir = None  # force gettempdir() to re-read TMPDIR
    yield str(sf)
    tempfile.tempdir = None


def _build_counter(calls):
    def build(d):
        calls.append(d)
        with open(os.path.join(d, "data.out"), "w") as fh:
            fh.write("built")

    return build


def test_cache_hit_skips_rebuild(src):
    calls = []
    p1 = derived_cache(src, "t1", ["events"], _build_counter(calls))
    p2 = derived_cache(src, "t1", ["events"], _build_counter(calls))
    assert p1 == p2
    assert len(calls) == 1
    assert os.path.exists(os.path.join(p1, "data.out"))


def test_source_regeneration_forces_rebuild(src):
    calls = []
    derived_cache(src, "t2", ["events"], _build_counter(calls))
    # Driver-style regeneration: same name, new bytes (new mtime/size).
    with open(os.path.join(src, "events.parquet"), "wb") as fh:
        fh.write(b"v2-bytes-regenerated")
    derived_cache(src, "t2", ["events"], _build_counter(calls))
    assert len(calls) == 2


def test_mtime_only_change_forces_rebuild(src):
    calls = []
    derived_cache(src, "t3", ["events"], _build_counter(calls))
    st = os.stat(os.path.join(src, "events.parquet"))
    os.utime(os.path.join(src, "events.parquet"), ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    derived_cache(src, "t3", ["events"], _build_counter(calls))
    assert len(calls) == 2


def test_rebuild_wipes_partial_leftovers(src):
    """A crashed attempt (files present, no marker) must not leak into the
    rebuilt dataset — the ADVICE wirelog double-count scenario."""
    calls = []
    base = derived_cache(src, "t4", ["events"], _build_counter(calls))
    # Simulate a crashed append-style attempt from a later (regenerated)
    # source: stale extra file + invalidated fingerprint.
    with open(os.path.join(base, "leftover.wirelog"), "w") as fh:
        fh.write("stale frames")
    with open(os.path.join(src, "events.parquet"), "wb") as fh:
        fh.write(b"v2")
    base2 = derived_cache(src, "t4", ["events"], _build_counter(calls))
    assert base2 == base
    assert len(calls) == 2
    assert not os.path.exists(os.path.join(base, "leftover.wirelog"))
    assert os.path.exists(os.path.join(base, "data.out"))


def test_fingerprint_covers_directory_tables(src):
    d = os.path.join(src, "orders.parquet")
    os.makedirs(d)
    with open(os.path.join(d, "part-0.parquet"), "wb") as fh:
        fh.write(b"a")
    fp1 = source_fingerprint(src, ["orders"])
    with open(os.path.join(d, "part-1.parquet"), "wb") as fh:
        fh.write(b"b")
    assert source_fingerprint(src, ["orders"]) != fp1
