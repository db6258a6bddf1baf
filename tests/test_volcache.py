"""Volume cache + asynchronous NIfTI writes (core/volcache.py).

The pipeline's filesystem-is-checkpoint contract (reference
utils/dcm_utils.py:277) must survive the cache: reads reflect what the
write put on disk, external modification/deletion invalidates, queued
writes are visible to exists()/read() and always land by flush().
"""

import os
import shutil

import numpy as np
import pytest

from fetal_t2mapping_tpu.core import nifti, volcache
from fetal_t2mapping_tpu.core.volume import Volume


def _vol(val, shape=(6, 5, 4), dtype=np.float32):
    data = np.full(shape, val, dtype)
    return Volume(data, spacing=(1, 1, 1), origin=(0, 0, 0))


@pytest.fixture(autouse=True)
def _clean_cache():
    volcache.flush()
    volcache.clear()
    yield
    volcache.flush()
    volcache.clear()


def test_write_then_read_hits_cache(tmp_path):
    p = str(tmp_path / "a.nii.gz")
    v = _vol(3.0)
    nifti.write(p, v)
    r = nifti.read(p)
    # the cached array is returned as-is: no disk read, no copy
    assert r.data is v.data
    # and the disk content agrees when the cache is bypassed
    volcache.clear()
    r2 = nifti.read(p)
    np.testing.assert_array_equal(np.asarray(r2.data), np.asarray(v.data))


def test_dtype_cast_is_reflected_in_cache(tmp_path):
    p = str(tmp_path / "m.nii.gz")
    mask = Volume(np.ones((4, 4, 4), bool), spacing=(1, 1, 1), origin=(0, 0, 0))
    nifti.write(p, mask, dtype=np.uint8)
    r = nifti.read(p)
    assert np.asarray(r.data).dtype == np.uint8   # cache == disk dtype
    volcache.clear()
    assert np.asarray(nifti.read(p).data).dtype == np.uint8


def test_external_modification_invalidates(tmp_path):
    pa, pb = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.nii.gz")
    nifti.write(pa, _vol(1.0))
    nifti.write(pb, _vol(2.0))
    shutil.copy(pb, pa)                      # external overwrite of pa
    os.utime(pa)                             # ensure a fresh mtime_ns
    r = nifti.read(pa)
    assert float(np.asarray(r.data)[0, 0, 0]) == 2.0


def test_deleted_file_is_not_served_from_cache(tmp_path):
    p = str(tmp_path / "gone.nii.gz")
    nifti.write(p, _vol(1.0))
    os.remove(p)
    with pytest.raises(OSError):
        nifti.read(p)


def test_write_async_visible_and_flushes(tmp_path):
    p = str(tmp_path / "async.nii.gz")
    v = _vol(7.5)
    nifti.write_async(p, v)
    assert nifti.exists(p)                   # pending or landed
    r = nifti.read(p)                        # served from cache immediately
    np.testing.assert_array_equal(np.asarray(r.data), np.asarray(v.data))
    nifti.flush_writes()
    assert os.path.exists(p)
    volcache.clear()
    r2 = nifti.read(p)
    np.testing.assert_array_equal(np.asarray(r2.data), np.asarray(v.data))


def test_deferred_flushes_collapse_barriers(tmp_path):
    # inside the context: flush_writes() is a no-op barrier (the composite
    # pipelines rely on this to overlap checkpoint IO with compute), reads
    # are served from the cache, force=True still drains (the contract for
    # handing files to out-of-process consumers), and the outermost exit
    # performs a real flush
    p1 = str(tmp_path / "a.nii.gz")
    p2 = str(tmp_path / "b.nii.gz")
    with nifti.deferred_flushes():
        nifti.write_async(p1, _vol(1.0))
        nifti.flush_writes()                  # deferred: no barrier
        assert nifti.exists(p1)
        np.testing.assert_array_equal(np.asarray(nifti.read(p1).data),
                                      np.asarray(_vol(1.0).data))
        with nifti.deferred_flushes():        # re-entrant
            nifti.write_async(p2, _vol(2.0))
            nifti.flush_writes(force=True)    # forced: real barrier
            assert os.path.exists(p2)
        nifti.flush_writes()                  # still inside the outer scope
    assert os.path.exists(p1)                 # outermost exit flushed
    volcache.clear()
    assert float(np.asarray(nifti.read(p1).data)[0, 0, 0]) == 1.0


def test_deferred_flushes_depth_restored_on_error(tmp_path):
    p = str(tmp_path / "e.nii.gz")
    with pytest.raises(RuntimeError):
        with nifti.deferred_flushes():
            nifti.write_async(p, _vol(3.0))
            raise RuntimeError("stage failed")
    # the error path still flushed and restored normal flush semantics
    assert os.path.exists(p)
    nifti.write_async(p, _vol(4.0))
    nifti.flush_writes()
    volcache.clear()
    assert float(np.asarray(nifti.read(p).data)[0, 0, 0]) == 4.0


def test_async_overwrite_order(tmp_path):
    p = str(tmp_path / "ow.nii.gz")
    nifti.write_async(p, _vol(1.0))
    nifti.write_async(p, _vol(2.0))
    nifti.flush_writes()
    volcache.clear()
    assert float(np.asarray(nifti.read(p).data)[0, 0, 0]) == 2.0


def test_async_error_surfaces_at_flush(tmp_path):
    p = str(tmp_path / "no" / "such" / "dir" / "x.nii.gz")
    nifti.write_async(p, _vol(1.0))
    with pytest.raises(Exception):
        nifti.flush_writes()
    nifti.flush_writes()                     # error queue drained


def test_read_batch_mixes_cache_and_disk(tmp_path):
    pa, pb = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.nii.gz")
    va, vb = _vol(1.0), _vol(2.0)
    nifti.write(pa, va)
    nifti.write(pb, vb)
    volcache.invalidate(pb)                  # pb must come from disk
    ra, rb = nifti.read_batch([pa, pb])
    assert ra.data is va.data
    np.testing.assert_array_equal(np.asarray(rb.data), np.asarray(vb.data))


def test_lru_eviction_spares_nothing_needed(tmp_path, monkeypatch):
    monkeypatch.setattr(volcache, "_CACHE_MB", 0.003)   # 3 KB cap
    pa, pb = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.nii.gz")
    nifti.write(pa, _vol(1.0, shape=(8, 8, 8)))         # 2 KB each
    nifti.write(pb, _vol(2.0, shape=(8, 8, 8)))
    # pa evicted, pb cached; both still readable (pa from disk)
    assert volcache.get(pa) is None
    assert volcache.get(pb) is not None
    assert float(np.asarray(nifti.read(pa).data)[0, 0, 0]) == 1.0


def test_concurrent_read_write_flush(tmp_path):
    """The pipeline's real pattern: a prefetch thread reads paths while the
    main thread queues writes and stage boundaries flush — no deadlocks,
    no torn reads, disk ends up consistent."""
    import threading

    paths = [str(tmp_path / f"v{i}.nii.gz") for i in range(24)]
    vals = {p: float(i) for i, p in enumerate(paths)}
    errors = []

    def writer():
        try:
            for p in paths:
                nifti.write_async(p, _vol(vals[p]))
        except Exception as e:                    # pragma: no cover
            errors.append(e)

    def reader():
        try:
            for p in paths:
                for _ in range(50):
                    if nifti.exists(p):
                        v = nifti.read(p)
                        assert float(np.asarray(v.data)[0, 0, 0]) == vals[p]
                        break
        except Exception as e:
            errors.append(e)

    def flusher():
        try:
            for _ in range(5):
                nifti.flush_writes()
        except Exception as e:                    # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=f)
               for f in (writer, reader, flusher, reader)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive(), "volcache deadlock"
    assert not errors, errors
    nifti.flush_writes()
    volcache.clear()
    for p in paths:
        assert float(np.asarray(nifti.read(p).data)[0, 0, 0]) == vals[p]


def test_device_array_roundtrip(tmp_path):
    jnp = pytest.importorskip("jax.numpy")
    p = str(tmp_path / "dev.nii.gz")
    host = np.random.default_rng(0).normal(size=(5, 6, 7)).astype(np.float32)
    v = Volume(jnp.asarray(host), spacing=(1, 1, 1), origin=(0, 0, 0))
    nifti.write_async(p, v)
    r = nifti.read(p)                        # device-backed cache hit
    np.testing.assert_array_equal(np.asarray(r.data), host)
    nifti.flush_writes()
    volcache.clear()
    np.testing.assert_array_equal(np.asarray(nifti.read(p).data), host)


def test_failed_async_write_drops_cache_entry(tmp_path):
    """A write that never landed must not be served as a phantom checkpoint:
    after the worker fails, read() raises (no file, no cache) and exists()
    is False — and the entry is not pinned in the cache forever."""
    p = str(tmp_path / "missing_dir" / "x.nii.gz")
    nifti.write_async(p, _vol(4.0))
    with pytest.raises(Exception):
        nifti.flush_writes()
    assert not nifti.exists(p)
    assert volcache.get(p) is None
    with pytest.raises(Exception):
        nifti.read(p)


def test_failed_sync_write_drops_cache_entry(tmp_path, monkeypatch):
    monkeypatch.setattr(volcache, "_ASYNC_ON", False)
    p = str(tmp_path / "missing_dir" / "y.nii.gz")
    with pytest.raises(Exception):
        nifti.write(p, _vol(4.0))
    assert volcache.get(p) is None
    assert not nifti.exists(p)


def test_async_write_readable_when_cache_disabled(tmp_path, monkeypatch):
    """FT2_VOLCACHE=0 with async writes on: exists() reports the queued
    path, and read() must block on the in-flight write instead of racing
    it to the filesystem."""
    monkeypatch.setattr(volcache, "_CACHE_ON", False)
    p = str(tmp_path / "nc.nii.gz")
    v = _vol(7.0)
    nifti.write_async(p, v)
    assert nifti.exists(p)
    r = nifti.read(p)                        # must not FileNotFoundError
    np.testing.assert_array_equal(np.asarray(r.data), np.asarray(v.data))
    nifti.flush_writes()


def test_oversize_volume_still_readable_while_queued(tmp_path, monkeypatch):
    """A Volume over the cache cap is write_async'd but never cached: read
    during the in-flight window must wait for the writer, not race it."""
    monkeypatch.setattr(volcache, "_CACHE_MB", 0.001)   # 1 KB cap
    p = str(tmp_path / "big.nii.gz")
    v = _vol(5.0, shape=(16, 16, 16))                   # 16 KB > cap
    nifti.write_async(p, v)
    assert volcache.get(p) is None                      # not cached
    r = nifti.read(p)
    np.testing.assert_array_equal(np.asarray(r.data), np.asarray(v.data))


def test_entry_pending_until_marked_written(tmp_path):
    """Between put() and mark_written() the file is absent/half-written:
    get() must serve the cached Volume (not pop the entry and send the
    reader to a torn file)."""
    p = str(tmp_path / "pend.nii.gz")
    v = _vol(9.0)
    volcache.put(p, v)                        # write not yet landed
    assert volcache.get(p) is v or volcache.get(p) is not None
    assert volcache.get(p) is not None        # entry survived the reads
    volcache.invalidate(p)


def _stall_writer_pool():
    """Occupy every writer-pool thread with a blocked task; returns the
    Event that releases them. Deterministically reproduces 'writes queued
    but not yet on disk' without racing the pool."""
    import threading

    release = threading.Event()
    started = threading.Barrier(volcache._THREADS + 1)

    def blocker():
        started.wait(timeout=30)
        release.wait(timeout=30)

    for i in range(volcache._THREADS):
        volcache._get_executor().submit(blocker)
    started.wait(timeout=30)          # every pool thread is now parked
    return release


def test_list_volumes_sees_queued_writes(tmp_path):
    """Regression (round-4 e2e bench failure): directory listings must see
    queued async writes. Under nifti.deferred_flushes the recon stage's
    writes are still in flight when the segmentation stage enumerates the
    recon directory; a plain glob returned [] and the whole
    segment->mask->bet->feta chain silently produced nothing."""
    import glob

    d = tmp_path / "anat"
    d.mkdir()
    p = str(d / "a_recon.nii.gz")
    release = _stall_writer_pool()
    try:
        with nifti.deferred_flushes():
            nifti.write_async(p, _vol(5.0))
            # deterministic: the pool is stalled, so the file CANNOT be on
            # disk yet — the plain glob provably loses this race
            assert glob.glob(str(d / "*.nii.gz")) == []
            assert nifti.list_volumes(str(d)) == [p]
            # and the listed path is immediately readable (cache-served)
            assert float(np.asarray(nifti.read(p).data)[0, 0, 0]) == 5.0
            release.set()
            nifti.flush_writes(force=True)
    finally:
        release.set()
    # after the flush: on disk exactly once, listing unchanged
    assert os.path.exists(p)
    assert nifti.list_volumes(str(d)) == [p]
    assert nifti.list_volumes(str(d / "missing")) == []


def test_fake_synthseg_segments_queued_recons(tmp_path):
    """The concrete failing stage: SynthSegRunner('fake') must label recon
    volumes whose writes are still queued (deferred_flushes pipeline)."""
    from fetal_t2mapping_tpu.labels.synthseg import SynthSegRunner

    in_dir = tmp_path / "recon"
    out_dir = tmp_path / "labels"
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    vol = Volume(rng.uniform(0, 100, (8, 8, 8)).astype(np.float32),
                 spacing=(1, 1, 1), origin=(0, 0, 0))
    release = _stall_writer_pool()
    try:
        with nifti.deferred_flushes():
            nifti.write_async(str(in_dir / "s1_recon.nii.gz"), vol)
            SynthSegRunner(mode="fake").run(str(in_dir), str(out_dir))
            release.set()
            nifti.flush_writes(force=True)
    finally:
        release.set()
    assert os.path.exists(str(out_dir / "s1_recon_synthseg.nii.gz"))
    labels = np.asarray(nifti.read(str(out_dir / "s1_recon_synthseg.nii.gz")).data)
    assert set(np.unique(labels)) == {0, 2, 3}


def test_oversize_overwrite_drops_stale_small_entry(tmp_path, monkeypatch):
    """A small cached entry must NOT survive an over-cap overwrite of the
    same path: mark_written would stamp the stale entry with the NEW
    file's stat and get() would serve the old voxels forever."""
    p = str(tmp_path / "grow.nii.gz")
    nifti.write(p, _vol(1.0))                           # small: cached
    assert volcache.get(p) is not None
    monkeypatch.setattr(volcache, "_CACHE_MB", 0.001)   # 1 KB cap
    nifti.write(p, _vol(2.0, shape=(16, 16, 16)))       # over-cap rewrite
    nifti.flush_writes()
    assert volcache.get(p) is None                      # stale entry gone
    r = nifti.read(p)                                   # disk: NEW content
    assert float(np.asarray(r.data).ravel()[0]) == 2.0
    assert r.shape == (16, 16, 16)


def test_mark_written_is_generation_scoped(tmp_path):
    """An OLDER write's completion must not mark a NEWER queued entry
    clean: the newer entry is the only copy of its checkpoint until its
    own write lands (eviction-safety invariant)."""
    p = str(tmp_path / "gen.nii.gz")
    gen1 = volcache.put(p, _vol(1.0))
    gen2 = volcache.put(p, _vol(2.0))
    assert gen2 > gen1
    # old write completes late: must NOT clear the new entry's pending
    open(p, "wb").write(b"x")                 # a file so os.stat succeeds
    volcache.mark_written(p, gen1)
    with volcache._lock:
        e = volcache._entries[volcache._key(p)]
        assert e.pending is True              # still awaiting gen2's write
    volcache.mark_written(p, gen2)
    with volcache._lock:
        e = volcache._entries[volcache._key(p)]
        assert e.pending is False
    volcache.invalidate(p)


def test_concurrent_write_async_same_path_serializes(tmp_path):
    """Racing write_asyncs for one path must never run two pool workers on
    the same file (check-then-register is atomic under the lock); the
    final on-disk content is one of the queued volumes, intact."""
    import threading

    p = str(tmp_path / "race.nii.gz")
    vals = list(range(1, 9))
    threads = [threading.Thread(target=nifti.write_async,
                                args=(p, _vol(float(v)))) for v in vals]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    nifti.flush_writes()
    volcache.clear()                          # force the DISK read
    r = nifti.read(p)                         # parses => file not torn
    assert float(np.asarray(r.data).ravel()[0]) in [float(v) for v in vals]
