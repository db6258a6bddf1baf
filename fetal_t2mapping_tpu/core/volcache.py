"""In-process device-volume cache and asynchronous NIfTI write queue.

The pipeline's checkpoint design is filesystem-is-checkpoint (reference
utils/dcm_utils.py:277, run stages re-runnable from the previous stage's
NIfTIs).  Naively that makes every stage boundary a device->host->disk->
host->device round trip: ``nifti.write`` blocks on the device download,
and the next stage re-reads the bytes it just wrote and re-uploads them.
Over a tunneled chip a single 1 MB download costs ~50 ms of fixed RPC
latency, so a 9-acquisition session pays seconds of pure latency per
stage.

This module keeps the checkpoint contract while removing the round trips:

- ``put``/``get``: an LRU byte-capped cache of the exact Volume handed to
  ``nifti.write`` (device-backed when the pipeline computed it on device).
  A subsequent ``nifti.read``/``read_batch`` of the same path returns the
  cached Volume — the next stage chains on the device array directly and
  XLA's async dispatch never blocks on the filesystem.  Entries validate
  against ``os.stat`` (size + mtime_ns recorded after the write lands), so
  external modification or deletion of the file invalidates the entry.
- ``submit_write``/``flush``: a small thread pool that performs the
  device download + gzip + write off the critical path.  Same-path writes
  are serialized (an overwrite waits for the prior write of that path).
  Worker errors are re-raised at ``flush()``; an ``atexit`` flush is the
  backstop so a process never exits with queued checkpoints unwritten.

Disable with ``FT2_VOLCACHE=0`` (no caching) / ``FT2_ASYNC_WRITES=0``
(``nifti.write_async`` degrades to the synchronous path).
"""

from __future__ import annotations

import atexit
import itertools
import os
import threading
from collections import OrderedDict
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, Optional

_gen_counter = itertools.count(1)   # write generations (see put/mark_written)

_CACHE_MB = float(os.environ.get("FT2_VOLCACHE_MB", "1024"))
_CACHE_ON = os.environ.get("FT2_VOLCACHE", "1") != "0"
_ASYNC_ON = os.environ.get("FT2_ASYNC_WRITES", "1") != "0"
_THREADS = int(os.environ.get("FT2_WRITE_THREADS", "4"))

_lock = threading.Lock()
_entries: "OrderedDict[str, _Entry]" = OrderedDict()
_bytes = 0
_pending: dict = {}          # path -> Future of the in-flight write
_errors: list = []           # exceptions raised by completed writes
_executor: Optional[ThreadPoolExecutor] = None


class _Entry:
    __slots__ = ("vol", "nbytes", "stat", "pending", "gen")

    def __init__(self, vol, nbytes):
        self.vol = vol
        self.nbytes = nbytes
        self.stat = None       # (st_size, st_mtime_ns) once the write landed
        self.pending = True    # write in flight (queued OR running inline)
        self.gen = 0           # write generation (set by put; see mark_written)
        # pending starts True: between put() and mark_written() the file is
        # absent or half-written, so the cached Volume must be served and
        # the entry must survive. A put() never followed by a write would
        # pin the entry — every caller (nifti.write/write_async) pairs
        # put() with mark_written() or fail_write().


def _key(path) -> str:
    return os.path.abspath(str(path))


def caching_enabled() -> bool:
    return _CACHE_ON and _CACHE_MB > 0


def async_enabled() -> bool:
    return _ASYNC_ON


def put(path, vol) -> "int | None":
    """Remember ``vol`` as the content of ``path`` (call before/with write).

    Returns the entry's write GENERATION (monotonic per put), or None when
    nothing was cached — :func:`mark_written` uses it to stamp only the
    entry whose write actually landed (an overwrite bumps the generation,
    so a completing OLDER write cannot mark the newer entry clean)."""
    if not caching_enabled():
        return None
    global _bytes
    nbytes = int(getattr(vol.data, "nbytes", 0))
    if nbytes > _CACHE_MB * 1e6:
        # larger than the whole cap: not cached — but a PRIOR smaller
        # entry for this path must not survive either, or mark_written
        # would stamp the stale entry with the NEW file's stat and get()
        # would serve the old volume forever
        invalidate(path)
        return None
    k = _key(path)
    with _lock:
        old = _entries.pop(k, None)
        if old is not None:
            _bytes -= old.nbytes
        e = _Entry(vol, nbytes)
        e.gen = next(_gen_counter)
        _entries[k] = e
        _bytes += nbytes
        # LRU eviction: never evict an entry whose write is still queued —
        # it is the only copy of that checkpoint until the worker lands it
        for kk in list(_entries):
            if _bytes <= _CACHE_MB * 1e6:
                break
            if kk == k or _entries[kk].pending:
                continue
            _bytes -= _entries.pop(kk).nbytes
        return e.gen


def mark_written(path, gen: "int | None" = None) -> None:
    """Record the on-disk stat of a completed write for later validation.

    ``gen`` (from :func:`put`) restricts the stamp to the entry the write
    corresponds to: when an overwrite has already replaced the entry, the
    OLDER write's completion must neither record its stat on the newer
    entry nor clear its pending flag (the newer entry is the only copy of
    that checkpoint until ITS write lands, and clearing pending would make
    it evictable in that window)."""
    if not caching_enabled():
        return
    k = _key(path)
    try:
        st = os.stat(k)
    except OSError:
        return
    with _lock:
        e = _entries.get(k)
        if e is not None and (gen is None or e.gen == gen):
            e.stat = (st.st_size, st.st_mtime_ns)
            e.pending = False


def get(path):
    """The cached Volume for ``path`` if it still matches the file, else None.

    Valid while the write is pending (the cached Volume IS what will land
    on disk) or while ``os.stat`` matches what the completed write
    recorded.  Anything else — deleted, rewritten externally, never
    stat-recorded — invalidates the entry.
    """
    if not caching_enabled():
        return None
    k = _key(path)
    with _lock:
        e = _entries.get(k)
        if e is None:
            return None
        if e.pending:
            _entries.move_to_end(k)
            return e.vol
        if e.stat is not None:
            try:
                st = os.stat(k)
                if (st.st_size, st.st_mtime_ns) == e.stat:
                    _entries.move_to_end(k)
                    return e.vol
            except OSError:
                pass
        global _bytes
        _bytes -= _entries.pop(k).nbytes
        return None


def invalidate(path) -> None:
    global _bytes
    with _lock:
        e = _entries.pop(_key(path), None)
        if e is not None:
            _bytes -= e.nbytes


def clear() -> None:
    """Drop every cache entry (pending writes keep running; flush() first
    if their content must be on disk)."""
    global _bytes
    with _lock:
        _entries.clear()
        _bytes = 0


def _get_executor() -> ThreadPoolExecutor:
    global _executor
    if _executor is None:
        _executor = ThreadPoolExecutor(
            max_workers=_THREADS, thread_name_prefix="ft2-volwrite")
        atexit.register(_atexit_flush)
    return _executor


def fail_write(path) -> None:
    """Drop ``path``'s cache entry after its write FAILED: the cached
    Volume would otherwise be served forever for a checkpoint that never
    landed (``exists`` False, ``read`` succeeding — a phantom), and the
    permanently-pending entry could never be evicted."""
    invalidate(path)


def submit_write(path, fn: Callable[[], None],
                 gen: "int | None" = None) -> Future:
    """Queue ``fn`` (download + encode + write of ``path``) on the writer
    pool.  Serialized per path: an overwrite of a still-queued path waits
    for the prior write so on-disk content ordering matches call order.
    ``gen`` (from :func:`put`) ties the completion stamp to the entry this
    write corresponds to (see :func:`mark_written`)."""
    k = _key(path)
    fut: Future = Future()
    # check-then-register must be atomic, and waiting on the prior must
    # happen OUTSIDE the lock (the worker needs it to deregister): loop
    # until this future claims the slot. Two racing writers for one path
    # thus serialize instead of tearing the file with two pool workers.
    while True:
        with _lock:
            prior = _pending.get(k)
            if prior is None:
                _pending[k] = fut                 # registered BEFORE the
                                                  # worker can complete it
                break
        try:
            prior.result()
        except Exception:
            pass                                  # already recorded in _errors

    def run():
        try:
            from ..utils.profiling import profiler

            with profiler.stage("io.write_worker"):
                fn()
            mark_written(k, gen)
            fut.set_result(None)
        except Exception as exc:                  # surfaced at flush()
            fail_write(k)
            _errors.append(exc)
            fut.set_exception(exc)
        finally:
            with _lock:
                if _pending.get(k) is fut:
                    del _pending[k]

    _get_executor().submit(run)
    return fut


def wait(path) -> None:
    """Block until ``path``'s in-flight write (if any) completes.

    Lets a filesystem read of a queued-but-uncached path (FT2_VOLCACHE=0,
    or a Volume over the cache cap) see the full file instead of racing
    the writer: ``exists`` reports pending paths as present, so ``read``
    must be able to make that true before touching the bytes.  Raises the
    write's error, if it failed (the path genuinely does not exist)."""
    fut = _pending.get(_key(path))
    if fut is not None:
        fut.result()


def pending(path) -> bool:
    return _key(path) in _pending


def pending_under(directory) -> list:
    """Queued-write paths directly inside ``directory`` (absolute paths).

    Directory listings (glob/os.listdir) cannot see queued writes the way
    :func:`get`/``nifti.exists`` can — a stage that enumerates a
    derivative directory while a prior stage's writes are still in flight
    (nifti.deferred_flushes) would silently see an empty directory. Union
    this with the on-disk listing (``nifti.list_volumes`` does)."""
    prefix = os.path.abspath(str(directory))
    with _lock:
        keys = list(_pending.keys())
    return [k for k in keys if os.path.dirname(k) == prefix]


def flush() -> None:
    """Wait for every queued write; re-raise the first worker error."""
    from ..utils.profiling import profiler

    with profiler.stage("io.flush_wait"):
        _flush_inner()
    if _errors:
        exc = _errors[0]
        _errors.clear()
        raise exc


def _flush_inner() -> None:
    while True:
        with _lock:
            items = list(_pending.items())
        if not items:
            break
        for k, fut in items:
            try:
                fut.result()
            except Exception:
                pass
            with _lock:                           # don't wait on the worker's
                if _pending.get(k) is fut:        # finally-block to deregister
                    del _pending[k]


def _atexit_flush() -> None:
    try:
        flush()
    except Exception as exc:                      # pragma: no cover
        import logging

        logging.getLogger(__name__).error("async NIfTI write failed: %s", exc)
