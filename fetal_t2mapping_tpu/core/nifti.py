"""Pure-Python NIfTI-1 reader/writer (.nii / .nii.gz).

The execution image has neither nibabel nor SimpleITK, so the framework ships
its own NIfTI-1 codec. Covers everything the pipeline needs: scalar 3-D (and
trailing singleton 4-D) volumes, the common dtypes, scl_slope/scl_inter, and
sform/qform geometry. Replaces the reference's ``sitk.ReadImage`` /
``sitk.WriteImage`` boundary (reference run_t2mapping.py:374-377,
utils/t2map_utils.py:18-28).

Geometry: NIfTI affines are RAS; :class:`~..core.volume.Volume` carries ITK
LPS spacing/origin/direction. Conversion is ``LPS = diag(-1,-1,1) @ RAS``.
"""

from __future__ import annotations

import gzip
import os
import struct
import zlib
from typing import Optional

import numpy as np

from .volume import Volume

_HDR_SIZE = 348
_MAGIC_N1 = b"n+1\x00"

# NIfTI datatype codes
_DT_TO_NP = {
    2: np.dtype(np.uint8),
    4: np.dtype(np.int16),
    8: np.dtype(np.int32),
    16: np.dtype(np.float32),
    64: np.dtype(np.float64),
    256: np.dtype(np.int8),
    512: np.dtype(np.uint16),
    768: np.dtype(np.uint32),
    1024: np.dtype(np.int64),
    1280: np.dtype(np.uint64),
}
_NP_TO_DT = {v: k for k, v in _DT_TO_NP.items()}

_FLIP_LPS = np.diag([-1.0, -1.0, 1.0])  # RAS <-> LPS

# gzip level for written volumes. Default 4: ~2x faster to compress than
# the zlib default 6 at a few-percent size cost — the writer pool's
# compress time sits on the pipeline's flush path, the bytes land on
# local scratch. Override with FT2_GZIP_LEVEL (0-9).
_GZIP_LEVEL = int(os.environ.get("FT2_GZIP_LEVEL", "4"))


def _open(path: str, mode: str):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


# --------------------------------------------------------------------------
# quaternion helpers (qform fallback)
def _quat_to_matrix(b: float, c: float, d: float, qfac: float) -> np.ndarray:
    a2 = 1.0 - (b * b + c * c + d * d)
    a = np.sqrt(max(a2, 0.0))
    R = np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * b * c - 2 * a * d, 2 * b * d + 2 * a * c],
            [2 * b * c + 2 * a * d, a * a + c * c - b * b - d * d, 2 * c * d - 2 * a * b],
            [2 * b * d - 2 * a * c, 2 * c * d + 2 * a * b, a * a + d * d - c * c - b * b],
        ]
    )
    R[:, 2] *= 1.0 if qfac >= 0 else -1.0
    return R


def _matrix_to_quat(R: np.ndarray):
    """Inverse of _quat_to_matrix; returns (b, c, d, qfac)."""
    R = R.copy()
    qfac = 1.0
    if np.linalg.det(R) < 0:
        qfac = -1.0
        R[:, 2] *= -1.0
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        a = 0.25 * s
        b = (R[2, 1] - R[1, 2]) / s
        c = (R[0, 2] - R[2, 0]) / s
        d = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        if i == 0:
            s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
            a = (R[2, 1] - R[1, 2]) / s
            b = 0.25 * s
            c = (R[0, 1] + R[1, 0]) / s
            d = (R[0, 2] + R[2, 0]) / s
        elif i == 1:
            s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
            a = (R[0, 2] - R[2, 0]) / s
            b = (R[0, 1] + R[1, 0]) / s
            c = 0.25 * s
            d = (R[1, 2] + R[2, 1]) / s
        else:
            s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
            a = (R[1, 0] - R[0, 1]) / s
            b = (R[0, 2] + R[2, 0]) / s
            c = (R[1, 2] + R[2, 1]) / s
            d = 0.25 * s
    if a < 0:
        b, c, d = -b, -c, -d
    return float(b), float(c), float(d), qfac


# --------------------------------------------------------------------------
def _affine_ras_to_itk(aff: np.ndarray):
    """RAS 4x4 -> (spacing xyz, origin LPS xyz, direction row-major 3x3 LPS)."""
    A = _FLIP_LPS @ aff[:3, :3]  # now LPS
    spacing = np.linalg.norm(A, axis=0)
    spacing = np.where(spacing == 0, 1.0, spacing)
    direction = A / spacing[None, :]
    origin = _FLIP_LPS @ aff[:3, 3]
    return tuple(spacing), tuple(origin), tuple(direction.reshape(-1))


def _itk_to_affine_ras(vol: Volume) -> np.ndarray:
    aff = np.eye(4)
    aff[:3, :3] = _FLIP_LPS @ vol.direction_matrix @ np.diag(vol.spacing)
    aff[:3, 3] = _FLIP_LPS @ np.asarray(vol.origin)
    return aff


# --------------------------------------------------------------------------
def read(path: str) -> Volume:
    """Read a .nii or .nii.gz file into a Volume (data indexed (z,y,x)).

    A path this process wrote through :func:`write`/:func:`write_async`
    returns the cached (possibly device-backed) Volume without touching
    the filesystem — see :mod:`..core.volcache`. Otherwise decompression
    goes through the native IO runtime (ft2io, threaded zlib) when it is
    available, with the pure-Python gzip path as fallback."""
    from .. import native
    from . import volcache

    cached = volcache.get(path)
    if cached is not None:
        return cached
    # a queued write_async whose Volume the cache did NOT keep
    # (FT2_VOLCACHE=0, or over the cache cap): exists() already reports
    # the path present, so make that true before touching the bytes
    volcache.wait(path)
    return parse(_load_raw(path), name=str(path))


def read_header(path: str) -> Volume:
    """Geometry-only read: decode the 352-byte header and return a Volume
    whose ``data`` is a zero broadcast VIEW of the right shape and dtype
    (no voxel payload is read or allocated — for .nii.gz only the first
    deflate blocks are inflated). For planning/prewarm paths that need a
    clinical-size input's shape + affine without touching megabytes
    (:mod:`..utils.prewarm`). Error contract matches :func:`read`."""
    from . import volcache

    cached = volcache.get(path)
    if cached is not None:
        return cached
    if volcache.pending(path):
        return read(path)
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    try:
        with _open(path, "rb") as f:
            raw = f.read(_HDR_SIZE)
    except (OSError, EOFError, zlib.error) as exc:
        raise ValueError(f"{path}: unreadable NIfTI payload ({exc})") from exc
    return parse(raw, name=str(path), header_only=True)


def _load_raw(path: str) -> bytes:
    """gz-transparent byte load with a uniform error contract.

    A missing file raises FileNotFoundError; a corrupt or truncated
    (gzip) payload raises ValueError — from BOTH the native runtime
    (ft2_read_file status codes surface as OSError) and the Python
    fallback (gzip.BadGzipFile / EOFError / zlib.error). The CLI reads
    arbitrary user NIfTIs, so decompression failures must be typed and
    attributable, never backend-dependent."""
    from .. import native

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    try:
        raw = native.read_file(path) if native.available() else None
        if raw is None:
            with _open(path, "rb") as f:
                raw = f.read()
        return raw
    except FileNotFoundError:
        raise
    except (OSError, EOFError, zlib.error) as exc:
        raise ValueError(f"{path}: unreadable NIfTI payload ({exc})") from exc


def read_batch(paths, n_threads: int = 8):
    """Read many NIfTI files in parallel (native thread pool when available).

    The echo-stack load (one volume per TE, reference run_t2mapping.py:
    365-381 reads them serially through SimpleITK) is the host-side hot
    path; inflating all members concurrently hides the zlib cost. Paths
    this process wrote are served from the volume cache."""
    from .. import native
    from . import volcache

    paths = list(paths)
    out = [volcache.get(p) for p in paths]
    misses = [(i, p) for i, p in enumerate(paths) if out[i] is None]
    if misses:
        for _, p in misses:
            volcache.wait(p)       # see read(): queued-but-uncached writes
        mpaths = [p for _, p in misses]
        try:
            raws = (native.read_batch(mpaths, n_threads)
                    if native.available() else None)
        except OSError:
            raws = None   # per-path read() re-raises with the uniform
            #               contract AND attributes the failing file
        if raws is None:
            for i, p in misses:
                out[i] = read(p)
        else:
            for (i, p), raw in zip(misses, raws):
                out[i] = parse(raw, name=str(p))
    return out


def exists(path) -> bool:
    """True if ``path`` is on disk OR its write is still queued (use for
    checkpoint skip-if-exists tests under asynchronous writes)."""
    from . import volcache

    return volcache.pending(path) or os.path.exists(path)


def list_volumes(directory, suffix: str = ".nii.gz") -> list:
    """Sorted ``suffix`` files in ``directory``, INCLUDING queued writes.

    The async-write counterpart of :func:`exists` for directory
    enumeration: a plain glob/listdir races the writer pool — under
    :func:`deferred_flushes` a stage that lists a derivative directory
    while the producing stage's writes are still in flight would silently
    see it empty (and e.g. segment/mask nothing). Pending paths are
    readable through :func:`read` (served from the volume cache), so the
    union is safe to consume immediately. Returns absolute paths."""
    from . import volcache

    directory = os.path.abspath(str(directory))
    try:
        on_disk = [os.path.join(directory, f) for f in os.listdir(directory)
                   if f.endswith(suffix)]
    except OSError:
        on_disk = []
    queued = [p for p in volcache.pending_under(directory)
              if p.endswith(suffix)]
    return sorted(set(on_disk) | set(queued))


_DEFER_DEPTH = 0


def flush_writes(force: bool = False) -> None:
    """Block until every queued :func:`write_async` has landed on disk.

    Inside a :func:`deferred_flushes` context this is a no-op unless
    ``force=True`` — pass force before handing FILES to a consumer outside
    this process (an external subprocess, a user callback that does its
    own IO). In-process readers never need a flush: :func:`read`/
    :func:`exists` serve queued writes from the volume cache."""
    from . import volcache

    if _DEFER_DEPTH and not force:
        return
    volcache.flush()


class deferred_flushes:
    """Context manager: make intermediate :func:`flush_writes` calls no-ops.

    The composite pipelines wrap their stage sequence in this so the
    per-stage flush barriers (every public stage drains the write queue on
    exit) collapse into ONE flush at the pipeline boundary: the writer
    pool keeps draining downloads/encodes in the background, overlapping
    them with the next stages' compute instead of serializing stage-end
    waits on the ~5 MB/s device link. Within the context the
    filesystem-is-checkpoint contract is served by the volume cache
    (read/read_batch/exists all consult queued writes); anything that
    hands a PATH to an out-of-process consumer must flush_writes(force=True)
    first. Re-entrant; the OUTERMOST exit performs a real flush (so the
    contract holds at the context boundary even on error paths)."""

    def __enter__(self):
        global _DEFER_DEPTH
        _DEFER_DEPTH += 1
        return self

    def __exit__(self, *exc):
        global _DEFER_DEPTH
        _DEFER_DEPTH -= 1
        if _DEFER_DEPTH == 0:
            flush_writes()
        return False


def parse(raw: bytes, name: str = "<bytes>",
          header_only: bool = False) -> Volume:
    """Decode an in-memory NIfTI-1 byte string into a Volume.

    Error contract (the CLI reads arbitrary user files): any structural
    corruption raises ValueError naming the file — never struct.error, a
    hang, or an unbounded allocation (np.frombuffer validates its count
    against the buffer BEFORE allocating, so a forged dim field cannot
    commit memory). ``header_only`` skips the payload: ``data`` becomes a
    zero broadcast view of the declared shape/dtype (see
    :func:`read_header`)."""
    path = name
    if len(raw) < _HDR_SIZE:
        raise ValueError(
            f"{path}: truncated NIfTI header ({len(raw)} < {_HDR_SIZE} bytes)")
    sizeof_hdr = struct.unpack_from("<i", raw, 0)[0]
    endian = "<"
    if sizeof_hdr != _HDR_SIZE:
        endian = ">"
        sizeof_hdr = struct.unpack_from(">i", raw, 0)[0]
        if sizeof_hdr != _HDR_SIZE:
            raise ValueError(f"{path}: not a NIfTI-1 file (sizeof_hdr={sizeof_hdr})")

    dim = struct.unpack_from(endian + "8h", raw, 40)
    ndim = dim[0]
    if ndim < 3:
        shape_xyz = tuple(list(dim[1 : 1 + ndim]) + [1] * (3 - ndim))
    else:
        shape_xyz = tuple(dim[1:4])
        extra = [d for d in dim[4 : 1 + ndim] if d > 1]
        if extra:
            raise ValueError(f"{path}: only scalar 3-D volumes supported, dim={dim}")

    datatype = struct.unpack_from(endian + "h", raw, 70)[0]
    if datatype not in _DT_TO_NP:
        raise ValueError(f"{path}: unsupported NIfTI datatype code {datatype}")
    dtype = _DT_TO_NP[datatype].newbyteorder(endian)

    pixdim = struct.unpack_from(endian + "8f", raw, 76)
    vox_offset = struct.unpack_from(endian + "f", raw, 108)[0]
    scl_slope = struct.unpack_from(endian + "f", raw, 112)[0]
    scl_inter = struct.unpack_from(endian + "f", raw, 116)[0]

    if any(d < 0 for d in shape_xyz):
        raise ValueError(f"{path}: negative dimension in header, dim={dim}")
    nvox = int(np.prod(shape_xyz))
    if not np.isfinite(vox_offset) or vox_offset < 0:
        raise ValueError(f"{path}: invalid vox_offset {vox_offset}")
    offset = int(vox_offset) if vox_offset else _HDR_SIZE + 4
    if header_only:
        # mirror the full read's dtype exactly: a scl_slope/inter header
        # makes read() return SCALED float32 data (below), so the
        # header-only view must be float32 too — prewarm derives program
        # dtypes from this, and a mismatch would warm programs the
        # session never runs
        eff = (np.dtype(np.float32)
               if scl_slope != 0.0 and (scl_slope != 1.0 or scl_inter != 0.0)
               else dtype.newbyteorder("="))
        data = np.broadcast_to(np.zeros((), eff), shape_xyz[::-1])
        return _finish_parse(raw, endian, path, data, pixdim)
    try:
        # frombuffer validates count*itemsize against the buffer BEFORE
        # allocating: a forged 32767^3 dim cannot commit memory
        data = np.frombuffer(raw, dtype=dtype, count=nvox, offset=offset)
    except ValueError as exc:
        raise ValueError(
            f"{path}: payload smaller than header dims "
            f"{shape_xyz} @ offset {offset} ({exc})") from exc
    # NIfTI voxels are Fortran-ordered in (x,y,z) == C-ordered in (z,y,x)
    data = data.reshape(shape_xyz[::-1])

    # NIfTI-1: scl_slope == 0 means NO scaling at all (inter must be ignored
    # too — stale intercepts with slope 0 are common in the wild)
    if scl_slope != 0.0 and (scl_slope != 1.0 or scl_inter != 0.0):
        data = data.astype(np.float32) * np.float32(scl_slope) + np.float32(scl_inter)
    else:
        data = np.asarray(data)
        if data.dtype.byteorder not in ("=", "|", "<"):
            data = data.astype(data.dtype.newbyteorder("="))

    return _finish_parse(raw, endian, path, data, pixdim)


def _finish_parse(raw, endian, path, data, pixdim) -> Volume:
    """Geometry decode shared by the full and header-only parse paths."""
    qform_code = struct.unpack_from(endian + "h", raw, 252)[0]
    sform_code = struct.unpack_from(endian + "h", raw, 254)[0]
    if sform_code > 0:
        srow = np.array(struct.unpack_from(endian + "12f", raw, 280), dtype=np.float64)
        aff = np.eye(4)
        aff[:3, :4] = srow.reshape(3, 4)
    elif qform_code > 0:
        qb, qc, qd = struct.unpack_from(endian + "3f", raw, 256)
        qx, qy, qz = struct.unpack_from(endian + "3f", raw, 268)
        qfac = pixdim[0] if pixdim[0] != 0 else 1.0
        R = _quat_to_matrix(qb, qc, qd, qfac)
        aff = np.eye(4)
        aff[:3, :3] = R @ np.diag(pixdim[1:4])
        aff[:3, 3] = (qx, qy, qz)
    else:
        aff = np.diag([pixdim[1] or 1.0, pixdim[2] or 1.0, pixdim[3] or 1.0, 1.0])

    if not np.all(np.isfinite(aff)):
        # NaN/inf spacing or origin would silently poison every downstream
        # physical-space computation (resampling, registration, fusion)
        raise ValueError(f"{path}: non-finite geometry in header affine")
    spacing, origin, direction = _affine_ras_to_itk(aff)
    return Volume(data=data, spacing=spacing, origin=origin, direction=direction)


def _cast_for_disk(vol: Volume, dtype):
    """Cast ``vol.data`` to its on-disk dtype WITHOUT forcing a device
    download (device arrays cast lazily via ``.astype``); returns the
    (possibly device-backed) cast array."""
    data = vol.data
    target = np.dtype(dtype) if dtype is not None else None
    if target is None:
        try:
            target = np.dtype(data.dtype)
        except TypeError:
            target = np.dtype(np.float32)
    if target not in _NP_TO_DT:
        target = np.dtype(np.float32)
    if not hasattr(data, "astype"):
        data = np.asarray(data)
    if np.dtype(data.dtype) != target:
        if np.dtype(data.dtype).kind == "f" and target.kind in "iu":
            # float -> integer storage (integer-typed checkpoint files, e.g.
            # resampled intermediates mirroring the reference's pixel-type-
            # preserving sitk.Resample, qmri_utils.py:78-80): round-half-even
            # and clamp to the target range instead of C-cast truncation/
            # wraparound; NaN (fusion's out-of-FOV marker) stores as 0. All
            # three ops are lazy on device arrays, so a device volume's
            # quantization rides the accelerator and HALVES what crosses the
            # host link (uint16 vs float32).
            info = np.iinfo(target)
            data = data.clip(info.min, info.max).round()
            if isinstance(data, np.ndarray):
                data = np.nan_to_num(data, nan=0.0)
            else:
                import jax.numpy as jnp
                data = jnp.nan_to_num(data, nan=0.0)
        data = data.astype(target)
    return data


def write(path: str, vol: Volume, dtype: Optional[np.dtype] = None) -> None:
    """Write a Volume as NIfTI-1 (.nii or .nii.gz), sform+qform set.

    Synchronous: blocks on the device download (if any) and the disk
    write. The written Volume is retained in the in-process volume cache
    so a later :func:`read` of the same path is free."""
    from . import volcache

    data = _cast_for_disk(vol, dtype)
    gen = volcache.put(path, vol.with_data(data))
    try:
        _write_payload(path, np.asarray(data), vol)
    except BaseException:
        volcache.fail_write(path)     # never serve a checkpoint that failed
        raise
    volcache.mark_written(path, gen)


def write_async(path: str, vol: Volume, dtype: Optional[np.dtype] = None) -> None:
    """Queue a NIfTI write; returns as soon as the (lazy, device-side)
    dtype cast is dispatched.

    The download + encode + gzip run on the writer pool
    (:mod:`..core.volcache`), overlapping the tunnel/disk latency with
    whatever the caller computes next. The Volume is immediately visible
    to :func:`read`/:func:`read_batch` (volume cache) and
    :func:`exists`; call :func:`flush_writes` (pipelines do, plus an
    atexit backstop) before handing the FILE to an external consumer."""
    from . import volcache

    data = _cast_for_disk(vol, dtype)
    geom = vol.with_data(data)
    gen = volcache.put(path, geom)
    if not volcache.async_enabled():
        try:
            _write_payload(path, np.asarray(data), vol)
        except BaseException:
            volcache.fail_write(path)
            raise
        volcache.mark_written(path, gen)
        return
    def _payload():
        # attribute the worker's two costs separately: the device->host
        # transfer (tunnel-bound, ~5 MB/s here) vs the encode+gzip+disk
        # (host-CPU-bound) — io.write_worker above them is the union
        from ..utils.profiling import profiler

        with profiler.stage("io.download"):
            arr = np.asarray(data)
        with profiler.stage("io.encode"):
            _write_payload(path, arr, vol)

    volcache.submit_write(path, _payload, gen)


def _write_payload(path: str, data: np.ndarray, vol: Volume) -> None:
    datatype = _NP_TO_DT[data.dtype]
    bitpix = data.dtype.itemsize * 8

    nz, ny, nx = data.shape
    aff = _itk_to_affine_ras(vol)
    spacing = np.asarray(vol.spacing, dtype=np.float64)
    # qform rotation must be expressed in RAS
    R_ras = _FLIP_LPS @ vol.direction_matrix
    qb, qc, qd, qfac = _matrix_to_quat(R_ras)

    hdr = bytearray(_HDR_SIZE)
    struct.pack_into("<i", hdr, 0, _HDR_SIZE)
    struct.pack_into("<8h", hdr, 40, 3, nx, ny, nz, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, datatype)
    struct.pack_into("<h", hdr, 72, bitpix)
    struct.pack_into("<8f", hdr, 76, qfac, *spacing, 0, 0, 0, 0)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)  # scl_inter
    struct.pack_into("<b", hdr, 123, 10)  # xyzt_units: mm | sec
    struct.pack_into("<h", hdr, 252, 1)  # qform_code = SCANNER_ANAT
    struct.pack_into("<h", hdr, 254, 1)  # sform_code = SCANNER_ANAT
    struct.pack_into("<3f", hdr, 256, qb, qc, qd)
    struct.pack_into("<3f", hdr, 268, *aff[:3, 3])
    struct.pack_into("<12f", hdr, 280, *aff[:3, :4].reshape(-1))
    hdr[344:348] = _MAGIC_N1

    payload = bytes(hdr) + b"\x00" * 4 + np.ascontiguousarray(data).tobytes()

    from .. import native

    if native.available():
        is_gz = str(path).endswith(".gz")
        native.write_file(path, payload,
                          gzip_level=_GZIP_LEVEL if is_gz else None)
        return
    with _open(path, "wb") as f:
        f.write(payload)
