"""Filesystem indirection for the PBF source/sink.

The reference reads any Hadoop FileSystem for free — OsmPbfRecordReader.java:
300-310 opens its split via ``file.getFileSystem(conf)`` and
OsmPbfInputFormat.java:13-19 inherits FileInputFormat path handling — so
``s3://`` / ``hdfs://`` paths just work there. Python DataSource readers run
in plain Python workers with no JVM access, so this module provides the
equivalent indirection on the Python side:

- no scheme, or ``file://``  -> local filesystem (the fast path; zero new
  dependencies, identical behavior to before)
- ``memory://``              -> a process-local in-memory store, used by the
  tests to prove every byte of source/sink I/O goes through this layer
  (fsspec's own ``memory://`` filesystem is process-local too)
- anything else (``s3://``, ``hdfs://``, ``gs://``, ...) -> delegated to
  fsspec when installed; a clear error naming the missing dependency when
  not. fsspec is the de-facto Python equivalent of Hadoop's FileSystem SPI
  (s3fs, gcsfs, adlfs, pyarrow-hdfs all register through it), and the PBF
  read path only needs open/seek/read — all part of fsspec's file contract.

Scale note: every call here is either driver-side planning (glob/list/stat,
one round per query) or a per-partition ``open`` on an executor. Nothing in
the hot decode loop touches this module — blocks are read with plain
``f.seek``/``f.read`` on whatever file object ``fs_open`` returned, so the
remote path costs one extra HTTP-range handshake per partition, not per
block.
"""

from __future__ import annotations

import fnmatch
import glob as globmod
import io
import os
import posixpath
import re

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://")


def scheme_of(path: str) -> str | None:
    """URL scheme of ``path``, or None for plain local paths. Windows drive
    letters (``C:\\``) don't match — the scheme must precede ``://``."""
    m = _SCHEME_RE.match(path)
    return m.group(1).lower() if m else None


def strip_file_scheme(path: str) -> str:
    return path[len("file://"):] if scheme_of(path) == "file" else path


# --------------------------------------------------------------------------
# memory:// — a process-local byte store. Lives at module scope so the
# writer-side tests and reader-side tests in one process share it; Spark
# executors are separate processes, so end-to-end cluster tests use file://
# (documented in tests/test_pbf.py).
# --------------------------------------------------------------------------

_MEMORY_STORE: dict[str, bytes] = {}


class _MemoryWriteFile(io.BytesIO):
    def __init__(self, path: str, text: bool):
        super().__init__()
        self._path = path
        self._text = text

    def write(self, data):  # type: ignore[override]
        if self._text and isinstance(data, str):
            data = data.encode("utf-8")
        return super().write(data)

    def close(self) -> None:
        # idempotent per the io.IOBase contract: a second close() (e.g. a
        # defensive finally after a with-block) must be a no-op, not a
        # ValueError from getvalue() on a closed buffer
        if not self.closed:
            _MEMORY_STORE[self._path] = self.getvalue()
        super().close()


def _memory_norm(path: str) -> str:
    rest = path[len("memory://"):]
    return "memory://" + posixpath.normpath("/" + rest).lstrip("/")


def memory_clear() -> None:
    """Test hook: drop every memory:// file."""
    _MEMORY_STORE.clear()


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------


def _fsspec_fs(scheme: str):
    try:
        import fsspec
    except ImportError as e:  # pragma: no cover - fsspec not in test env
        raise ImportError(
            f"reading {scheme}:// paths requires the 'fsspec' package "
            f"(plus its {scheme} backend, e.g. s3fs/gcsfs); install it or "
            "copy the data to local/file:// paths"
        ) from e
    return fsspec.filesystem(scheme)


def fs_open(path: str, mode: str = "rb"):
    """Open ``path`` for reading or writing. Returned objects support the
    io contract the decoder needs: read/seek/tell for "rb", write for w*."""
    scheme = scheme_of(path)
    if scheme is None or scheme == "file":
        return open(strip_file_scheme(path), mode)
    if scheme == "memory":
        path = _memory_norm(path)
        if "r" in mode:
            try:
                data = _MEMORY_STORE[path]
            except KeyError:
                raise FileNotFoundError(path) from None
            return io.BytesIO(data)
        return _MemoryWriteFile(path, text="b" not in mode)
    f = _fsspec_fs(scheme).open(path, mode)  # pragma: no cover
    return f


def fs_stat(path: str) -> tuple[int, int] | None:
    """(size, mtime_ns) identity for sidecar-index invalidation, or None
    when the backend can't provide a stable one (callers must then skip
    caching and walk the file — correctness never depends on a stat).
    Local files use os.stat; fsspec backends use info() size + whatever
    mtime the store reports (object stores report last-modified; a
    missing mtime degrades to size-only identity, still invalidated by
    any size change)."""
    scheme = scheme_of(path)
    if scheme is None or scheme == "file":
        try:
            st = os.stat(strip_file_scheme(path))
        except OSError:
            return None
        return (st.st_size, st.st_mtime_ns)
    if scheme == "memory":
        # process-local test store: no mtime; rewrites of same-size
        # content would alias, so report no identity (no caching)
        return None
    try:  # pragma: no cover - exercised only with fsspec remotes
        info = _fsspec_fs(scheme).info(path)
        size = int(info.get("size") or 0)
        mt = info.get("mtime") or info.get("LastModified") or 0
        try:
            mt_ns = int(float(mt) * 1e9)
        except (TypeError, ValueError):
            mt_ns = int(getattr(mt, "timestamp", lambda: 0)() * 1e9)
        return (size, mt_ns)
    except Exception:  # pragma: no cover
        return None


def fs_isdir(path: str) -> bool:
    scheme = scheme_of(path)
    if scheme is None or scheme == "file":
        return os.path.isdir(strip_file_scheme(path))
    if scheme == "memory":
        prefix = _memory_norm(path).rstrip("/") + "/"
        return any(k.startswith(prefix) for k in _MEMORY_STORE)
    return _fsspec_fs(scheme).isdir(path)  # pragma: no cover


def fs_exists(path: str) -> bool:
    scheme = scheme_of(path)
    if scheme is None or scheme == "file":
        return os.path.exists(strip_file_scheme(path))
    if scheme == "memory":
        p = _memory_norm(path)
        return p in _MEMORY_STORE or fs_isdir(p)
    return _fsspec_fs(scheme).exists(path)  # pragma: no cover


def fs_glob(pattern: str) -> list[str]:
    """Expand a glob pattern; results keep the scheme prefix so they can be
    fed straight back to ``fs_open``."""
    scheme = scheme_of(pattern)
    if scheme is None:
        return sorted(globmod.glob(pattern))
    if scheme == "file":
        return sorted(
            "file://" + p for p in globmod.glob(strip_file_scheme(pattern))
        )
    if scheme == "memory":
        # glob semantics, not fnmatch: '*' must stop at '/' (fnmatch would
        # match nested subdirectory entries that the local-glob branch
        # excludes, silently diverging memory:// tests from file://
        # production behavior). Matching segment counts restores that.
        pat = _memory_norm(pattern)
        return sorted(
            k
            for k in _MEMORY_STORE
            if k.count("/") == pat.count("/") and fnmatch.fnmatchcase(k, pat)
        )
    fs = _fsspec_fs(scheme)  # pragma: no cover
    return sorted(f"{scheme}://{p}" for p in fs.glob(pattern))


def fs_join(path: str, *parts: str) -> str:
    if scheme_of(path) is None:
        return os.path.join(path, *parts)
    # never strip the scheme's own '//': joining onto a bare root like
    # 'memory://' must yield 'memory://x', not 'memory:/x' (which no
    # longer parses as a scheme and would fall through to local disk)
    base = path.rstrip("/")
    if base.endswith(":"):
        base = base + "//"
    return "/".join([base, *parts]).replace(":///", "://")


def fs_makedirs(path: str) -> None:
    scheme = scheme_of(path)
    if scheme is None or scheme == "file":
        os.makedirs(strip_file_scheme(path), exist_ok=True)
    elif scheme != "memory":  # memory/object stores have no directories
        _fsspec_fs(scheme).makedirs(path, exist_ok=True)  # pragma: no cover


def fs_remove(path: str) -> None:
    scheme = scheme_of(path)
    if scheme is None or scheme == "file":
        os.remove(strip_file_scheme(path))
    elif scheme == "memory":
        _MEMORY_STORE.pop(_memory_norm(path), None)
    else:  # pragma: no cover
        _fsspec_fs(scheme).rm(path)
