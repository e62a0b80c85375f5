"""URI / filesystem seam for the storage boundary.

The sink-and-manifest layout is designed for shared storage (NFS / S3 —
exactly_once.py module docstring); this module is the seam that makes
the claim executable instead of aspirational:

* ``normalize_uri`` — ``file://`` URIs collapse to plain local paths,
  so every engine entry point (``StreamingJob(out_dir=...)``, snapshot
  dirs, compact/fsck CLIs) accepts them with zero behavior change;
* ``get_fs`` — any other scheme (``memory://``, ``s3://``, ...)
  resolves to an fsspec-backed adapter exposing the exact operation set
  the exactly-once sink needs (mkdir/open/rename/list/exists/sync).
  Local paths resolve to a thin os/builtin adapter — the hot path stays
  free of fsspec overhead.

Semantics note for object stores: ``replace`` maps to fsspec ``mv``,
which is NOT atomic on eventual-consistency stores the way POSIX
rename is. The sink's correctness does not rest on data-file rename
atomicity alone — the manifest is the commit point and readers ignore
uncommitted slots — but the manifest write itself should target a
store with atomic put-if-absent or a consistent prefix listing (S3 is
read-after-write consistent since 2020). ``sync`` is a no-op off-POSIX:
object stores make a completed PUT durable by contract.

These claims are EXECUTED, not aspirational: the full streaming job
(map/reduce tasks, snapshot chain, committer, fsck, rewind,
kill→resume) runs end to end against ``objstore://`` — an
object-store-semantics filesystem (gush_ray/fakestore.py: non-atomic
copy+delete mv, no fsync, shared across Ray worker processes) — with
output identical to the local-POSIX run, including manifest-publish
crash injection in BOTH halves of the non-atomic move
(tests/test_objectstore_e2e.py).
"""

from __future__ import annotations

import os
import shutil


def normalize_uri(uri: str) -> str:
    """``file://`` → local path; everything else unchanged."""
    if uri.startswith("file://"):
        return uri[len("file://"):] or "/"
    return uri


def is_remote(uri: str) -> bool:
    return "://" in normalize_uri(uri)


class LocalFS:
    """os/builtin-backed adapter (the zero-overhead local fast path)."""

    sep = os.sep

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def open(self, path: str, mode: str = "rb"):
        return open(path, mode)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def remove(self, path: str) -> None:
        """Delete ONE file (missing-ok). rmtree silently no-ops on
        files (shutil ignore_errors) — callers deleting manifests or
        marker files must use this instead."""
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def sync(self) -> None:
        os.sync()

    def fsync(self, f) -> None:
        f.flush()
        os.fsync(f.fileno())

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    def uri_of(self, path: str) -> str:
        return path


class FsspecFS:
    """fsspec-backed adapter for remote schemes (memory://, s3://...).

    Paths passed in/out keep their full ``scheme://...`` form so they
    remain readable by pyarrow/fsspec consumers downstream.
    """

    sep = "/"

    # scheme -> module whose import registers the fsspec implementation.
    # Needed because registration is per-process: Ray worker tasks
    # construct their own FsspecFS, so the plugin must load THERE, not
    # just on the driver. Extend via GUSH_FS_PLUGINS=mod1,mod2 (each
    # imported before scheme resolution) for user-supplied filesystems.
    _PLUGIN_SCHEMES = {"objstore": "gush_ray.fakestore"}

    def __init__(self, scheme: str):
        import importlib

        import fsspec

        mod = self._PLUGIN_SCHEMES.get(scheme)
        if mod is not None:
            importlib.import_module(mod)
        for m in filter(None,
                        os.environ.get("GUSH_FS_PLUGINS", "").split(",")):
            importlib.import_module(m)
        self.scheme = scheme
        self.fs = fsspec.filesystem(scheme)

    def _strip(self, uri: str) -> str:
        return uri.split("://", 1)[1] if "://" in uri else uri

    def _uri(self, path: str) -> str:
        return path if "://" in path else f"{self.scheme}://{path}"

    def join(self, *parts: str) -> str:
        head = parts[0].rstrip("/")
        return "/".join([head, *[p.strip("/") for p in parts[1:]]])

    def makedirs(self, path: str) -> None:
        self.fs.makedirs(self._strip(path), exist_ok=True)

    def open(self, path: str, mode: str = "rb"):
        return self.fs.open(self._strip(path), mode)

    def replace(self, src: str, dst: str) -> None:
        # NOT POSIX-atomic on object stores; see module docstring
        s, d = self._strip(src), self._strip(dst)
        if self.fs.exists(d):
            self.fs.rm(d)
        self.fs.mv(s, d)

    def exists(self, path: str) -> bool:
        return self.fs.exists(self._strip(path))

    def isdir(self, path: str) -> bool:
        return self.fs.isdir(self._strip(path))

    def listdir(self, path: str) -> list[str]:
        return sorted(
            p.rstrip("/").rsplit("/", 1)[-1]
            for p in self.fs.ls(self._strip(path), detail=False)
        )

    def rmtree(self, path: str) -> None:
        p = self._strip(path)
        if self.fs.exists(p):
            self.fs.rm(p, recursive=True)

    def remove(self, path: str) -> None:
        p = self._strip(path)
        if self.fs.exists(p):
            self.fs.rm(p)

    def sync(self) -> None:
        pass  # a completed PUT is durable by object-store contract

    def fsync(self, f) -> None:
        f.flush()

    def getsize(self, path: str) -> int:
        return self.fs.size(self._strip(path))

    def uri_of(self, path: str) -> str:
        return self._uri(path)


def get_fs(uri: str) -> tuple["LocalFS | FsspecFS", str]:
    """(adapter, normalized base path) for a path or URI."""
    uri = normalize_uri(uri)
    if "://" in uri:
        scheme = uri.split("://", 1)[0]
        return FsspecFS(scheme), uri
    return LocalFS(), uri
