"""Filesystem abstraction for the stores — ``pyarrow.fs`` throughout.

The reference ships per-backend sink providers (LocalFileSystemSaveRawProvider
/ S3SaveRawProvider, worker/.../raw/S3SaveRawProvider.scala:27-37). Here the
storage layer is path-agnostic instead: every store takes an optional
``pyarrow.fs.FileSystem`` handle (or derives one from a URI scheme), so the
same code serves ``/local/path``, ``s3://bucket/prefix`` (via pyarrow's S3
filesystem) or any SubTreeFileSystem in tests. No ``open()``/``os.*`` in the
store internals.

Atomicity notes: commits are manifest-last via write-to-temp + ``fs.move``.
On a local filesystem move is an atomic rename; on object stores pyarrow
implements move as copy+delete, where the final PUT is the visibility point
— a reader sees the old manifest or the complete new one, never a torn
write. Orphan temps from a crashed writer are harmless (never referenced).
"""

from __future__ import annotations

import json
import uuid

from pyarrow import fs as pafs


def resolve_fs(path: str, filesystem: "pafs.FileSystem | None" = None) -> tuple["pafs.FileSystem", str]:
    """(filesystem, normalized path) from an optional handle or a URI."""
    if filesystem is not None:
        return filesystem, path
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def write_json_atomic(fs: "pafs.FileSystem", path: str, obj: dict) -> None:
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with fs.open_output_stream(tmp) as f:
        f.write(json.dumps(obj).encode())
    fs.move(tmp, path)


def read_json(fs: "pafs.FileSystem", path: str) -> dict:
    with fs.open_input_stream(path) as f:
        return json.loads(f.read().decode())


def list_names(fs: "pafs.FileSystem", directory: str) -> list[str]:
    """Base names of entries in a directory ([] if it doesn't exist)."""
    sel = pafs.FileSelector(directory, allow_not_found=True)
    return [info.path.rsplit("/", 1)[-1] for info in fs.get_file_info(sel)]


def file_size(fs: "pafs.FileSystem", path: str) -> int:
    return fs.get_file_info(path).size


class LatencyFileSystemHandler(pafs.FileSystemHandler):
    """``pyarrow.fs.PyFileSystem`` handler delegating every operation to a
    base filesystem after a fixed per-operation delay — a deterministic
    stand-in for a remote object store (S3-class ~1-50 ms/op latency) in
    conformance and soak tests. The engine must produce byte-identical
    results on any ``pyarrow.fs`` backend; wrapping one of these around
    LocalFileSystem exercises the whole fs-handle threading path (driver,
    claim/commit tasks, sinks, push/bootstrap tasks) under non-local
    timing. Picklable, so it ships into Ray tasks like any other handle:
    ``pafs.PyFileSystem(LatencyFileSystemHandler(pafs.LocalFileSystem(),
    delay_ms=2))``."""

    def __init__(self, base: "pafs.FileSystem", delay_ms: float = 2.0):
        self.base = base
        self.delay_ms = delay_ms

    def _lag(self):
        import time

        time.sleep(self.delay_ms / 1000.0)

    def get_type_name(self):
        return f"latency({self.delay_ms}ms)"

    def normalize_path(self, p):
        return self.base.normalize_path(p)

    def get_file_info(self, paths):
        self._lag()
        return self.base.get_file_info(paths)

    def get_file_info_selector(self, sel):
        self._lag()
        return self.base.get_file_info(sel)

    def create_dir(self, p, recursive):
        self._lag()
        self.base.create_dir(p, recursive=recursive)

    def delete_dir(self, p):
        self._lag()
        self.base.delete_dir(p)

    def delete_dir_contents(self, p, missing_dir_ok=False):
        self._lag()
        self.base.delete_dir_contents(p, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        self._lag()
        self.base.delete_dir_contents("/", accept_root_dir=True)

    def delete_file(self, p):
        self._lag()
        self.base.delete_file(p)

    def move(self, s, d):
        self._lag()
        self.base.move(s, d)

    def copy_file(self, s, d):
        self._lag()
        self.base.copy_file(s, d)

    def open_input_stream(self, p):
        self._lag()
        return self.base.open_input_stream(p)

    def open_input_file(self, p):
        self._lag()
        return self.base.open_input_file(p)

    def open_output_stream(self, p, metadata):
        self._lag()
        return self.base.open_output_stream(p, metadata=metadata)

    def open_append_stream(self, p, metadata):
        self._lag()
        return self.base.open_append_stream(p, metadata=metadata)

    def __eq__(self, other):
        return (
            isinstance(other, LatencyFileSystemHandler)
            and other.base == self.base
            and other.delay_ms == self.delay_ms
        )

    def __ne__(self, other):
        return not self.__eq__(other)
