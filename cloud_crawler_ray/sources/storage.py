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
