"""Resumable partitioned parquet output for query-layer pipelines.

The crawl engine's tables are already resumable (deterministic fragment
names + manifest-last commits); this is the same discipline for ad-hoc
pipeline output: one directory per logical partition, a ``_SUCCESS``
marker written LAST, and a re-run that skips every partition whose marker
exists — a failed job resumes where it stopped instead of rewriting (or
half-trusting) one giant file.

Shape: the caller supplies ``make_ds(part)`` — the Dataset for ONE
partition's rows (e.g. a hash-bucket or key-range filter pushed into the
read). Each partition is its own streaming pipeline, so a 100 TB output
is N independent, individually-restartable jobs; Ray Data writes multiple
files per partition directory (never one giant file).
"""

from __future__ import annotations

import posixpath as pp
import re
from collections.abc import Callable, Iterable

from .storage import resolve_fs

# path-safe partition values only: a '/' or '=' (or whitespace/control char)
# in a value would silently change the directory layout and break the
# marker/commit discipline (ADVICE r3) — reject instead of mangling
_SAFE_PART = re.compile(r"^[A-Za-z0-9._\-]+$")


def _part_dirname(part: object) -> str:
    s = str(part)
    if not _SAFE_PART.match(s) or s in (".", ".."):
        raise ValueError(
            f"partition value {s!r} is not path-safe (allowed: letters, digits, '.', '_', '-');"
            " hex-encode or hash path-significant values before using them as partitions"
        )
    return f"part={s}"


def _marker(pdir: str) -> str:
    return pp.join(pdir, "_SUCCESS")


def resumable_write(
    make_ds: Callable[[object], "object"],
    out_dir: str,
    partitions: Iterable[object],
    filesystem=None,
    file_format: str = "parquet",
) -> dict:
    """Write one directory per partition, skipping finished ones.

    ``make_ds(part)`` → ray.data.Dataset for that partition. Directory
    layout: ``out_dir/part=<part>/*.<ext>`` + ``_SUCCESS`` (written only
    after the partition's write completed — the commit point). Returns
    {"written": [...], "skipped": [...]}. Safe to re-run after any crash:
    a partition directory without its marker is overwritten from scratch.

    ``file_format="jsonl"`` writes newline-delimited JSON shards (the
    training-corpus handoff format) with the identical marker discipline —
    for text/metadata exports only (binary columns are not JSON-safe);
    parquet remains the default for typed/columnar output.
    """
    from pyarrow import fs as pafs

    if file_format not in ("parquet", "jsonl"):
        raise ValueError(f"unknown file_format {file_format!r} (parquet|jsonl)")
    fs, root = resolve_fs(out_dir, filesystem)
    fs.create_dir(root, recursive=True)
    written, skipped = [], []
    for part in partitions:
        pdir = pp.join(root, _part_dirname(part))
        if fs.get_file_info(_marker(pdir)).type != pafs.FileType.NotFound:
            _check_marker_format(fs, pdir, file_format)
            skipped.append(part)
            continue
        # a torn previous attempt leaves files without the marker: clear it
        if fs.get_file_info(pdir).type != pafs.FileType.NotFound:
            fs.delete_dir_contents(pdir, missing_dir_ok=True)
        ds = make_ds(part)
        if file_format == "parquet":
            ds.write_parquet(pdir, filesystem=fs)
        else:
            ds.write_json(pdir, filesystem=fs)
        with fs.open_output_stream(_marker(pdir)) as f:
            # marker-last = the partition's commit point; its content records
            # the shard format so a resume/read with a different format fails
            # loudly instead of silently skipping/dropping committed shards
            f.write(file_format.encode())
        written.append(part)
    return {"written": written, "skipped": skipped}


def _check_marker_format(fs, pdir: str, file_format: str) -> None:
    with fs.open_input_stream(_marker(pdir)) as f:
        recorded = f.read().decode() or "parquet"  # empty marker: pre-format layout
    if recorded != file_format:
        raise ValueError(
            f"partition {pdir} was committed as {recorded!r} but this run asked for "
            f"{file_format!r}; refusing to mix shard formats in one output"
        )


def read_partitioned(out_dir: str, filesystem=None, file_format: str = "parquet"):
    """Streaming read of every COMMITTED partition (marker present)."""
    import ray.data as rd
    from pyarrow import fs as pafs

    fs, root = resolve_fs(out_dir, filesystem)
    sel = pafs.FileSelector(root, allow_not_found=True)
    dirs = [i.path for i in fs.get_file_info(sel) if i.type == pafs.FileType.Directory]
    committed = [d for d in sorted(dirs) if fs.get_file_info(_marker(d)).type != pafs.FileType.NotFound]
    if not committed:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    for d in committed:
        _check_marker_format(fs, d, file_format)
    ext = {"parquet": ".parquet", "jsonl": ".json"}[file_format]
    files = [
        i.path
        for d in committed
        for i in fs.get_file_info(pafs.FileSelector(d))
        if i.type == pafs.FileType.File and i.path.endswith(ext)
    ]
    if file_format == "jsonl":
        return rd.read_json(files, filesystem=fs)
    return rd.read_parquet(files, filesystem=fs)
