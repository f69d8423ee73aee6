"""Partitioned, versioned frontier store with wave manifests + status deltas.

The reference's frontier is a DB table with per-row status updates
(MongoQueueTaskProvider.scala:151-159 / projects_url). Here it is P
hostname-hash partitions (SURVEY.md §4.4); a wave commits a
``manifest-w{wave}.json`` mapping each partition to its current *file
list*:

    p0007/v00003.parquet        # main: full rows as of wave 3's compaction
    p0007/ins00004.parquet      # rows discovered during wave 3
    p0007/del00005.parquet      # (url_hash, status, attempt) flips of wave 4

Status commits are O(wave), not O(frontier): a wave writes one small
``del*`` file per touched partition instead of rewriting the partition
(round-1 write amplification: committing ~10^6 status flips rewrote the
whole ~10^10-row frontier). Reads fold the list in order — base files
(``v*``/``ins*``) concatenated, then each delta scattered onto
status/attempt by url_hash. When a partition's list reaches
``compact_files`` entries the wave's commit task consolidates it back to a
single ``v*`` file, so read fan-in stays bounded.

Commits are manifest-last: a crash mid-wave leaves the previous manifest
authoritative and the wave re-runs idempotently (deterministic file names —
the lease-recovery analog, QueueTaskRecover.scala:31-46).

All IO goes through ``pyarrow.fs`` (sources/storage.py) — pass a
``filesystem`` handle or an ``s3://...`` root and the store is
backend-agnostic (S3SaveRawProvider analog, without per-backend code).

The frontier IS the URL-seen set (a URL enters at most once): dedup-shard
actors are rebuilt from the base files' ``url_hash`` column on resume — no
separate filter snapshot to keep consistent.
"""

from __future__ import annotations

import posixpath as pp

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .storage import file_size, list_names, read_json, resolve_fs, write_json_atomic

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.float32()),
        ("status", pa.int8()),
        ("attempt", pa.int32()),
        ("discovered_at", pa.int32()),
        ("parent_hash", pa.uint64()),
        ("link_index", pa.int32()),
        ("partition_id", pa.int32()),
    ]
)

DELTA_SCHEMA = pa.schema(
    [
        ("url_hash", pa.uint64()),
        ("status", pa.int8()),
        ("attempt", pa.int32()),
    ]
)

# row groups small enough that a top-K claim's heavy-column take reads a
# bounded slice of the partition, large enough for scan efficiency
_ROW_GROUP_SIZE = 65_536


def is_delta(path: str) -> bool:
    return path.rsplit("/", 1)[-1].startswith("del")


def base_paths(paths: list[str]) -> list[str]:
    """The files that carry full rows (v*/ins*), in list (= wave) order."""
    return [p for p in paths if not is_delta(p)]


def scatter_positions(order: np.ndarray, sorted_uh: np.ndarray, delta_uh: np.ndarray, ctx: str) -> np.ndarray:
    """Positions (in original row order) of ``delta_uh`` within the base rows
    whose sorted url_hash view is ``sorted_uh`` (with ``order`` the argsort).

    Membership is verified: a delta key absent from the base rows is an
    invariant violation (compaction bug, hand-edited manifest, partial file
    loss) and must fail loudly instead of silently corrupting whichever row
    sits at the insertion point."""
    ins = np.searchsorted(sorted_uh, delta_uh)
    bad = (ins >= len(sorted_uh)) | (sorted_uh[np.minimum(ins, max(len(sorted_uh) - 1, 0))] != delta_uh)
    if bad.any():
        raise ValueError(
            f"frontier corruption in {ctx}: {int(bad.sum())}/{len(delta_uh)} delta url_hash "
            "values are absent from the partition's base rows"
        )
    return order[ins]


def fold_paths(paths: list[str], columns: list[str] | None = None, filesystem=None) -> pa.Table:
    """Current partition state from its manifest file list.

    Base files concat in order; deltas scatter (status, attempt) by
    url_hash in order. Column pruning: deltas only touch status/attempt,
    so requests not involving them skip delta reads entirely.
    """
    bases = base_paths(paths)
    deltas = [p for p in paths if is_delta(p)]
    need_fold = bool(deltas) and (columns is None or "status" in columns or "attempt" in columns)
    read_cols = columns
    if need_fold and columns is not None:
        read_cols = list(dict.fromkeys([*columns, "url_hash", "status", "attempt"]))
    t = pa.concat_tables(
        [pq.read_table(p, columns=read_cols, filesystem=filesystem) for p in bases]
    ).combine_chunks()
    if not need_fold:
        return t
    uh = t["url_hash"].to_numpy().astype(np.uint64)
    order = np.argsort(uh, kind="stable")
    sorted_uh = uh[order]
    status = t["status"].to_numpy().copy()
    attempt = t["attempt"].to_numpy().copy()
    for dp in deltas:
        d = pq.read_table(dp, filesystem=filesystem)
        pos = scatter_positions(order, sorted_uh, d["url_hash"].to_numpy().astype(np.uint64), dp)
        status[pos] = d["status"].to_numpy()
        attempt[pos] = d["attempt"].to_numpy()
    t = t.set_column(t.schema.get_field_index("status"), "status", pa.array(status, pa.int8()))
    t = t.set_column(t.schema.get_field_index("attempt"), "attempt", pa.array(attempt, pa.int32()))
    if columns is not None:
        t = t.select(columns)
    return t


def take_rows(paths: list[str], indices: np.ndarray, columns: list[str], filesystem=None) -> pa.Table:
    """Row-group-pruned take of ``indices`` (ascending, global over the base
    files' concat order) reading only ``columns`` — the claim stage's heavy
    read (url/host for the selected top-K) touches O(K) row groups, not the
    partition's url column (VERDICT r1 "what's wrong" #2)."""
    out = []
    offset = 0
    for p in paths:
        pf = pq.ParquetFile(filesystem.open_input_file(p) if filesystem is not None else p)
        n = pf.metadata.num_rows
        local = indices[(indices >= offset) & (indices < offset + n)] - offset
        if len(local):
            sizes = np.array([pf.metadata.row_group(i).num_rows for i in range(pf.metadata.num_row_groups)])
            starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
            grp = np.searchsorted(starts, local, side="right") - 1
            kept = np.unique(grp)
            t = pf.read_row_groups(kept.tolist(), columns=columns)
            new_starts = np.concatenate([[0], np.cumsum(sizes[kept])[:-1]])
            pos = np.searchsorted(kept, grp)
            out.append(t.take(pa.array(local - starts[grp] + new_starts[pos])))
        offset += n
    return (
        pa.concat_tables(out)
        if out
        else pq.read_table(paths[0], columns=columns, filesystem=filesystem).slice(0, 0)
    )


class FrontierStore:
    def __init__(self, path: str, num_partitions: int, filesystem=None):
        self.fs, self.path = resolve_fs(path, filesystem)
        self.num_partitions = num_partitions

    # ------------------------------------------------------------ manifests
    def _manifest_path(self, wave: int) -> str:
        return pp.join(self.path, f"manifest-w{wave:05d}.json")

    def latest_wave(self) -> int:
        waves = [
            int(f[len("manifest-w") : -len(".json")])
            for f in list_names(self.fs, self.path)
            if f.startswith("manifest-w") and f.endswith(".json")
        ]
        if not waves:
            raise FileNotFoundError(f"no frontier manifests in {self.path}")
        return max(waves)

    def manifest(self, wave: int | None = None) -> dict:
        w = self.latest_wave() if wave is None else wave
        return read_json(self.fs, self._manifest_path(w))

    def commit(self, wave: int, partition_files: dict[int, list[str]], meta: dict) -> None:
        """Atomic wave commit: manifest written last (temp + move)."""
        m = {"wave": wave, "partitions": {str(k): v for k, v in sorted(partition_files.items())}, "meta": meta}
        write_json_atomic(self.fs, self._manifest_path(wave), m)

    # -------------------------------------------------------------- writes
    def _write(self, rel: str, table: pa.Table, schema: pa.Schema) -> str:
        full = pp.join(self.path, rel)
        self.fs.create_dir(pp.dirname(full), recursive=True)
        import uuid

        tmp = full + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(table.cast(schema), tmp, filesystem=self.fs, row_group_size=_ROW_GROUP_SIZE)
        self.fs.move(tmp, full)
        return rel

    def write_main(self, pid: int, table: pa.Table, wave: int) -> str:
        """Consolidated partition version for this wave (deterministic name)."""
        return self._write(pp.join(f"p{pid:04d}", f"v{wave + 1:05d}.parquet"), table, FRONTIER_SCHEMA)

    def write_inserts(self, pid: int, table: pa.Table, wave: int) -> str:
        """Rows discovered during this wave (deterministic name)."""
        return self._write(pp.join(f"p{pid:04d}", f"ins{wave + 1:05d}.parquet"), table, FRONTIER_SCHEMA)

    def write_delta(self, pid: int, table: pa.Table, wave: int) -> str:
        """This wave's (url_hash, status, attempt) flips (deterministic name)."""
        return self._write(pp.join(f"p{pid:04d}", f"del{wave + 1:05d}.parquet"), table, DELTA_SCHEMA)

    def write_push(self, pid: int, table: pa.Table, tag: str) -> str:
        """Externally-pushed rows (pushTasks analog) — content-tagged name so
        an identical re-push is idempotent."""
        return self._write(pp.join(f"p{pid:04d}", f"push-{tag}.parquet"), table, FRONTIER_SCHEMA)

    @classmethod
    def initialize(
        cls, path: str, seeds: pa.Table, num_partitions: int, meta: dict | None = None, filesystem=None
    ) -> "FrontierStore":
        """Create the store with the seed frontier as wave -1."""
        fs_store = cls(path, num_partitions, filesystem=filesystem)
        fs_store.fs.create_dir(fs_store.path, recursive=True)
        parts: dict[int, list[str]] = {}
        pid_col = seeds["partition_id"].to_numpy()
        for pid in range(num_partitions):  # every partition gets a file, even if empty
            sub = seeds.filter(pa.array(pid_col == pid))
            parts[pid] = [fs_store.write_main(pid, sub, wave=-2)]
        fs_store.commit(-1, parts, {"num_partitions": num_partitions, **(meta or {})})
        return fs_store

    # ---------------------------------------------------------------- reads
    def partition_files(self, wave: int | None = None) -> dict[int, list[str]]:
        m = self.manifest(wave)
        return {int(k): [pp.join(self.path, r) for r in v] for k, v in m["partitions"].items()}

    def file_size(self, rel: str) -> int:
        return file_size(self.fs, pp.join(self.path, rel))

    def base_row_count(self, wave: int | None = None) -> int:
        """Row count from base-file metadata only (deltas carry no rows)."""
        return sum(
            pq.read_metadata(f, filesystem=self.fs).num_rows
            for files in self.partition_files(wave).values()
            for f in base_paths(files)
        )

    def to_arrow(self, wave: int | None = None, columns: list[str] | None = None) -> pa.Table:
        """Current (delta-folded) frontier as one Arrow table."""
        return pa.concat_tables(
            [
                fold_paths(files, columns, filesystem=self.fs)
                for _, files in sorted(self.partition_files(wave).items())
            ]
        )

    def to_dataset(self, wave: int | None = None, columns: list[str] | None = None):
        """Streaming read of the delta-folded frontier (one task/partition)."""
        import ray.data as rd

        parts = [files for _, files in sorted(self.partition_files(wave).items())]
        cols = columns
        fs = self.fs

        def read_part(b: pa.Table) -> pa.Table:
            return pa.concat_tables([fold_paths(parts[int(i)], cols, filesystem=fs) for i in b["i"].to_pylist()])

        return (
            rd.from_items([{"i": i} for i in range(len(parts))])
            .repartition(len(parts))
            .map_batches(read_part, batch_size=1, batch_format="pyarrow")
        )
