"""Partitioned, versioned frontier store with wave manifests.

The reference's frontier is a DB table with per-row status updates
(MongoQueueTaskProvider.scala:151-159 / projects_url). Here it is P
hostname-hash partitions (SURVEY.md §4.4); a wave commits a
``manifest-w{wave}.json`` mapping each partition to its current *file
list* — a consolidated main file plus (optionally) that wave's inserts
file:

    p0007/v00003.parquet        # main: all rows through wave 3's updates
    p0007/ins00003.parquet      # rows discovered during wave 3

The next wave's claim task reads the list and writes a consolidated
``v00004.parquet`` — compaction rides along with the claim, so no partition
ever holds more than two files. Commits are manifest-last: a crash mid-wave
leaves the previous manifest authoritative and the wave re-runs
idempotently (deterministic file names — the lease-recovery analog,
QueueTaskRecover.scala:31-46).

The frontier IS the URL-seen set (a URL enters at most once): dedup-shard
actors are rebuilt from the partitions' ``url_hash`` column on resume — no
separate filter snapshot to keep consistent.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

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


class FrontierStore:
    def __init__(self, path: str, num_partitions: int):
        self.path = path
        self.num_partitions = num_partitions

    # ------------------------------------------------------------ manifests
    def _manifest_path(self, wave: int) -> str:
        return os.path.join(self.path, f"manifest-w{wave:05d}.json")

    def latest_wave(self) -> int:
        waves = [
            int(f[len("manifest-w") : -len(".json")])
            for f in os.listdir(self.path)
            if f.startswith("manifest-w") and f.endswith(".json")
        ]
        if not waves:
            raise FileNotFoundError(f"no frontier manifests in {self.path}")
        return max(waves)

    def manifest(self, wave: int | None = None) -> dict:
        w = self.latest_wave() if wave is None else wave
        with open(self._manifest_path(w)) as f:
            return json.load(f)

    def commit(self, wave: int, partition_files: dict[int, list[str]], meta: dict) -> None:
        """Atomic wave commit: manifest written last (tmp + rename)."""
        m = {"wave": wave, "partitions": {str(k): v for k, v in sorted(partition_files.items())}, "meta": meta}
        tmp = self._manifest_path(wave) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path(wave))

    # -------------------------------------------------------------- writes
    def _write(self, rel: str, table: pa.Table) -> str:
        full = os.path.join(self.path, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        tmp = full + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(table.cast(FRONTIER_SCHEMA), tmp)
        os.replace(tmp, full)
        return rel

    def write_main(self, pid: int, table: pa.Table, wave: int) -> str:
        """Consolidated partition version for this wave (deterministic name)."""
        return self._write(os.path.join(f"p{pid:04d}", f"v{wave + 1:05d}.parquet"), table)

    def write_inserts(self, pid: int, table: pa.Table, wave: int) -> str:
        """Rows discovered during this wave (deterministic name)."""
        return self._write(os.path.join(f"p{pid:04d}", f"ins{wave + 1:05d}.parquet"), table)

    @classmethod
    def initialize(cls, path: str, seeds: pa.Table, num_partitions: int, meta: dict | None = None) -> "FrontierStore":
        """Create the store with the seed frontier as wave -1."""
        os.makedirs(path, exist_ok=True)
        fs = cls(path, num_partitions)
        parts: dict[int, list[str]] = {}
        pid_col = seeds["partition_id"].to_numpy()
        for pid in range(num_partitions):  # every partition gets a file, even if empty
            sub = seeds.filter(pa.array(pid_col == pid))
            parts[pid] = [fs.write_main(pid, sub, wave=-2)]
        fs.commit(-1, parts, {"num_partitions": num_partitions, **(meta or {})})
        return fs

    # ---------------------------------------------------------------- reads
    def partition_files(self, wave: int | None = None) -> dict[int, list[str]]:
        m = self.manifest(wave)
        return {int(k): [os.path.join(self.path, r) for r in v] for k, v in m["partitions"].items()}

    def _all_files(self, wave: int | None = None) -> list[str]:
        return [f for files in self.partition_files(wave).values() for f in files]

    def to_dataset(self, wave: int | None = None, columns: list[str] | None = None):
        import ray.data as rd

        return rd.read_parquet(sorted(self._all_files(wave)), columns=columns)

    def to_arrow(self, wave: int | None = None, columns: list[str] | None = None) -> pa.Table:
        return pa.concat_tables([pq.read_table(f, columns=columns) for f in sorted(self._all_files(wave))])
