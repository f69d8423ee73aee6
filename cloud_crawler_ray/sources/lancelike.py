"""Lance-style versioned columnar table on parquet fragments + JSON manifests.

The north_rule's output format is "Lance tables of image + caption pairs".
pylance is not installable in this sandbox (no network), so this module
implements the same capability surface on parquet: immutable data fragments,
append-only versions, manifest-last atomic commits, version pinning /
time-travel reads. The API is narrow so real Lance can be dropped in.

Layout::

    table_dir/
      _versions/manifest-v000001.json   # {"version", "fragments", "meta", "parent"}
      data/<fragment>.parquet           # immutable

A version's manifest lists *all* fragments visible at that version. Commit
protocol: write fragments → write manifest to a temp name → atomic move.
A crashed writer leaves orphan fragments, never a broken table (the
resumable-output rule: re-runs skip versions that already committed).

All IO goes through ``pyarrow.fs`` (sources/storage.py): pass a
``filesystem`` handle or an ``s3://...`` path and the table is
backend-agnostic — the S3SaveRawProvider / Mongo-sink analogs collapse
into one path-agnostic store.
"""

from __future__ import annotations

import posixpath as pp
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from .storage import list_names, read_json, resolve_fs, write_json_atomic

_V_DIR = "_versions"
_D_DIR = "data"


class LanceLikeTable:
    def __init__(self, path: str, filesystem=None):
        self.fs, self.path = resolve_fs(path, filesystem)
        self.vdir = pp.join(self.path, _V_DIR)
        self.ddir = pp.join(self.path, _D_DIR)

    # ------------------------------------------------------------- creation
    @classmethod
    def create(cls, path: str, schema: pa.Schema | None = None, filesystem=None) -> "LanceLikeTable":
        t = cls(path, filesystem=filesystem)
        t.fs.create_dir(t.vdir, recursive=True)
        t.fs.create_dir(t.ddir, recursive=True)
        if t.latest_version() == 0:
            t._write_manifest(1, [], {"created": True})
        return t

    # ------------------------------------------------------------- versions
    def _manifest_path(self, version: int) -> str:
        return pp.join(self.vdir, f"manifest-v{version:06d}.json")

    def latest_version(self) -> int:
        versions = [
            int(f[len("manifest-v") : -len(".json")])
            for f in list_names(self.fs, self.vdir)
            if f.startswith("manifest-v") and f.endswith(".json")
        ]
        return max(versions, default=0)

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        return read_json(self.fs, self._manifest_path(v))

    def _write_manifest(self, version: int, fragments: list[str], meta: dict) -> None:
        m = {"version": version, "fragments": fragments, "meta": meta, "parent": version - 1}
        write_json_atomic(self.fs, self._manifest_path(version), m)

    # --------------------------------------------------------------- writes
    def write_fragment(self, table: pa.Table, name: str | None = None) -> str:
        """Write one immutable fragment (NOT yet visible) and return its relpath.

        Idempotent per name: a finished fragment file is left in place, so a
        re-run of a failed wave rewrites the same content.
        """
        name = name or f"frag-{uuid.uuid4().hex}"
        rel = pp.join(_D_DIR, f"{name}.parquet")
        full = pp.join(self.path, rel)
        tmp = full + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(table, tmp, filesystem=self.fs)
        self.fs.move(tmp, full)
        return rel

    def commit(self, new_fragments: list[str], meta: dict | None = None) -> int:
        """Append fragments as a new version (manifest-last atomic commit).

        Fragment names are deduplicated so a resumed wave that rewrites the
        same deterministic fragment names cannot double-register rows.
        """
        cur = self.latest_version()
        frags = list(self.manifest(cur)["fragments"]) if cur else []
        have = set(frags)
        frags += [f for f in new_fragments if f not in have]
        self._write_manifest(cur + 1, frags, meta or {})
        return cur + 1

    # ---------------------------------------------------------------- reads
    def fragment_paths(self, version: int | None = None) -> list[str]:
        return [pp.join(self.path, rel) for rel in self.manifest(version)["fragments"]]

    def to_dataset(self, version: int | None = None, columns: list[str] | None = None):
        """Open as a ray.data.Dataset (streaming read over the fragments)."""
        import ray.data as rd

        paths = self.fragment_paths(version)
        if not paths:
            return rd.from_arrow(pa.table({}))
        return rd.read_parquet(paths, columns=columns, filesystem=self.fs)

    def to_arrow(self, version: int | None = None, columns: list[str] | None = None) -> pa.Table:
        paths = self.fragment_paths(version)
        if not paths:
            return pa.table({})
        return pa.concat_tables([pq.read_table(p, columns=columns, filesystem=self.fs) for p in paths])

    def count_rows(self, version: int | None = None) -> int:
        return sum(pq.read_metadata(p, filesystem=self.fs).num_rows for p in self.fragment_paths(version))
