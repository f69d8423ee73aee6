"""Distributed crawl engine: one Ray Data pipeline per wave, checkpointed.

The Ray-native restatement of the reference crawl loop (SURVEY.md §3.4).
Each wave:

  frontier scan (filter-at-read: WAIT ∧ attempt<cap, pruned columns)
    → per-partition top-k selection            [rule (a), groupby map_groups]
    → host-bucket fetch                         [FetchStage actor-pool groups]
    → DONE rows → DecodeStage (image+phash)     [actor-pool map_batches]
                → per-partition image fragments → Lance-style commit
    → DONE rows → out-link explode/canonicalize [vectorized map_batches]
                → within-wave dedup (min (parent_hash, link_index))
                → sharded bloom/cuckoo/exact dedup [DedupShard actors]
    → per-partition frontier update (status columns + inserts, anti-join
      defensive) → new partition versions → manifest-last wave commit.

Master/gRPC/Akka from the reference disappear: the driver is the scheduler,
Ray Data's streaming executor the dispatcher, partition ownership replaces
the global claim lock (QueueTaskServiceImpl.scala:57-66).

Scale notes: every shuffle here moves *wave-sized* data (≤ P × wave_cap
rows), never the whole frontier; the frontier itself is only read
filter-pruned and written partition-wise. Buckets (fetch, dedup) amortize
Python dispatch. Blocks stay Arrow end-to-end.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.hashing import hash64
from ..functions.urls import canonicalize, extract_host, host_partition
from ..sources.frontier import FRONTIER_SCHEMA, FrontierStore
from ..sources.lancelike import LanceLikeTable
from ..stages.crawl import DecodeStage, DedupShard, SelectAndFetch, ShardDedupGroup, extract_candidates
from . import semantics as sem
from . import synthweb as sw

_PA = {"batch_format": "pyarrow"}

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("partition_id", pa.int32()),
    ]
)

ORDER_SCHEMA = pa.schema(
    [
        ("wave", pa.int32()),
        ("vtime", pa.int64()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("partition_id", pa.int32()),
    ]
)


# tagged-union row kinds for the fused per-partition commit stage
KIND_IMAGE, KIND_ORDER, KIND_UPDATE, KIND_NEW = 0, 1, 2, 3

# superset schema all four branches are padded to before the union
SUPER_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),
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
        ("vtime", pa.int64()),
        ("wave", pa.int32()),
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

_SUPER_DEFAULTS = {
    pa.string(): "",
    pa.binary(): b"",
}


def _pad_super(t: pa.Table, kind: int, wave: int) -> pa.Table:
    """Project a branch's batch onto SUPER_SCHEMA (missing cols → defaults)."""
    n = t.num_rows
    cols = {}
    for f in SUPER_SCHEMA:
        if f.name == "kind":
            cols["kind"] = pa.array(np.full(n, kind, np.int8), pa.int8())
        elif f.name == "wave":
            cols["wave"] = pa.array(np.full(n, wave, np.int32), pa.int32())
        elif f.name == "discovered_at" and kind == KIND_NEW:
            cols["discovered_at"] = pa.array(np.full(n, wave + 1, np.int32), pa.int32())
        elif f.name in t.column_names:
            cols[f.name] = t[f.name].cast(f.type)
        else:
            default = _SUPER_DEFAULTS.get(f.type)
            if default is not None:
                cols[f.name] = pa.array([default] * n, f.type)
            else:
                cols[f.name] = pa.array(np.zeros(n, np.int64), pa.int64()).cast(f.type)
    return pa.table(cols).select([f.name for f in SUPER_SCHEMA])


class CommitPartition:
    """Fused per-partition wave commit: image fragment + order fragment +
    frontier partition version, written by the partition's one group task.

    Fragment/version names are deterministic (wave, pid) so a re-run of a
    failed wave rewrites identical files — combined with manifest-last
    commits this makes waves idempotent (the lease-recovery analog)."""

    def __init__(self, frontier_path: str, images_path: str, order_path: str, num_partitions: int, wave: int, part_files: dict):
        self.frontier_path = frontier_path
        self.images_path = images_path
        self.order_path = order_path
        self.P = num_partitions
        self.wave = wave
        self.part_files = part_files
        self.__name__ = f"CommitPartition(w{wave})"

    def __call__(self, g: pa.Table) -> pa.Table:
        wave = self.wave
        pid = g["partition_id"][0].as_py()
        kind = g["kind"].to_numpy()
        name = f"w{wave:05d}-p{pid:04d}"

        img = g.filter(pa.array(kind == KIND_IMAGE))
        img_rel = ""
        if img.num_rows:
            t = img.select([f.name for f in IMAGES_SCHEMA]).cast(IMAGES_SCHEMA)
            t = t.take(pc.sort_indices(t, sort_keys=[("image_id", "ascending")]))
            img_rel = LanceLikeTable(self.images_path).write_fragment(t, name=name)

        order = g.filter(pa.array(kind == KIND_ORDER))
        order_rel = ""
        if order.num_rows:
            t = order.select([f.name for f in ORDER_SCHEMA]).cast(ORDER_SCHEMA)
            t = t.take(pc.sort_indices(t, sort_keys=[("vtime", "ascending"), ("url_hash", "ascending")]))
            order_rel = LanceLikeTable(self.order_path).write_fragment(t, name=name)

        upd = g.filter(pa.array(kind == KIND_UPDATE))
        new = g.filter(pa.array(kind == KIND_NEW))
        front_rel = ""
        n_new = 0
        if upd.num_rows or new.num_rows:
            store = FrontierStore(self.frontier_path, self.P)
            old = pq.read_table(self.part_files[pid])
            uh = old["url_hash"].to_numpy().astype(np.uint64)
            status = old["status"].to_numpy().copy()
            attempt = old["attempt"].to_numpy().copy()
            if upd.num_rows:
                order_idx = np.argsort(uh, kind="stable")
                pos = order_idx[np.searchsorted(uh[order_idx], upd["url_hash"].to_numpy().astype(np.uint64))]
                status[pos] = upd["status"].to_numpy()
                attempt[pos] = upd["attempt"].to_numpy()
            cols = {nm: old[nm] for nm in old.column_names}
            cols["status"] = pa.array(status, pa.int8())
            cols["attempt"] = pa.array(attempt, pa.int32())
            out = pa.table(cols)
            if new.num_rows:
                mask = ~np.isin(new["url_hash"].to_numpy().astype(np.uint64), uh)  # defensive anti-join
                new = new.filter(pa.array(mask))
            n_new = new.num_rows
            if n_new:
                nt = new.select([f.name for f in FRONTIER_SCHEMA]).cast(FRONTIER_SCHEMA)
                nt = nt.take(pc.sort_indices(nt, sort_keys=[("url_hash", "ascending")]))
                out = pa.concat_tables([out, nt]).cast(FRONTIER_SCHEMA)
            front_rel = store.write_partition(pid, out, wave)

        return pa.table(
            {
                "pid": pa.array([pid], pa.int32()),
                "img_rel": pa.array([img_rel], pa.string()),
                "order_rel": pa.array([order_rel], pa.string()),
                "front_rel": pa.array([front_rel], pa.string()),
                "img_rows": pa.array([img.num_rows], pa.int64()),
                "order_rows": pa.array([order.num_rows], pa.int64()),
                "n_new": pa.array([n_new], pa.int64()),
            }
        )


class CrawlEngine:
    def __init__(
        self,
        root: str,
        cfg: sw.WebConfig,
        num_partitions: int = 8,
        num_shards: int = 4,
        wave_cap_per_partition: int = 50,
        fetch_buckets: int = 8,
        decode_batch_size: int = 64,
        decode_concurrency: int = 2,
    ):
        self.root = root
        self.cfg = cfg
        self.P = num_partitions
        self.S = num_shards
        self.K = wave_cap_per_partition
        self.B = fetch_buckets
        self.decode_batch_size = decode_batch_size
        self.decode_concurrency = decode_concurrency
        self.frontier = FrontierStore(os.path.join(root, "frontier"), num_partitions)
        self.images = LanceLikeTable(os.path.join(root, "images"))
        self.order = LanceLikeTable(os.path.join(root, "order"))
        self.shards: list | None = None

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def start(cls, root: str, cfg: sw.WebConfig, **kw) -> "CrawlEngine":
        """Initialize a new crawl: seed frontier + empty output tables."""
        eng = cls(root, cfg, **kw)
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, "config.json"), "w") as f:
            json.dump(
                {
                    "cfg": cfg.__dict__ | {"hot_hosts": list(cfg.hot_hosts)},
                    "num_partitions": eng.P,
                    "num_shards": eng.S,
                    "wave_cap_per_partition": eng.K,
                    "fetch_buckets": eng.B,
                },
                f,
            )
        seeds = eng._seed_table()
        FrontierStore.initialize(eng.frontier.path, seeds, eng.P)
        LanceLikeTable.create(eng.images.path)
        LanceLikeTable.create(eng.order.path)
        return eng

    @classmethod
    def resume(cls, root: str) -> "CrawlEngine":
        """Reopen from the last committed wave manifest (kill-restart path)."""
        with open(os.path.join(root, "config.json")) as f:
            c = json.load(f)
        raw = dict(c["cfg"])
        raw["hot_hosts"] = tuple(raw.get("hot_hosts", ()))
        cfg = sw.WebConfig(**raw)
        return cls(
            root,
            cfg,
            num_partitions=c["num_partitions"],
            num_shards=c["num_shards"],
            wave_cap_per_partition=c["wave_cap_per_partition"],
            fetch_buckets=c["fetch_buckets"],
        )

    def _seed_table(self) -> pa.Table:
        cfg = self.cfg
        urls = canonicalize(cfg.seed_urls())
        hosts = extract_host(urls)
        uh = hash64(urls)
        depth = np.zeros(len(uh), np.int32)
        return pa.table(
            {
                "url": urls,
                "url_hash": pa.array(uh, pa.uint64()),
                "host": hosts,
                "depth": pa.array(depth, pa.int32()),
                "priority": pa.array(sw.priority_of(uh, depth), pa.float32()),
                "status": pa.array(np.full(len(uh), sem.WAIT, np.int8), pa.int8()),
                "attempt": pa.array(np.zeros(len(uh), np.int32), pa.int32()),
                "discovered_at": pa.array(np.zeros(len(uh), np.int32), pa.int32()),
                "parent_hash": pa.array(np.zeros(len(uh), np.uint64), pa.uint64()),
                "link_index": pa.array(np.arange(len(uh), dtype=np.int32), pa.int32()),
                "partition_id": pa.array(host_partition(hosts, self.P, seed=cfg.seed), pa.int32()),
            }
        )

    # ---------------------------------------------------------- dedup shards
    def _ensure_shards(self) -> list:
        """Create DedupShard actors and bootstrap them from the committed
        frontier (the frontier IS the seen set — crash-consistent)."""
        if self.shards is not None:
            return self.shards
        cap = max(1 << 16, 4 * self.frontier_row_count())
        self.shards = [DedupShard.remote(s, capacity=cap, seed=self.cfg.seed) for s in range(self.S)]
        seen = self.frontier.to_arrow(columns=["url_hash"])["url_hash"].to_numpy().astype(np.uint64)
        sid = seen % np.uint64(self.S)
        ray.get([self.shards[s].bootstrap.remote(seen[sid == s]) for s in range(self.S)])
        return self.shards

    def frontier_row_count(self) -> int:
        return sum(pq.read_metadata(f).num_rows for f in self.frontier.partition_files().values())

    # ---------------------------------------------------------------- waves
    def run(self, max_waves: int = 20) -> dict:
        start_wave = self.frontier.latest_wave() + 1
        metrics = []
        for wave in range(start_wave, max_waves):
            m = self.run_wave(wave)
            if m is None:
                break
            metrics.append(m)
        return {"waves_run": len(metrics), "metrics": metrics}

    def _tuned_context(self):
        """Scale Ray Data's shuffle/read parallelism to the wave's real size.

        The defaults (min_parallelism=200, read_op_min_num_blocks=200) spawn
        hundreds of empty reduce tasks for wave-sized exchanges; a wave's
        natural parallelism is the partition count.
        """
        import contextlib

        @contextlib.contextmanager
        def tune():
            ctx = rd.DataContext.get_current()
            saved = (ctx.min_parallelism, ctx.read_op_min_num_blocks)
            ctx.min_parallelism = max(self.P, 2 * self.S)
            ctx.read_op_min_num_blocks = self.P
            try:
                yield
            finally:
                ctx.min_parallelism, ctx.read_op_min_num_blocks = saved

        return tune()

    def run_wave(self, wave: int) -> dict | None:
        with self._tuned_context():
            return self._run_wave_inner(wave)

    def _run_wave_inner(self, wave: int) -> dict | None:
        cfg, P = self.cfg, self.P
        shards = self._ensure_shards()
        part_files = self.frontier.partition_files()

        # ---- fused per-partition claim + fetch: one task per partition file,
        # no shuffle (partition ownership replaces the reference's global
        # claim lock). The partition manifest is the input dataset.
        parts_ds = rd.from_items(
            [{"pid": pid, "path": path} for pid, path in sorted(part_files.items())]
        ).repartition(len(part_files))
        fetched = (
            parts_ds.map_batches(SelectAndFetch(cfg, wave, self.K), batch_size=1, **_PA)
            .materialize()  # wave-sized working set, reused by 3 consumers
        )
        n_selected = fetched.count()
        if n_selected == 0:
            return None

        done = fetched.map_batches(lambda t: t.filter(pc.equal(t["status"], sem.DONE)), **_PA)

        # ---- everything downstream of fetch is ONE execution graph:
        #   decode(images) ─┐
        #   order rows     ─┤
        #   status updates ─┼─ union → groupby(partition_id) → CommitPartition
        #   candidates → groupby(shard) → dedup → new rows ─┘
        # Two internal shuffles total (shard exchange + partition exchange);
        # both move wave-sized data only.
        S = self.S
        images_rows = done.map_batches(
            DecodeStage(cfg),
            batch_size=self.decode_batch_size,
            **({"concurrency": self.decode_concurrency} if self.decode_concurrency else {}),
            **_PA,
        ).map_batches(lambda t: _pad_super(t, KIND_IMAGE, wave), **_PA)

        def keep_fetched(t: pa.Table) -> pa.Table:
            return _pad_super(t.filter(t["fetched"]), KIND_ORDER, wave)

        order_rows = fetched.map_batches(keep_fetched, **_PA)
        update_rows = fetched.map_batches(lambda t: _pad_super(t, KIND_UPDATE, wave), **_PA)

        cands = done.map_batches(lambda t: extract_candidates(t, cfg, P), **_PA)
        new_rows = (
            cands.map_batches(
                lambda t: t.append_column(
                    "shard", pa.array((t["url_hash"].to_numpy() % np.uint64(S)).astype(np.int32), pa.int32())
                ),
                **_PA,
            )
            .groupby("shard")
            .map_groups(ShardDedupGroup(shards), batch_format="pandas")
            .map_batches(lambda t: _pad_super(t.drop_columns(["shard"]), KIND_NEW, wave), **_PA)
        )

        committer = CommitPartition(
            self.frontier.path, self.images.path, self.order.path, self.P, wave, self.frontier.partition_files()
        )
        res = (
            images_rows.union(order_rows)
            .union(update_rows)
            .union(new_rows)
            .groupby("partition_id")
            .map_groups(committer, batch_format="pyarrow")
            .to_pandas()
        )

        # ---- wave commits (frontier manifest last = the wave commit point)
        self.images.commit([r for r in res["img_rel"] if r], meta={"wave": wave})
        self.order.commit([r for r in res["order_rel"] if r], meta={"wave": wave})
        merged = {int(k): v for k, v in self.frontier.manifest()["partitions"].items()}
        for _, r in res.iterrows():
            if r["front_rel"]:
                merged[int(r["pid"])] = r["front_rel"]
        meta = {
            "selected": int(n_selected),
            "fetched": int(res["order_rows"].sum()),
            "done": int(res["img_rows"].sum()),
            "new": int(res["n_new"].sum()),
        }
        self.frontier.commit(wave, merged, meta)
        return {"wave": wave, **meta}

    # --------------------------------------------------------------- export
    def crawl_order(self) -> pa.Table:
        """Global crawl order: (wave, vtime, url_hash) sort + fetch_seq."""
        t = self.order.to_arrow()
        if t.num_rows == 0:
            return t
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[("wave", "ascending"), ("vtime", "ascending"), ("url_hash", "ascending")]
            )
        )
        return t.add_column(0, "fetch_seq", pa.array(np.arange(t.num_rows), pa.int64()))

    def shutdown_shards(self) -> None:
        if self.shards:
            for s in self.shards:
                ray.kill(s)
            self.shards = None
