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
from ..stages.crawl import DecodeStage, DedupRouter, DedupShard, FetchStage, extract_candidates
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

    def run_wave(self, wave: int) -> dict | None:
        cfg, P = self.cfg, self.P
        shards = self._ensure_shards()
        files = sorted(self.frontier.partition_files().values())

        # ---- selection: filter at the read, per-partition top-k
        elig = rd.read_parquet(
            files,
            columns=["url", "url_hash", "host", "depth", "priority", "attempt", "discovered_at", "partition_id"],
            filter=(pc.field("status") == sem.WAIT) & (pc.field("attempt") < cfg.max_attempts),
        )
        k = self.K

        def select_topk(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["priority", "url_hash"], kind="stable")
            return g.head(k)

        selected = elig.groupby("partition_id").map_groups(select_topk, batch_format="pandas")

        # ---- fetch: host-buckets so each host's politeness bucket is local
        fetch_seed = cfg.seed ^ 0xFE7C
        B = self.B

        def add_bucket(t: pa.Table) -> pa.Table:
            return t.append_column("fetch_bucket", pa.array(host_partition(t["host"], B, seed=fetch_seed), pa.int32()))

        fetched = (
            selected.map_batches(add_bucket, **_PA)
            .groupby("fetch_bucket")
            .map_groups(FetchStage(cfg, wave), batch_format="pandas")
            .materialize()  # wave-sized working set, reused by 3 consumers
        )
        n_selected = fetched.count()
        if n_selected == 0:
            return None

        done = fetched.map_batches(lambda t: t.filter(pc.equal(t["status"], sem.DONE)), **_PA)

        # ---- images: decode+phash actor pool, fragments per partition
        images_root = self.images.path

        def write_image_frag(g: pd.DataFrame) -> pd.DataFrame:
            pid = int(g["partition_id"].iloc[0])
            t = pa.Table.from_pandas(g, preserve_index=False).select([f.name for f in IMAGES_SCHEMA]).cast(IMAGES_SCHEMA)
            t = t.take(pc.sort_indices(t, sort_keys=[("image_id", "ascending")]))
            rel = LanceLikeTable(images_root).write_fragment(t, name=f"w{wave:05d}-p{pid:04d}")
            return pd.DataFrame({"pid": [pid], "rel": [rel], "rows": [len(g)]})

        img_frags = (
            done.map_batches(
                DecodeStage(cfg),
                batch_size=self.decode_batch_size,
                concurrency=self.decode_concurrency,
                **_PA,
            )
            .groupby("partition_id")
            .map_groups(write_image_frag, batch_format="pandas")
            .to_pandas()
        )
        if len(img_frags):
            self.images.commit(list(img_frags["rel"]), meta={"wave": wave})

        # ---- crawl-order log: one fragment per wave per partition
        order_root = self.order.path

        def write_order_frag(g: pd.DataFrame) -> pd.DataFrame:
            pid = int(g["partition_id"].iloc[0])
            t = pa.Table.from_pandas(g, preserve_index=False).select([f.name for f in ORDER_SCHEMA]).cast(ORDER_SCHEMA)
            t = t.take(pc.sort_indices(t, sort_keys=[("vtime", "ascending"), ("url_hash", "ascending")]))
            rel = LanceLikeTable(order_root).write_fragment(t, name=f"w{wave:05d}-p{pid:04d}")
            return pd.DataFrame({"pid": [pid], "rel": [rel], "rows": [len(g)]})

        def keep_fetched(t: pa.Table) -> pa.Table:
            t = t.filter(t["fetched"])
            return t.append_column("wave", pa.array(np.full(t.num_rows, wave, np.int32), pa.int32()))

        order_frags = (
            fetched.map_batches(keep_fetched, **_PA)
            .groupby("partition_id")
            .map_groups(write_order_frag, batch_format="pandas")
            .to_pandas()
        )
        if len(order_frags):
            self.order.commit(list(order_frags["rel"]), meta={"wave": wave})
        n_fetched = int(order_frags["rows"].sum()) if len(order_frags) else 0

        # ---- out-links → candidates → within-wave dedup → sharded dedup
        cands = done.map_batches(lambda t: extract_candidates(t, cfg, P), **_PA)

        def wave_dedup(g: pd.DataFrame) -> pd.DataFrame:
            # rule §4.3(c): first discovery within the wave = min (parent_hash, link_index)
            g = g.sort_values(["url_hash", "parent_hash", "link_index"], kind="stable")
            return g.drop_duplicates("url_hash", keep="first")

        deduped = (
            cands.map_batches(
                lambda t: t.append_column(
                    "dedup_bucket", pa.array((t["url_hash"].to_numpy() % np.uint64(64)).astype(np.int32), pa.int32())
                ),
                **_PA,
            )
            .groupby("dedup_bucket")
            .map_groups(wave_dedup, batch_format="pandas")
            .drop_columns(["dedup_bucket"])
        )
        fresh = deduped.map_batches(DedupRouter(shards), **_PA)

        def as_frontier_rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "url": t["url"],
                    "url_hash": t["url_hash"],
                    "host": t["host"],
                    "depth": t["depth"],
                    "priority": t["priority"],
                    "status": pa.array(np.full(n, sem.WAIT, np.int8), pa.int8()),
                    "attempt": pa.array(np.zeros(n, np.int32), pa.int32()),
                    "discovered_at": pa.array(np.full(n, wave + 1, np.int32), pa.int32()),
                    "parent_hash": t["parent_hash"],
                    "link_index": t["link_index"],
                    "partition_id": t["partition_id"],
                    "is_new": pa.array(np.ones(n, bool), pa.bool_()),
                }
            )

        new_rows = fresh.map_batches(as_frontier_rows, **_PA)

        # ---- frontier partition update (status columns + inserts)
        def as_update_rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            z64 = pa.array(np.zeros(n, np.uint64), pa.uint64())
            return pa.table(
                {
                    "url": pa.array([""] * n, pa.string()),
                    "url_hash": t["url_hash"],
                    "host": t["host"],
                    "depth": t["depth"],
                    "priority": pa.array(np.zeros(n, np.float32), pa.float32()),
                    "status": t["status"],
                    "attempt": t["attempt"],
                    "discovered_at": pa.array(np.zeros(n, np.int32), pa.int32()),
                    "parent_hash": z64,
                    "link_index": pa.array(np.zeros(n, np.int32), pa.int32()),
                    "partition_id": t["partition_id"],
                    "is_new": pa.array(np.zeros(n, bool), pa.bool_()),
                }
            )

        updates = fetched.map_batches(as_update_rows, **_PA)
        part_files = self.frontier.partition_files()
        frontier_path = self.frontier.path
        num_partitions = self.P

        def update_partition(g: pd.DataFrame) -> pd.DataFrame:
            pid = int(g["partition_id"].iloc[0])
            store = FrontierStore(frontier_path, num_partitions)
            old = pq.read_table(part_files[pid])
            uh = old["url_hash"].to_numpy().astype(np.uint64)
            status = old["status"].to_numpy().copy()
            attempt = old["attempt"].to_numpy().copy()
            upd = g[~g["is_new"]]
            if len(upd):
                order = np.argsort(uh, kind="stable")
                pos = order[np.searchsorted(uh[order], upd["url_hash"].to_numpy().astype(np.uint64))]
                status[pos] = upd["status"].to_numpy()
                attempt[pos] = upd["attempt"].to_numpy()
            cols = {name: old[name] for name in old.column_names}
            cols["status"] = pa.array(status, pa.int8())
            cols["attempt"] = pa.array(attempt, pa.int32())
            out = pa.table(cols)
            new = g[g["is_new"]]
            if len(new):
                mask = ~np.isin(new["url_hash"].to_numpy().astype(np.uint64), uh)  # defensive anti-join
                new = new[mask]
            if len(new):
                nt = pa.Table.from_pandas(new.drop(columns=["is_new"]), preserve_index=False).cast(FRONTIER_SCHEMA)
                nt = nt.take(pc.sort_indices(nt, sort_keys=[("url_hash", "ascending")]))
                out = pa.concat_tables([out, nt]).cast(FRONTIER_SCHEMA)
            rel = store.write_partition(pid, out, wave)
            return pd.DataFrame({"pid": [pid], "rel": [rel], "n_new": [int(len(new))], "rows": [out.num_rows]})

        upd_res = (
            updates.union(new_rows)
            .groupby("partition_id")
            .map_groups(update_partition, batch_format="pandas")
            .to_pandas()
        )

        # ---- wave commit (manifest-last)
        merged = {int(k): v for k, v in self.frontier.manifest()["partitions"].items()}
        for _, r in upd_res.iterrows():
            merged[int(r["pid"])] = r["rel"]
        meta = {
            "selected": int(n_selected),
            "fetched": int(n_fetched),
            "done": int(img_frags["rows"].sum()) if len(img_frags) else 0,
            "new": int(upd_res["n_new"].sum()),
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
