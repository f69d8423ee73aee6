"""Distributed crawl engine: one Ray Data pipeline per wave, checkpointed.

The Ray-native restatement of the reference crawl loop (SURVEY.md §3.4),
engineered down to ONE all-to-all exchange per wave:

  execution 1 — claim+fetch+commit, zero exchanges:
    partition manifest → map_batches(SelectFetchCommit): each task owns one
    hostname-hash partition — reads its file list, takes the top-k claim
    [rule (a)], runs politeness-ordered host fetches [rules (b)-(d)],
    writes the consolidated partition version (status/attempt columns) and
    the wave's crawl-order fragment, and emits light fetch rows.

  execution 2 — three branches, one exchange:
    DONE rows → DecodeWriteBatch  (image decode+phash+fragment write; plain
                map_batches — bytes never cross an exchange)           ─┐
    DONE rows → out-link explode/canonicalize → CheckRouter (sharded   ─┼→ union
                bloom/cuckoo/exact seen pre-filter, check-only)         │  of tiny
              → groupby(partition_id) → InsertPartition (wave keep-     │  metrics
                first §4.3(c), exact anti-join, inserts file)          ─┘  rows
    marker rows → manifest bookkeeping

  then the driver writes the three manifests, frontier last (the wave
  commit point).

Master/gRPC/Akka from the reference disappear: the driver is the scheduler,
Ray Data's streaming executor the dispatcher, partition ownership replaces
the global claim lock (QueueTaskServiceImpl.scala:57-66).

Scale notes: the only exchanged rows are pre-filtered out-link candidates
(wave-sized, light columns); the frontier is read and written partition-
wise; image bytes are produced and written at their destination task;
every file name is deterministic in (wave, partition | content) so waves
re-run idempotently after a crash.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.hashing import hash64
from ..functions.urls import canonicalize, extract_host, host_partition
from ..sources.frontier import FrontierStore
from ..sources.lancelike import LanceLikeTable
from ..stages.crawl import (
    MARKER_STATUS,
    CheckRouter,
    DecodeStage,
    DedupShard,
    InsertPartition,
    SelectFetchCommit,
    extract_candidates,
)
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

_RESULT_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("pid", pa.int32()),
        ("rel", pa.string()),
        ("rel2", pa.string()),
        ("n1", pa.int64()),
    ]
)


def _result_row(src: str, pid: int, rel: str = "", rel2: str = "", n1: int = 0) -> pa.Table:
    """One metrics row — shared schema so all branches union into one
    execution and the driver reads a single tiny result table."""
    return pa.table(
        {
            "src": pa.array([src], pa.string()),
            "pid": pa.array([pid], pa.int32()),
            "rel": pa.array([rel], pa.string()),
            "rel2": pa.array([rel2], pa.string()),
            "n1": pa.array([n1], pa.int64()),
        }
    )


def _empty_result() -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in _RESULT_SCHEMA})


class DecodeWriteBatch:
    """Image decode + phash + fragment write, one fragment per input batch.

    Plain ``map_batches`` over the DONE rows — no exchange at all for the
    image path: bytes are produced exactly where the fragment is written,
    and uniform batch sizes keep decode tasks even regardless of host or
    partition skew (the hot-domain salting analog for the payload stage).
    The fragment name derives from the batch's minimum url_hash (disjoint
    batches → unique names); cross-run idempotency comes from the
    commit-by-wave guard in run_wave, task-retry idempotency from
    deterministic blocks of the materialized fetch output."""

    def __init__(self, images_path: str, wave: int, cfg: sw.WebConfig):
        self.images_path = images_path
        self.wave = wave
        self.decode = DecodeStage(cfg)
        self.__name__ = f"DecodeWriteBatch(w{wave})"

    def __call__(self, g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty_result()
        t = self.decode(g.select(["url_hash", "partition_id"]))
        t = t.select([f.name for f in IMAGES_SCHEMA]).cast(IMAGES_SCHEMA)
        t = t.take(pc.sort_indices(t, sort_keys=[("image_id", "ascending")]))
        name = f"w{self.wave:05d}-h{int(g['url_hash'].to_numpy().min()):016x}"
        rel = LanceLikeTable(self.images_path).write_fragment(t, name=name)
        return _result_row("img", -1, rel=rel, n1=t.num_rows)


class CrawlEngine:
    def __init__(
        self,
        root: str,
        cfg: sw.WebConfig,
        num_partitions: int = 8,
        num_shards: int = 4,
        wave_cap_per_partition: int = 50,
        fetch_buckets: int = 8,  # kept for config compat; partition tasks ARE the fetch buckets
        decode_batch_size: int = 64,
        decode_concurrency: int | None = None,
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
                    "cfg": eng.cfg.__dict__ | {"hot_hosts": list(eng.cfg.hot_hosts)},
                    "num_partitions": eng.P,
                    "num_shards": eng.S,
                    "wave_cap_per_partition": eng.K,
                    "fetch_buckets": eng.B,
                    "decode_batch_size": eng.decode_batch_size,
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
            fetch_buckets=c.get("fetch_buckets", 8),
            decode_batch_size=c.get("decode_batch_size", 64),
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
        return sum(pq.read_metadata(f).num_rows for f in self.frontier._all_files())

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
            import multiprocessing

            ncpu = multiprocessing.cpu_count()
            ctx.min_parallelism = max(self.P, 2 * ncpu)
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
        import time as _time

        t_start = _time.time()
        cfg, P = self.cfg, self.P
        shards = self._ensure_shards()
        part_files = self.frontier.partition_files()
        old_manifest = self.frontier.manifest()

        # ---- execution 1: per-partition claim + fetch + status commit
        parts_ds = rd.from_items(
            [{"pid": pid, "paths": paths} for pid, paths in sorted(part_files.items())]
        ).repartition(len(part_files))
        stage1 = SelectFetchCommit(cfg, wave, self.K, self.frontier.path, self.order.path, P)
        fetched = parts_ds.map_batches(stage1, batch_size=1, **_PA).materialize()
        n_rows = fetched.count()
        t_fetch = _time.time() - t_start
        if n_rows == 0:
            return None  # frontier drained — nothing claimed anywhere

        # ---- execution 2: decode branch + insert branch + marker rows
        done = fetched.map_batches(lambda t: t.filter(pc.equal(t["status"], sem.DONE)), **_PA)

        def markers_to_result(t: pa.Table) -> pa.Table:
            m = t.filter(pc.equal(t["status"], MARKER_STATUS))
            if m.num_rows == 0:
                return _empty_result()
            return pa.table(
                {
                    "src": pa.array(["main"] * m.num_rows, pa.string()),
                    "pid": m["partition_id"],
                    "rel": m["url"],
                    "rel2": m["host"],
                    "n1": m["vtime"],
                }
            )

        marker_branch = fetched.map_batches(markers_to_result, **_PA)
        img_branch = done.map_batches(
            DecodeWriteBatch(self.images.path, wave, cfg), batch_size=self.decode_batch_size, **_PA
        )
        ins_branch = (
            done.map_batches(lambda t: extract_candidates(t, cfg, P), **_PA)
            .map_batches(CheckRouter(shards), **_PA)
            .groupby("partition_id")
            .map_groups(InsertPartition(self.frontier.path, P, wave, part_files, shards), batch_format="pandas")
        )
        res = marker_branch.union(img_branch).union(ins_branch).to_pandas()
        t_commit = _time.time() - t_start - t_fetch

        mains = res[res["src"] == "main"]
        n_selected = n_rows - len(mains)
        if n_selected == 0:
            return None  # nothing crawled (consolidation-only markers possible)

        # ---- manifests (frontier last = the wave commit point); a table
        # whose latest version already carries this wave id is not
        # re-committed (crash between commits → idempotent re-run)
        imgs = res[res["src"] == "img"]
        ins = res[res["src"] == "ins"]
        if self.images.manifest().get("meta", {}).get("wave") != wave:
            self.images.commit([r for r in imgs["rel"] if r], meta={"wave": wave})
        if self.order.manifest().get("meta", {}).get("wave") != wave:
            self.order.commit([r for r in mains["rel2"] if r], meta={"wave": wave})
        part_lists = {int(k): list(v) for k, v in old_manifest["partitions"].items()}
        for _, r in mains.iterrows():
            part_lists[int(r["pid"])] = [r["rel"]]
        for _, r in ins.iterrows():
            part_lists[int(r["pid"])].append(r["rel"])
        meta = {
            "selected": int(n_selected),
            "fetched": int(mains["n1"].sum()),
            "done": int(imgs["n1"].sum()),
            "new": int(ins["n1"].sum()),
            "t_fetch": round(t_fetch, 2),
            "t_commit": round(t_commit, 2),
        }
        self.frontier.commit(wave, part_lists, meta)
        return {"wave": wave, **meta}

    # --------------------------------------------------------------- export
    def metrics_table(self) -> pa.Table:
        """Per-wave metrics from the committed manifests (the notification /
        events-log analog, BaseNotification.scala:3-5 → metrics rows)."""
        rows = []
        for w in range(self.frontier.latest_wave() + 1):
            try:
                m = self.frontier.manifest(w)
            except FileNotFoundError:
                continue
            rows.append({"wave": w, **{k: v for k, v in m.get("meta", {}).items() if isinstance(v, (int, float))}})
        if not rows:
            return pa.table({"wave": pa.array([], pa.int32())})
        return pa.Table.from_pylist(rows)

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
