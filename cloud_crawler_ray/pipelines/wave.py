"""Distributed crawl engine: one Ray Data pipeline per wave, checkpointed.

The Ray-native restatement of the reference crawl loop (SURVEY.md §3.4),
round-2 shape — pipeline hooks threaded end-to-end, status-delta commits,
pruned claims, host-level fetch fan-out:

  execution 1 — claim (and for light pipelines, fetch):
    partition manifest → map_batches(ClaimStage): one task per hostname-hash
    partition folds ONLY the light columns (url_hash/priority/status/attempt
    + deltas) for the top-k claim [rule (a)], row-group-takes the selected
    rows' heavy columns, runs the validator hook (skip-routing), and — when
    the pipeline's fetcher is light (outcome pure in url_hash, the synthetic
    default) — the politeness-ordered host fetch [rules (b)-(d)]. io
    pipelines instead tag rows with a per-(partition, host) fetch_group and
    a groupby fans every host out to its own fetch task running the user's
    fetcher/parser — a hot or slow host no longer serializes its partition.

  execution 2 — branches, ONE all-to-all exchange:
    DONE rows → SaveParsedBatch  (pipeline.save_parsed sink; image decode +
                phash + fragment write for the synthetic default — bytes
                never cross an exchange)                                ─┐
    DONE rows → AttachParse (light) → out-link explode/canonicalize →   ─┼→ union
                CheckRouter (sharded seen pre-filter, check-only)        │  of tiny
    all rows  → status commit rows                                       │  metrics
              → groupby(partition_id) → CommitPartition (status-delta    │  rows
                file + order fragment + keep-first/anti-join inserts)   ─┘
    body rows → SaveParsedBatch(save_raw) (io pipelines only)

  then the driver writes the table manifests, frontier last (the wave
  commit point).

Master/gRPC/Akka from the reference disappear: the driver is the scheduler,
Ray Data's streaming executor the dispatcher, partition ownership replaces
the global claim lock (QueueTaskServiceImpl.scala:57-66).

Scale notes: a wave commits O(wave)-sized delta files, not O(frontier)
rewrites (compaction amortized over compact_files waves); claim reads are
pruned to light columns + K selected rows; the only exchanged rows are
pre-filtered out-link candidates and per-row status flips (both wave-sized,
light columns); payload bytes are produced and written at their destination
task; every file name is deterministic in (wave, partition | content) so
waves re-run idempotently after a crash.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import hash64
from ..functions.urls import canonicalize, extract_host, host_partition
from ..sources.frontier import FrontierStore
from ..sources.lancelike import LanceLikeTable
from ..stages.crawl import (
    COMMIT_SCHEMA,
    IMAGES_SCHEMA,  # noqa: F401  (re-export; external callers read it from here)
    ORDER_SCHEMA,  # noqa: F401
    AttachParse,
    CheckRouter,
    ClaimStage,
    CommitPartition,
    DedupShard,
    FetchHostGroup,
    SaveParsedBatch,
    extract_candidates,
)
from . import semantics as sem
from . import synthweb as sw
from .api import CrawlPipeline, synthetic_pipeline

_PA = {"batch_format": "pyarrow"}


def _as_commit_status(t: pa.Table) -> pa.Table:
    n = t.num_rows
    return pa.table(
        {
            "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
            "partition_id": t["partition_id"],
            # status commits key on url_hash; the url string (the widest
            # column) never needs to cross the exchange
            "url": pa.array([""] * n, pa.string()),
            "url_hash": t["url_hash"],
            "host": t["host"],
            "depth": t["depth"],
            "priority": t["priority"],
            "parent_hash": pa.array(np.zeros(n, np.uint64), pa.uint64()),
            "link_index": pa.array(np.zeros(n, np.int32), pa.int32()),
            "status": t["status"],
            "attempt": t["attempt"],
            "vtime": t["vtime"],
            "fetched": t["fetched"],
        }
    ).cast(COMMIT_SCHEMA)


def _as_commit_cand(t: pa.Table) -> pa.Table:
    n = t.num_rows
    return pa.table(
        {
            "kind": pa.array(np.ones(n, np.int8), pa.int8()),
            "partition_id": t["partition_id"],
            "url": t["url"],
            "url_hash": t["url_hash"],
            "host": t["host"],
            "depth": t["depth"],
            "priority": t["priority"],
            "parent_hash": t["parent_hash"],
            "link_index": t["link_index"],
            "status": pa.array(np.full(n, sem.WAIT, np.int8), pa.int8()),
            "attempt": pa.array(np.zeros(n, np.int32), pa.int32()),
            "vtime": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "fetched": pa.array(np.zeros(n, bool), pa.bool_()),
        }
    ).cast(COMMIT_SCHEMA)


@ray.remote
def _bootstrap_partition(paths: list[str], shards: list, num_shards: int, filesystem=None) -> int:
    """Feed one frontier partition's committed url_hash values to the dedup
    shard actors — runs as a Ray task so the driver never holds frontier
    hashes (VERDICT r2 fix #1: shard bootstrap peak memory is per-task
    O(frontier/P), driver-side O(1)). ``filesystem`` is the store's
    pyarrow.fs handle (ships with the task) so custom/credentialed backends
    keep working off-driver."""
    import pyarrow.parquet as pq

    from ..sources import frontier as fsrc

    bases = fsrc.base_paths(list(paths))
    cols = [
        pq.read_table(p, columns=["url_hash"], filesystem=filesystem)["url_hash"].to_numpy()
        for p in bases
    ]
    if not cols:
        return 0
    h = np.concatenate(cols).astype(np.uint64)
    if not len(h):
        return 0
    sid = h % np.uint64(num_shards)
    futs = [shards[s].bootstrap.remote(h[sid == s]) for s in range(num_shards) if (sid == s).any()]
    ray.get(futs)
    return len(h)


@ray.remote
def _push_partition(
    frontier_path: str, num_partitions: int, pid: int, paths: list[str], sub: pa.Table, filesystem=None
) -> tuple[int, str, np.ndarray]:
    """One partition's share of pushTasks: exact anti-join confirm against
    committed rows (seen_mask — keys-sidecar zone maps + appended files)
    and the content-tagged push-file write, off-driver. Returns (pid,
    relpath or '', fresh url_hash array) for the driver's manifest fold."""
    import hashlib

    import pyarrow.compute as pc

    from ..sources import frontier as fsrc
    from ..sources.frontier import FrontierStore

    already = fsrc.seen_mask(
        list(paths), sub["url_hash"].to_numpy().astype(np.uint64), filesystem=filesystem
    )
    fresh = sub.filter(pa.array(~already))
    if fresh.num_rows == 0:
        return pid, "", np.empty(0, np.uint64)
    fresh = fresh.take(pc.sort_indices(fresh, sort_keys=[("url_hash", "ascending")]))
    h = fresh["url_hash"].to_numpy().astype(np.uint64)
    tag = hashlib.sha256(h.tobytes()).hexdigest()[:12]
    store = FrontierStore(frontier_path, num_partitions, filesystem=filesystem)
    rel = store.write_push(pid, fresh, tag)
    return pid, rel, h


@ray.remote
def _wave_done_partition(
    frontier_path: str, pid: int, paths: list[str], wave: int, filesystem=None
) -> list[str]:
    """URLs that reached DONE in ``wave`` within one partition: the wave's
    delta names the hashes (O(wave)), the sorted-keys sidecar maps hash →
    row_idx via zone-map-pruned row-group reads, and take_rows pulls just
    those rows' url column — never a full-partition url fold (VERDICT r2
    fix #4). Only a genuinely MISSING delta file means "partition had no
    status commit this wave"; any other read error propagates — swallowing
    it would silently drop chained seeds."""
    import posixpath as pp

    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    from ..sources import frontier as fsrc
    from ..sources.storage import resolve_fs

    fs, root = resolve_fs(frontier_path, filesystem)
    paths = list(paths)
    del_path = pp.join(root, f"p{pid:04d}", f"del{wave + 1:05d}.parquet")
    if fs.get_file_info(del_path).type == pafs.FileType.NotFound:
        return []
    d = pq.read_table(del_path, filesystem=fs)
    want = (
        d.filter(pc.equal(d["status"], sem.DONE))["url_hash"].to_numpy().astype(np.uint64)
    )
    if not len(want):
        return []
    found, ridx, uncovered = fsrc.keys_lookup(paths, want, filesystem=fs)
    urls: list[str] = []
    if found.any():
        idx = np.sort(ridx[found])
        urls.extend(
            fsrc.take_rows(fsrc.base_paths(paths), idx, ["url"], filesystem=fs)["url"].to_pylist()
        )
    rest = want[~found]
    if len(rest):
        for p in uncovered:
            t = pq.read_table(p, columns=["url", "url_hash"], filesystem=fs)
            m = np.isin(t["url_hash"].to_numpy().astype(np.uint64), rest)
            if m.any():
                urls.extend(t.filter(pa.array(m))["url"].to_pylist())
    return urls


class CrawlEngine:
    def __init__(
        self,
        root: str,
        cfg: sw.WebConfig,
        num_partitions: int = 8,
        num_shards: int = 4,
        wave_cap_per_partition: int = 50,
        fetch_buckets: int = 8,  # kept for config compat; host fetch groups ARE the buckets
        decode_batch_size: int = 64,
        decode_concurrency: int | None = None,
        compact_files: int = 8,
        pipeline: CrawlPipeline | None = None,
        filesystem=None,
    ):
        self.cfg = cfg
        self.P = num_partitions
        self.S = num_shards
        self.K = wave_cap_per_partition
        self.B = fetch_buckets
        self.decode_batch_size = decode_batch_size
        self.decode_concurrency = decode_concurrency
        self.compact_files = compact_files
        self.pipeline = pipeline if pipeline is not None else synthetic_pipeline(cfg)
        # one pyarrow.fs handle for the whole job (None → local); every
        # store and remote task reads/writes through it, so a crawl runs
        # unchanged against any non-local backend (tests drive this with a
        # latency-injecting wrapper — sources/storage.py). self.root is the
        # NORMALIZED path (a URI root like s3://bucket/crawl resolves to
        # its fs + scheme-less path here, once, for every child store and
        # every config/manifest access)
        from ..sources.storage import resolve_fs

        self.fs, self.root = resolve_fs(root, filesystem)
        self.frontier = FrontierStore(os.path.join(self.root, "frontier"), num_partitions, filesystem=self.fs)
        self.images = LanceLikeTable(os.path.join(self.root, "images"), filesystem=self.fs)  # parsed table
        self.raw = LanceLikeTable(os.path.join(self.root, "raw"), filesystem=self.fs)
        self.order = LanceLikeTable(os.path.join(self.root, "order"), filesystem=self.fs)
        self.shards: list | None = None

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def start(cls, root: str, cfg: sw.WebConfig, **kw) -> "CrawlEngine":
        """Initialize a new crawl: seed frontier + empty output tables."""
        from ..sources.storage import write_json_atomic

        eng = cls(root, cfg, **kw)
        fs = eng.fs
        fs.create_dir(eng.root, recursive=True)
        write_json_atomic(
            fs,
            os.path.join(eng.root, "config.json"),
            {
                "cfg": eng.cfg.__dict__ | {"hot_hosts": list(eng.cfg.hot_hosts)},
                "num_partitions": eng.P,
                "num_shards": eng.S,
                "wave_cap_per_partition": eng.K,
                "fetch_buckets": eng.B,
                "decode_batch_size": eng.decode_batch_size,
                "compact_files": eng.compact_files,
                "task_type": eng.pipeline.task_type,
            },
        )
        seeds = eng._seed_table()
        FrontierStore.initialize(eng.frontier.path, seeds, eng.P, filesystem=eng.frontier.fs)
        LanceLikeTable.create(eng.images.path, filesystem=eng.images.fs)
        LanceLikeTable.create(eng.order.path, filesystem=eng.order.fs)
        if eng.pipeline.save_raw is not None:
            LanceLikeTable.create(eng.raw.path, filesystem=eng.raw.fs)
        return eng

    @classmethod
    def resume(
        cls, root: str, pipeline: CrawlPipeline | None = None, filesystem=None
    ) -> "CrawlEngine":
        """Reopen from the last committed wave manifest (kill-restart path).

        Hooks are code, not state: a custom-pipeline job must be resumed
        with the same ``pipeline`` it started with (None → synthetic) and,
        for non-local roots, the same ``filesystem`` handle."""
        from ..sources.storage import read_json, resolve_fs

        rfs, root = resolve_fs(root, filesystem)
        c = read_json(rfs, os.path.join(root, "config.json"))
        raw = dict(c["cfg"])
        raw["hot_hosts"] = tuple(raw.get("hot_hosts", ()))
        cfg = sw.WebConfig(**raw)
        eng = cls(
            root,
            cfg,
            num_partitions=c["num_partitions"],
            num_shards=c["num_shards"],
            wave_cap_per_partition=c["wave_cap_per_partition"],
            fetch_buckets=c.get("fetch_buckets", 8),
            decode_batch_size=c.get("decode_batch_size", 64),
            compact_files=c.get("compact_files", 8),
            pipeline=pipeline,
            filesystem=rfs,  # root is already normalized — don't re-resolve a URI as local
        )
        stored = c.get("task_type")
        if stored is not None and eng.pipeline.task_type != stored:
            raise ValueError(
                f"resume pipeline mismatch: job at {root!r} was started with task_type "
                f"{stored!r} but resume() was given {eng.pipeline.task_type!r} — a resumed "
                "job must use the same pipeline it started with (hooks are code, not state)"
            )
        return eng

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
        frontier (the frontier IS the seen set — crash-consistent). One Ray
        task per partition reads its hash column and feeds the shard actors
        directly; the driver only holds ObjectRefs (VERDICT r2 fix #1)."""
        if self.shards is not None:
            return self.shards
        cap = max(1 << 16, 4 * self.frontier_row_count())
        self.shards = [DedupShard.remote(s, capacity=cap, seed=self.cfg.seed) for s in range(self.S)]
        futs = [
            _bootstrap_partition.remote(paths, self.shards, self.S, self.frontier.fs)
            for _, paths in sorted(self.frontier.partition_files().items())
        ]
        ray.get(futs)
        return self.shards

    # per-shard bloom ship budget for CheckRouter's router-local pre-check:
    # small frontiers broadcast the blooms once per wave (128 KB–8 MB); a
    # 10^10-URL frontier's shards exceed it and keep the RPC-only path
    _BLOOM_SHIP_MAX_BYTES = 8 << 20

    def _bloom_snapshots_ref(self, shards):
        """ObjectRef to the wave-start list of per-shard bloom snapshots
        (None entries for shards over budget), or None when nothing ships.
        One broadcast per wave — readers (CheckRouter tasks) restore once
        per process and answer definitely-new rows locally, RPC-free."""
        snaps = ray.get([s.bloom_snapshot.remote(self._BLOOM_SHIP_MAX_BYTES) for s in shards])
        if all(s is None for s in snaps):
            return None
        return ray.put(snaps)

    def frontier_row_count(self) -> int:
        return self.frontier.base_row_count()

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
        cfg, P, pl = self.cfg, self.P, self.pipeline
        shards = self._ensure_shards()
        bloom_ref = self._bloom_snapshots_ref(shards)
        part_files = self.frontier.partition_files()
        old_manifest = self.frontier.manifest()
        # bench evidence for the O(backlog) claim scan (VERDICT r2 #1):
        # bytes the claim stage will read for candidate selection this wave.
        # O(P) driver-side footer/stat calls, so auto-disabled for large P
        # (at 10^4 partitions on an object store this would add seconds per
        # wave for a metric) — claim_bytes is then reported as -1.
        claim_bytes = self.frontier.claim_scan_bytes() if self.P <= 256 else -1

        # ---- execution 1: pruned per-partition claim (+ light fetch, whose
        # status delta + order fragment are written inside the claim task)
        parts_ds = rd.from_items(
            [{"pid": pid, "paths": paths} for pid, paths in sorted(part_files.items())]
        ).repartition(len(part_files))
        claimed = parts_ds.map_batches(
            ClaimStage(
                cfg, pl, wave, self.K,
                frontier_path=self.frontier.path,
                num_partitions=P,
                order_path=self.order.path,
                compact_files=self.compact_files,
                filesystem=self.frontier.fs,
            ),
            batch_size=1,
            **_PA,
        )
        if not pl.light:
            # io fetch exchange: one task per (partition, host) fetch group
            claimed = claimed.groupby("fetch_group").map_groups(
                FetchHostGroup(cfg, pl, wave), batch_format="pyarrow"
            )
        fetched = claimed.materialize()
        n_rows = fetched.count()
        t_claim = _time.time() - t_start
        if n_rows == 0:
            return None  # frontier drained — nothing claimed anywhere

        # ---- execution 2: sink branches + the single commit exchange
        done = fetched.map_batches(lambda t: t.filter(pc.equal(t["status"], sem.DONE)), **_PA)

        branches = []
        if pl.save_parsed is not None:
            # light user pipelines now collect records at fetch time inside
            # the claim task (ADVICE r2 routing), so DONE rows already carry
            # their record column on every path.
            # (A streaming repartition to decode_batch_size-row blocks was
            # tried here to shrink the decode stage's straggler tail and
            # A/B-measured consistently ~20% SLOWER — the extra operator
            # pass costs more than the better packing wins; see BASELINE.md
            # wave-profile notes.)
            parsed_in = done
            branches.append(
                parsed_in.map_batches(
                    SaveParsedBatch(pl.save_parsed, self.images.path, wave, src="parsed", filesystem=self.images.fs),
                    batch_size=self.decode_batch_size,
                    **_PA,
                )
            )
        if pl.save_raw is not None:
            raw_rows = fetched.map_batches(lambda t: t.filter(pc.is_valid(t["body"])), **_PA)
            branches.append(
                raw_rows.map_batches(
                    SaveParsedBatch(pl.save_raw, self.raw.path, wave, src="raw", filesystem=self.raw.fs),
                    batch_size=self.decode_batch_size,
                    **_PA,
                )
            )
        if pl.notifier is not None:
            from ..stages.crawl import NotifyBatch

            pf_rows = fetched.map_batches(
                lambda t: t.filter(pc.equal(t["status"], sem.PARSE_FAILED)), **_PA
            )
            branches.append(pf_rows.map_batches(NotifyBatch(pl.notifier, wave), **_PA))

        cand_src = done
        if pl.light and pl.parser is not None and not pl.user_parser:
            # synthetic parser: defer link generation to uniform batches
            # (custom light parsers already attached links at fetch time)
            cand_src = done.map_batches(AttachParse(pl), **_PA)
        cand_rows = (
            cand_src.map_batches(lambda t: extract_candidates(t, cfg, P), **_PA)
            .map_batches(CheckRouter(shards, bloom_ref), **_PA)
            .map_batches(_as_commit_cand, **_PA)
        )
        if pl.light:
            # status deltas already committed inside the claim tasks — only
            # candidate rows cross the wave's single exchange; markers carry
            # the written relpaths out as result rows
            def markers_to_result(t: pa.Table) -> pa.Table:
                from ..stages.crawl import MARKER_STATUS, empty_result

                m = t.filter(pc.equal(t["status"], MARKER_STATUS))
                if m.num_rows == 0:
                    return empty_result()
                return pa.table(
                    {
                        "src": m["record"],
                        "pid": m["partition_id"],
                        "rel": m["url"],
                        "rel2": m["host"],
                        "n1": m["vtime"],
                        "n2": pc.cast(m["attempt"], pa.int64()),
                    }
                )

            commit_input = cand_rows
            branches.append(fetched.map_batches(markers_to_result, **_PA))
        else:
            commit_input = fetched.map_batches(_as_commit_status, **_PA).union(cand_rows)
        commit = commit_input.groupby("partition_id").map_groups(
            CommitPartition(
                self.frontier.path, P, wave, part_files, shards, self.order.path, self.compact_files,
                cfg=cfg, filesystem=self.frontier.fs,
            ),
            batch_format="pyarrow",
        )
        for b in branches:
            commit = commit.union(b)
        res = commit.to_pandas()
        t_commit = _time.time() - t_start - t_claim
        if os.environ.get("GRAFT_WAVE_STATS"):  # per-operator wall-time debug
            import sys as _sys

            print(f"--- wave {wave} execution-2 stats ---\n{commit.stats()}", file=_sys.stderr)

        stat = res[(res["src"] == "delta") | (res["src"] == "compact")]
        n_selected = int(stat["n2"].sum())
        if n_selected == 0:
            return None

        # ---- manifests (frontier last = the wave commit point); a table
        # whose latest version already carries this wave id is not
        # re-committed (crash between commits → idempotent re-run)
        parsed = res[res["src"] == "parsed"]
        raws = res[res["src"] == "raw"]
        ins = res[res["src"] == "ins"]
        if pl.save_parsed is not None and self.images.manifest().get("meta", {}).get("wave") != wave:
            self.images.commit([r for r in parsed["rel"] if r], meta={"wave": wave})
        if pl.save_raw is not None and self.raw.manifest().get("meta", {}).get("wave") != wave:
            self.raw.commit([r for r in raws["rel"] if r], meta={"wave": wave})
        if self.order.manifest().get("meta", {}).get("wave") != wave:
            self.order.commit([r for r in stat["rel2"] if r], meta={"wave": wave})
        part_lists = {int(k): list(v) for k, v in old_manifest["partitions"].items()}
        frontier_bytes = 0
        for _, r in stat.iterrows():
            if r["src"] == "compact":
                part_lists[int(r["pid"])] = [r["rel"]]
            else:
                part_lists[int(r["pid"])].append(r["rel"])
            frontier_bytes += self.frontier.file_size(r["rel"])
        for _, r in ins.iterrows():
            part_lists[int(r["pid"])].append(r["rel"])
            frontier_bytes += self.frontier.file_size(r["rel"])
        meta = {
            "selected": n_selected,
            "fetched": int(stat["n1"].sum()),
            "done": int(parsed["n1"].sum()) if len(parsed) else 0,
            "new": int(ins["n1"].sum()),
            "compacted": int((stat["src"] == "compact").sum()),
            "frontier_bytes": int(frontier_bytes),
            "claim_bytes": int(claim_bytes),
            "t_claim": round(t_claim, 2),
            "t_commit": round(t_commit, 2),
        }
        if P <= 256:  # per-partition fetch/dedup metrics in the checkpoint
            per_part: dict[str, dict] = {}
            for _, r in stat.iterrows():
                per_part[str(int(r["pid"]))] = {"selected": int(r["n2"]), "fetched": int(r["n1"])}
            for _, r in ins.iterrows():
                per_part.setdefault(str(int(r["pid"])), {})["new"] = int(r["n1"])
            meta["partitions"] = per_part
        self.frontier.commit(wave, part_lists, meta)
        return {"wave": wave, **meta}

    # ----------------------------------------------------- external inserts
    def push_tasks(self, urls: list[str], depth: int = 0) -> int:
        """Insert externally-supplied URLs into the frontier — the master's
        pushTasks RPC analog (QueueTaskService.pushTasks; anti-join dedup
        SqlQueueTaskProvider.scala:58-68). Canonicalizes, dedups within the
        batch (first wins), anti-joins each partition's committed rows,
        writes content-tagged push files and re-commits the current wave
        manifest (atomic replace) — an identical re-push is a no-op.
        Returns the number of genuinely new URLs inserted.

        CONCURRENCY: must not run while a wave is in flight. The anti-join
        confirms against the last COMMITTED manifest, so a push racing
        run_wave() can insert a url_hash the wave's CommitPartition also
        inserts — duplicate base rows break the at-most-once invariant.
        Push between waves (the engine's driver loop is single-threaded, so
        this is the natural call pattern); compaction verifies the invariant
        and fails loudly on duplicates (commit_status_files)."""
        canon = canonicalize(urls).drop_null()
        if len(canon) == 0:
            return 0
        uh = hash64(canon)
        _, first_idx = np.unique(uh, return_index=True)
        canon = canon.take(pa.array(np.sort(first_idx)))
        uh = hash64(canon)
        hosts = extract_host(canon)
        depths = np.full(len(uh), depth, np.int32)
        pids = host_partition(hosts, self.P, seed=self.cfg.seed)
        t = pa.table(
            {
                "url": canon,
                "url_hash": pa.array(uh, pa.uint64()),
                "host": hosts,
                "depth": pa.array(depths, pa.int32()),
                "priority": pa.array(sw.priority_of(uh, depths), pa.float32()),
                "status": pa.array(np.full(len(uh), sem.WAIT, np.int8), pa.int8()),
                "attempt": pa.array(np.zeros(len(uh), np.int32), pa.int32()),
                "discovered_at": pa.array(
                    np.full(len(uh), self.frontier.latest_wave() + 1, np.int32), pa.int32()
                ),
                "parent_hash": pa.array(np.zeros(len(uh), np.uint64), pa.uint64()),
                "link_index": pa.array(np.arange(len(uh), dtype=np.int32), pa.int32()),
                "partition_id": pa.array(pids, pa.int32()),
            }
        )
        wave = self.frontier.latest_wave()
        manifest = self.frontier.manifest(wave)
        part_lists = {int(k): list(v) for k, v in manifest["partitions"].items()}
        # one Ray task per touched partition (anti-join confirm + push-file
        # write run off-driver in parallel — a chained wave can push a
        # wave-sized URL set); the driver only folds (pid, rel, hashes)
        # results into the manifest + shard pre-filters
        order = np.argsort(pids, kind="stable")
        t_sorted = t.take(pa.array(order))
        pid_sorted = pids[order]
        bounds = np.flatnonzero(np.concatenate([[True], pid_sorted[1:] != pid_sorted[:-1]]))
        bounds = np.append(bounds, len(pid_sorted))
        futs = []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            pid = int(pid_sorted[b0])
            paths = [os.path.join(self.frontier.path, r) for r in part_lists[pid]]
            futs.append(
                _push_partition.remote(
                    self.frontier.path, self.P, pid, paths,
                    t_sorted.slice(int(b0), int(b1 - b0)), self.frontier.fs,
                )
            )
        inserted = 0
        for pid, rel, fresh_h in ray.get(futs):
            if not len(fresh_h):
                continue
            if rel not in part_lists[pid]:
                part_lists[pid].append(rel)
            inserted += len(fresh_h)
            if self.shards is not None:
                h = np.asarray(fresh_h, np.uint64)
                sid = h % np.uint64(self.S)
                for s in range(self.S):
                    m = sid == s
                    if m.any():
                        self.shards[s].add_seen.remote(h[m])
        if inserted:
            meta = dict(manifest.get("meta", {}))
            meta["pushed"] = meta.get("pushed", 0) + inserted
            self.frontier.commit(wave, part_lists, meta)
        return inserted

    def wave_done_urls(self, wave: int) -> list[str]:
        """URLs that reached DONE in the given wave — read from that wave's
        status commits joined back to the frontier (the nextProjectId
        chaining source: crawl results of one project seed the next,
        task.proto projectId/nextProjectId). One Ray task per partition:
        the delta names O(wave) hashes, the keys sidecar maps them to row
        indices, take_rows pulls just those url values — the full-frontier
        url fold of round 2 is gone (VERDICT r2 fix #4)."""
        futs = [
            _wave_done_partition.remote(self.frontier.path, pid, paths, wave, self.frontier.fs)
            for pid, paths in sorted(self.frontier.partition_files(wave).items())
        ]
        urls: list[str] = []
        for part in ray.get(futs):
            urls.extend(part)
        return sorted(urls)

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
        """Global crawl order: (wave, vtime, url_hash) sort + fetch_seq —
        driver-side Arrow table, for tests/exports at small scale. For the
        design scale use :meth:`crawl_order_ds` and stream."""
        t = self.order.to_arrow()
        if t.num_rows == 0:
            return t
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[("wave", "ascending"), ("vtime", "ascending"), ("url_hash", "ascending")]
            )
        )
        return t.add_column(0, "fetch_seq", pa.array(np.arange(t.num_rows), pa.int64()))

    def crawl_order_ds(self, columns: list[str] | None = None) -> rd.Dataset:
        """Global crawl order as a SORTED streaming Dataset (distributed
        sort over the order fragments; consume with iter_batches /
        write_parquet — the driver never materializes O(fetched) rows).
        fetch_seq is implied by the stream position. NOTE: consumers that
        need batches delivered in the sorted order must set
        ``DataContext.execution_options.preserve_order = True`` — Ray
        Data's streaming executor may otherwise yield blocks out of order."""
        ds = self.order.to_dataset(columns=columns)
        return ds.sort(["wave", "vtime", "url_hash"])

    def shutdown_shards(self) -> None:
        if self.shards:
            for s in self.shards:
                ray.kill(s)
            self.shards = None
