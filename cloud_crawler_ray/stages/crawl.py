"""Distributed crawl-wave stages (the engine half of pipelines/semantics.py).

Stage inventory (SURVEY.md §3.4):
  FetchStage   — actor-pool ``map_groups`` body over host-buckets: politeness
                 token buckets + robots + outcome routing per host (state
                 machine shared with the oracle via semantics.fetch_host_wave)
  DecodeStage  — actor-pool ``map_batches``: synthetic payload → decode →
                 phash (the image decode + phash stage of the north_rule)
  extract_candidates — vectorized link explode + canonicalize + child hash
  DedupShard   — named Ray actor: bloom pre-filter → cuckoo → exact seen-set
                 confirm; sharded by ``url_hash % S`` (north_rule's sharded
                 URL-seen set; exactness guaranteed by state/seen.py)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.hashing import hash64
from ..functions.urls import canonicalize, extract_host, extract_scheme, host_partition, resolve_links
from ..pipelines import semantics as sem
from ..pipelines import synthweb as sw
from ..state.bloom import BloomFilter
from ..state.cuckoo import CuckooFilter
from ..state.seen import SeenSet

FETCH_OUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("partition_id", pa.int32()),
        ("status", pa.int8()),
        ("attempt", pa.int32()),
        ("vtime", pa.int64()),
        ("fetched", pa.bool_()),
        ("links", pa.list_(pa.string())),
    ]
)


MARKER_STATUS = -1  # meta row emitted by SelectFetchCommit per touched partition


class SelectFetchCommit:
    """Fused per-partition claim + fetch + status-commit (one task per
    frontier partition — the whole "worker" of the reference in one task).

    The reference's transactional claim (pullAndUpdateStatus under a global
    lock, QueueTaskServiceImpl.scala:57-66) becomes partition ownership: one
    task owns one hostname-hash partition. It reads the partition's file
    list (main + pending inserts), takes the top-k by (priority, url_hash)
    [rule (a)], runs the politeness-ordered host fetches locally [rules
    (b)-(d)], then — because it already holds the whole partition in memory
    — writes the consolidated next partition version with the new status /
    attempt columns AND the wave's crawl-order fragment. Claim, fetch,
    status update and compaction cost ZERO exchanges; all of a host's
    token-bucket grants are computed in one place (SURVEY.md §4.5).

    Output: the light fetch rows (consumed by the decode and out-link
    branches) plus one marker row per partition (status = -1) carrying the
    written file names for the driver's manifest commit.
    """

    def __init__(self, cfg: sw.WebConfig, wave: int, k: int, frontier_path: str, order_path: str, num_partitions: int):
        self.cfg = cfg
        self.wave = wave
        self.k = k
        self.frontier_path = frontier_path
        self.order_path = order_path
        self.P = num_partitions

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from ..sources.frontier import FRONTIER_SCHEMA, FrontierStore
        from ..sources.lancelike import LanceLikeTable

        cfg, wave = self.cfg, self.wave
        store = FrontierStore(self.frontier_path, self.P)
        out: list[pa.Table] = []
        for pid, paths in zip(t["pid"].to_pylist(), t["paths"].to_pylist()):
            part = pa.concat_tables([pq.read_table(p) for p in paths]).combine_chunks()
            uh_all = part["url_hash"].to_numpy().astype(np.uint64)
            sel = sem.select_wave_indices(
                part["priority"].to_numpy(),
                uh_all,
                part["status"].to_numpy(),
                part["attempt"].to_numpy(),
                self.k,
                cfg.max_attempts,
            )
            if len(sel) == 0:
                if len(paths) > 1:  # still consolidate multi-file partitions
                    rel = store.write_main(pid, part, wave)
                    out.append(_marker_row(pid, rel, "", 0))
                continue
            g = part.take(pa.array(sel)).to_pandas()
            status_new = part["status"].to_numpy().copy()
            attempt_new = part["attempt"].to_numpy().copy()
            part_rows: list[pa.Table] = []
            for host, hrows in g.groupby("host", sort=True):
                # rule (b): per-host order (discovered_at, priority, url_hash)
                hrows = hrows.sort_values(["discovered_at", "priority", "url_hash"], kind="stable")
                uh = hrows["url_hash"].to_numpy().astype(np.uint64)
                res = sem.fetch_host_wave(str(host), wave, hrows["url"].tolist(), uh, hrows["attempt"].to_numpy(), cfg)
                part_rows.append(
                    pa.table(
                        {
                            "url": pa.array(hrows["url"].tolist(), pa.string()),
                            "url_hash": pa.array(uh, pa.uint64()),
                            "host": pa.array([str(host)] * len(hrows), pa.string()),
                            "depth": pa.array(hrows["depth"].to_numpy(), pa.int32()),
                            "partition_id": pa.array(np.full(len(hrows), pid, np.int32), pa.int32()),
                            "status": pa.array(res.status, pa.int8()),
                            "attempt": pa.array(res.attempt, pa.int32()),
                            "vtime": pa.array(res.vtime, pa.int64()),
                            "fetched": pa.array(res.fetched, pa.bool_()),
                            "links": pa.array(res.links, pa.list_(pa.string())),
                        }
                    )
                )
            fetch_rows = pa.concat_tables(part_rows)
            # apply the wave's status/attempt updates (searchsorted scatter)
            order_idx = np.argsort(uh_all, kind="stable")
            pos = order_idx[np.searchsorted(uh_all[order_idx], fetch_rows["url_hash"].to_numpy())]
            status_new[pos] = fetch_rows["status"].to_numpy()
            attempt_new[pos] = fetch_rows["attempt"].to_numpy()
            cols = {nm: part[nm] for nm in part.column_names}
            cols["status"] = pa.array(status_new, pa.int8())
            cols["attempt"] = pa.array(attempt_new, pa.int32())
            main_rel = store.write_main(pid, pa.table(cols).cast(FRONTIER_SCHEMA), wave)
            # crawl-order fragment for this (wave, partition)
            forder = fetch_rows.filter(fetch_rows["fetched"])
            order_rel = ""
            if forder.num_rows:
                ot = pa.table(
                    {
                        "wave": pa.array(np.full(forder.num_rows, wave, np.int32), pa.int32()),
                        "vtime": forder["vtime"],
                        "url_hash": forder["url_hash"],
                        "host": forder["host"],
                        "partition_id": forder["partition_id"],
                    }
                )
                ot = ot.take(pc.sort_indices(ot, sort_keys=[("vtime", "ascending"), ("url_hash", "ascending")]))
                order_rel = LanceLikeTable(self.order_path).write_fragment(ot, name=f"w{wave:05d}-p{pid:04d}")
            out.append(fetch_rows)
            out.append(_marker_row(pid, main_rel, order_rel, forder.num_rows))
        if not out:
            return pa.table({f.name: pa.array([], f.type) for f in FETCH_OUT_SCHEMA})
        return pa.concat_tables(out)


def _marker_row(pid: int, main_rel: str, order_rel: str, n_order: int) -> pa.Table:
    """Meta row (status = MARKER_STATUS) in FETCH_OUT_SCHEMA: url carries the
    main file relpath, host the order fragment relpath, vtime the order-row
    count."""
    return pa.table(
        {
            "url": pa.array([main_rel], pa.string()),
            "url_hash": pa.array([0], pa.uint64()),
            "host": pa.array([order_rel], pa.string()),
            "depth": pa.array([0], pa.int32()),
            "partition_id": pa.array([pid], pa.int32()),
            "status": pa.array([MARKER_STATUS], pa.int8()),
            "attempt": pa.array([0], pa.int32()),
            "vtime": pa.array([n_order], pa.int64()),
            "fetched": pa.array([False], pa.bool_()),
            "links": pa.array([None], pa.list_(pa.string())),
        }
    )


class DecodeStage:
    """Image decode + phash over DONE rows (actor-pool ``map_batches``).

    The synthetic fetch payload is generated from the url_hash PRF (the
    in-sandbox stand-in for the HTTP body), then decoded with the real
    codecs and perceptually hashed. Wide binary rows → callers use a small
    ``batch_size`` (SURVEY.md §4.1 memory row).
    """

    def __init__(self, cfg: sw.WebConfig):
        self.cfg = cfg

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
        for uh in t["url_hash"].to_numpy():
            p = sw.image_payload(int(uh), self.cfg)
            phs.append(sw.decode_and_phash(p))
            ids.append(p["image_id"]); blobs.append(p["bytes"]); ws.append(p["w"])
            hs.append(p["h"]); fmts.append(p["fmt"]); caps.append(p["caption"])
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
                "caption": pa.array(caps, pa.string()),
                "phash": pa.array(phs, pa.int64()),
                "partition_id": t["partition_id"],
            }
        )


def extract_candidates(t: pa.Table, cfg: sw.WebConfig, num_partitions: int) -> pa.Table:
    """Vectorized out-link explode for a batch of DONE fetch rows.

    Emits (child url_hash-keyed) candidate frontier rows with the
    (parent_hash, link_index) tie-break key of rule §4.3(c).
    """
    links = t["links"]
    counts = np.array([len(x) if x is not None else 0 for x in links.to_pylist()], np.int64)
    if counts.sum() == 0:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "url_hash": pa.array([], pa.uint64()),
                "host": pa.array([], pa.string()),
                "depth": pa.array([], pa.int32()),
                "priority": pa.array([], pa.float32()),
                "parent_hash": pa.array([], pa.uint64()),
                "link_index": pa.array([], pa.int32()),
                "partition_id": pa.array([], pa.int32()),
            }
        )
    rep = np.repeat(np.arange(len(t), dtype=np.int64), counts)
    flat_hrefs = pa.array([h for row in links.to_pylist() for h in (row or [])], pa.string())
    link_index = np.concatenate([np.arange(c, dtype=np.int32) for c in counts if c > 0]) if counts.sum() else np.zeros(0, np.int32)
    parent_urls = pc.take(t["url"], pa.array(rep))
    parent_hash = t["url_hash"].to_numpy()[rep]
    child_depth = (t["depth"].to_numpy()[rep] + 1).astype(np.int32)
    parent_host = pc.take(t["host"], pa.array(rep))
    # scheme derives from each parent URL (oracle parity: _canon_candidates
    # splits the parent on "://") — an https parent resolves /links to https
    parent_scheme = pc.take(extract_scheme(t["url"]), pa.array(rep))

    resolved = resolve_links(flat_hrefs, parent_scheme, parent_host)
    canon = canonicalize(resolved.fill_null(""))
    valid = pc.is_valid(canon)
    canon = canon.filter(valid)
    keep = np.asarray(valid)
    parent_hash, child_depth, link_index = parent_hash[keep], child_depth[keep], link_index[keep]

    child_host = extract_host(canon)
    child_hash = hash64(canon)
    return pa.table(
        {
            "url": canon,
            "url_hash": pa.array(child_hash, pa.uint64()),
            "host": child_host,
            "depth": pa.array(child_depth, pa.int32()),
            "priority": pa.array(sw.priority_of(child_hash, child_depth), pa.float32()),
            "parent_hash": pa.array(parent_hash, pa.uint64()),
            "link_index": pa.array(link_index, pa.int32()),
            "partition_id": pa.array(host_partition(child_host, num_partitions, seed=cfg.seed), pa.int32()),
        }
    )


@ray.remote
class DedupShard:
    """One URL-seen shard: bloom pre-filter → cuckoo filter → exact confirm.

    Sharded by ``url_hash % num_shards`` (independent of the hostname
    partitioning so one hot domain cannot skew the seen-set, SURVEY.md
    §4.4). The bloom/cuckoo pair answers most probes without touching the
    exact structure; SeenSet keeps semantics exactly first-discovery-wins.
    Rebuilt from the committed frontier on resume (sources/frontier.py).
    """

    def __init__(self, shard_id: int, capacity: int = 1 << 20, seed: int = 0):
        self.shard_id = shard_id
        self.capacity = capacity
        self.seed = seed
        self.bloom = BloomFilter(capacity, seed=seed ^ shard_id)
        self.cuckoo = CuckooFilter(capacity, seed=seed ^ shard_id)
        self.exact = SeenSet()

    def _ensure_capacity(self, n_new: int) -> bool:
        """Grow the approximate filters when the seen set outgrows them.

        The cuckoo filter hard-fails past ~95% load and the bloom FP rate
        degrades, so when the projected load crosses 85% both are rebuilt at
        ≥2x from the exact set (the authority — rebuild cannot lose keys).
        Amortized O(1) per key, same growth discipline as a hash table.
        """
        target = len(self.exact) + n_new
        if target <= 0.85 * self.cuckoo.num_buckets * 4:
            return False
        self.capacity = max(2 * self.capacity, int(target * 2))
        self.bloom = BloomFilter(self.capacity, seed=self.seed ^ self.shard_id)
        self.cuckoo = CuckooFilter(self.capacity, seed=self.seed ^ self.shard_id)
        keys = self.exact.snapshot()["base"]
        if len(keys):
            self.bloom.add_many(keys)
            self.cuckoo.add_many(keys)
        return True

    def _register(self, fresh: np.ndarray) -> None:
        """Add newly-seen keys to the approximate filters (exact set already
        holds them); a capacity rebuild re-inserts everything from exact, in
        which case ``fresh`` must not be double-inserted."""
        if not self._ensure_capacity(0):
            self.bloom.add_many(fresh)
            self.cuckoo.add_many(fresh)

    def bootstrap(self, hashes: np.ndarray) -> int:
        """Load hashes known seen (from the committed frontier on resume)."""
        new = self.exact.check_and_add(hashes)
        self._register(np.unique(hashes[new]))
        return int(new.sum())

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """bool[n]: True = first discovery (now registered).

        Caller guarantees within-batch uniqueness (the wave-level groupby
        dedup ran first), so the bloom/cuckoo fast path is sound: a key the
        bloom has never seen is definitely new (no false negatives) and
        skips the exact probe entirely; only "maybe seen" keys hit SeenSet.
        """
        hashes = hashes.astype(np.uint64)
        maybe = self.bloom.contains_many(hashes) & self.cuckoo.contains_many(hashes)
        new = ~maybe
        if maybe.any():
            idx = np.flatnonzero(maybe)
            new[idx] = ~self.exact.contains_many(hashes[idx])
        fresh = np.unique(hashes[new])
        self.exact.add_many(fresh)
        self._register(fresh)
        return new

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Check-only membership: bloom/cuckoo fast-no, exact confirm.

        Used as the in-wave pre-filter (state frozen during a wave; see
        CheckRouter). No false "seen" for genuinely new keys: bloom/cuckoo
        positives are confirmed against the exact set.
        """
        hashes = hashes.astype(np.uint64)
        maybe = self.bloom.contains_many(hashes) & self.cuckoo.contains_many(hashes)
        out = np.zeros(len(hashes), bool)
        if maybe.any():
            idx = np.flatnonzero(maybe)
            out[idx] = self.exact.contains_many(hashes[idx])
        return out

    def add_seen(self, hashes: np.ndarray) -> int:
        """Register committed-seen keys (post-wave pre-filter refresh)."""
        hashes = np.unique(hashes.astype(np.uint64))
        new = ~self.exact.contains_many(hashes)
        fresh = hashes[new]
        self.exact.add_many(fresh)
        self._register(fresh)
        return int(new.sum())

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "exact": len(self.exact),
            "bloom_count": self.bloom.count,
            "cuckoo_load": self.cuckoo.load_factor(),
        }


class CheckRouter:
    """Check-only pre-filter against the sharded URL-seen actors.

    Routes a candidate batch's hashes to the shard actors (url_hash % S)
    and drops rows the exact seen-sets already contain. Deliberately
    *check-only* (no add) during a wave: actor state stays frozen at
    wave-start, so every within-wave copy of a new URL passes through and
    the tie rule §4.3(c) is resolved by data in the partition group — never
    by actor-call arrival order. Staleness is safe: a stale "new" verdict
    is caught by the destination partition's exact anti-join; "seen"
    verdicts only ever come from committed state. Cuts the shuffle volume
    by the duplicate fraction (≈40-60% in steady-state waves).
    """

    def __init__(self, shard_handles: list):
        self.shards = shard_handles
        self.n = len(shard_handles)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = t["url_hash"].to_numpy().astype(np.uint64)
        sid = (h % np.uint64(self.n)).astype(np.int64)
        keep = np.zeros(len(h), bool)
        futs, idxs = [], []
        for s in range(self.n):
            m = sid == s
            if m.any():
                futs.append(self.shards[s].contains.remote(h[m]))
                idxs.append(np.flatnonzero(m))
        for fut, ix in zip(futs, idxs):
            keep[ix] = ~ray.get(fut)
        return t.filter(pa.array(keep))


class InsertPartition:
    """``map_groups`` body for one frontier partition's discovered URLs:
    within-wave keep-first (rule §4.3(c): min (parent_hash, link_index) per
    child url_hash — all copies of a URL are in this group because host
    determines the partition), exact anti-join against the partition's own
    committed rows (the authoritative first-discovery-wins check,
    SqlQueueTaskProvider.scala:58-68 analog), then writes the wave's
    inserts file and pushes the accepted hashes to the seen-shard actors
    (async — the actors are a pre-filter, the partition file is the truth).
    """

    def __init__(self, frontier_path: str, num_partitions: int, wave: int, part_files: dict, shard_handles: list):
        self.frontier_path = frontier_path
        self.P = num_partitions
        self.wave = wave
        self.part_files = part_files  # pre-wave file lists (url set == post-claim main)
        self.shards = shard_handles
        self.__name__ = f"InsertPartition(w{wave})"

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        from ..sources.frontier import FRONTIER_SCHEMA, FrontierStore

        pid = int(g["partition_id"].iloc[0])
        g = g.sort_values(["url_hash", "parent_hash", "link_index"], kind="stable")
        g = g.drop_duplicates("url_hash", keep="first")
        seen = np.concatenate(
            [pq.read_table(p, columns=["url_hash"])["url_hash"].to_numpy() for p in self.part_files[pid]]
        ).astype(np.uint64)
        fresh = g[~np.isin(g["url_hash"].to_numpy().astype(np.uint64), seen)].copy()
        if not len(fresh):
            return _empty_ins_result()
        fresh["status"] = np.int8(0)  # WAIT
        fresh["attempt"] = np.int32(0)
        fresh["discovered_at"] = np.int32(self.wave + 1)
        t = pa.Table.from_pandas(fresh, preserve_index=False).select([f.name for f in FRONTIER_SCHEMA]).cast(FRONTIER_SCHEMA)
        t = t.take(pc.sort_indices(t, sort_keys=[("url_hash", "ascending")]))
        rel = FrontierStore(self.frontier_path, self.P).write_inserts(pid, t, self.wave)
        h = t["url_hash"].to_numpy().astype(np.uint64)
        sid = h % np.uint64(len(self.shards))
        for s in range(len(self.shards)):
            m = sid == s
            if m.any():
                self.shards[s].add_seen.remote(h[m])  # fire-and-forget pre-filter update
        return pd.DataFrame({"src": ["ins"], "pid": np.array([pid], np.int32), "rel": [rel],
                             "rel2": [""], "n1": np.array([len(fresh)], np.int64)})


def _empty_ins_result() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "src": pd.Series([], dtype=object),
            "pid": pd.Series([], dtype=np.int32),
            "rel": pd.Series([], dtype=object),
            "rel2": pd.Series([], dtype=object),
            "n1": pd.Series([], dtype=np.int64),
        }
    )
