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
from ..functions.urls import canonicalize, extract_host, host_partition, resolve_links
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


class FetchStage:
    """Fetch one wave's host-bucket groups.

    A callable class so ``map_groups`` runs it on an actor pool: per-actor
    state (robots cache, UA table — here the WebConfig environment) is built
    once in ``__init__``, not per batch. Each group = one ``fetch_bucket``
    (hash(host) % B) containing whole hosts, so every host's politeness
    bucket is computed by exactly one task — the serialization point the
    token-bucket model requires (SURVEY.md §4.5). Bucketing (vs one group
    per host) amortizes Python dispatch over many hosts.
    """

    def __init__(self, cfg: sw.WebConfig, wave: int):
        self.cfg = cfg
        self.wave = wave
        self.robots_cache: dict[str, int] = {}  # per-actor robots cache (host→residue)
        self.__name__ = f"FetchStage(w{wave})"  # map_groups wraps fn by name

    def __call__(self, g: pd.DataFrame) -> pa.Table:
        cfg, wave = self.cfg, self.wave
        out: list[pa.Table] = []
        for host, hrows in g.groupby("host", sort=True):
            # rule (b): per-host order (discovered_at, priority, url_hash)
            hrows = hrows.sort_values(["discovered_at", "priority", "url_hash"], kind="stable")
            uh = hrows["url_hash"].to_numpy().astype(np.uint64)
            res = sem.fetch_host_wave(
                str(host), wave, hrows["url"].tolist(), uh, hrows["attempt"].to_numpy(), cfg
            )
            out.append(
                pa.table(
                    {
                        "url": pa.array(hrows["url"].tolist(), pa.string()),
                        "url_hash": pa.array(uh, pa.uint64()),
                        "host": pa.array([str(host)] * len(hrows), pa.string()),
                        "depth": pa.array(hrows["depth"].to_numpy(), pa.int32()),
                        "partition_id": pa.array(hrows["partition_id"].to_numpy(), pa.int32()),
                        "status": pa.array(res.status, pa.int8()),
                        "attempt": pa.array(res.attempt, pa.int32()),
                        "vtime": pa.array(res.vtime, pa.int64()),
                        "fetched": pa.array(res.fetched, pa.bool_()),
                        "links": pa.array(res.links, pa.list_(pa.string())),
                    }
                )
            )
        return pa.concat_tables(out) if out else pa.table({f.name: pa.array([], f.type) for f in FETCH_OUT_SCHEMA})


class SelectAndFetch:
    """Fused per-partition claim + fetch (one task per frontier partition).

    The reference's transactional claim (pullAndUpdateStatus under a global
    lock, QueueTaskServiceImpl.scala:57-66) becomes partition ownership: one
    task owns one hostname-hash partition, reads only its file (pruned
    columns + WAIT/attempt filter), takes the top-k by (priority, url_hash)
    [rule (a)] and runs the politeness-ordered host fetches locally — no
    shuffle, no lock, and all of a host's token-bucket grants computed in
    one place (SURVEY.md §4.5). Input batch: rows of {pid, path} from the
    wave manifest.
    """

    def __init__(self, cfg: sw.WebConfig, wave: int, k: int):
        self.cfg = cfg
        self.wave = wave
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        cfg, wave = self.cfg, self.wave
        out: list[pa.Table] = []
        for path in t["path"].to_pylist():
            part = pq.read_table(
                path,
                columns=["url", "url_hash", "host", "depth", "priority", "status", "attempt", "discovered_at", "partition_id"],
                filters=[("status", "=", sem.WAIT), ("attempt", "<", cfg.max_attempts)],
            )
            if part.num_rows == 0:
                continue
            sel = sem.select_wave_indices(
                part["priority"].to_numpy(),
                part["url_hash"].to_numpy().astype(np.uint64),
                part["status"].to_numpy(),
                part["attempt"].to_numpy(),
                self.k,
                cfg.max_attempts,
            )
            if len(sel) == 0:
                continue
            g = part.take(pa.array(sel)).to_pandas()
            for host, hrows in g.groupby("host", sort=True):
                hrows = hrows.sort_values(["discovered_at", "priority", "url_hash"], kind="stable")
                uh = hrows["url_hash"].to_numpy().astype(np.uint64)
                res = sem.fetch_host_wave(str(host), wave, hrows["url"].tolist(), uh, hrows["attempt"].to_numpy(), cfg)
                out.append(
                    pa.table(
                        {
                            "url": pa.array(hrows["url"].tolist(), pa.string()),
                            "url_hash": pa.array(uh, pa.uint64()),
                            "host": pa.array([str(host)] * len(hrows), pa.string()),
                            "depth": pa.array(hrows["depth"].to_numpy(), pa.int32()),
                            "partition_id": pa.array(hrows["partition_id"].to_numpy(), pa.int32()),
                            "status": pa.array(res.status, pa.int8()),
                            "attempt": pa.array(res.attempt, pa.int32()),
                            "vtime": pa.array(res.vtime, pa.int64()),
                            "fetched": pa.array(res.fetched, pa.bool_()),
                            "links": pa.array(res.links, pa.list_(pa.string())),
                        }
                    )
                )
        if not out:
            return pa.table({f.name: pa.array([], f.type) for f in FETCH_OUT_SCHEMA})
        return pa.concat_tables(out)


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

    resolved = resolve_links(flat_hrefs, pa.array(["http"] * len(flat_hrefs), pa.string()), parent_host)
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
        self.bloom = BloomFilter(capacity, seed=seed ^ shard_id)
        self.cuckoo = CuckooFilter(capacity, seed=seed ^ shard_id)
        self.exact = SeenSet()

    def bootstrap(self, hashes: np.ndarray) -> int:
        """Load hashes known seen (from the committed frontier on resume)."""
        new = self.exact.check_and_add(hashes)
        fresh = np.unique(hashes[new])
        self.bloom.add_many(fresh)
        self.cuckoo.add_many(fresh)
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
        self.bloom.add_many(fresh)
        self.cuckoo.add_many(fresh)
        return new

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "exact": len(self.exact),
            "bloom_count": self.bloom.count,
            "cuckoo_load": self.cuckoo.load_factor(),
        }


class ShardDedupGroup:
    """Fused ``map_groups`` body for one dedup shard: within-wave keep-first
    (rule §4.3(c): min (parent_hash, link_index) per child url_hash) then a
    single round-trip to the shard's actor for the cross-wave check — one
    groupby replaces two shuffle stages."""

    def __init__(self, shard_handles: list):
        self.shards = shard_handles
        self.__name__ = "ShardDedupGroup"

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url_hash", "parent_hash", "link_index"], kind="stable")
        g = g.drop_duplicates("url_hash", keep="first")
        sid = int(g["shard"].iloc[0])
        new = ray.get(self.shards[sid].check_and_add.remote(g["url_hash"].to_numpy().astype(np.uint64)))
        return g[new]


class DedupRouter:
    """map_batches body that routes candidate rows to the shard actors and
    filters to first discoveries. The actor round-trip happens once per
    (batch × shard) — candidates are wave-sized, not frontier-sized."""

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
                futs.append(self.shards[s].check_and_add.remote(h[m]))
                idxs.append(np.flatnonzero(m))
        for fut, ix in zip(futs, idxs):
            keep[ix] = ray.get(fut)
        return t.filter(pa.array(keep))
