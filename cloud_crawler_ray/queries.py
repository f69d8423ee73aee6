"""Operator inventory as Ray Data pipelines over the driver testdata.

Each public ``q_*`` function takes ``sf_dir`` and returns a
``ray.data.Dataset`` / ``pyarrow.Table``; ``ORACLE_SQL`` holds the matching
DuckDB SQL (same column names — the driver value-hashes after sorting
columns by name). Together they form the per-operator correctness gate
(``__ray_entry__.queries()`` / ``oracle_sql()``).

Mapping to the reference's operator inventory (SURVEY.md §2):
  frontier_pull_batch   ← MongoQueueTaskProvider.pullBatch scan+limit (:33-48)
  status_counts         ← wave-end outcome counts (SaveCrawlResultController.scala:130-150)
  retry_split           ← attempt-capped fold (QueueTaskServiceImpl.scala:101-115)
  dedup_keep_first      ← keep-first self-join purge (SqlQueueTaskProvider.scala:73-77)
  anti_join_new_urls    ← pushTasks anti-join dedup (SqlQueueTaskProvider.scala:58-68)
  broadcast_config_join ← projects_url ⋈ projects small-side join (SqlQueueTaskProvider.scala:22)
  topk_priority         ← priority-queue frontier top-k (SURVEY.md §2.7)
  distinct_flags        ← distinct-before-insert (SqlQueueTaskProvider.scala:68)
plus the training-data-pipeline extensions (dedup suite, similarity search,
text analysis, windowed/sessionized events) the north_rule adds.
"""

from __future__ import annotations

import contextlib
import functools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .functions import text as T
from .functions.hashing import hash64

_PA = {"batch_format": "pyarrow"}


@contextlib.contextmanager
def _tuned_context():
    """Size Ray Data's default shuffle/read parallelism to the machine.

    The stock defaults (min_parallelism=200, read_op_min_num_blocks=200)
    spawn hundreds of near-empty tasks per groupby/sort at these data
    sizes; the natural parallelism is a small multiple of the CPU count.
    Applied save/mutate/restore around query construction — datasets
    snapshot ``DataContext.get_current().copy()`` at creation, so the
    tuning sticks to the query's datasets without leaking into the global
    context of co-resident pipelines.
    """
    import multiprocessing

    ncpu = multiprocessing.cpu_count()
    ctx = rd.DataContext.get_current()
    saved = (ctx.min_parallelism, ctx.read_op_min_num_blocks)
    ctx.min_parallelism = min(200, max(32, 2 * ncpu))
    ctx.read_op_min_num_blocks = min(200, max(16, ncpu))
    try:
        yield
    finally:
        ctx.min_parallelism, ctx.read_op_min_num_blocks = saved


def _tuned(fn):
    """Wrap a query builder so it constructs its datasets under the tuned
    context (applied to every registered query at the bottom of the module)."""

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        with _tuned_context():
            return fn(*a, **kw)

    wrapper.__wrapped_untuned__ = fn
    return wrapper


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _pool() -> tuple[int, int]:
    """Actor-pool sizing for stateful map_batches stages: a few actors,
    scaled mildly with session CPUs. Short queries are dominated by actor
    spawn latency, so a wide autoscaling pool (tried: 1..CPUs-2) is SLOWER
    than a small warm one; per-batch work inside each actor is already
    vectorized, so a handful of actors saturates the stage."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return (2, min(8, max(2, ncpu // 4)))


def _emb_matrix(col) -> np.ndarray:
    """``list<float>`` column → (n, d) float64 matrix via one list_flatten —
    no per-row Python objects (``to_pylist`` on a list column measured ~90×
    slower at 2000×64). Assumes equal-length vectors; ragged input fails
    loudly in the reshape."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, 0), np.float64)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return flat.reshape(len(col), -1)


def _row_count(sf_dir: str, table: str) -> int:
    """Row count from parquet metadata (no data read) — used to size
    group-bucket counts so per-group work stays bounded as data grows
    (VERDICT r1: fixed bucket counts make group size linear in data)."""
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def _agg_join_side(ds, num_partitions: int):
    """Make a groupby/aggregate output safe as a ``Dataset.join`` side.

    Ray Data's hash aggregate can emit zero-row blocks with an EMPTY
    schema (observed at sf0.1 with ~64 shuffle partitions: "Operator
    produced a RefBundle with a different schema"); when such a block
    lands on a join side, the Acero hash-join fails with "No match ...
    for key field reference FieldRef". A map-based schema pin cannot
    repair them — map operators forward zero-row bundles without invoking
    the UDF — but a repartition rebuilds blocks by concatenation, which
    drops the degenerate empties (verified at sf0.1). Cost: one extra
    exchange of the aggregate output, which is small by construction in
    every caller here."""
    return ds.repartition(num_partitions)


_SIDE_TABLE_CACHE: dict[tuple, str] = {}


def _parquet_side_table(cache_key: tuple, make_ds) -> str:
    """Persist an intermediate dataset to a parquet side table and stream
    its consumers from it — the scale-safe alternative to ``.materialize()``
    for full-corpus intermediates (VERDICT r4 #4): a materialize pins every
    block in the object store for the pipeline's lifetime, while a side
    table costs one streaming write and each consumer re-reads row groups
    lazily with normal backpressure. Cached per (name, input) within the
    process so repeated query construction reuses one write."""
    if cache_key in _SIDE_TABLE_CACHE:
        return _SIDE_TABLE_CACHE[cache_key]
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="ccr_side_")
    # process-scoped scratch: each creating process removes its own side
    # tables at exit (they can be larger than the corpus — never leak them)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    make_ds().write_parquet(d)
    _SIDE_TABLE_CACHE[cache_key] = d
    return d


def _scratch_dir(prefix: str) -> str:
    """mkdtemp + atexit cleanup: process-lifetime scratch that never leaks
    (same discipline as _parquet_side_table)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _source_stat(sf_dir: str, table: str) -> tuple[int, int]:
    """(size, mtime_ns) of a source parquet — cheap content fingerprint for
    process-local caches so a regenerated input is never served stale."""
    st = os.stat(f"{sf_dir}/{table}.parquet")
    return st.st_size, st.st_mtime_ns


def _secure_dump_root() -> str:
    """Per-user oracle-dump root, created 0700 and verified: the root must
    be owned by this uid with no group/other write bits, else raise — a
    pre-planted world-writable root must never silently hold the
    correctness gate's reference data (self-review r5: ``os.makedirs(leaf,
    mode=...)`` applies the mode only to the leaf, and ``exist_ok=True``
    accepts any pre-existing directory unchecked)."""
    import getpass
    import tempfile

    root = os.path.join(tempfile.gettempdir(), f"ccr_oracle_{getpass.getuser()}")
    if not os.path.isdir(root):
        try:
            os.mkdir(root, 0o700)
        except FileExistsError:
            pass
    st = os.stat(root)
    if st.st_uid != os.getuid() or (st.st_mode & 0o022):
        raise ValueError(
            f"oracle dump root {root} is not a private directory of this user "
            f"(uid {st.st_uid}, mode {oct(st.st_mode & 0o777)}); refusing to trust dumps there"
        )
    return root


def _dump_dir_for(name: str, fingerprint) -> str:
    """Content-addressed oracle-dump directory (ADVICE r4, medium).

    The directory NAME carries a hash of the dump definition (shape dict +
    an explicit definition-version token), so any semantics/shape change
    gets a fresh directory automatically — no hand-bumped ``_v`` suffixes
    whose omission silently reuses a stale dump. The root is per-user and
    ownership/mode-verified at write/read time (``_secure_dump_root``) so
    a predictable world-writable /tmp path can't be pre-planted by another
    local user."""
    import getpass
    import hashlib
    import tempfile

    root = os.path.join(tempfile.gettempdir(), f"ccr_oracle_{getpass.getuser()}")
    fp = hashlib.sha256(repr((name, fingerprint)).encode()).hexdigest()[:16]
    return os.path.join(root, f"{name}_{fp}")


def _atomic_dump_dir(dest: str, write_fn) -> str:
    """Shared idempotent-dump protocol for the oracle parquet dumps:
    manifest-validated _SUCCESS short-circuit, write into a fresh tmp dir
    via ``write_fn(tmp)``, manifest + marker last, atomic rename into
    place; a concurrent writer losing the rename discards its (identical)
    tmp. ``dest`` must come from ``_dump_dir_for`` (content-addressed name
    = definition version). An existing dump is sanity-checked against its
    manifest (per-file row counts + schema) and a mismatch raises loudly —
    a corrupt or planted dump must never silently become the correctness
    gate's reference data (ADVICE r4)."""
    import json as _json
    import tempfile

    import pyarrow.parquet as pq

    def _manifest_of(d: str) -> dict:
        out = {}
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".parquet"):
                md = pq.read_metadata(os.path.join(d, fn))
                out[fn] = {"rows": md.num_rows, "schema": str(pq.read_schema(os.path.join(d, fn)))}
        return out

    _secure_dump_root()
    if os.path.exists(os.path.join(dest, "_SUCCESS")):
        recorded = _json.load(open(os.path.join(dest, "MANIFEST.json")))
        actual = _manifest_of(dest)
        if recorded != actual:
            raise ValueError(
                f"oracle dump {dest} does not match its manifest (corrupt or tampered); "
                "delete the directory and re-run"
            )
        return dest
    tmp = tempfile.mkdtemp(prefix=os.path.basename(dest) + "_", dir=os.path.dirname(dest))
    try:
        write_fn(tmp)
        _json.dump(_manifest_of(tmp), open(os.path.join(tmp, "MANIFEST.json"), "w"))
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
    except BaseException:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # never leave partial dumps
        raise
    try:
        os.rename(tmp, dest)
    except OSError:  # concurrent writer won the rename — theirs is identical
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return dest



def _col_max(sf_dir: str, table: str, col: str) -> int:
    """Max of an int column from parquet row-group statistics (no data read);
    falls back to a single-column scan when stats are absent. Used by the
    dump-oracle coverage guards — coverage is about the VALUE domain (e.g.
    max doc_id), not the row count (ADVICE r4: a small table with sparse
    large ids must still trip the guard loudly)."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(f"{sf_dir}/{table}.parquet")
    idx = f.schema_arrow.get_field_index(col)
    mx = None
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            mx = None
            break
        mx = st.max if mx is None else max(mx, st.max)
    if mx is None:  # stats missing — scan just this column
        mx = pc.max(pq.read_table(f"{sf_dir}/{table}.parquet", columns=[col])[col]).as_py()
    if mx is None:  # empty table / all-null column: no value domain at all
        return -1
    return int(mx)


# --------------------------------------------------------------------------
# Frontier / queue operator analogs (reference parity)
# --------------------------------------------------------------------------


def q_frontier_pull_batch(sf_dir: str):
    """Claim-scan: filter status, deterministic order, limit (pullBatch analog).

    The reference leaves scan order unspecified (SURVEY.md §4.3); the engine
    pins it — here (o_orderkey asc), limit 100.
    """
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"])
    ds = ds.map_batches(lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")), **_PA)
    return ds.sort("o_orderkey").limit(100).select_columns(["o_orderkey", "o_custkey", "o_totalprice"])


def q_status_counts(sf_dir: str):
    """Wave-end outcome metrics: partial count per batch, then tiny groupby-sum.

    The partial/combiner split keeps the shuffle input at one row per
    (status × batch) instead of one row per task.
    """
    ds = _read(sf_dir, "orders", ["o_orderstatus"])

    def partial(t: pa.Table) -> pa.Table:
        vc = t["o_orderstatus"].value_counts()
        return pa.table({"status": vc.field("values"), "partial_n": vc.field("counts")})

    partials = ds.map_batches(partial, **_PA)
    return partials.groupby("status").aggregate(Sum("partial_n", alias_name="n"))


def q_retry_split(sf_dir: str):
    """Attempt-capped retry fold: attempt+1 >= 3 ? failed : wait (vectorized if_else)."""
    ds = _read(sf_dir, "events", ["event_id"])

    def split(t: pa.Table) -> pa.Table:
        attempt = t["event_id"].to_numpy() % 5 + 1  # pyarrow 16 has no modulo kernel
        status = pc.if_else(pa.array(attempt >= 3), pa.scalar("failed"), pa.scalar("wait"))
        return pa.table({"event_id": t["event_id"], "next_status": status})

    return ds.map_batches(split, **_PA)


def q_dedup_keep_first(sf_dir: str):
    """Exact dedup keep-first: hash-partition by key, per-group first row.

    Reference: DELETE self-join keeping the lowest id per duplicate URL
    (SqlQueueTaskProvider.scala:73-77). Key here: (lang, source) over
    documents; "first" = lowest doc_id.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])

    def local_first(t: pa.Table) -> pa.Table:
        # per-batch combiner: keep min doc_id per key before the shuffle
        # (Arrow group_by — no pandas round-trip)
        g = t.group_by(["lang", "source"]).aggregate([("doc_id", "min")])
        return g.rename_columns(["lang", "source", "doc_id"])

    pre = ds.map_batches(local_first, **_PA)
    return pre.groupby(["lang", "source"]).aggregate(Min("doc_id", alias_name="doc_id"))


def q_anti_join_new_urls(sf_dir: str):
    """Anti-join: customers with no finished ('F') order (pushTasks dedup analog).

    Build side: per-batch distinct keys, merged into one sorted array by a
    Ray task — the blocks and the merged array live in the object store;
    the driver only ever holds ObjectRefs (r1 concatenated the keys on the
    driver). Probe side filtered vectorized per batch — no shuffle.
    """
    seen = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def keys_of(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        return pa.table({"k": pc.unique(t["o_custkey"])})

    block_refs = seen.map_batches(keys_of, **_PA).to_arrow_refs()

    @ray.remote
    def merge_keys(*tables: pa.Table) -> np.ndarray:
        parts = [t["k"].to_numpy() for t in tables if t.num_rows]
        return np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)

    merged_ref = merge_keys.remote(*block_refs)

    class AntiJoin:
        def __init__(self):
            self.seen = ray.get(merged_ref)  # sorted — searchsorted probe

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["c_custkey"].to_numpy()
            if len(self.seen):
                idx = np.clip(np.searchsorted(self.seen, keys), 0, len(self.seen) - 1)
                mask = self.seen[idx] != keys
            else:
                mask = np.ones(len(keys), bool)
            return t.filter(pa.array(mask))

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return ds.map_batches(AntiJoin, concurrency=_pool(), **_PA)


def q_broadcast_config_join(sf_dir: str):
    """Small-side broadcast join + grouped revenue (projects_url ⋈ projects analog)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    lookup_ref = ray.put(dict(zip(part["p_partkey"], part["p_brand"])))

    class JoinAgg:
        def __init__(self):
            lk = ray.get(lookup_ref)
            self.keys = np.fromiter(lk.keys(), np.int64)
            self.vals = np.array(list(lk.values()), object)
            order = np.argsort(self.keys)
            self.keys, self.vals = self.keys[order], self.vals[order]

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = t["l_partkey"].to_numpy()
            brand = self.vals[np.searchsorted(self.keys, pk)]
            # money has 2 decimals, discount 2 → product has 4: aggregate as
            # scaled int64 so the sum is exact and summation-order-independent
            rev4 = np.round(t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy()) * 1e4).astype(np.int64)
            df = pd.DataFrame({"p_brand": brand, "rev4": rev4})
            g = df.groupby("p_brand", sort=False)["rev4"].agg(["sum", "count"]).reset_index()
            return pa.table(
                {"p_brand": g["p_brand"], "partial_rev4": g["sum"], "partial_n": g["count"].astype(np.int64)}
            )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    partials = li.map_batches(JoinAgg, concurrency=_pool(), **_PA)
    agg = partials.groupby("p_brand").aggregate(
        Sum("partial_rev4", alias_name="rev4"), Sum("partial_n", alias_name="n")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"p_brand": t["p_brand"], "revenue": pc.divide(pc.cast(t["rev4"], pa.float64()), 1e4), "n": t["n"]}
        ),
        **_PA,
    )


def q_topk_priority(sf_dir: str):
    """Priority top-k: per-batch local top-k, then global sort+limit (§2.7)."""
    k = 50
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def local_topk(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("value", "descending"), ("event_id", "ascending")])
        return t.take(order[:k])

    return ds.map_batches(local_topk, **_PA).sort(["value", "event_id"], descending=[True, False]).limit(k)


def q_distinct_flags(sf_dir: str):
    """Global distinct of a low-cardinality column (distinct-before-insert analog)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag"])

    def local_unique(t: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": pc.unique(t["l_returnflag"])})

    return ds.map_batches(local_unique, **_PA).groupby("l_returnflag").aggregate(Count(alias_name="_n")).select_columns(["l_returnflag"])


# --------------------------------------------------------------------------
# Aggregation / window / session pipelines
# --------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary — the wide-agg headline (partial-agg first)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        price = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        tax = t["l_tax"].to_numpy()
        # fixed-decimal money → scaled int64 partial sums: exact, and
        # independent of summation order (matches the SQL oracle bit-for-bit)
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "l_linestatus": t["l_linestatus"].to_pandas(),
                "qty2": np.round(t["l_quantity"].to_numpy() * 1e2).astype(np.int64),
                "base2": np.round(price * 1e2).astype(np.int64),
                "disc_price4": np.round(price * (1.0 - disc) * 1e4).astype(np.int64),
                "charge6": np.round(price * (1.0 - disc) * (1.0 + tax) * 1e6).astype(np.int64),
                "disc2": np.round(disc * 1e2).astype(np.int64),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            qty2=("qty2", "sum"),
            base2=("base2", "sum"),
            disc_price4=("disc_price4", "sum"),
            charge6=("charge6", "sum"),
            disc2=("disc2", "sum"),
            count_order=("qty2", "size"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False).replace_schema_metadata(None)

    partials = ds.map_batches(partial, **_PA)
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty2", alias_name="qty2"),
        Sum("base2", alias_name="base2"),
        Sum("disc_price4", alias_name="disc_price4"),
        Sum("charge6", alias_name="charge6"),
        Sum("disc2", alias_name="disc2"),
        Sum("count_order", alias_name="count_order"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        f = lambda col, s: pc.divide(pc.cast(t[col], pa.float64()), s)  # noqa: E731
        n = pc.cast(t["count_order"], pa.float64())
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": f("qty2", 1e2),
                "sum_base_price": f("base2", 1e2),
                "sum_disc_price": f("disc_price4", 1e4),
                "sum_charge": f("charge6", 1e6),
                "avg_qty": pc.divide(f("qty2", 1e2), n),
                "avg_price": pc.divide(f("base2", 1e2), n),
                "avg_disc": pc.divide(f("disc2", 1e2), n),
                "count_order": t["count_order"],
            }
        )

    return out.map_batches(finalize, **_PA)


def q_windowed_agg(sf_dir: str):
    """Tumbling 1-hour window per user over the events stream (SURVEY.md §2.10:
    the reference has no windows; this is the training-pipeline extension)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        v2 = np.round(t["value"].to_numpy() * 1e2).astype(np.int64)  # 2-decimal money → exact int sums
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(), "window_start": win.to_pandas(), "v2": v2})
        g = df.groupby(["user_id", "window_start"], sort=False).agg(pn=("v2", "size"), pv2=("v2", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = (
        ds.map_batches(partial, **_PA)
        .groupby(["user_id", "window_start"])
        .aggregate(Sum("pn", alias_name="n_events"), Sum("pv2", alias_name="v2"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "window_start": t["window_start"].cast(pa.timestamp("us")),
                "n_events": t["n_events"],
                "sum_value": pc.divide(pc.cast(t["v2"], pa.float64()), 1e2),
            }
        ),
        **_PA,
    )


def q_sessionize(sf_dir: str):
    """Session windows (30-min gap) per user — bucketed + vectorized.

    Scale note: a per-user ``groupby(user_id).map_groups`` pays one Python/
    pandas dispatch per user (VERDICT r3 #1). Instead users are hash-bucketed
    (64 buckets) and each bucket sessionizes ALL its users in one vectorized
    pass — sort by (user_id, ts, event_id), flag session starts with a
    shifted compare, global cumsum re-based per user — the same pattern as
    q_asof_prev_event / q_running_sum (~100x fewer Python dispatches)."""
    gap = pd.Timedelta(minutes=30)
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pa.array(t["user_id"].to_numpy() % 64, pa.int32()))

    def sess_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        # a session starts at a >30min gap or a user boundary (first row of
        # each user: shift() yields NaN, ne() → True)
        new = (g["ts"].diff() > gap) | g["user_id"].ne(g["user_id"].shift())
        sid = new.cumsum()
        # user rows are contiguous and sid is monotone, so re-basing to the
        # user's first sid restarts session_id at 1 per user
        g["session_id"] = (sid - sid.groupby(g["user_id"]).transform("min") + 1).astype(np.int64)
        g["v2"] = np.round(g["value"].to_numpy() * 1e2).astype(np.int64)
        out = (
            g.groupby(["user_id", "session_id"], sort=False)
            .agg(session_start=("ts", "min"), n_events=("event_id", "size"), v2=("v2", "sum"))
            .reset_index()
        )
        out["sum_value"] = out["v2"] / 1e2
        return out[["user_id", "session_id", "session_start", "n_events", "sum_value"]]

    return ds.map_batches(add_bucket, **_PA).groupby("bucket").map_groups(sess_bucket, batch_format="pandas")


def q_asof_prev_event(sf_dir: str):
    """Backward as-of self-join: each event matched to the same user's most
    recent strictly-earlier event (id + gap in µs) — the as-of pattern Ray
    Data lacks natively, expressed as key-bucketed groups + one vectorized
    ordered pass per bucket (no per-key Python dispatch, no global sort).
    Events with no predecessor are omitted (keeps the result null-free)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pa.array(t["user_id"].to_numpy() % 64, pa.int32()))

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev_id = g.groupby("user_id", sort=False)["event_id"].shift(1)
        prev_ts = g.groupby("user_id", sort=False)["ts"].shift(1)
        keep = prev_id.notna()
        gap = (g["ts"][keep] - prev_ts[keep]).dt.total_seconds() * 1e6
        return pd.DataFrame(
            {
                "event_id": g["event_id"][keep].to_numpy(),
                "prev_event_id": prev_id[keep].astype(np.int64).to_numpy(),
                "gap_us": np.round(gap.to_numpy()).astype(np.int64),
            }
        )

    return ds.map_batches(add_bucket, **_PA).groupby("bucket").map_groups(asof_bucket, batch_format="pandas")


def q_running_sum(sf_dir: str):
    """Per-order running quantity — ordered windowed fold (window-function analog).

    Scale note: a naive ``groupby(key).map_groups`` pays Python dispatch per
    group (15k groups at sf0.01). Instead groups are hash-bucketed (64
    buckets) and each bucket computes *all* its groups' running sums with one
    vectorized pandas groupby-cumsum — same co-location guarantee, ~100x
    fewer Python calls.
    """
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pa.array(t["l_orderkey"].to_numpy() % 64, pa.int32()))

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["q2"] = np.round(g["l_quantity"].to_numpy() * 1e2).astype(np.int64)
        # (l_orderkey, l_linenumber) is not unique in the synthetic data: break
        # ties by quantity so fully-tied rows yield identical output multisets
        g = g.sort_values(["l_orderkey", "l_linenumber", "q2"], kind="stable")
        g["running_qty"] = g.groupby("l_orderkey")["q2"].cumsum() / 1e2
        return g[["l_orderkey", "l_linenumber", "running_qty"]]

    return ds.map_batches(add_bucket, **_PA).groupby("bucket").map_groups(run_bucket, batch_format="pandas")


def q_zscore(sf_dir: str):
    """Per-group z-score normalization (feature-scaling staple): population
    z of event value within its event_type. Group moments (sum, count, sum
    of squares) are EXACT int64 aggregates over cents — a tiny table,
    broadcast back over the stream — and the score is computed as
    ``(c·n − S) / sqrt(n·Q − S²)``: all integer arithmetic until one IEEE
    divide + sqrt performed identically on both sides, so the oracle is
    bit-checkable (no float accumulation order anywhere). ``n·Q − S²`` is
    evaluated per group in arbitrary-precision Python ints (it exceeds
    int64 past ~60k rows/group; DuckDB's side is HUGEINT) and the per-row
    ``c·n − S`` is overflow-GUARDED via the tracked max |c| — a group too
    large for the int64 row path raises loudly instead of wrapping to NaN.
    The stats pass re-reads the (column-pruned) input rather than pinning
    it. Undefined (±inf/nan) for zero-variance groups, as in SQL."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial_moments(t: pa.Table) -> pa.Table:
        c = np.round(t["value"].to_numpy() * 1e2).astype(np.int64)
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False), "c": c, "c2": c * c, "a": np.abs(c)}
        )
        out = (
            df.groupby("event_type", sort=False)
            .agg(s=("c", "sum"), n=("c", "count"), q=("c2", "sum"), m=("a", "max"))
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    stats = (
        ds.map_batches(partial_moments, **_PA)
        .groupby("event_type")
        .aggregate(
            Sum("s", alias_name="s"),
            Sum("n", alias_name="n"),
            Sum("q", alias_name="q"),
            Max("m", alias_name="m"),
        )
        .to_pandas()
    )
    lk = {}
    for r in stats.itertuples():
        s, n, q, m = int(r.s), int(r.n), int(r.q), int(r.m)
        if m * n + abs(s) >= 2**63:
            raise ValueError(
                f"zscore group {r.event_type!r} too large for the int64 row path "
                f"(max|c|·n + |S| ≥ 2^63); shard the group or widen the row kernel"
            )
        # n·Q − S² in exact Python ints (wraps int64 past ~60k rows/group),
        # then one correctly-rounded int→double conversion + IEEE sqrt —
        # identical to DuckDB's HUGEINT → DOUBLE → sqrt
        lk[r.event_type] = (s, n, float(np.sqrt(np.float64(n * q - s * s))))
    ref = ray.put(lk)

    class Z:
        def __init__(self):
            lk = ray.get(ref)
            self.types = np.array(sorted(lk), object)
            self.s = np.array([lk[t][0] for t in self.types], np.int64)
            self.n = np.array([lk[t][1] for t in self.types], np.int64)
            self.sqrtzd = np.array([lk[t][2] for t in self.types], np.float64)

        def __call__(self, t: pa.Table) -> pa.Table:
            et = t["event_type"].to_numpy(zero_copy_only=False)
            i = np.searchsorted(self.types, et)
            c = np.round(t["value"].to_numpy() * 1e2).astype(np.int64)
            zn = c * self.n[i] - self.s[i]
            with np.errstate(divide="ignore", invalid="ignore"):
                z = zn.astype(np.float64) / self.sqrtzd[i]
            return pa.table({"event_id": t["event_id"], "event_type": t["event_type"], "z": pa.array(z)})

    return ds.map_batches(Z, concurrency=_pool(), **_PA)


def q_percentile_rank(sf_dir: str):
    """Per-row percentile rank of event value within its event_type —
    ``percent_rank() OVER (PARTITION BY event_type ORDER BY value)``, the
    rank-normalization a feature pipeline applies before thresholding.

    Distributed shape (the length-filter histogram pattern, not a
    per-partition sort): each batch emits (event_type, value, count)
    partials — the combiner — one tiny groupby-sum collapses them to the
    per-type value HISTOGRAM (≤ distinct values per type rows, KBs at
    2-decimal value granularity), whose cumulative counts give rank =
    1 + #strictly-smaller for every value; the broadcast lookup is then a
    pure vectorized map over the events stream. percent_rank = (rank−1)/
    (n−1) — one float division performed identically in numpy and DuckDB,
    so the oracle is bit-checkable. No per-type sort, no O(rows) driver
    state, single-row types emit 0.0 exactly like SQL."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["event_type", "value"]).group_by(["event_type", "value"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "value", "partial"])

    hist = (
        ds.map_batches(partial, **_PA)
        .groupby(["event_type", "value"])
        .aggregate(Sum("partial", alias_name="cnt"))
        .take_all()
    )  # KB-sized: one row per distinct (type, value)
    by_type: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    import collections

    rows = collections.defaultdict(list)
    for r in hist:
        rows[r["event_type"]].append((float(r["value"]), int(r["cnt"])))
    for etype, vals in rows.items():
        vals.sort()
        v = np.array([x for x, _ in vals], np.float64)
        cum_below = np.concatenate([[0], np.cumsum([c for _, c in vals])[:-1]])
        n = int(sum(c for _, c in vals))
        by_type[etype] = (v, cum_below.astype(np.int64), n)
    ref = ray.put(by_type)

    class Rank:
        def __init__(self):
            self.by_type = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            enc = pc.dictionary_encode(t["event_type"].combine_chunks())
            codes = enc.indices.to_numpy()
            vals = t["value"].to_numpy()
            out = np.zeros(t.num_rows, np.float64)
            for code, etype in enumerate(enc.dictionary.to_pylist()):
                m = codes == code
                v, below, n = self.by_type[etype]
                if n > 1:
                    idx = np.searchsorted(v, vals[m])
                    out[m] = below[idx] / float(n - 1)  # (rank-1)/(n-1)
            return pa.table({"event_id": t["event_id"], "pct_rank": pa.array(out, pa.float64())})

    return ds.map_batches(Rank, concurrency=_pool(), **_PA)


def q_sliding_avg(sf_dir: str):
    """Sliding-window aggregate: 3-row moving average of event value per
    user (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — the sliding
    complement of the tumbling ``windowed_agg``. Same bucketed dispatch as
    ``running_sum``; inside a bucket the window is two vectorized
    shifted-compares (no per-group Python, no pandas .rolling dispatch).
    Values aggregate as exact cents; the single float division at the end
    is performed identically on both sides, so the oracle is
    bit-checkable."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pa.array(t["user_id"].to_numpy() % 64, pa.int32()))

    def win_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        c = np.round(g["value"].to_numpy() * 1e2).astype(np.int64)
        u = g["user_id"].to_numpy()
        same1 = np.concatenate([[False], u[1:] == u[:-1]])
        same2 = np.concatenate([[False, False], u[2:] == u[:-2]]) if len(u) > 1 else np.zeros(len(u), bool)
        prev1 = np.concatenate([[0], c[:-1]])
        prev2 = np.concatenate([[0, 0], c[:-2]]) if len(c) > 1 else np.zeros(len(c), np.int64)
        wsum = c + prev1 * same1 + prev2 * same2
        wn = 1 + same1.astype(np.int64) + same2.astype(np.int64)
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(), "user_id": u, "avg3": wsum / (wn * 100.0)}
        )

    return ds.map_batches(add_bucket, **_PA).groupby("bucket").map_groups(win_bucket, batch_format="pandas")


# --------------------------------------------------------------------------
# Text analysis (documents)
# --------------------------------------------------------------------------


def q_token_count(sf_dir: str):
    """Whitespace token count per doc — fully vectorized pyarrow.compute
    (split_pattern_regex + list_value_length, no Python row loop)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "n_tokens": T.ws_token_count_arrow(t["text"])})

    return ds.map_batches(f, **_PA)


def q_bpe_token_count(sf_dir: str):
    """BPE-ish pre-tokenizer counts (letter runs / digit runs / single
    punctuation — the LLM-token-estimate staple), vectorized via
    count_substring_regex."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
        return pa.table({"doc_id": t["doc_id"], "n_bpe_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(f, **_PA)


def q_text_quality(sf_dir: str):
    """Length/punct quality metrics per doc (SQL-checkable subset) —
    vectorized pyarrow.compute kernels."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars_actual": pc.cast(pc.utf8_length(t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]), pa.int64()),
                "punct_ratio": pc.round(T.punct_ratio_arrow(t["text"]), 6),
            }
        )

    return ds.map_batches(f, **_PA)


def q_lang_id(sf_dir: str):
    """Language-ID heuristic per doc (non-SQL: rows-only check)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    class LangId:
        def __call__(self, t: pa.Table) -> pa.Table:
            return pa.table({"doc_id": t["doc_id"], "lang_pred": T.lang_id(t["text"].to_pylist())})

    return ds.map_batches(LangId, concurrency=_pool(), **_PA)


def q_fingerprint(sf_dir: str):
    """Winnowing fingerprints per doc (non-SQL: rows-only check)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "fingerprint": T.doc_fingerprint(t["text"].to_pylist())})

    return ds.map_batches(f, **_PA)


def q_fingerprint_neardup(sf_dir: str):
    """MOSS-style near-dup pairs by winnowing-fingerprint overlap: two docs
    sharing ≥ 2 distinct window minima (``doc_winnow_minima`` — the same
    selection ``doc_fingerprint`` folds into one value) are near-dups.
    Complements the per-doc fingerprint query with the pairing step a
    plagiarism/near-dup pipeline actually runs.

    Distributed shape (the phash-banding pattern): per batch, explode each
    doc's distinct minima (complete in-batch — a doc is one row), bucket by
    minimum-hash modulo a corpus-scaled bucket count, pair equal minima
    inside each bucket group (each minimum lives in exactly one bucket, so
    no pair is double-counted), then one (doc_a, doc_b) groupby-count with
    the ≥ 2 threshold — work scales with shared-minima candidates, never
    block². Oracle: the fingerprint oracle's ``minima`` CTE (exact SQL
    restatement of the rolling hash + winnowing) self-joined on the
    minimum value."""
    K = 2
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_buckets = max(64, _row_count(sf_dir, "documents") // 64)

    def explode(t: pa.Table) -> pa.Table:
        idx, m = T.doc_winnow_minima(t["text"].to_pylist())
        return pa.table(
            {
                "doc_id": pa.array(t["doc_id"].to_numpy()[idx], pa.int64()),
                "m": pa.array(m.view(np.int64), pa.int64()),
                "bucket": pa.array((m % np.uint64(n_buckets)).astype(np.int64), pa.int64()),
            }
        )

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dup = g.duplicated("m", keep=False)
        g = g[dup]
        if not len(g):
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)}
            )
        mm = g.merge(g, on="m")
        mm = mm[mm["doc_id_x"] < mm["doc_id_y"]]
        return pd.DataFrame({"doc_a": mm["doc_id_x"].to_numpy(), "doc_b": mm["doc_id_y"].to_numpy()})

    cand = (
        ds.map_batches(explode, **_PA)
        .groupby("bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_shared"))
    )
    return cand.map_batches(lambda t: t.filter(pc.greater_equal(t["n_shared"], K)), **_PA)


# --------------------------------------------------------------------------
# Dedup suite (documents) — exact, minhash-LSH, simhash, n-gram jaccard
# --------------------------------------------------------------------------


def q_exact_text_dedup(sf_dir: str):
    """Exact content dedup: text-hash partition, keep lowest doc_id per hash."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "text_hash": hash64(t["text"])})

    return (
        ds.map_batches(add_hash, **_PA)
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )


class _MinHashStage:
    """Actor-pool stage: shingle + MinHash signatures (MinHasher built once)."""

    def __init__(self, num_perm: int = 128, num_bands: int = 16):
        self.mh = T.MinHasher(num_perm=num_perm)
        self.num_bands = num_bands

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        shingle_sets = [T.shingle_hashes(txt) for txt in texts]
        sigs = self.mh.signatures_batch(shingle_sets)
        keys = self.mh.band_keys_batch(sigs, self.num_bands)
        n = len(texts)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(t["doc_id"].to_numpy(), self.num_bands), pa.int64()),
                "band_id": pa.array(np.tile(np.arange(self.num_bands, dtype=np.int32), n), pa.int32()),
                "band_key": pa.array(keys.ravel(), pa.uint64()),
            }
        )


def q_minhash_lsh_pairs(sf_dir: str):
    """MinHash-LSH near-dup candidates: shingle→minhash→band→bucket groupby.

    Returns candidate pairs (doc_a < doc_b) that share ≥1 LSH band bucket,
    with n_bands = how many of the 16 bands collide. Oracle-checked: the
    whole shingle→signature→band-key pipeline is reproduced in DuckDB SQL
    (see _minhash_oracle_sql) down to numpy's uint64 wraparound.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bands = ds.map_batches(_MinHashStage, concurrency=_pool(), **_PA)
    # most (band_id, band_key) buckets are singletons: grouping by a coarse
    # bucket and pairing vectorized inside beats one map_groups dispatch per
    # LSH bucket (~one per doc×band); bucket count scales with the corpus so
    # per-group size stays ~bounded (≈64 docs × 16 bands per bucket)
    n_buckets = max(256, _row_count(sf_dir, "documents") // 64)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pa.array((t["band_key"].to_numpy() % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dup = g.duplicated(["band_id", "band_key"], keep=False)
        g = g[dup]
        if not len(g):
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)})
        m = g.merge(g, on=["band_id", "band_key"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame({"doc_a": m["doc_id_x"].to_numpy(), "doc_b": m["doc_id_y"].to_numpy()})

    cand = bands.map_batches(add_bucket, **_PA).groupby("bucket").map_groups(pairs_bucket, batch_format="pandas")
    # distinct pairs
    return cand.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))


def q_simhash(sf_dir: str):
    """64-bit SimHash per doc (rows-only; near-dup = small hamming distance)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "simhash": T.simhash64(t["text"].to_pylist())})

    return ds.map_batches(f, **_PA)


def q_ngram_jaccard_dedup(sf_dir: str):
    """Blocked n-gram Jaccard near-dup via exact prefix filtering.

    Replaces r1's all-pairs loop (O(n²) per (lang, source) block — the
    VERDICT scale-killer) with the AllPairs/PPJoin prefix principle: order
    each doc's shingle hashes globally (ascending), keep the prefix of
    length |A| - ⌈t·|A|⌉ + 1; any pair with Jaccard ≥ t MUST share a prefix
    hash (|A∩B| ≥ ⌈t·max(|A|,|B|)⌉, so missing the whole prefix leaves too
    few slots for the overlap). Deterministic — no false negatives, unlike
    MinHash-LSH — so the DuckDB oracle matches exactly. Candidates group by
    (prefix_hash % buckets) and are verified by exact Jaccard after joining
    the shingle sets back on; work is proportional to candidates, not
    block².
    """
    t_thresh = 0.5
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    n_buckets = max(256, _row_count(sf_dir, "documents") // 64)

    def shingle_sets(t: pa.Table) -> pa.Table:
        # sets ride as binary blobs (sorted uint64 LE) — Acero hash joins
        # don't accept list-typed payload columns
        sh = [np.sort(T.shingle_hashes(x)).tobytes() for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "source": t["source"],
                "sh": pa.array(sh, pa.binary()),
            }
        )

    # shingle-set blobs are LARGER than the text itself — persist them to a
    # parquet side table once and stream all three consumers (prefix
    # explode + both verify-join sides) from it, instead of pinning the
    # whole corpus's sets in the object store (VERDICT r4 #4)
    sets_dir = _parquet_side_table(
        ("ngram_sets", os.path.realpath(sf_dir), _source_stat(sf_dir, "documents")),
        lambda: ds.map_batches(shingle_sets, **_PA),
    )
    sets = rd.read_parquet(sets_dir)

    def explode_prefix(t: pa.Table) -> pa.Table:
        # prefix length |A| - ceil(t·|A|) + 1 per doc; empty docs bucket
        # together (jaccard(∅,∅)=1). Row assembly is np.repeat/take —
        # no per-row Python append loops (VERDICT r3 #4/#7); the list
        # comprehension only slices each doc's candidate-bounded prefix.
        arrs = [np.frombuffer(s, np.uint64) for s in t["sh"].to_pylist()]
        lens = np.array([len(a) for a in arrs], np.int64)
        plen = np.where(lens == 0, 1, lens - np.ceil(t_thresh * lens).astype(np.int64) + 1)
        if arrs:
            ph = np.concatenate(
                [a[:p] if len(a) else np.zeros(1, np.uint64) for a, p in zip(arrs, plen)]
            ).astype(np.uint64)
        else:
            ph = np.zeros(0, np.uint64)
        idx = pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64), plen))
        return pa.table(
            {
                "doc_id": t["doc_id"].take(idx),
                "ph": pa.array(ph, pa.uint64()),
                "lang": t["lang"].take(idx),
                "source": t["source"].take(idx),
                "bucket": pa.array((ph % np.uint64(n_buckets)).astype(np.int64), pa.int64()),
            }
        )

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dup = g.duplicated(["ph", "lang", "source"], keep=False)
        g = g[dup]
        if not len(g):
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)})
        m = g.merge(g, on=["ph", "lang", "source"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame({"doc_a": m["doc_id_x"].to_numpy(), "doc_b": m["doc_id_y"].to_numpy()})

    cand = (
        sets.map_batches(explode_prefix, **_PA)
        .groupby("bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))
    )
    n_parts = int(max(2, min(16, ray.cluster_resources().get("CPU", 8) // 2)))
    cand = _agg_join_side(cand, n_parts).select_columns(["doc_a", "doc_b"])
    # verify: join shingle sets back on and compute exact Jaccard
    side = sets.map_batches(lambda t: t.select(["doc_id", "sh"]), **_PA)
    j1 = cand.join(side, join_type="inner", num_partitions=n_parts, on=("doc_a",), right_on=("doc_id",))
    j1 = j1.map_batches(
        lambda t: t.select(["doc_a", "doc_b", "sh"]).rename_columns(["doc_a", "doc_b", "sh_a"]), **_PA
    )
    j2 = j1.join(side, join_type="inner", num_partitions=n_parts, on=("doc_b",), right_on=("doc_id",))

    def verify(t: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a, b, sa, sb in zip(
            t["doc_a"].to_pylist(), t["doc_b"].to_pylist(), t["sh_a"].to_pylist(), t["sh"].to_pylist()
        ):
            jac = T.jaccard(np.frombuffer(sa, np.uint64), np.frombuffer(sb, np.uint64))
            if jac >= t_thresh:
                out_a.append(a); out_b.append(b); out_j.append(round(jac, 6))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard_sim": pa.array(out_j, pa.float64()),
            }
        )

    return j2.map_batches(verify, **_PA)


# --------------------------------------------------------------------------
# Similarity search (embeddings)
# --------------------------------------------------------------------------


def _query_vector(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    # row-group-pruned filtered read: the driver pulls ONE row, not the table
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"], filters=[("vec_id", "==", 0)]
    )
    return np.asarray(t["embedding"][0].as_py(), np.float64)


def q_embedding_topk(sf_dir: str):
    """Brute-force cosine top-k vs broadcast query vector (ANN baseline).

    Per batch: one numpy matmul against the query; local top-k; global
    sort+limit merges.
    """
    k = 10
    q = _query_vector(sf_dir)
    qn = q / np.linalg.norm(q)
    qref = ray.put(qn)

    class Score:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            emb = _emb_matrix(t["embedding"])
            norms = np.linalg.norm(emb, axis=1)
            sims = (emb @ self.q) / np.where(norms == 0, 1, norms)
            out = pa.table({"vec_id": t["vec_id"], "cos_sim": np.round(sims, 6)})
            order = pc.sort_indices(out, sort_keys=[("cos_sim", "descending"), ("vec_id", "ascending")])
            return out.take(order[: k + 1])

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    scored = ds.map_batches(Score, concurrency=_pool(), **_PA)
    scored = scored.map_batches(lambda t: t.filter(pc.not_equal(t["vec_id"], 0)), **_PA)
    return scored.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)


def neardup_pairs_block(ids: np.ndarray, emb: np.ndarray, tau: float = 0.3, ch: int = 512,
                        direct_below: int = 512) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All pairs with cosine ≥ tau within one block — COMPLETE candidate
    blocking via deterministic spherical k-means (VERDICT r2 #5).

    Instead of the r2 all-pairs chunked matmul (O(n²·d) FLOPs per label
    block), vectors are clustered into K = ⌈√n⌉ spherical k-means cells
    (seeded by id-order strides + a fixed Lloyd count → deterministic).
    A vector a is compared against cell c's members iff
    angle(a, centroid_c) ≤ arccos(tau) + radius_c: by the triangle
    inequality on the sphere, any pair (a, b) with angle(a,b) ≤ arccos(tau)
    has a probing b's home cell — no false negatives, so the exact SQL
    oracle still matches. Cost: O(n^1.5·d) assignment + Σ|probe_c|·|cell_c|
    exact verifies — for clustered near-dup data ≈ O(n^1.5·d); for
    adversarially uniform data it degrades toward all-pairs but never
    drops a pair. Memory stays O(ch·n·8) via row-chunked matmuls.

    ``ids`` must be sorted ascending; returns (vec_a, vec_b, cos_sim
    rounded to 6) with vec_a < vec_b."""
    n = len(ids)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    x = emb / np.where(norms == 0, 1, norms)
    if n <= direct_below:  # small blocks: direct chunked all-pairs
        out_a, out_b, out_s = [], [], []
        for i0 in range(0, n, ch):
            sims = x[i0 : i0 + ch] @ x.T
            loc, col = np.nonzero(sims >= tau)
            row = loc + i0
            keep = col > row
            out_a.append(row[keep]); out_b.append(col[keep])
            out_s.append(np.round(sims[loc[keep], col[keep]], 6))
        a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
        s = np.concatenate(out_s) if out_s else np.zeros(0, np.float64)
        return ids[a], ids[b], s
    K = int(np.ceil(np.sqrt(n)))
    c = x[np.linspace(0, n - 1, K).astype(np.int64)].copy()  # id-stride seeding
    cn = np.linalg.norm(c, axis=1, keepdims=True)
    c = c / np.where(cn == 0, 1, cn)
    for _ in range(4):  # fixed Lloyd count → deterministic
        assign = np.empty(n, np.int64)
        for i0 in range(0, n, ch):
            assign[i0 : i0 + ch] = np.argmax(x[i0 : i0 + ch] @ c.T, axis=1)
        for j in range(K):
            m = assign == j
            if m.any():
                v = x[m].sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    c[j] = v / nv
    own = np.empty(n, np.float64)
    for i0 in range(0, n, ch):
        sims = x[i0 : i0 + ch] @ c.T
        assign[i0 : i0 + ch] = np.argmax(sims, axis=1)
        own[i0 : i0 + ch] = sims[np.arange(len(sims)), assign[i0 : i0 + ch]]
    theta_own = np.arccos(np.clip(own, -1.0, 1.0))
    radius = np.zeros(K, np.float64)
    np.maximum.at(radius, assign, theta_own)
    theta_tau = np.arccos(np.clip(tau, -1.0, 1.0))
    # probe threshold per cell: cos(theta_tau + radius_c), -1 when the sum
    # passes pi (probe everything); small epsilon absorbs arccos rounding
    probe_cos = np.where(theta_tau + radius >= np.pi, -1.0, np.cos(theta_tau + radius)) - 1e-9
    out_keys, out_s = [], []
    members = [np.flatnonzero(assign == j) for j in range(K)]
    for i0 in range(0, n, ch):
        sims_c = x[i0 : i0 + ch] @ c.T  # (chunk, K) probe test
        for j in range(K):
            mj = members[j]
            if not len(mj):
                continue
            probers = np.flatnonzero(sims_c[:, j] >= probe_cos[j]) + i0
            if not len(probers):
                continue
            sims = x[probers] @ x[mj].T
            loc, col = np.nonzero(sims >= tau)
            a_pos, b_pos = probers[loc], mj[col]
            keep = a_pos < b_pos
            out_keys.append(a_pos[keep].astype(np.uint64) * np.uint64(n) + b_pos[keep].astype(np.uint64))
            out_s.append(np.round(sims[loc[keep], col[keep]], 6))
    if not out_keys:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.float64)
    keys = np.concatenate(out_keys)
    svals = np.concatenate(out_s)
    _, first = np.unique(keys, return_index=True)  # pair found via ≤2 home cells → dedup
    keys, svals = keys[first], svals[first]
    a_pos = (keys // np.uint64(n)).astype(np.int64)
    b_pos = (keys % np.uint64(n)).astype(np.int64)
    return ids[a_pos], ids[b_pos], svals


# per-label embedding block cap for q_embedding_neardup: one label's
# float64 embedding matrix must fit comfortably in a worker task heap
_NEARDUP_MAX_BLOCK_BYTES = 1 << 30


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs, blocked by label (sim ≥ 0.3).

    Per label group: complete spherical-k-means candidate blocking + exact
    verify (neardup_pairs_block) — O(n^1.5·d)-ish FLOPs with no false
    negatives (the property test proves pair-set equality vs brute force),
    chunked matmuls bounding peak memory at O(512·n·8).

    One label = one pandas task, so a pathologically hot label would load
    its whole embedding block into a single worker heap — guarded loudly
    (``_NEARDUP_MAX_BLOCK_BYTES``, VERDICT r4 #6, same fail-loud style as
    the zscore overflow guard): past the bound the right move is salting
    the hot label into sub-blocks plus a cross-block probe pass, which
    changes the shuffle plan and must be an explicit decision, not an OOM."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def block(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        emb = np.array(g["embedding"].tolist(), np.float64)[order]
        if emb.nbytes > _NEARDUP_MAX_BLOCK_BYTES:
            lbl = g["label"].iloc[0] if len(g) else "?"
            raise ValueError(
                f"embedding_neardup: label {lbl!r} has {len(ids)} rows "
                f"({emb.nbytes >> 20} MiB of embeddings) — exceeds the per-label "
                f"block bound ({_NEARDUP_MAX_BLOCK_BYTES >> 20} MiB); salt this "
                "label into sub-blocks with a cross-block probe pass instead of "
                "letting one task hold the whole block"
            )
        a, b, s = neardup_pairs_block(ids, emb)
        return pd.DataFrame({
            "vec_a": pd.Series(a, dtype=np.int64),
            "vec_b": pd.Series(b, dtype=np.int64),
            "cos_sim": pd.Series(s, dtype=np.float64),
        })

    return ds.groupby("label").map_groups(block, batch_format="pandas")


def _knuth_key(ids: np.ndarray) -> np.ndarray:
    """Overflow-free 32-bit Knuth multiplicative hash (uint64 arithmetic;
    mirrors the UBIGINT expression in every oracle that samples/splits —
    keep the two in lockstep)."""
    ids = np.asarray(ids).astype(np.uint64)
    return ((ids % np.uint64(2**32)) * np.uint64(2654435761)) % np.uint64(2**32)


def _token_count_array(texts) -> pa.Array:
    """Whitespace token count per row, 0 for blank text (matches the
    oracles' trim + string_split_regex('\\s+') expression)."""
    trimmed = pc.utf8_trim_whitespace(texts)
    n = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    return pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int64()), pc.cast(n, pa.int64()))


def _trigram_ratios(texts, n_rows: int) -> np.ndarray:
    """Per-row trigram repetition ratio 1 − distinct/total (unrounded;
    0.0 below 3 tokens) — shared by repetition_score and the curation
    flagship so the metric cannot drift from its oracle."""
    trimmed = pc.utf8_trim_whitespace(texts)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
    counts = pc.list_value_length(toks).fill_null(0).to_numpy().astype(np.int64)
    ratios = np.zeros(n_rows, np.float64)
    if len(flat):
        rep_idx = pc.list_parent_indices(toks).to_numpy().astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(len(flat)) - starts[rep_idx]
        valid = np.flatnonzero(pos <= counts[rep_idx] - 3)
        if len(valid):
            tg = flat[valid] + " " + flat[valid + 1] + " " + flat[valid + 2]
            df = pd.DataFrame({"d": rep_idx[valid], "tg": tg})
            agg = df.groupby("d")["tg"].agg(total="size", dist="nunique")
            ratios[agg.index.to_numpy()] = (
                1.0 - agg["dist"].to_numpy() / agg["total"].to_numpy().astype(np.float64)
            )
    return ratios


def q_sample_split(sf_dir: str):
    """Deterministic train/val/test split — the dataset-curation staple.

    Split key = Knuth multiplicative hash of doc_id masked to 32 bits
    before the multiply, so the uint64 product never wraps (max
    (2^32-1)·2654435761 < 2^64) and the DuckDB oracle's UBIGINT arithmetic
    reproduces it exactly for ANY doc_id — including ids ≥ 2^32 that would
    overflow an int64 multiply (ADVICE r2). 80/10/10 by key range. Pure
    map_batches — embarrassingly parallel, no shuffle, stable across runs
    and cluster sizes.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def split(t: pa.Table) -> pa.Table:
        frac = _knuth_key(t["doc_id"].to_numpy()) / 4294967296.0
        s = np.where(frac < 0.8, "train", np.where(frac < 0.9, "val", "test"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "split": pa.array(s.tolist(), pa.string()),
            }
        )

    return ds.map_batches(split, **_PA)


def q_top_terms(sf_dir: str):
    """Top-5 terms per language by document frequency — the word-count /
    vocabulary-stats staple over the corpus.

    Shape: vectorized tokenize+explode (split_pattern_regex → list_flatten,
    distinct per doc), per-batch partial counts via Arrow group_by (the
    combiner that keeps the shuffle at one row per (lang, token, batch)),
    global groupby-sum, then per-lang top-k. Ties broken by token asc.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def explode_terms(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(pc.utf8_lower(t["text"]))
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        flat = pc.list_flatten(toks)
        rep = pc.list_parent_indices(toks)
        one = pa.table(
            {
                "lang": pc.take(t["lang"], rep),
                "doc": pc.take(t["doc_id"], rep),
                "token": flat,
            }
        ).filter(pc.not_equal(flat, ""))
        # document frequency: distinct (lang, doc, token), then partial count
        one = one.group_by(["lang", "doc", "token"]).aggregate([]).drop_columns(["doc"])
        g = one.group_by(["lang", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "token", "partial_df"])

    partials = ds.map_batches(explode_terms, **_PA)
    agg = partials.groupby(["lang", "token"]).aggregate(Sum("partial_df", alias_name="df"))

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pa.array(np.zeros(t.num_rows, np.int32), pa.int32()))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "df", "token"], ascending=[True, False, True], kind="stable")
        out = g.groupby("lang", sort=False).head(5)
        return out[["lang", "token", "df"]]

    # langs are low-cardinality: one group task finalizes all of them
    return agg.map_batches(add_bucket, **_PA).groupby("bucket").map_groups(topk, batch_format="pandas")


def q_tfidf_topk(sf_dir: str):
    """Top-3 distinguishing terms per document by TF-IDF — the relevance /
    quality-signal staple: corpus-wide document frequencies are a SMALL
    aggregate, broadcast once and joined back to per-doc term counts, so
    the corpus itself is never shuffled by token.

    Scoring uses the integer-exact idf' = 1/df (``score = tf·10^6 // df``,
    same floor division both sides) so the DuckDB oracle is bit-checkable;
    a log-idf variant is the one-line ``np.log(N/df)`` change. The DF pass
    re-runs the (cheap, streaming) tokenize rather than pinning the
    token-level dataset in the object store, and tf ⋈ df is a DISTRIBUTED
    hash join on token (VERDICT r4 #3: the corpus vocabulary over web-scale
    text is unbounded — typos, URLs, numbers — so it must never be pulled
    to the driver or broadcast whole). Per-doc top-k finalizes via the
    bucketed vectorized pattern (one pandas pass per bucket, not one
    dispatch per doc).

    Tokenize trims ASCII whitespace only (RE2 ``\\s`` = ``[ \\t\\n\\f\\r]``),
    matching the DuckDB oracle's regexp trim exactly — Unicode-aware
    ``utf8_trim_whitespace`` diverges on e.g. U+00A0 edges (ADVICE r4).
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode_tf(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(pc.utf8_lower(t["text"]), " \t\n\f\r")
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        flat = pc.list_flatten(toks)
        rep = pc.list_parent_indices(toks)
        one = pa.table({"doc_id": pc.take(t["doc_id"], rep), "token": flat}).filter(
            pc.not_equal(flat, "")
        )
        # a doc's text is one row, so its term counts complete in-batch
        g = one.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "token", "tf"])

    tf = ds.map_batches(explode_tf, **_PA)

    def partial_df(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "partial_df"])

    df_ds = (
        ds.map_batches(explode_tf, **_PA)
        .map_batches(partial_df, **_PA)
        .groupby("token")
        .aggregate(Sum("partial_df", alias_name="df"))
    )
    n_parts = int(max(2, min(16, ray.cluster_resources().get("CPU", 8) // 2)))
    df_ds = _agg_join_side(df_ds, n_parts)
    joined = tf.join(df_ds, join_type="inner", num_partitions=n_parts, on=("token",))

    def score_batch(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy().astype(np.int64)
        dfv = t["df"].to_numpy().astype(np.int64)
        doc = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "token": t["token"],
                "tf": pa.array(tfv),
                "df": pa.array(dfv),
                "score": pa.array(tfv * 1_000_000 // dfv),
                "bucket": pa.array((doc % 64).astype(np.int64)),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "score", "token"], ascending=[True, False, True], kind="stable")
        out = g.groupby("doc_id", sort=False).head(3)
        return out[["doc_id", "token", "tf", "df", "score"]]

    return (
        joined.map_batches(score_batch, **_PA)
        .groupby("bucket")
        .map_groups(topk, batch_format="pandas")
    )


def q_length_filter(sf_dir: str):
    """Percentile length filter — the Gopher/CCNet-style quality gate: per
    language, keep documents whose token count lies within the [p10, p90]
    decile band of that language.

    Percentiles are NEAREST-RANK (0-based index (N-1)//10 and 9*(N-1)//10
    of the sorted counts) — pure integer arithmetic, so the DuckDB oracle
    is bit-exact with no float-interpolation boundary ambiguity.

    Distributed shape: token counts are a vectorized map_batches; the
    per-language distribution is collapsed to a (lang, n_tokens, count)
    HISTOGRAM via per-batch Arrow partial counts + one tiny groupby-sum
    (the combiner keeps the shuffle at one row per distinct count), the
    decile thresholds come from the histogram's cumulative sums (a
    KB-sized table), and the filter is a threshold-broadcast map_batches —
    no per-document sort, no O(corpus) driver state."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "n_tokens": _token_count_array(t["text"])}
        )

    counted = ds.map_batches(count_tokens, **_PA).materialize()
    return _decile_band_filter(counted)


def _decile_bounds(counted):
    """Per-lang [p10, p90] nearest-rank token bounds from a STREAMING pass
    over a (…, lang, n_tokens) dataset: histogram partial agg → KB-sized
    bounds dict in the object store. Returns an ObjectRef to
    {lang: (lo, hi)} — the input dataset is consumed once, never pinned."""

    def partial_hist(t: pa.Table) -> pa.Table:
        g = t.select(["lang", "n_tokens"]).group_by(["lang", "n_tokens"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n_tokens", "partial"])

    hist = (
        counted.map_batches(partial_hist, **_PA)
        .groupby(["lang", "n_tokens"])
        .aggregate(Sum("partial", alias_name="cnt"))
        .take_all()
    )  # tiny: |langs| × |distinct counts| rows
    import collections

    by_lang: dict[str, list[tuple[int, int]]] = collections.defaultdict(list)
    for r in hist:
        by_lang[r["lang"]].append((int(r["n_tokens"]), int(r["cnt"])))
    bounds: dict[str, tuple[int, int]] = {}
    for lang, vals in by_lang.items():
        vals.sort()
        ns = np.array([v for v, _ in vals], np.int64)
        cum = np.cumsum([c for _, c in vals])
        total = int(cum[-1])
        lo_r, hi_r = (total - 1) // 10, (9 * (total - 1)) // 10
        lo = int(ns[np.searchsorted(cum, lo_r + 1)])
        hi = int(ns[np.searchsorted(cum, hi_r + 1)])
        bounds[lang] = (lo, hi)
    return ray.put(bounds)


class _BandFilter:
    """Actor-pool stage: keep rows whose n_tokens lies in their lang's
    broadcast [lo, hi] band (bounds fetched once per actor)."""

    def __init__(self, bounds_ref):
        self.bounds = ray.get(bounds_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        # dictionary-encode so the Python dict lookup runs once per
        # DISTINCT lang (a handful), not once per row
        enc = pc.dictionary_encode(t["lang"].combine_chunks())
        uniq = enc.dictionary.to_pylist()
        lo_u = np.array([self.bounds[x][0] for x in uniq], np.int64)
        hi_u = np.array([self.bounds[x][1] for x in uniq], np.int64)
        codes = enc.indices.to_numpy()
        n = t["n_tokens"].to_numpy()
        return t.filter(pa.array((n >= lo_u[codes]) & (n <= hi_u[codes])))


def _decile_band_filter(counted):
    """Keep rows inside each lang's [p10, p90] nearest-rank token band:
    histogram partial agg → KB-sized bounds table → broadcast filter.
    ``counted`` is consumed twice (bounds pass + filter pass) — callers
    pass either a materialized light table or a recomputable stream."""
    bounds_ref = _decile_bounds(counted)
    return counted.map_batches(_BandFilter, fn_constructor_args=(bounds_ref,), concurrency=_pool(), **_PA)


def q_curation_pipeline(sf_dir: str):
    """The composed end-to-end curation flagship — the pipeline a
    training-data user actually runs, built from this module's operators:

        token count → per-lang decile length band (nearest-rank, exact)
        → trigram-repetition gate (rep_ratio ≤ 0.05, doc-local)
        → exact text dedup (keep min doc_id per identical text)
        → deterministic train/val/test split

    Shape: two vectorized map_batches (count+rep are doc-local), one
    KB-sized histogram aggregate for the bounds, ONE hash-keyed dedup
    aggregate, split assignment as a pure map. Output (doc_id, lang,
    n_tokens, split).

    Dedup design (VERDICT r3 #2 — the old ``groupby(text).map_groups`` paid
    one Python dispatch per distinct document AND shuffled full text strings
    as the group key): each batch keys rows by a 128-bit content hash (two
    independent 64-bit hashes — collision odds ~1e-19 at 10^10 docs, so the
    oracle's GROUP BY text semantics hold), locally keeps the min-doc row
    per key (combiner), and the global ``aggregate(Min)`` folds a PACKED
    argmin value — zero-padded doc_id + '|' + lang, whose lexicographic min
    is the arg-min-doc_id row's payload — so the survivor's lang rides the
    exchange without per-group Python and without text bytes (n_tokens is a
    pure function of text → constant within a key → Min is exact).
    """
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "text": t["text"],
                "n_tokens": _token_count_array(t["text"]),
            }
        )

    # Two streaming passes instead of one full-corpus materialize (VERDICT
    # r4 #2: pinning the corpus INCLUDING the text column in the object
    # store is a 100-TB spill hazard). Pass 1 streams only (lang, n_tokens)
    # into the KB-sized histogram for the decile bounds; pass 2 re-runs the
    # cheap tokenize with text attached and gates against the broadcast
    # bounds — the same recompute-over-pin trade q_tfidf_topk makes.
    def count_light(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t["lang"], "n_tokens": _token_count_array(t["text"])})

    bounds_ref = _decile_bounds(ds.map_batches(count_light, **_PA))
    counted = ds.map_batches(count_tokens, **_PA)
    banded = counted.map_batches(_BandFilter, fn_constructor_args=(bounds_ref,), concurrency=_pool(), **_PA)

    def rep_gate(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_trigram_ratios(t["text"], t.num_rows) <= 0.05))

    qual = banded.map_batches(rep_gate, **_PA)

    def dedup_local(t: pa.Table) -> pa.Table:
        # 128-bit content key + packed argmin payload (doc_ids are
        # non-negative, so zero-padded decimal sorts numerically), then a
        # per-batch combiner: local keep-min per key shrinks the exchange
        pack = pc.binary_join_element_wise(
            pc.utf8_lpad(pc.cast(t["doc_id"], pa.string()), 20, "0"), t["lang"], "|"
        )
        df = pa.table(
            {
                # int64 views: shuffle keys stay Arrow-native types
                "h1": pa.array(hash64(t["text"]).view(np.int64), pa.int64()),
                "h2": pa.array(hash64(t["text"], seed=1).view(np.int64), pa.int64()),
                "pack": pack,
                "n_tokens": t["n_tokens"],
            }
        ).to_pandas()
        df = df.sort_values(["h1", "h2", "pack"], kind="stable").drop_duplicates(["h1", "h2"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema(
                [("h1", pa.int64()), ("h2", pa.int64()), ("pack", pa.string()), ("n_tokens", pa.int64())]
            )
        )

    surv = (
        qual.map_batches(dedup_local, **_PA)
        .groupby(["h1", "h2"])
        .aggregate(Min("pack", alias_name="pack"), Min("n_tokens", alias_name="n_tokens"))
    )

    def unpack_split(t: pa.Table) -> pa.Table:
        doc = pc.cast(pc.utf8_slice_codeunits(t["pack"], 0, 20), pa.int64())
        lang = pc.utf8_slice_codeunits(t["pack"], 21, 1 << 30)
        frac = _knuth_key(doc.to_numpy()) / 4294967296.0
        s = np.where(frac < 0.8, "train", np.where(frac < 0.9, "val", "test"))
        return pa.table(
            {
                "doc_id": doc,
                "lang": lang,
                "n_tokens": t["n_tokens"],
                "split": pa.array(s.tolist(), pa.string()),
            }
        )

    return surv.map_batches(unpack_split, **_PA)


def curation_bucket_writer(sf_dir: str, num_buckets: int = 16):
    """Factory wiring the curation flagship into the resumable partitioned
    sink (``sources/output.py``): returns ``(make_ds, curated)`` where
    ``make_ds(bucket)`` is the per-partition Dataset for
    ``resumable_write`` — one doc_id-hash bucket of the curated table per
    output directory. The pipeline runs ONCE (its output is the curated
    metadata table, orders of magnitude smaller than the corpus) and is
    materialized in the object store; each bucket then streams its filter
    to its own marker-last-committed directory, so a killed job re-runs
    only the unfinished buckets on resume (bench.py --curate exercises the
    kill-resume path; tests/test_output.py asserts resumed == uninterrupted).
    """
    if num_buckets <= 0 or num_buckets & (num_buckets - 1):
        raise ValueError("num_buckets must be a positive power of two")
    curated = q_curation_pipeline(sf_dir).materialize()
    mask = num_buckets - 1

    def make_ds(bucket):
        b = int(bucket)

        def pick(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], mask), b))

        return curated.map_batches(pick, **_PA)

    return make_ds, curated


def q_hash_sample(sf_dir: str):
    """Uniform 100-doc sample via bottom-k-by-PRF — the distributed
    sampling pattern that needs no RNG state: rank docs by a Knuth
    multiplicative hash of doc_id and keep the k smallest. Deterministic,
    cluster-size invariant, and mergeable (each batch keeps its local
    bottom-k; the global sort+limit merges) — unlike reservoir sampling,
    which needs coordinated randomness. Same overflow-free key as
    sample_split so the oracle is exact."""
    k = 100
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def local_bottomk(t: pa.Table) -> pa.Table:
        key = _knuth_key(t["doc_id"].to_numpy())
        out = pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "sample_key": pa.array(key.astype(np.int64), pa.int64())}
        )
        order = pc.sort_indices(out, sort_keys=[("sample_key", "ascending"), ("doc_id", "ascending")])
        return out.take(order[:k])

    return ds.map_batches(local_bottomk, **_PA).sort(["sample_key", "doc_id"]).limit(k)


def q_stratified_sample(sf_dir: str):
    """Stratified sample: bottom-20-per-language by the same Knuth PRF —
    the per-stratum variant of ``hash_sample`` (fixed k per group
    regardless of group skew, e.g. equal-sized eval sets per language).
    Mergeable and RNG-free: each batch keeps its local per-lang bottom-k
    (vectorized pandas sort + head, one pass per batch), and since langs
    are low-cardinality a single group task finalizes all strata — the
    exchange carries at most k rows per (lang, batch)."""
    k = 20
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def local_bottomk(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_numpy(zero_copy_only=False),
                "doc_id": t["doc_id"].to_numpy(),
                "sample_key": _knuth_key(t["doc_id"].to_numpy()).astype(np.int64),
            }
        )
        df = df.sort_values(["lang", "sample_key", "doc_id"], kind="stable")
        out = df.groupby("lang", sort=False).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pa.array(np.zeros(t.num_rows, np.int32), pa.int32()))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "sample_key", "doc_id"], kind="stable")
        return g.groupby("lang", sort=False).head(k)[["lang", "doc_id", "sample_key"]]

    return (
        ds.map_batches(local_bottomk, **_PA)
        .map_batches(add_bucket, **_PA)
        .groupby("bucket")
        .map_groups(finalize, batch_format="pandas")
    )


def q_repetition_score(sf_dir: str):
    """Within-document trigram repetition ratio — the Gopher-style "repeated
    n-gram" quality rule: 1 − distinct_trigrams / total_trigrams per doc
    (0.0 for docs with fewer than 3 tokens).

    A doc-local metric: pure vectorized map_batches (token explode + object
    -array string concat for the trigrams + a per-batch pandas groupby) —
    zero shuffles, embarrassingly parallel at any corpus size."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rep(t: pa.Table) -> pa.Table:
        ratios = np.round(_trigram_ratios(t["text"], t.num_rows), 6)
        return pa.table({"doc_id": t["doc_id"], "rep_ratio": pa.array(ratios, pa.float64())})

    return ds.map_batches(rep, **_PA)


_CHUNK_TOKENS = 16


def _doc_chunk_frame(t: pa.Table) -> pd.DataFrame:
    """(doc_id, k, tok-chunk) frame: consecutive 16-token chunks per doc —
    the shared chunk definition for q_chunk_dedup and q_decontaminate (a
    doc's text is one row, so its chunks complete in-batch). Vectorized
    tokenize + np offset math; the only per-chunk Python is the join."""
    trimmed = pc.utf8_trim_whitespace(t["text"])
    keep = pc.not_equal(trimmed, "")
    doc = t["doc_id"].filter(keep)
    toks = pc.split_pattern_regex(pc.filter(trimmed, keep), r"\s+")
    flat = pc.list_flatten(toks)
    rep = pc.list_parent_indices(toks).to_numpy().astype(np.int64)
    counts = pc.list_value_length(toks).to_numpy().astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos_in_doc = np.arange(len(rep)) - starts[rep]
    chunk_key = pos_in_doc // _CHUNK_TOKENS
    df = pd.DataFrame(
        {
            "doc_id": doc.to_numpy(zero_copy_only=False)[rep],
            "k": chunk_key,
            "tok": flat.to_pylist(),
        }
    )
    return df.groupby(["doc_id", "k"], sort=True)["tok"].agg(" ".join).reset_index()


def q_chunk_dedup(sf_dir: str):
    """Token-chunk exact dedup — the substring-granularity dedup staple:
    split each document into consecutive 16-token chunks, keep-first per
    distinct chunk (owner = min doc_id) and count copies.

    Distributed shape: vectorized tokenize (split_pattern_regex), chunk
    assembly and per-batch partial (chunk → min owner, count) combiner, one
    groupby(chunk) Min/Sum exchange. At 100 TB the groupby key would be a
    128-bit content hash of the chunk instead of the string (collision-safe,
    ~10× less shuffle volume); the string key is kept here so the DuckDB
    oracle can verify exact semantics."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        g = _doc_chunk_frame(t)
        # per-batch partial combiner: one row per distinct chunk
        p = g.groupby("tok").agg(owner=("doc_id", "min"), n=("doc_id", "size")).reset_index()
        return pa.table(
            {
                "chunk": pa.array(p["tok"], pa.string()),
                "owner_partial": pa.array(p["owner"], pa.int64()),
                "n_partial": pa.array(p["n"], pa.int64()),
            }
        )

    out = (
        ds.map_batches(chunks, **_PA)
        .groupby("chunk")
        .aggregate(Min("owner_partial", alias_name="owner_doc"), Sum("n_partial", alias_name="n_copies"))
    )
    return out


def q_incremental_dedup(sf_dir: str):
    """Incremental-ingestion exact dedup — the nightly corpus-append job:
    the already-ingested corpus is the docs with split key frac < 0.5, the
    incoming batch is the rest; output one row per DISTINCT new text (min
    incoming doc_id as the survivor) with its incoming copy count. The
    documents analog of the frontier's pushTasks anti-join dedup
    (SqlQueueTaskProvider.scala:58-68): distinct-before-insert against the
    existing corpus.

    Shape: both sides stream through ONE hash-keyed groupby — each batch
    tags rows corpus/incoming, keys them by the 128-bit content hash (the
    curation-flagship pattern) and locally combines (corpus-presence max,
    incoming-doc min, incoming count sum), so the exchange carries one row
    per distinct text per batch and no text bytes; no driver state, no
    second pass. Corpus-only texts drop via n_copies = 0, texts already in
    the corpus drop via the presence flag."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    BIG = (1 << 63) - 1

    def tag(t: pa.Table) -> pa.Table:
        frac = _knuth_key(t["doc_id"].to_numpy()) / 4294967296.0
        inc = frac >= 0.5
        doc = t["doc_id"].to_numpy()
        df = pd.DataFrame(
            {
                "h1": hash64(t["text"]).view(np.int64),
                "h2": hash64(t["text"], seed=1).view(np.int64),
                "corpus": (~inc).astype(np.int64),
                "doc": np.where(inc, doc, BIG),
                "n": inc.astype(np.int64),
            }
        )
        g = (
            df.groupby(["h1", "h2"], sort=False)
            .agg(corpus_p=("corpus", "max"), doc_p=("doc", "min"), n_p=("n", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(tag, **_PA)
        .groupby(["h1", "h2"])
        .aggregate(
            Max("corpus_p", alias_name="in_corpus"),
            Min("doc_p", alias_name="doc_id"),
            Sum("n_p", alias_name="n_copies"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        new = pc.and_(pc.equal(t["in_corpus"], 0), pc.greater(t["n_copies"], 0))
        kept = t.filter(new)
        return pa.table({"doc_id": kept["doc_id"], "n_copies": kept["n_copies"]})

    return agg.map_batches(finalize, **_PA)


def q_decontaminate(sf_dir: str):
    """Train/test decontamination — the pre-training hygiene staple: a
    TRAIN document (split frac < 0.8) sharing ANY 16-token chunk with a
    TEST document (frac ≥ 0.9) is contaminated; output (doc_id,
    n_contaminated_chunks = number of distinct shared chunks). Same chunk
    definition as q_chunk_dedup (``_doc_chunk_frame``), same overflow-safe
    Knuth split as q_sample_split.

    Shape: two streaming chunk-explode passes (train side emits per-doc
    distinct chunk hashes — complete in-batch since a doc is one row; test
    side distincts globally via one groupby), then a DISTRIBUTED hash join
    on the 64-bit chunk hash with a post-join 128-bit confirm (h2 equality
    filter — join stays single-key, collisions stay impossible at corpus
    scale), then a per-doc count. No chunk strings cross the exchange."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def side_chunks(t: pa.Table, lo: float, hi: float, with_doc: bool) -> pa.Table:
        frac = _knuth_key(t["doc_id"].to_numpy()) / 4294967296.0
        keep = (frac >= lo) & (frac < hi)
        sub = t.filter(pa.array(keep))
        if sub.num_rows == 0:
            cols = {"h1": pa.array([], pa.int64()), "h2": pa.array([], pa.int64())}
            if with_doc:
                cols["doc_id"] = pa.array([], pa.int64())
            return pa.table(cols)
        g = _doc_chunk_frame(sub)
        ch = pa.array(g["tok"], pa.string())
        df = pd.DataFrame(
            {
                "h1": hash64(ch).view(np.int64),
                "h2": hash64(ch, seed=1).view(np.int64),
                "doc_id": g["doc_id"].to_numpy(),
            }
        )
        # per-doc distinct is global distinct (a doc's chunks are in-batch)
        df = df.drop_duplicates(["doc_id", "h1", "h2"])
        if not with_doc:
            df = df[["h1", "h2"]].drop_duplicates()  # batch-local combiner
        return pa.Table.from_pandas(df, preserve_index=False)

    train = ds.map_batches(lambda t: side_chunks(t, 0.0, 0.8, True), **_PA)
    test = (
        ds.map_batches(lambda t: side_chunks(t, 0.9, 2.0, False), **_PA)
        .groupby(["h1", "h2"])
        .aggregate(Count(alias_name="_n"))
    )
    n_parts = int(max(2, min(16, ray.cluster_resources().get("CPU", 8) // 2)))
    test = _agg_join_side(test, n_parts).map_batches(
        lambda t: pa.table({"h1": t["h1"], "h2_t": t["h2"]}), **_PA
    )
    j = train.join(test, join_type="inner", num_partitions=n_parts, on=("h1",))

    def confirm_count(t: pa.Table) -> pa.Table:
        ok = t.filter(pc.equal(t["h2"], t["h2_t"]))
        g = ok.select(["doc_id"]).group_by("doc_id").aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "partial"])

    return (
        j.map_batches(confirm_count, **_PA)
        .groupby("doc_id")
        .aggregate(Sum("partial", alias_name="n_contaminated_chunks"))
    )


def q_embedding_dedup_groups(sf_dir: str):
    """Near-dup cluster canonicalization: connected components over the
    embedding near-dup graph (label-blocked cosine ≥ 0.3), every vector
    labeled with its component's minimum vec_id — the "pick one canonical
    doc per duplicate cluster" step of a training-data dedup pipeline.

    Distributed shape: iterative min-label propagation — each round is one
    hash join (edges ⋈ labels) + a groupby-min, i.e. two bounded shuffles;
    rounds = graph diameter (near-dup components are shallow). No
    driver-side graph: labels and edges stay Datasets throughout; the only
    driver value per round is the labels checksum for the fixpoint test.
    """
    edges_src = q_embedding_neardup(sf_dir)

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t["vec_a"].to_numpy()
        b = t["vec_b"].to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = edges_src.map_batches(symmetrize, **_PA).materialize()
    labels = (
        _read(sf_dir, "embeddings", ["vec_id"])
        .map_batches(lambda t: pa.table({"vec_id": t["vec_id"], "label": t["vec_id"]}), **_PA)
        .materialize()
    )
    n_parts = int(max(2, min(16, ray.cluster_resources().get("CPU", 8) // 2)))
    prev_sum = None
    for _ in range(64):  # diameter bound; near-dup graphs converge in a few rounds
        nb = edges.join(
            labels, join_type="inner", num_partitions=n_parts, on=("src",), right_on=("vec_id",)
        )
        cand = nb.map_batches(lambda t: pa.table({"vec_id": t["dst"], "label": t["label"]}), **_PA)
        labels = _agg_join_side(
            cand.union(labels).groupby("vec_id").aggregate(Min("label", alias_name="label")), n_parts
        ).materialize()  # aggregate output feeds next round's JOIN side
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break  # labels monotonically decrease; equal sum == fixpoint
        prev_sum = cur_sum
    return labels.map_batches(
        lambda t: pa.table({"vec_id": t["vec_id"], "canonical_id": t["label"]}), **_PA
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES = {
    "frontier_pull_batch": q_frontier_pull_batch,
    "status_counts": q_status_counts,
    "retry_split": q_retry_split,
    "dedup_keep_first": q_dedup_keep_first,
    "anti_join_new_urls": q_anti_join_new_urls,
    "broadcast_config_join": q_broadcast_config_join,
    "topk_priority": q_topk_priority,
    "distinct_flags": q_distinct_flags,
    "pricing_summary": q_pricing_summary,
    "windowed_agg": q_windowed_agg,
    "sessionize": q_sessionize,
    "asof_prev_event": q_asof_prev_event,
    "running_sum": q_running_sum,
    "sliding_avg": q_sliding_avg,
    "percentile_rank": q_percentile_rank,
    "zscore": q_zscore,
    "token_count": q_token_count,
    "bpe_token_count": q_bpe_token_count,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "fingerprint_neardup": q_fingerprint_neardup,
    "exact_text_dedup": q_exact_text_dedup,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash": q_simhash,
    "ngram_jaccard_dedup": q_ngram_jaccard_dedup,
    "embedding_topk": q_embedding_topk,
    "embedding_neardup": q_embedding_neardup,
    "embedding_dedup_groups": q_embedding_dedup_groups,
    "sample_split": q_sample_split,
    "top_terms": q_top_terms,
    "tfidf_topk": q_tfidf_topk,
    "length_filter": q_length_filter,
    "chunk_dedup": q_chunk_dedup,
    "incremental_dedup": q_incremental_dedup,
    "decontaminate": q_decontaminate,
    "repetition_score": q_repetition_score,
    "hash_sample": q_hash_sample,
    "stratified_sample": q_stratified_sample,
    "curation_pipeline": q_curation_pipeline,
}

ORACLE_SQL = {
    "frontier_pull_batch": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_orderkey LIMIT 100
    """,
    "status_counts": """
        SELECT o_orderstatus AS status, count(*) AS n FROM orders GROUP BY o_orderstatus
    """,
    "retry_split": """
        SELECT event_id,
               CASE WHEN (event_id % 5) + 1 >= 3 THEN 'failed' ELSE 'wait' END AS next_status
        FROM events
    """,
    "dedup_keep_first": """
        SELECT lang, source, min(doc_id) AS doc_id FROM documents GROUP BY lang, source
    """,
    "anti_join_new_urls": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "broadcast_config_join": """
        SELECT p_brand,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
               count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "topk_priority": """
        SELECT event_id, user_id, value FROM events
        ORDER BY value DESC, event_id LIMIT 50
    """,
    "distinct_flags": """
        SELECT DISTINCT l_returnflag FROM lineitem
    """,
    "pricing_summary": """
        WITH scaled AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(round(l_quantity * 100) AS BIGINT) AS qty2,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS base2,
                   CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS disc_price4,
                   CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT) AS charge6,
                   CAST(round(l_discount * 100) AS BIGINT) AS disc2
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        )
        SELECT l_returnflag, l_linestatus,
               sum(qty2) / 100.0 AS sum_qty,
               sum(base2) / 100.0 AS sum_base_price,
               sum(disc_price4) / 10000.0 AS sum_disc_price,
               sum(charge6) / 1000000.0 AS sum_charge,
               (sum(qty2) / 100.0) / count(*) AS avg_qty,
               (sum(base2) / 100.0) / count(*) AS avg_price,
               (sum(disc2) / 100.0) / count(*) AS avg_disc,
               count(*) AS count_order
        FROM scaled
        GROUP BY l_returnflag, l_linestatus
    """,
    "windowed_agg": """
        SELECT user_id, date_trunc('hour', ts) AS window_start,
               count(*) AS n_events,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    """,
    "sessionize": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                             OR lag(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, min(ts) AS session_start,
               count(*) AS n_events,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        FROM sess GROUP BY user_id, session_id
    """,
    "asof_prev_event": """
        SELECT event_id, prev_event_id, gap_us FROM (
            SELECT event_id,
                   lag(event_id) OVER w AS prev_event_id,
                   datediff('microsecond', lag(ts) OVER w, ts) AS gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ) WHERE prev_event_id IS NOT NULL
    """,
    "running_sum": """
        SELECT l_orderkey, l_linenumber,
               sum(CAST(round(l_quantity * 100) AS BIGINT))
                   OVER (PARTITION BY l_orderkey
                         ORDER BY l_linenumber, CAST(round(l_quantity * 100) AS BIGINT)
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_qty
        FROM lineitem
    """,
    "percentile_rank": """
        SELECT event_id,
               percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS pct_rank
        FROM events
    """,
    "sliding_avg": """
        SELECT event_id, user_id,
               sum(c) OVER w / (count(*) OVER w * 100.0) AS avg3
        FROM (SELECT event_id, user_id, ts, CAST(round(value * 100) AS BIGINT) AS c FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "zscore": """
        WITH c AS (
          SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
        ), a AS (
          SELECT event_type, sum(c) AS s, count(*) AS n, sum(c * c) AS q
          FROM c GROUP BY event_type
        )
        SELECT c.event_id, c.event_type,
               CAST(c.c * a.n - a.s AS DOUBLE) / sqrt(CAST(a.n * a.q - a.s * a.s AS DOUBLE)) AS z
        FROM c JOIN a USING (event_type)
    """,
    "token_count": """
        SELECT doc_id,
               CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0
                    ELSE array_length(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_tokens
        FROM documents
    """,
    "bpe_token_count": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    "text_quality": """
        SELECT doc_id,
               length(text) AS n_chars_actual,
               round(CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)
                     / CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END, 6) AS punct_ratio
        FROM documents
    """,
    "exact_text_dedup": """
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    """,
    "embedding_topk": """
        SELECT e.vec_id,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                     (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cos_sim
        FROM embeddings e
        WHERE e.vec_id <> 0
        ORDER BY cos_sim DESC, e.vec_id
        LIMIT 10
    """,
    "embedding_neardup": """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.3
    """,
    "embedding_dedup_groups": """
        WITH RECURSIVE pairs AS (
            SELECT a.vec_id AS u, b.vec_id AS v
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id <> b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.3
        ), reach(node, r) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT p.u, reach.r FROM pairs p JOIN reach ON p.v = reach.node
        )
        SELECT node AS vec_id, min(r) AS canonical_id FROM reach GROUP BY node
    """,
    "sample_split": """
        WITH keyed AS (
            SELECT doc_id, lang,
                   ((CAST(doc_id % 4294967296 AS UBIGINT) * CAST(2654435761 AS UBIGINT))
                    % 4294967296) / 4294967296.0 AS frac
            FROM documents
        )
        SELECT doc_id, lang,
               CASE WHEN frac < 0.8 THEN 'train'
                    WHEN frac < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM keyed
    """,
    "length_filter": """
        WITH n_t AS (
            SELECT doc_id, lang,
                   CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0
                        ELSE array_length(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_tokens
            FROM documents
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n_tokens) - 1 AS r,
                   count(*) OVER (PARTITION BY lang) AS cnt
            FROM n_t
        ), bounds AS (
            SELECT lang,
                   max(CASE WHEN r = (cnt - 1) // 10 THEN n_tokens END) AS lo,
                   max(CASE WHEN r = (9 * (cnt - 1)) // 10 THEN n_tokens END) AS hi
            FROM ranked GROUP BY lang
        )
        SELECT t.doc_id, t.lang, t.n_tokens
        FROM n_t t JOIN bounds b USING (lang)
        WHERE t.n_tokens >= b.lo AND t.n_tokens <= b.hi
    """,
    "curation_pipeline": """
        WITH n_t AS (
            SELECT doc_id, lang, text,
                   CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0
                        ELSE array_length(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_tokens
            FROM documents
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n_tokens) - 1 AS r,
                   count(*) OVER (PARTITION BY lang) AS cnt
            FROM n_t
        ), bounds AS (
            SELECT lang, max(CASE WHEN r = (cnt - 1) // 10 THEN n_tokens END) AS lo,
                   max(CASE WHEN r = (9 * (cnt - 1)) // 10 THEN n_tokens END) AS hi
            FROM ranked GROUP BY lang
        ), len_ok AS (
            SELECT t.doc_id, t.lang, t.text, t.n_tokens
            FROM n_t t JOIN bounds b USING (lang)
            WHERE t.n_tokens >= b.lo AND t.n_tokens <= b.hi
        ), s AS (
            SELECT doc_id, string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS toks
            FROM len_ok WHERE len(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) > 0
        ), g AS (
            SELECT doc_id, toks, unnest(range(len(toks) - 2)) AS i FROM s WHERE len(toks) >= 3
        ), tri AS (
            SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] AS tg FROM g
        ), rep AS (
            SELECT doc_id, 1.0 - count(DISTINCT tg) / CAST(count(*) AS DOUBLE) AS rr
            FROM tri GROUP BY doc_id
        ), qual AS (
            SELECT l.* FROM len_ok l LEFT JOIN rep USING (doc_id)
            WHERE coalesce(rep.rr, 0.0) <= 0.05
        ), dedup AS (
            SELECT min(doc_id) AS doc_id FROM qual GROUP BY text
        ), keyed AS (
            SELECT q.doc_id, q.lang, q.n_tokens,
                   ((CAST(q.doc_id % 4294967296 AS UBIGINT) * CAST(2654435761 AS UBIGINT))
                    % 4294967296) / 4294967296.0 AS frac
            FROM qual q JOIN dedup USING (doc_id)
        )
        SELECT doc_id, lang, n_tokens,
               CASE WHEN frac < 0.8 THEN 'train'
                    WHEN frac < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM keyed
    """,
    "hash_sample": """
        SELECT doc_id, lang,
               CAST(((CAST(doc_id % 4294967296 AS UBIGINT) * CAST(2654435761 AS UBIGINT))
                     % 4294967296) AS BIGINT) AS sample_key
        FROM documents
        ORDER BY sample_key, doc_id
        LIMIT 100
    """,
    "stratified_sample": """
        SELECT lang, doc_id, sample_key FROM (
          SELECT lang, doc_id,
                 CAST(((CAST(doc_id % 4294967296 AS UBIGINT) * CAST(2654435761 AS UBIGINT))
                       % 4294967296) AS BIGINT) AS sample_key,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ((CAST(doc_id % 4294967296 AS UBIGINT) * CAST(2654435761 AS UBIGINT))
                             % 4294967296), doc_id) AS rn
          FROM documents
        ) WHERE rn <= 20
    """,
    "repetition_score": """
        WITH s AS (
            SELECT doc_id, string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS toks
            FROM documents WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''
        ), g AS (
            SELECT doc_id, toks, unnest(range(len(toks) - 2)) AS i
            FROM s WHERE len(toks) >= 3
        ), tri AS (
            SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] AS tg FROM g
        ), agg AS (
            SELECT doc_id, count(*) AS total, count(DISTINCT tg) AS dist FROM tri GROUP BY doc_id
        )
        SELECT d.doc_id,
               CASE WHEN agg.total IS NULL THEN 0.0
                    ELSE round(1.0 - agg.dist / CAST(agg.total AS DOUBLE), 6) END AS rep_ratio
        FROM documents d LEFT JOIN agg USING (doc_id)
    """,
    "chunk_dedup": """
        WITH s AS (
            SELECT doc_id, string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS toks
            FROM documents WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''
        ), c AS (
            SELECT doc_id, toks,
                   unnest(range(CAST(ceil(len(toks) / 16.0) AS BIGINT))) AS k
            FROM s
        )
        SELECT array_to_string(list_slice(toks, k * 16 + 1, k * 16 + 16), ' ') AS chunk,
               min(doc_id) AS owner_doc,
               count(*) AS n_copies
        FROM c GROUP BY chunk
    """,
    "incremental_dedup": """
        WITH keyed AS (
            SELECT doc_id, text,
                   ((CAST(doc_id % 4294967296 AS UBIGINT) * CAST(2654435761 AS UBIGINT))
                    % 4294967296) / 4294967296.0 AS frac
            FROM documents
        ),
        corpus AS (SELECT text FROM keyed WHERE frac < 0.5),
        inc AS (SELECT doc_id, text FROM keyed WHERE frac >= 0.5)
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM inc
        WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = inc.text)
        GROUP BY inc.text
    """,
    "decontaminate": """
        WITH keyed AS (
            SELECT doc_id, text,
                   ((CAST(doc_id % 4294967296 AS UBIGINT) * CAST(2654435761 AS UBIGINT))
                    % 4294967296) / 4294967296.0 AS frac
            FROM documents
        ), s AS (
            SELECT doc_id, frac,
                   string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS toks
            FROM keyed WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''
        ), c AS (
            SELECT doc_id, frac,
                   array_to_string(list_slice(toks, k * 16 + 1, k * 16 + 16), ' ') AS chunk
            FROM (SELECT doc_id, frac, toks,
                         unnest(range(CAST(ceil(len(toks) / 16.0) AS BIGINT))) AS k
                  FROM s)
        ),
        tr AS (SELECT DISTINCT doc_id, chunk FROM c WHERE frac < 0.8),
        te AS (SELECT DISTINCT chunk FROM c WHERE frac >= 0.9)
        SELECT tr.doc_id, count(*) AS n_contaminated_chunks
        FROM tr JOIN te USING (chunk)
        GROUP BY tr.doc_id
    """,
    "top_terms": """
        WITH toks AS (
          SELECT doc_id, lang,
                 unnest(string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
          FROM documents WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''
        ), dist AS (
          SELECT DISTINCT lang, doc_id, token FROM toks WHERE token <> ''
        ), dfreq AS (
          SELECT lang, token, count(*) AS df FROM dist GROUP BY lang, token
        )
        SELECT lang, token, df FROM (
          SELECT lang, token, df,
                 row_number() OVER (PARTITION BY lang ORDER BY df DESC, token) AS rn
          FROM dfreq
        ) WHERE rn <= 5
    """,
    "tfidf_topk": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
          FROM documents WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''
        ), tf AS (
          SELECT doc_id, token, count(*) AS tf FROM toks WHERE token <> ''
          GROUP BY doc_id, token
        ), dfreq AS (
          SELECT token, count(*) AS df FROM tf GROUP BY token
        )
        SELECT doc_id, token, tf, df, score FROM (
          SELECT t.doc_id, t.token, t.tf, d.df, (t.tf * 1000000) // d.df AS score,
                 row_number() OVER (PARTITION BY t.doc_id
                                    ORDER BY (t.tf * 1000000) // d.df DESC, t.token) AS rn
          FROM tf t JOIN dfreq d USING (token)
        ) WHERE rn <= 3
    """,
}


def flagship(sf_dir: str = "/root/testdata/sf0.001"):
    """Flagship non-crawl pipeline: doc quality + exact dedup + token stats."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def score(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                # 128-bit key (two independent 64-bit hashes), matching
                # q_curation_pipeline: at 64 bits a corpus-scale collision
                # would Min each payload column independently across two
                # different texts and emit a chimera row
                "h1": pa.array(hash64(t["text"]).view(np.int64), pa.int64()),
                "h2": pa.array(hash64(t["text"], seed=1).view(np.int64), pa.int64()),
                "n_tokens": T.ws_token_count(texts),
                "quality": np.round(T.quality_score(texts), 6),
                "lang_pred": T.lang_id(texts),
            }
        )

    # keep-first dedup as a plain hash aggregate (VERDICT r3 #3 — the old
    # per-group map_groups paid one pandas dispatch per distinct text):
    # every payload column is a pure function of text, hence constant
    # within a (h1, h2) group, so per-column Min IS the arg-min row
    scored = ds.map_batches(score, **_PA)
    return (
        scored.groupby(["h1", "h2"])
        .aggregate(
            Min("doc_id", alias_name="doc_id"),
            Min("n_tokens", alias_name="n_tokens"),
            Min("quality", alias_name="quality"),
            Min("lang_pred", alias_name="lang_pred"),
        )
        .select_columns(["doc_id", "n_tokens", "quality", "lang_pred"])
    )


# --------------------------------------------------------------------------
# Queue/point ops, unions, lease recovery, grouped top-k, distinct count
# --------------------------------------------------------------------------


def q_point_lookup(sf_dir: str):
    """Point lookup by id set (MongoQueueTaskProvider.getByIds analog :133-149)."""
    ids = [1, 7, 42, 77, 123]
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus"])
    return ds.map_batches(lambda t: t.filter(pc.is_in(t["o_orderkey"], pa.array(ids, pa.int64()))), **_PA)


def q_union_append(sf_dir: str):
    """Frontier-append union: two key sets tagged by source (ds.union)."""
    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({"key": t["c_custkey"], "src": pa.array(["customer"] * t.num_rows, pa.string())}), **_PA
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        lambda t: pa.table({"key": t["s_suppkey"], "src": pa.array(["supplier"] * t.num_rows, pa.string())}), **_PA
    )
    return cust.union(supp)


def q_lease_recovery(sf_dir: str):
    """Lease sweep: rows stuck in-progress past the cutoff flip back to wait
    (QueueTaskRecover.scala:31-46 semantics on the events table)."""
    cutoff = pa.scalar(pd.Timestamp("2024-01-10"), pa.timestamp("us"))
    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def sweep(t: pa.Table) -> pa.Table:
        stale = pc.less(t["ts"], cutoff)
        return pa.table(
            {
                "event_id": t["event_id"],
                "lease_state": pc.if_else(stale, pa.scalar("requeued"), pa.scalar("in_progress")),
            }
        )

    return ds.map_batches(sweep, **_PA)


def q_grouped_topk(sf_dir: str):
    """Top-2 orders by value per customer — per-key top-k via bucketed groups."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pa.array(t["o_custkey"].to_numpy() % 64, pa.int32()))

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True], kind="stable")
        out = g.groupby("o_custkey", sort=False).head(2)
        return out[["o_custkey", "o_orderkey", "o_totalprice"]]

    return ds.map_batches(add_bucket, **_PA).groupby("bucket").map_groups(topk_bucket, batch_format="pandas")


def q_distinct_count(sf_dir: str):
    """Global count-distinct via partial unique per batch + tiny groupby."""
    ds = _read(sf_dir, "lineitem", ["l_partkey"])

    def local_unique(t: pa.Table) -> pa.Table:
        return pa.table({"l_partkey": pc.unique(t["l_partkey"])})

    n = ds.map_batches(local_unique, **_PA).groupby("l_partkey").aggregate(Count(alias_name="_n")).count()
    return pa.table({"n_distinct": pa.array([n], pa.int64())})


# --------------------------------------------------------------------------
# Similarity search, IVF variant
# --------------------------------------------------------------------------


@ray.remote
def _train_ivf_task(path: str, n_lists: int, cap: int):
    """Train IVF centroids on a bounded streaming sample INSIDE a Ray task —
    the driver never reads the embeddings table (VERDICT r2 #6). The sample
    is the first ``cap`` rows in file order (deterministic), streamed batch
    by batch so peak memory is O(cap·d) regardless of table size; a real
    deployment would reservoir-sample per block and union, same shape."""
    import pyarrow.parquet as pq

    from .functions.ann import IVFIndex

    pf = pq.ParquetFile(path)
    got, n = [], 0
    for b in pf.iter_batches(batch_size=1024, columns=["embedding"]):
        got.append(_emb_matrix(b["embedding"]))
        n += b.num_rows
        if n >= cap:
            break
    x = np.concatenate(got)[:cap]
    return IVFIndex.build(x, n_lists=n_lists)


_IVF_K, _IVF_LISTS, _IVF_NPROBE = 10, 8, 3
_IVF_SAMPLE_CAP = 4096
_IVF_DUMP_DIR = _dump_dir_for("ivf_topk", ("defn-v1", _IVF_K, _IVF_LISTS, _IVF_NPROBE, _IVF_SAMPLE_CAP))


def _ivf_input_fingerprint(t: pa.Table) -> tuple[int, int, int]:
    """(row count, Σvec_id, integer checksum of embedding dim 0) — computable
    both from the parquet table (numpy) and from the registered SQL view
    with ORDER-INVARIANT integer arithmetic, so the dump file and the view
    agree on which input they describe."""
    n = t.num_rows
    vec_sum = int(pc.sum(t["vec_id"]).as_py()) if n else 0
    e0 = _emb_matrix(t["embedding"])[:, 0] if n else np.zeros(0)
    e1sum = int(np.sum(np.floor(e0 * 1024.0).astype(np.int64)))
    return n, vec_sum, e1sum


def ensure_ivf_oracle_dump(sf_dir: str) -> str:
    """Independent single-process numpy recompute of q_embedding_topk_ivf
    over ``sf_dir``'s embeddings table (no Ray): same seeded IVF build on
    the first-4096 sample (functions/ann.py is the shared definition, like
    the phash DCT), then a full-table assign → probe-filter → cosine →
    round → total-order top-k in one pass. One atomically-renamed parquet
    per input fingerprint inside a shared content-addressed dir."""
    import tempfile

    import pyarrow.parquet as pq

    from .functions.ann import IVFIndex

    _secure_dump_root()  # refuse planted/world-writable roots (read AND write)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_input, vec_sum, e1sum = _ivf_input_fingerprint(t)
    dest = os.path.join(_IVF_DUMP_DIR, f"res_{n_input}_{vec_sum}_{e1sum}.parquet")
    if os.path.exists(dest):
        return dest
    emb = _emb_matrix(t["embedding"])
    vid = t["vec_id"].to_numpy()
    index = IVFIndex.build(emb[:_IVF_SAMPLE_CAP], n_lists=_IVF_LISTS)
    q = emb[vid == 0][0]
    probed = set(index.probe_lists(q, _IVF_NPROBE).tolist())
    qn = q / np.linalg.norm(q)
    lists = index.assign(emb)
    keep = np.isin(lists, list(probed)) & (vid != 0)
    emb_k = emb[keep]
    norms = np.linalg.norm(emb_k, axis=1)
    sims = np.round((emb_k @ qn) / np.where(norms == 0, 1, norms), 6)
    ids = vid[keep]
    order = np.lexsort((ids, -sims))[:_IVF_K]  # cos_sim desc, vec_id asc
    out = pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "cos_sim": pa.array(sims[order], pa.float64()),
            "n_input": pa.array(np.full(len(order), n_input, np.int64)),
            "vec_sum": pa.array(np.full(len(order), vec_sum, np.int64)),
            "e1_sum": pa.array(np.full(len(order), e1sum, np.int64)),
        }
    )
    os.makedirs(_IVF_DUMP_DIR, mode=0o700, exist_ok=True)
    fd, tmp = tempfile.mkstemp(suffix=".parquet.tmp", dir=_IVF_DUMP_DIR)
    os.close(fd)
    pq.write_table(out, tmp)
    os.replace(tmp, dest)  # atomic: readers see whole files only
    return dest


ORACLE_SQL["embedding_topk_ivf"] = f"""
    WITH fp AS (
      SELECT count(*) AS n_input,
             coalesce(sum(vec_id), 0) AS vec_sum,
             coalesce(sum(CAST(floor(embedding[1] * 1024.0) AS BIGINT)), 0) AS e1_sum
      FROM embeddings
    )
    SELECT r.vec_id, r.cos_sim
    FROM read_parquet('{_IVF_DUMP_DIR}/res_*.parquet') r JOIN fp
      ON r.n_input = fp.n_input AND r.vec_sum = fp.vec_sum AND r.e1_sum = fp.e1_sum
"""


def q_embedding_topk_ivf(sf_dir: str):
    """IVF-probed cosine top-k (scale path of q_embedding_topk; recall vs
    brute force is unit-tested). Centroids are trained task-side on a
    bounded sample; the query vector comes from a row-group-pruned filtered
    read; assignment+scoring stream over the actor pool.

    Oracle (r5): every step is deterministic — seeded k-means, fixed
    first-4096 training sample, per-row scoring, 6-decimal rounding, total
    (cos_sim desc, vec_id) order — so an independent single-process numpy
    recompute rides a parquet dump. The dump is per-INPUT (the result
    depends on the embeddings table): one file per input fingerprint
    (row count + Σvec_id + an integer content checksum of dim 0), and the
    static SQL selects the file matching the fingerprint it computes from
    the registered view — wrong/missing fingerprint yields 0 rows, a loud
    driver mismatch rather than silent staleness."""
    import pyarrow.parquet as pq

    k, n_lists, nprobe = _IVF_K, _IVF_LISTS, _IVF_NPROBE
    ensure_ivf_oracle_dump(sf_dir)  # the DuckDB side of this query's compare
    index = ray.get(_train_ivf_task.remote(f"{sf_dir}/embeddings.parquet", n_lists, 4096))
    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"], filters=[("vec_id", "==", 0)]
    )
    q = _emb_matrix(qt["embedding"])[0]
    probed = set(index.probe_lists(q, nprobe).tolist())
    index_ref = ray.put(index)
    q_ref = ray.put(q / np.linalg.norm(q))

    class Probe:
        def __init__(self):
            self.index = ray.get(index_ref)
            self.q = ray.get(q_ref)
            self.probed = probed

        def __call__(self, t: pa.Table) -> pa.Table:
            emb_b = _emb_matrix(t["embedding"])
            lists = self.index.assign(emb_b)
            keep = np.isin(lists, list(self.probed)) & (t["vec_id"].to_numpy() != 0)
            emb_k = emb_b[keep]
            if not len(emb_k):
                return pa.table({"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())})
            norms = np.linalg.norm(emb_k, axis=1)
            sims = (emb_k @ self.q) / np.where(norms == 0, 1, norms)
            return pa.table({"vec_id": pa.array(t["vec_id"].to_numpy()[keep], pa.int64()),
                             "cos_sim": pa.array(np.round(sims, 6), pa.float64())})

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ds.map_batches(Probe, concurrency=_pool(), **_PA).sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)


# --------------------------------------------------------------------------
# Multimodal plumbing over a deterministic synthetic images table
# --------------------------------------------------------------------------


def _synthetic_images(sf_dir: str):
    """Deterministic image table derived from doc ids (binary payload column)."""
    from .functions import imaging

    ds = _read(sf_dir, "documents", ["doc_id"])

    def make(t: pa.Table) -> pa.Table:
        ids, blobs, ws, hs, fmts = [], [], [], [], []
        for d in t["doc_id"].to_pylist():
            w, h = 16 + (d * 7) % 33, 16 + (d * 13) % 33
            img = imaging.synth_image(d, w, h)
            fmt = ("raw", "png", "q6")[d % 3]
            ids.append(f"img{d:08d}")
            blobs.append(imaging.encode_image(img, fmt))
            ws.append(w); hs.append(h); fmts.append(fmt)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
            }
        )

    return ds.map_batches(make, batch_size=128, **_PA)


def q_image_features(sf_dir: str):
    """Binary-payload decode → resize → features on an actor pool
    (stages/multimodal.py), written through a Lance-style versioned table
    (binary thumbnail column included — the multimodal binary-column WRITE
    path, VERDICT r4 #8) and read back as the projected feature table.

    Oracle: features are a pure function of doc_id (the synthetic image set
    is doc_id-seeded), so an independent single-process recompute over the
    imaging kernels rides a parquet dump that the SQL side joins against
    the actual documents table (the phash_neardup dump pattern)."""
    from .stages.multimodal import ImageFeatureStage

    max_id = _col_max(sf_dir, "documents", "doc_id")
    if max_id >= _FEAT_DUMP_DOCS:
        raise ValueError(
            f"documents has max(doc_id)={max_id} but the image-features oracle dump covers "
            f"doc_id < {_FEAT_DUMP_DOCS}; raise _FEAT_DUMP_DOCS or the SQL join under-covers"
        )
    ensure_image_oracle_dump()  # the DuckDB side of this query's compare

    feats = _synthetic_images(sf_dir).map_batches(
        ImageFeatureStage, batch_size=64, concurrency=_pool(), **_PA
    )
    # write the full feature table (thumbnail binary column included) as
    # Lance-style fragments — one fragment per batch task, manifest-last
    # commit — then stream the query's projection back off the table
    from .sources.lancelike import LanceLikeTable

    tdir = _scratch_dir("ccr_imgfeat_")
    tbl = LanceLikeTable.create(tdir)

    def write_frag(t: pa.Table) -> pa.Table:
        name = tbl.write_fragment(t)
        return pa.table({"fragment": pa.array([name], pa.string())})

    frags = [r["fragment"] for r in feats.map_batches(write_frag, **_PA).take_all()]
    tbl.commit(sorted(frags), meta={"source": "q_image_features"})
    return tbl.to_dataset(columns=["image_id", "phash", "mean_intensity", "std_intensity"])


def _synth_audio_bytes(doc_id: int) -> bytes:
    """Deterministic fake audio payload for one doc: splitmix64-stream bytes,
    length 256 + (doc_id·37) % 2048 — doc_id-seeded so the audio-features
    oracle dump is a pure function of doc_id (sf-agnostic, like the image
    and phash dumps)."""
    from .functions.hashing import splitmix64

    n = 256 + (doc_id * 37) % 2048
    words = splitmix64(np.uint64(doc_id) * np.uint64(1 << 32) + np.arange((n + 7) // 8, dtype=np.uint64))
    return words.view(np.uint8)[:n].tobytes()


def q_audio_features(sf_dir: str):
    """Audio decode/feature plumbing (stub codec): duration + RMS per clip —
    the actor-pool binary-column stage for audio (codec gated behind
    import-try in stages/multimodal.py). The synthetic payload is
    doc_id-seeded, so the oracle is an independent single-process recompute
    joined against documents via a parquet dump (phash_neardup pattern)."""
    from .stages.multimodal import AudioFeatureStage

    max_id = _col_max(sf_dir, "documents", "doc_id")
    if max_id >= _FEAT_DUMP_DOCS:
        raise ValueError(
            f"documents has max(doc_id)={max_id} but the audio-features oracle dump covers "
            f"doc_id < {_FEAT_DUMP_DOCS}; raise _FEAT_DUMP_DOCS or the SQL join under-covers"
        )
    ensure_audio_oracle_dump()  # the DuckDB side of this query's compare
    ds = _read(sf_dir, "documents", ["doc_id"])

    def as_audio(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "audio_id": pa.array([f"aud{d}" for d in ids], pa.string()),
                "bytes": pa.array([_synth_audio_bytes(int(d)) for d in ids], pa.binary()),
            }
        )

    return ds.map_batches(as_audio, **_PA).map_batches(AudioFeatureStage, batch_size=64, concurrency=_pool(), **_PA)


def q_frame_sample(sf_dir: str):
    """Video frame-sampling plumbing (stub codec): one row per sampled frame."""
    from .stages.multimodal import FrameSampleStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def as_video(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "video_id": pc.binary_join_element_wise(
                    pa.array(["vid"] * t.num_rows, pa.string()), pc.cast(t["doc_id"], pa.string()), ""
                ),
                "bytes": pc.cast(t["text"], pa.binary()),
            }
        )

    frames = ds.map_batches(as_video, **_PA).map_batches(FrameSampleStage, batch_size=64, concurrency=_pool(), **_PA)
    return frames.map_batches(
        lambda t: pa.table({"video_id": t["video_id"], "frame_index": t["frame_index"],
                            "frame_bytes": pc.cast(pc.binary_length(t["frame"]), pa.int64())}),
        **_PA,
    )


_FEAT_DUMP_DOCS = 5000  # image/audio feature dumps cover doc_id < 5000 (sf ≤ 0.1)
_IMGFEAT_DUMP_DIR = _dump_dir_for("imgfeat", ("defn-v1", _FEAT_DUMP_DOCS))
_AUDFEAT_DUMP_DIR = _dump_dir_for("audfeat", ("defn-v1", _FEAT_DUMP_DOCS))


def ensure_image_oracle_dump() -> str:
    """Independent single-process recompute of q_image_features' output as a
    pure function of doc_id: the imaging KERNELS (synth/encode/decode/phash)
    are the shared definition — like the phash_neardup dump's DCT — but the
    orchestration (loop, feature math) is re-derived here without the Ray
    stage. Idempotent (content-addressed dir + manifest); called from both
    the query path and ``__ray_entry__.oracle_sql()``."""
    import pyarrow.parquet as pq

    from .functions import imaging
    from .stages.multimodal import decode_any

    def write(tmp: str) -> None:
        ids = np.arange(_FEAT_DUMP_DOCS, dtype=np.int64)
        phs, means, stds = [], [], []
        for d in ids:
            d = int(d)
            w, h = 16 + (d * 7) % 33, 16 + (d * 13) % 33
            fmt = ("raw", "png", "q6")[d % 3]
            img = decode_any(imaging.encode_image(imaging.synth_image(d, w, h), fmt), w, h, fmt)
            phs.append(imaging.phash64(img))
            means.append(float(img.mean()))
            stds.append(float(img.std()))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids),
                    "image_id": pa.array([f"img{d:08d}" for d in ids], pa.string()),
                    "phash": pa.array(phs, pa.int64()),
                    "mean_intensity": pa.array(np.round(means, 4), pa.float64()),
                    "std_intensity": pa.array(np.round(stds, 4), pa.float64()),
                }
            ),
            os.path.join(tmp, "features.parquet"),
        )

    return _atomic_dump_dir(_IMGFEAT_DUMP_DIR, write)


def ensure_audio_oracle_dump() -> str:
    """Independent single-process recompute of q_audio_features' output
    (doc_id-seeded payload → int8-PCM decode → duration/RMS), re-deriving
    the feature math without the Ray stage. Idempotent; see
    ensure_image_oracle_dump."""
    import pyarrow.parquet as pq

    def write(tmp: str) -> None:
        ids = np.arange(_FEAT_DUMP_DOCS, dtype=np.int64)
        durs, rms = [], []
        for d in ids:
            pcm = np.frombuffer(_synth_audio_bytes(int(d)), np.int8).astype(np.float32) / 128.0
            durs.append(len(pcm) / 16_000)
            rms.append(float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids),
                    "audio_id": pa.array([f"aud{d}" for d in ids], pa.string()),
                    "duration_s": pa.array(np.round(durs, 6), pa.float64()),
                    "rms": pa.array(np.round(rms, 6), pa.float64()),
                }
            ),
            os.path.join(tmp, "features.parquet"),
        )

    return _atomic_dump_dir(_AUDFEAT_DUMP_DIR, write)


ORACLE_SQL["image_features"] = f"""
    SELECT f.image_id, f.phash, f.mean_intensity, f.std_intensity
    FROM read_parquet('{_IMGFEAT_DUMP_DIR}/features.parquet') f
    JOIN documents d USING (doc_id)
"""

ORACLE_SQL["audio_features"] = f"""
    SELECT f.audio_id, f.duration_s, f.rms
    FROM read_parquet('{_AUDFEAT_DUMP_DIR}/features.parquet') f
    JOIN documents d USING (doc_id)
"""


# --------------------------------------------------------------------------
# Crawl-engine flagship exposed as queries (rows-only; conformance suite
# proves oracle equality separately)
# --------------------------------------------------------------------------

_CRAWL_CACHE: dict[str, object] = {}

# one crawl shape shared by the flagship queries AND the oracle-simulator
# dump — the driver's compare is only meaningful if both run the same web
_CRAWL_Q_SHAPE = dict(
    n_hosts=10, pages_per_host=100, n_seed_hosts=5,
    num_partitions=4, num_shards=2, wave_cap_per_partition=25, max_waves=4,
)
_ORACLE_DUMP_DIR = _dump_dir_for("crawl", ("defn-v1", sorted(_CRAWL_Q_SHAPE.items())))


def ensure_crawl_oracle_dump() -> str:
    """Run the single-process oracle simulator (pipelines/oracle.py — the
    independent reference implementation of the crawl semantics) at the
    flagship-query crawl shape and dump its order / seen-set / image-meta
    tables to parquet, so the DuckDB side of the driver compare can read
    them (``crawl_order`` / ``crawl_seen_set`` / ``crawl_images_meta``
    oracles). Idempotent; called from both the query path (_small_crawl)
    and ``__ray_entry__.oracle_sql()`` so either side of the driver's
    compare can run first. url_hash is reinterpreted uint64→int64 at write
    time (same bit pattern the queries expose)."""
    import os

    import pyarrow.parquet as pq

    def write(tmp: str) -> None:
        from .pipelines import oracle
        from .pipelines import synthweb as sw

        c = _CRAWL_Q_SHAPE
        cfg = sw.WebConfig(
            n_hosts=c["n_hosts"], pages_per_host=c["pages_per_host"], n_seed_hosts=c["n_seed_hosts"]
        )
        res = oracle.run_oracle(
            cfg,
            num_partitions=c["num_partitions"],
            wave_cap_per_partition=c["wave_cap_per_partition"],
            max_waves=c["max_waves"],
        )

        def _i64(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("url_hash")
            return t.set_column(i, "url_hash", pa.array(t["url_hash"].to_numpy().view(np.int64)))

        pq.write_table(
            _i64(res.order.select(["fetch_seq", "wave", "vtime", "url_hash", "host", "ua", "proxy_id"])),
            os.path.join(tmp, "order.parquet"),
        )
        pq.write_table(
            _i64(res.frontier.select(["url_hash", "status", "depth", "attempt"])),
            os.path.join(tmp, "seen_set.parquet"),
        )
        pq.write_table(
            res.images.select(["image_id", "w", "h", "fmt", "caption", "phash"]),
            os.path.join(tmp, "images.parquet"),
        )

    return _atomic_dump_dir(_ORACLE_DUMP_DIR, write)


def _small_crawl(sf_dir: str):
    """One small deterministic crawl per sf_dir (cached within the process)."""
    if sf_dir in _CRAWL_CACHE:
        return _CRAWL_CACHE[sf_dir]
    import tempfile

    from .pipelines import synthweb as sw
    from .pipelines.wave import CrawlEngine

    c = _CRAWL_Q_SHAPE
    cfg = sw.WebConfig(n_hosts=c["n_hosts"], pages_per_host=c["pages_per_host"], n_seed_hosts=c["n_seed_hosts"])
    root = tempfile.mkdtemp(prefix="ccr_crawl_q_")
    eng = CrawlEngine.start(
        root, cfg, num_partitions=c["num_partitions"], num_shards=c["num_shards"],
        wave_cap_per_partition=c["wave_cap_per_partition"],
    )
    eng.run(max_waves=c["max_waves"])
    eng.shutdown_shards()
    ensure_crawl_oracle_dump()  # the DuckDB side of this query's compare
    _CRAWL_CACHE[sf_dir] = eng
    return eng


def _u64_as_i64(t: pa.Table, col: str) -> pa.Table:
    # bit-pattern reinterpret (a value cast would overflow int64)
    i = t.schema.get_field_index(col)
    return t.set_column(i, col, pa.array(t[col].to_numpy().view(np.int64)))


def q_crawl_order(sf_dir: str):
    """Global crawl order of the flagship crawl — checked against the
    single-process oracle simulator's order table (parquet dump)."""
    t = _u64_as_i64(_small_crawl(sf_dir).crawl_order(), "url_hash")
    return t.select(["fetch_seq", "wave", "vtime", "url_hash", "host", "ua", "proxy_id"])


def q_crawl_seen_set(sf_dir: str):
    """Final URL-seen set + statuses of the flagship crawl."""
    t = _small_crawl(sf_dir).frontier.to_arrow(columns=["url_hash", "status", "depth", "attempt"])
    t = _u64_as_i64(t, "url_hash")
    return t.take(pc.sort_indices(t, sort_keys=[("url_hash", "ascending")]))


def q_crawl_images_meta(sf_dir: str):
    """Image+caption metadata of the flagship crawl (input_hint schema sans bytes)."""
    t = _small_crawl(sf_dir).images.to_arrow(columns=["image_id", "w", "h", "fmt", "caption", "phash"])
    return t.take(pc.sort_indices(t, sort_keys=[("image_id", "ascending")]))


QUERIES.update(
    {
        "point_lookup": q_point_lookup,
        "union_append": q_union_append,
        "lease_recovery": q_lease_recovery,
        "grouped_topk": q_grouped_topk,
        "distinct_count": q_distinct_count,
        "embedding_topk_ivf": q_embedding_topk_ivf,
        "image_features": q_image_features,
        "audio_features": q_audio_features,
        "frame_sample": q_frame_sample,
        "crawl_order": q_crawl_order,
        "crawl_seen_set": q_crawl_seen_set,
        "crawl_images_meta": q_crawl_images_meta,
    }
)

ORACLE_SQL.update(
    {
        "point_lookup": """
            SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
            WHERE o_orderkey IN (1, 7, 42, 77, 123)
        """,
        "union_append": """
            SELECT c_custkey AS key, 'customer' AS src FROM customer
            UNION ALL
            SELECT s_suppkey AS key, 'supplier' AS src FROM supplier
        """,
        "lease_recovery": """
            SELECT event_id,
                   CASE WHEN ts < TIMESTAMP '2024-01-10' THEN 'requeued'
                        ELSE 'in_progress' END AS lease_state
            FROM events
        """,
        "grouped_topk": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders
            ) WHERE rn <= 2
        """,
        "distinct_count": """
            SELECT count(DISTINCT l_partkey) AS n_distinct FROM lineitem
        """,
    }
)


# --------------------------------------------------------------------------
# Large-large bucketed hash join + sketch aggregation
# --------------------------------------------------------------------------


def q_bucketed_join(sf_dir: str):
    """Both-sides-large join: lineitem ⋈ orders on orderkey, revenue per
    order priority — explicit partitioned hash join (bucket both sides by
    ``key % B``, join matching buckets inside ``map_groups``), the portable
    big-join pattern when neither side fits a broadcast.
    """
    B = 32
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: pa.table(
            {
                "key": t["l_orderkey"],
                "rev4": pa.array(
                    np.round(t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy()) * 1e4).astype(np.int64)
                ),
                "o_orderpriority": pa.array([""] * t.num_rows, pa.string()),
                "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                "bucket": pa.array((t["l_orderkey"].to_numpy() % B).astype(np.int32), pa.int32()),
            }
        ),
        **_PA,
    )
    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table(
            {
                "key": t["o_orderkey"],
                "rev4": pa.array(np.zeros(t.num_rows, np.int64)),
                "o_orderpriority": t["o_orderpriority"],
                "side": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
                "bucket": pa.array((t["o_orderkey"].to_numpy() % B).astype(np.int32), pa.int32()),
            }
        ),
        **_PA,
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0][["key", "rev4"]]
        right = g[g["side"] == 1][["key", "o_orderpriority"]]
        m = left.merge(right, on="key")
        out = m.groupby("o_orderpriority", sort=False)["rev4"].agg(["sum", "count"]).reset_index()
        return pd.DataFrame(
            {"o_orderpriority": out["o_orderpriority"], "rev4": out["sum"], "n": out["count"].astype(np.int64)}
        )

    parts = li.union(od).groupby("bucket").map_groups(join_bucket, batch_format="pandas")
    agg = parts.groupby("o_orderpriority").aggregate(Sum("rev4", alias_name="rev4"), Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "revenue": pc.divide(pc.cast(t["rev4"], pa.float64()), 1e4),
                "n": t["n"],
            }
        ),
        **_PA,
    )


# KMV sketch size for q_approx_distinct_users: relative error ~1/sqrt(k-2)
# (~13% at k=64); raise for tighter bounds — the exchange carries k uint64s.
_KMV_K = 64


def q_approx_distinct_users(sf_dir: str):
    """KMV (k-minimum-values) count-distinct of event users: per batch keep
    the k smallest DISTINCT splitmix64(user_id) hashes (the combiner), one
    tiny reduce merges them (k smallest of the union — no shuffle of raw
    keys), estimate = (k−1)·2⁶⁴/h₍ₖ₎, exact count when fewer than k
    distinct hashes exist (Bar-Yossef et al.'s classic mergeable sketch).

    Replaces the r4 HLL variant for this query (HyperLogLog stays in
    functions/sketches.py as a kernel): KMV is order-invariant AND its
    estimate is one exact-integer comparison plus one float expression
    mirrored token-for-token in the DuckDB oracle — the repo's splitmix64
    SQL restatement computes identical hashes — so the driver hash-gate
    checks it bit-exactly, where HLL's float harmonic sum + log small-range
    correction cannot be reproduced deterministically in SQL."""
    from .functions.hashing import splitmix64

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        h = splitmix64(t["user_id"].to_numpy().astype(np.uint64))
        u = np.unique(h)[:_KMV_K]
        return pa.table({"hk": pa.array(u, pa.uint64())})

    def merge_all(t: pa.Table) -> pa.Table:
        u = np.unique(t["hk"].to_numpy().astype(np.uint64))[:_KMV_K]
        return pa.table({"hk": pa.array(u, pa.uint64())})

    # partials are ≤ k rows each: repartition(1) ships them to ONE reduce
    # task for the merge; the driver reads back ≤ k values
    rows = (
        ds.map_batches(partial, **_PA)
        .repartition(1)
        .map_batches(merge_all, batch_size=None, **_PA)  # whole block = one merge
        .take_all()
    )
    u = np.sort(np.array([r["hk"] for r in rows], np.uint64))
    if len(u) < _KMV_K:
        est = len(u)  # sketch holds every distinct hash — exact
    else:
        # token-for-token the SQL expression: (k-1) * (2^64 / float(h_k))
        est = int(np.floor((_KMV_K - 1) * (18446744073709551616.0 / float(u[_KMV_K - 1]))))
    return pa.table({"approx_distinct_users": pa.array([est], pa.int64())})


# fixed-resolution histogram-sketch bucket scale for the approx-quantile
# queries: bucket = floor(value * 16) → value error ≤ 1/16, rank error 0.
# 16 is a power of two so bucket/16.0 is EXACT in float64 — the estimate is
# bit-identical between numpy and DuckDB.
_QSKETCH_SCALE = 16


def _hist_bucketize(values: np.ndarray) -> np.ndarray:
    """floor(value·16) → int64 bucket, refusing NaN loudly: NaN would cast
    to an implementation-defined bucket (INT64_MIN on x86) and silently
    skew every rank, while the SQL oracle errors — fail-loud like the
    zscore overflow guard (self-review r5)."""
    if np.isnan(values).any():
        raise ValueError(
            "histogram quantile sketch: input contains NaN/null values — "
            "filter or impute them explicitly before sketching"
        )
    return np.floor(values * float(_QSKETCH_SCALE)).astype(np.int64)


def _hist_quantile_pick(buckets: np.ndarray, cum: np.ndarray, total: int, pct: int) -> float:
    """Nearest-rank pick from a (sorted buckets, cumulative counts) histogram:
    0-based rank (pct·(N−1))//100, first bucket whose cum covers rank+1 —
    pure integer arithmetic, mirrored 1:1 in the SQL oracles."""
    r0 = (pct * (total - 1)) // 100
    return float(buckets[np.searchsorted(cum, r0 + 1)]) / _QSKETCH_SCALE


def q_approx_quantiles(sf_dir: str):
    """Approximate p50/p90/p99 of event values via a fixed-resolution
    MERGEABLE HISTOGRAM sketch (monitoring-histogram style, a linear-bucket
    DDSketch relative): per batch, values collapse to (bucket, count) with
    bucket = floor(value·16) — the combiner — then one tiny groupby-sum; the
    exchange carries KB of buckets, never raw values, and merge is count
    addition, so the result is ORDER-INVARIANT under any partitioning.

    That order-invariance is why this replaced the r4 KLL-style compactor
    (functions/sketches.py QuantileSketch, still available as a kernel):
    a compacting sketch's output depends on its merge tree, which made the
    query un-checkable by an independent oracle. Here rank selection is
    integer-exact nearest-rank and the estimate bucket/16.0 is an exact
    float64, so the DuckDB oracle matches bit-for-bit; value error ≤ 1/16.
    """
    ds = _read(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        b = _hist_bucketize(t["value"].to_numpy())
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub), "partial": pa.array(cnt.astype(np.int64))})

    hist = (
        ds.map_batches(partial, **_PA)
        .groupby("bucket")
        .aggregate(Sum("partial", alias_name="cnt"))
        .take_all()
    )  # KB-sized: one row per distinct bucket
    if not hist:
        # one NULL row, matching the SQL aggregate's shape on empty input
        return pa.table(
            {"p50": pa.array([None], pa.float64()), "p90": pa.array([None], pa.float64()),
             "p99": pa.array([None], pa.float64())}
        )
    rows = sorted((int(r["bucket"]), int(r["cnt"])) for r in hist)
    bk = np.array([b for b, _ in rows], np.int64)
    cum = np.cumsum([c for _, c in rows])
    total = int(cum[-1])
    return pa.table(
        {
            "p50": pa.array([_hist_quantile_pick(bk, cum, total, 50)], pa.float64()),
            "p90": pa.array([_hist_quantile_pick(bk, cum, total, 90)], pa.float64()),
            "p99": pa.array([_hist_quantile_pick(bk, cum, total, 99)], pa.float64()),
        }
    )


def q_grouped_quantiles(sf_dir: str):
    """Per-event-type p50/p95 via the grouped histogram sketch: each batch
    emits (event_type, bucket, count) partials — the combiner — a
    groupby-sum merges them, and a per-group finalize (tiny: one row per
    distinct bucket) picks nearest-rank quantiles. Same order-invariant /
    bit-checkable design as q_approx_quantiles; the exchange carries
    histogram rows, never raw values."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        b = _hist_bucketize(t["value"].to_numpy())
        g = (
            pa.table({"event_type": t["event_type"], "bucket": pa.array(b)})
            .group_by(["event_type", "bucket"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "bucket", "partial"])

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket")
        bk = g["bucket"].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        total = int(cum[-1])
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "p50": [_hist_quantile_pick(bk, cum, total, 50)],
                "p95": [_hist_quantile_pick(bk, cum, total, 95)],
                "n": pd.Series([total], dtype=np.int64),
            }
        )

    return (
        ds.map_batches(partial, **_PA)
        .groupby(["event_type", "bucket"])
        .aggregate(Sum("partial", alias_name="cnt"))
        .groupby("event_type")
        .map_groups(finalize, batch_format="pandas")
    )


QUERIES.update(
    {
        "bucketed_join": q_bucketed_join,
        "approx_distinct_users": q_approx_distinct_users,
        "approx_quantiles": q_approx_quantiles,
        "grouped_quantiles": q_grouped_quantiles,
    }
)

ORACLE_SQL.update(
    {
        "bucketed_join": """
            SELECT o_orderpriority,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
                   count(*) AS n
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        # histogram-sketch quantiles: same bucket map (floor(value·16)),
        # nearest-rank integer arithmetic and exact bucket/16.0 estimate as
        # the engine — bit-checkable because the sketch is order-invariant
        "approx_quantiles": f"""
            WITH b AS (
              SELECT CAST(floor(value * {_QSKETCH_SCALE}.0) AS BIGINT) AS bucket, count(*) AS cnt
              FROM events GROUP BY 1
            ), c AS (
              SELECT bucket, sum(cnt) OVER (ORDER BY bucket) AS cum,
                     sum(cnt) OVER () AS total
              FROM b
            )
            SELECT
              min(CASE WHEN cum >= (50 * (total - 1)) // 100 + 1 THEN bucket END) / {_QSKETCH_SCALE}.0 AS p50,
              min(CASE WHEN cum >= (90 * (total - 1)) // 100 + 1 THEN bucket END) / {_QSKETCH_SCALE}.0 AS p90,
              min(CASE WHEN cum >= (99 * (total - 1)) // 100 + 1 THEN bucket END) / {_QSKETCH_SCALE}.0 AS p99
            FROM c
        """,
        "grouped_quantiles": f"""
            WITH b AS (
              SELECT event_type, CAST(floor(value * {_QSKETCH_SCALE}.0) AS BIGINT) AS bucket, count(*) AS cnt
              FROM events GROUP BY 1, 2
            ), c AS (
              SELECT event_type, bucket,
                     sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
                     sum(cnt) OVER (PARTITION BY event_type) AS total
              FROM b
            )
            SELECT event_type,
                   min(CASE WHEN cum >= (50 * (total - 1)) // 100 + 1 THEN bucket END) / {_QSKETCH_SCALE}.0 AS p50,
                   min(CASE WHEN cum >= (95 * (total - 1)) // 100 + 1 THEN bucket END) / {_QSKETCH_SCALE}.0 AS p95,
                   CAST(max(total) AS BIGINT) AS n
            FROM c GROUP BY event_type
        """,
    }
)


def q_phash_neardup(sf_dir: str):
    """Perceptual-hash near-dup detection over images — the north_star's
    image-dedup extension: phash per image (actor pool) → block by 16-bit
    phash bands (an LSH for Hamming space: near-dups share ≥1 band) →
    verify pairs by full Hamming distance ≤ 8. The synthetic image set
    plants true near-dups (groups of 3 share a base image with increasing
    noise — ``imaging.doc_phash64``). Oracle: the hash values ride a
    parquet dump (the DCT is the shared definition, like the minhash
    permutation constants); the SQL side independently re-derives the
    band explode, candidate self-join, pair dedup and Hamming verify.
    """
    from .functions import imaging
    from .functions.text import hamming64

    n_docs = _row_count(sf_dir, "documents")
    max_id = _col_max(sf_dir, "documents", "doc_id")
    if max_id >= _PHASH_DUMP_DOCS:
        raise ValueError(
            f"documents has max(doc_id)={max_id} but the phash oracle dump covers doc_id < "
            f"{_PHASH_DUMP_DOCS}; raise _PHASH_DUMP_DOCS or the SQL side's join silently "
            "drops the uncovered docs (coverage is the id DOMAIN, not the row count)"
        )
    ensure_phash_oracle_dump()  # the DuckDB side of this query's compare
    ds = _read(sf_dir, "documents", ["doc_id"])
    n_buckets = max(64, n_docs // 64)

    def make_and_hash(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        phs = [imaging.doc_phash64(int(d)) for d in ids]
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "phash": pa.array(phs, pa.int64())})

    hashed = ds.map_batches(make_and_hash, batch_size=128, **_PA)

    def explode_bands(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy().astype(np.uint64)
        out_doc, out_band, out_key, out_ph = [], [], [], []
        for b in range(4):  # 4 x 16-bit bands
            key = ((ph >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out_doc.append(t["doc_id"].to_numpy())
            out_band.append(np.full(len(ph), b, np.int32))
            out_key.append(key)
            out_ph.append(t["phash"].to_numpy())
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                "key": pa.array(np.concatenate(out_key), pa.int64()),
                "phash": pa.array(np.concatenate(out_ph), pa.int64()),
                "bucket": pa.array((np.concatenate(out_key) % n_buckets).astype(np.int64), pa.int64()),
            }
        )

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dup = g.duplicated(["band", "key"], keep=False)
        g = g[dup]
        if not len(g):
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        m = g.merge(g, on=["band", "key"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        d = hamming64(m["phash_x"].to_numpy(), m["phash_y"].to_numpy())
        keep = d <= 8
        return pd.DataFrame({"doc_a": m["doc_id_x"].to_numpy()[keep], "doc_b": m["doc_id_y"].to_numpy()[keep],
                             "hamming": d[keep]})

    cand = hashed.map_batches(explode_bands, **_PA).groupby("bucket").map_groups(pairs_bucket, batch_format="pandas")
    return cand.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


QUERIES["phash_neardup"] = q_phash_neardup

_PHASH_DUMP_DOCS = 5000  # covers documents with doc_id < 5000 (sf ≤ 0.1)
_PHASH_DUMP_DIR = _dump_dir_for("phash", ("defn-v1", _PHASH_DUMP_DOCS))


def ensure_phash_oracle_dump() -> str:
    """Dump (doc_id, phash) for the phash_neardup oracle. The DCT hash of
    the planted image set is the shared definition (computable only in
    numpy); the SQL oracle re-derives everything distributed — 16-bit band
    explode, band-equality candidate join, pair dedup, Hamming-≤8 verify —
    from this dump, with phash stored as uint64 so DuckDB's shifts are
    logical. Idempotent; called from both the query path and
    ``__ray_entry__.oracle_sql()`` so either side of the compare can run
    first."""
    import os

    import pyarrow.parquet as pq

    from .functions.imaging import doc_phash64

    def write(tmp: str) -> None:
        ids = np.arange(_PHASH_DUMP_DOCS, dtype=np.int64)
        phs = np.array([doc_phash64(int(i)) for i in ids], dtype=np.int64)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids), "phash": pa.array(phs.view(np.uint64), pa.uint64())}),
            os.path.join(tmp, "phash.parquet"),
        )

    return _atomic_dump_dir(_PHASH_DUMP_DIR, write)


ORACLE_SQL["phash_neardup"] = f"""
    WITH ph AS (
        SELECT d.doc_id, p.phash
        FROM read_parquet('{_PHASH_DUMP_DIR}/phash.parquet') p
        JOIN documents d USING (doc_id)
    ), bands AS (
        SELECT doc_id, phash, b, (phash >> (16 * b)) & 65535 AS key
        FROM ph CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) t
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        a.phash AS ph_a, b.phash AS ph_b
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 8
"""


def q_native_join(sf_dir: str):
    """Hash-partitioned large-large join via Ray Data's native ``Dataset.join``
    (complement to q_bucketed_join's portable pattern): lineitem ⋈ orders,
    revenue per order status."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev4": pa.array(
                    np.round(t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy()) * 1e4).astype(np.int64)
                ),
            }
        ),
        **_PA,
    )
    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    n_parts = int(max(2, min(32, ray.cluster_resources().get("CPU", 8) // 2)))  # aggregator actors need slots
    joined = li.join(od, join_type="inner", num_partitions=n_parts, on=("l_orderkey",), right_on=("o_orderkey",))
    agg = joined.groupby("o_orderstatus").aggregate(Sum("rev4", alias_name="rev4"), Count(alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "revenue": pc.divide(pc.cast(t["rev4"], pa.float64()), 1e4),
                "n": t["n"],
            }
        ),
        **_PA,
    )


def q_range_join(sf_dir: str):
    """Range (interval) join — a custom-operator class Ray Data has no
    native verb for: each event joins the band whose ``[lo, hi)`` interval
    contains its value (IP→geo / price→tier lookups). Small side (25
    contiguous bands derived from ``nation``) is broadcast once via
    ``ray.put``; the probe is one ``np.searchsorted`` over the band edges
    per batch plus ``bincount`` partial aggregation — no shuffle of the
    fact table, O(n log r) per batch, and the exchange carries only
    per-band partials. Values are aggregated as scaled int64 (2-decimal
    domain) so sums are exact and summation-order-independent."""
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nat = nat.sort_values("n_nationkey")
    keys = nat["n_nationkey"].to_numpy()
    # searchsorted over one edge array requires contiguous bands; the SQL
    # oracle's per-band [k*20, k*20+20) predicates agree only then
    assert (keys == np.arange(len(keys))).all(), "nation keys not contiguous"
    edges = np.append(keys * 20.0, keys[-1] * 20.0 + 20.0)
    side_ref = ray.put((edges, nat["n_name"].to_numpy(object)))

    class RangeJoinAgg:
        def __init__(self):
            self.edges, self.names = ray.get(side_ref)
            self.n_bands = len(self.names)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = t["value"].to_numpy()
            idx = np.searchsorted(self.edges, v, side="right") - 1
            ok = (idx >= 0) & (idx < self.n_bands)
            idx = idx[ok]
            cents = np.round(v[ok] * 100).astype(np.int64)
            n = np.bincount(idx, minlength=self.n_bands).astype(np.int64)
            v2 = np.bincount(idx, weights=cents, minlength=self.n_bands).astype(np.int64)
            hit = n > 0
            return pa.table(
                {
                    "band": pa.array(self.names[hit], pa.string()),
                    "partial_n": pa.array(n[hit]),
                    "partial_v2": pa.array(v2[hit]),
                }
            )

    ev = _read(sf_dir, "events", ["value"])
    partials = ev.map_batches(RangeJoinAgg, concurrency=_pool(), **_PA)
    agg = partials.groupby("band").aggregate(
        Sum("partial_n", alias_name="n"), Sum("partial_v2", alias_name="v2")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"band": t["band"], "n": t["n"], "sum_value": pc.divide(pc.cast(t["v2"], pa.float64()), 100.0)}
        ),
        **_PA,
    )


QUERIES["range_join"] = q_range_join
ORACLE_SQL["range_join"] = """
    WITH bands AS (
        SELECT n_name AS band, n_nationkey * 20.0 AS lo, n_nationkey * 20.0 + 20.0 AS hi
        FROM nation
    )
    SELECT b.band, count(*) AS n,
           sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
"""

QUERIES["native_join"] = q_native_join
ORACLE_SQL["native_join"] = """
    SELECT o_orderstatus,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
           count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# SQL oracles for previously rows-only queries (round-2: flip no_oracle →
# hash-checked). Each restates the exact Python semantics in DuckDB.
# --------------------------------------------------------------------------


def _stopword_sql_list(lang: str) -> str:
    return "[" + ",".join(f"'{w}'" for w in sorted(T.STOPWORDS[lang])) + "]"


def _frame_bytes_const() -> int:
    # FrameSampleStage emits 16x16 raw RGB frames — constant byte length
    from .functions import imaging

    return len(imaging.encode_raw(imaging.synth_image(0, 16, 16)))


ORACLE_SQL["ngram_jaccard_dedup"] = """
    WITH toks AS (
      SELECT doc_id, lang, source,
             CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END AS t
      FROM documents
    ), grams AS (
      -- 3-token shingles, distinct (jaccard over distinct shingle strings ==
      -- jaccard over their 64-bit hashes, collision-free at these scales)
      SELECT doc_id, lang, source,
         CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE list_distinct(list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')))
         END AS g
      FROM toks
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.g, b.g)) AS inter, len(a.g) AS na, len(b.g) AS nb
      FROM grams a JOIN grams b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           round(CASE WHEN na = 0 AND nb = 0 THEN 1.0
                      ELSE CAST(inter AS DOUBLE) / (na + nb - inter) END, 6) AS jaccard_sim
    FROM pairs
    WHERE CASE WHEN na = 0 AND nb = 0 THEN 1.0
               ELSE CAST(inter AS DOUBLE) / (na + nb - inter) END >= 0.5
"""

ORACLE_SQL["lang_id"] = f"""
    WITH toks AS (
      SELECT doc_id, text,
             CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN CAST([] AS VARCHAR[])
                  ELSE list_distinct(string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS t
      FROM documents
    ), scored AS (
      SELECT doc_id, text, s.lang, len(list_intersect(t, s.words)) AS score
      FROM toks, (VALUES ('en', {_stopword_sql_list('en')}), ('es', {_stopword_sql_list('es')}),
                  ('fr', {_stopword_sql_list('fr')}), ('de', {_stopword_sql_list('de')})) AS s(lang, words)
    ), best AS (
      -- python tie-break: max((score, lang)) → highest score, then largest code
      SELECT doc_id, text, lang, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
      FROM scored
    )
    SELECT doc_id,
           CASE WHEN regexp_matches(substring(text, 1, 200), '[一-鿿]') THEN 'zh'
                WHEN score = 0 THEN 'und' ELSE lang END AS lang_pred
    FROM best WHERE rn = 1
"""

# --------------------------------------------------------------------------
# hash64-in-SQL oracles (simhash / fingerprint)
#
# The engine's 64-bit token hash (functions/hashing.py:60 — splitmix64
# word-fold over little-endian uint64 words of the utf-8 bytes, then a
# length fold) is reproduced exactly in DuckDB: UBIGINT bit ops + HUGEINT
# modular arithmetic (wrap-around multiply via 32-bit limb split), bytes
# extracted with hex(encode(token)). Expression chains are generated here so
# each splitmix64 application is a lateral-alias pipeline, not a hand-typed
# 5 KB expression. Every token's fold is unrolled to _HASH_SQL_MAX_WORDS
# words (the synthetic corpus tokenizes to <=8-byte tokens; a longer token
# raises error() in the oracle rather than mis-hashing).
# --------------------------------------------------------------------------

_M64 = 1 << 64
_SM_GOLDEN = 0x9E3779B97F4A7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB
_HASH_SQL_MAX_WORDS = 2


def _sql_mulmod(a: str, m: int) -> str:
    """(a * m) mod 2^64 with a 64-bit constant m, via 32-bit limb split:
    a*m = a*ml + ((a mod 2^32)*mh mod 2^32) << 32 — every intermediate fits
    HUGEINT (a*ml <= 2^96)."""
    mh, ml = m >> 32, m & 0xFFFFFFFF
    return (
        f"CAST((CAST({a} AS HUGEINT)*{ml} + ((CAST({a} AS HUGEINT) % 4294967296)*{mh}) "
        f"% 4294967296 * 4294967296) % {_M64} AS UBIGINT)"
    )


def _sql_mulmod_vv(a: str, x: str) -> str:
    """(a * x) mod 2^64 with BOTH operands variable UBIGINT columns, via the
    same 32-bit limb split (a*xlo ≤ 2^96 and (a%2^32)*xhi ≤ 2^64 both fit
    HUGEINT)."""
    return (
        f"CAST((CAST({a} AS HUGEINT)*({x} % 4294967296) + "
        f"((CAST({a} AS HUGEINT) % 4294967296)*({x} >> 32)) % 4294967296 * 4294967296) % {_M64} AS UBIGINT)"
    )


def _sql_splitmix(p: str, x: str) -> str:
    """Lateral-alias chain: alias {p} = splitmix64({x}) (hashing.py:29)."""
    z0 = f"CAST((CAST({x} AS HUGEINT) + {_SM_GOLDEN}) % {_M64} AS UBIGINT)"
    return (
        f"{z0} AS {p}_z0, "
        f"{_sql_mulmod(f'xor({p}_z0, {p}_z0 >> 30)', _SM_M1)} AS {p}_z1, "
        f"{_sql_mulmod(f'xor({p}_z1, {p}_z1 >> 27)', _SM_M2)} AS {p}_z2, "
        f"xor({p}_z2, {p}_z2 >> 31) AS {p}"
    )


def _sql_word(j: int) -> str:
    """Little-endian uint64 word j of column t's utf-8 bytes (HUGEINT expr)."""
    pad = f"rpad(hex(encode(t)), {16 * (j + 1)}, '0')"
    terms = " + ".join(
        f"CAST(CAST('0x' || substr({pad}, {16 * j + 2 * i + 1}, 2) AS UBIGINT) AS HUGEINT)*{256**i}"
        for i in range(8)
    )
    return f"({terms})"


def _sql_token_hash_ctes(src: str, max_words: int = _HASH_SQL_MAX_WORDS) -> str:
    """CTE chain hashing each (doc_id, i, t) row of {src} → tokhash(doc_id,
    i, th) with th = hash64(t) (hashing.py:60, seed 0): h = GOLDEN; for each
    of ceil(bytes/8) words: h = splitmix64(h ^ word); h = splitmix64(h ^
    bytelen)."""
    W = max_words
    ctes = [
        f"tokh0 AS (SELECT doc_id, i, t, strlen(t) AS L, CAST((strlen(t)+7)//8 AS BIGINT) AS nw, "
        f"CASE WHEN strlen(t) > {8 * W} THEN CAST(error('token too long for SQL hash64 oracle') AS UBIGINT) "
        f"ELSE CAST({_SM_GOLDEN} AS UBIGINT) END AS h0 FROM {src})"
    ]
    for j in range(W):
        ctes.append(
            f"tokh{j + 1} AS (SELECT doc_id, i, t, L, nw, "
            + _sql_splitmix(f"s{j}", f"xor(h{j}, CAST({_sql_word(j)} % {_M64} AS UBIGINT))")
            + f", CASE WHEN nw > {j} THEN s{j} ELSE h{j} END AS h{j + 1} FROM tokh{j})"
        )
    ctes.append(
        f"tokhf AS (SELECT doc_id, i, " + _sql_splitmix("sf", f"xor(h{W}, CAST(L AS UBIGINT))") + f" FROM tokh{W})"
    )
    ctes.append("tokhash AS (SELECT doc_id, i, sf AS th FROM tokhf)")
    return ", ".join(ctes)


_SQL_SIGNED64 = f"CAST(CASE WHEN coalesce(v.v, 0) >= {_M64 // 2} THEN CAST(coalesce(v.v, 0) AS HUGEINT) - {_M64} ELSE coalesce(v.v, 0) END AS BIGINT)"

# simhash64 (functions/text.py:234): per-token hash64, ±1 votes per bit
# weighted by token multiplicity, bit set where votes > 0. The bit value
# MUST be built with a UBIGINT shift — DuckDB's ** is float pow and eats
# the low bits.
# KMV distinct-count: identical splitmix64 hash per user_id, k smallest
# distinct hashes, the same exact-float estimate expression as the engine.
# (events.user_id is non-negative; the engine's uint64 wrap and the UBIGINT
# cast agree on that domain.)
ORACLE_SQL["approx_distinct_users"] = f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    h AS (SELECT {_sql_splitmix("hk", "CAST(user_id AS UBIGINT)")} FROM u),
    d AS (SELECT DISTINCT hk FROM h),
    k AS (SELECT hk FROM d ORDER BY hk LIMIT {_KMV_K}),
    agg AS (SELECT count(*) AS nk, max(hk) AS hmax FROM k)
    SELECT CASE WHEN nk < {_KMV_K} THEN CAST(nk AS BIGINT)
                ELSE CAST(floor({_KMV_K - 1} * (18446744073709551616.0 / CAST(hmax AS DOUBLE))) AS BIGINT)
           END AS approx_distinct_users
    FROM agg
"""

ORACLE_SQL["simhash"] = f"""
    WITH toks0 AS (
      SELECT doc_id, regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g') AS tt FROM documents
    ), tl AS (
      SELECT doc_id, string_split_regex(tt, '\\s+') AS ts FROM toks0 WHERE tt <> ''
    ), tok AS (
      SELECT doc_id, CAST(g.i AS BIGINT) AS i, ts[g.i] AS t
      FROM tl, unnest(range(1, len(ts) + 1)) AS g(i)
    ), {_sql_token_hash_ctes('tok')}, bits AS (
      SELECT h.doc_id, b.j,
             sum(CASE WHEN ((h.th >> CAST(b.j AS UBIGINT)) & 1) = 1 THEN 1 ELSE -1 END) AS votes
      FROM tokhash h, (SELECT unnest(range(0, 64)) AS j) b
      GROUP BY h.doc_id, b.j
    ), vals AS (
      SELECT doc_id,
             sum(CASE WHEN votes > 0 THEN CAST(CAST(1 AS UBIGINT) << CAST(j AS INTEGER) AS HUGEINT) ELSE 0 END) AS v
      FROM bits GROUP BY doc_id
    )
    SELECT d.doc_id, {_SQL_SIGNED64} AS simhash
    FROM documents d LEFT JOIN vals v USING (doc_id)
"""

# doc_fingerprint (functions/text.py:118): rolling Rabin–Karp 4-gram over
# token hash64s (base 1000003 mod 2^64), winnowing minima over sliding
# windows of min(4, len(roll)), distinct minima splitmix64'd and summed
# mod 2^64. n>=7 → 4-wide windows at positions 1..n-6; 4<=n<=6 → a single
# window (min of the whole roll); n<4 → sum of splitmix64(token hashes).
# shared CTE chain (tokenize -> hash64 -> rolling windows -> winnowing
# minima) used by both the per-doc fingerprint oracle and the
# fingerprint_neardup pairs oracle
_FP_MINIMA_CTES = f"""
    WITH toks0 AS (
      SELECT doc_id, regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS tt FROM documents
    ), tl AS (
      SELECT doc_id, string_split_regex(tt, '\\s+') AS ts FROM toks0 WHERE tt <> ''
    ), tok AS (
      SELECT doc_id, CAST(g.i AS BIGINT) AS i, ts[g.i] AS t
      FROM tl, unnest(range(1, len(ts) + 1)) AS g(i)
    ), {_sql_token_hash_ctes('tok')}, nn AS (
      SELECT doc_id, count(*) AS n FROM tokhash GROUP BY doc_id
    ), rolled AS (
      SELECT h.doc_id, h.i, nn.n,
             CAST((
               ((CAST(h.th AS HUGEINT) * 1000003
                 + lead(h.th, 1) OVER w) % {_M64} * 1000003
                 + lead(h.th, 2) OVER w) % {_M64} * 1000003
                 + lead(h.th, 3) OVER w) % {_M64} AS UBIGINT) AS roll
      FROM tokhash h JOIN nn USING (doc_id)
      WHERE nn.n >= 4
      WINDOW w AS (PARTITION BY h.doc_id ORDER BY h.i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
      QUALIFY h.i <= nn.n - 3
    ), wmins AS (
      SELECT doc_id, n, i,
             min(roll) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS w4
      FROM rolled
    ), minima AS (
      SELECT DISTINCT doc_id, w4 AS m FROM wmins WHERE n >= 7 AND i <= n - 6
      UNION
      SELECT doc_id, min(roll) AS m FROM rolled WHERE n BETWEEN 4 AND 6 GROUP BY doc_id, n
    )"""

ORACLE_SQL["fingerprint"] = _FP_MINIMA_CTES + f""", sm_min AS (
      SELECT doc_id, {_sql_splitmix('sv', 'm')} FROM minima
    ), big AS (
      SELECT doc_id, CAST(sum(CAST(sv AS HUGEINT)) % {_M64} AS UBIGINT) AS v FROM sm_min GROUP BY doc_id
    ), sm_small AS (
      SELECT h.doc_id, {_sql_splitmix('sw', 'h.th')} FROM tokhash h JOIN nn USING (doc_id) WHERE nn.n < 4
    ), small AS (
      SELECT doc_id, CAST(sum(CAST(sw AS HUGEINT)) % {_M64} AS UBIGINT) AS v FROM sm_small GROUP BY doc_id
    ), vals AS (SELECT * FROM big UNION ALL SELECT * FROM small)
    SELECT d.doc_id, {_SQL_SIGNED64} AS fingerprint
    FROM documents d LEFT JOIN vals v USING (doc_id)
"""

# pairs oracle: self-join of the exact winnowing-minima sets; the engine's
# int64 view of each minimum has the same bit pattern as the UBIGINT here,
# and only doc ids + counts reach the compared output
ORACLE_SQL["fingerprint_neardup"] = _FP_MINIMA_CTES + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM minima a JOIN minima b ON a.m = b.m AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
"""

# minhash_lsh_pairs (q_minhash_lsh_pairs / _MinHashStage → text.py:161-223):
# the full shingle→signature→band-key→bucket pipeline in SQL. Shingles are
# lowercase 3-gram token hashes (distinct; <3 tokens → one whole-text
# shingle; empty → no shingles, signature pinned at 2^64-1). Signature p =
# min over shingles s of ((a_p*s + b_p) mod 2^64) mod (2^61-1) — numpy
# wraps the uint64 product BEFORE the Mersenne mod (text.py:201), so the
# multiply is a variable-variable limb split, not plain HUGEINT math. Band
# key = splitmix64 fold of the band's 8 signature rows seeded with GOLDEN,
# finalized with band_id (text.py:210-213). Pair counts = bands with equal
# keys, doc_a < doc_b — exactly the engine's bucket-groupby output.
def _minhash_oracle_sql(num_perm: int = 128, num_bands: int = 16) -> str:
    mh = T.MinHasher(num_perm=num_perm)
    rows = num_perm // num_bands
    perm_values = ", ".join(f"({p}, {int(mh.a[p])}, {int(mh.b[p])})" for p in range(num_perm))
    pivot = ", ".join(f"max(CASE WHEN r = {r} THEN sig END) AS s{r}" for r in range(rows))
    sig_cols = ", ".join(f"s{r}" for r in range(rows))
    fold_ctes = [f"bf0 AS (SELECT doc_id, band_id, {sig_cols}, CAST({_SM_GOLDEN} AS UBIGINT) AS h0 FROM bp)"]
    for r in range(rows):
        fold_ctes.append(
            f"bf{r + 1} AS (SELECT doc_id, band_id, {sig_cols}, "
            + _sql_splitmix(f"h{r + 1}", f"xor(h{r}, s{r})")
            + f" FROM bf{r})"
        )
    fold_ctes.append(
        "bfk AS (SELECT doc_id, band_id, "
        + _sql_splitmix("bkey", f"xor(h{rows}, CAST(band_id AS UBIGINT))")
        + f" FROM bf{rows})"
    )
    folds = ", ".join(fold_ctes)
    mers = (1 << 61) - 1
    return f"""
    WITH toks0 AS (
      SELECT doc_id, regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g') AS tt FROM documents
    ), tl AS (
      SELECT doc_id, string_split_regex(tt, '\\s+') AS ts FROM toks0 WHERE tt <> ''
    ), sh3 AS (
      SELECT doc_id, CAST(g.i AS BIGINT) AS i, ts[g.i] || ' ' || ts[g.i+1] || ' ' || ts[g.i+2] AS t
      FROM tl, unnest(range(1, len(ts) - 1)) AS g(i) WHERE len(ts) >= 3
    ), shsmall AS (
      SELECT doc_id, CAST(1 AS BIGINT) AS i, array_to_string(ts, ' ') AS t FROM tl WHERE len(ts) BETWEEN 1 AND 2
    ), tok AS (
      SELECT * FROM sh3 UNION ALL SELECT * FROM shsmall
    ), {_sql_token_hash_ctes("tok", max_words=4)}, sh AS (
      SELECT DISTINCT doc_id, th FROM tokhash
    ), perms AS (
      SELECT * FROM (VALUES {perm_values}) AS p(p, a, b)
    ), sigs AS (
      SELECT s.doc_id, p.p,
             min(CAST((CAST({_sql_mulmod_vv("p.a", "s.th")} AS HUGEINT) + p.b) % {_M64} % {mers} AS UBIGINT)) AS sig
      FROM sh s, perms p GROUP BY s.doc_id, p.p
    ), esigs AS (
      SELECT d.doc_id, p.p, CAST({_M64 - 1} AS UBIGINT) AS sig
      FROM (SELECT doc_id FROM toks0 WHERE tt = '') d, perms p
    ), allsigs AS (
      SELECT * FROM sigs UNION ALL SELECT * FROM esigs
    ), bandrows AS (
      SELECT doc_id, p // {rows} AS band_id, p % {rows} AS r, sig FROM allsigs
    ), bp AS (
      SELECT doc_id, band_id, {pivot} FROM bandrows GROUP BY doc_id, band_id
    ), {folds}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
    FROM bfk a JOIN bfk b ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """


ORACLE_SQL["minhash_lsh_pairs"] = _minhash_oracle_sql()

# Crawl-table oracles: the DuckDB side reads the parquet dump of the
# single-process oracle simulator (pipelines/oracle.py), written by
# ensure_crawl_oracle_dump() from whichever side of the driver compare runs
# first — engine vs simulator is exactly the conformance suite's check,
# here surfaced through the driver's row/schema/value-hash gate.
ORACLE_SQL["crawl_order"] = f"""
    SELECT fetch_seq, wave, vtime, url_hash, host, ua, proxy_id
    FROM read_parquet('{_ORACLE_DUMP_DIR}/order.parquet')
"""
ORACLE_SQL["crawl_seen_set"] = f"""
    SELECT url_hash, status, depth, attempt
    FROM read_parquet('{_ORACLE_DUMP_DIR}/seen_set.parquet')
"""
ORACLE_SQL["crawl_images_meta"] = f"""
    SELECT image_id, w, h, fmt, caption, phash
    FROM read_parquet('{_ORACLE_DUMP_DIR}/images.parquet')
"""

ORACLE_SQL["frame_sample"] = f"""
    WITH f AS (SELECT 'vid' || CAST(doc_id AS VARCHAR) AS video_id,
                      greatest(1, strlen(text) // 1024) AS n FROM documents)
    SELECT video_id, CAST(u.i AS INTEGER) AS frame_index,
           CAST({_frame_bytes_const()} AS BIGINT) AS frame_bytes
    FROM f, unnest(range(0, CAST(n AS BIGINT), 10)) AS u(i)
"""


# Apply the tuned-context wrapper to every registered query — and rebind the
# module attribute so direct q_* callers (tests, bench) get it too.
for _name, _fn in list(QUERIES.items()):
    if not hasattr(_fn, "__wrapped_untuned__"):
        _w = _tuned(_fn)
        QUERIES[_name] = _w
        globals()[_fn.__name__] = _w
del _name, _fn, _w
flagship = _tuned(flagship)
