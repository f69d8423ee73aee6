"""Vectorized URL canonicalization, host extraction and link resolution.

The reference enqueues raw ``href`` strings verbatim (HabrParser.scala:23-28)
and relies on exact string equality for dedup (SqlQueueTaskProvider.scala:58-68).
A sane 64-bit ``url_hash`` needs a canonical form first, so this engine adds an
explicit canonicalize stage (SURVEY.md §2.3, "URL canonicalization" row):

* lowercase scheme and host,
* strip the fragment (``#...``),
* strip default ports (``:80`` for http, ``:443`` for https),
* empty path → ``/``,
* resolve relative hrefs against the parent URL (reference keeps only hrefs
  with ``startsWith("/") || contains(baseDomain)`` — HabrParser.scala:25).

All kernels are pyarrow.compute expressions over string arrays — no Python
row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = r"^(?P<scheme>[Hh][Tt][Tt][Pp][Ss]?)://(?P<host>[^/?#]+)(?P<rest>[^#]*)"


def _as_chunkless(arr: pa.Array | pa.ChunkedArray | list) -> pa.Array:
    if isinstance(arr, list):
        arr = pa.array(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def canonicalize(urls: pa.Array | pa.ChunkedArray | list) -> pa.Array:
    """Canonical form of absolute http(s) URLs; non-URLs → null."""
    urls = _as_chunkless(urls)
    parts = pc.extract_regex(urls, _URL_RE)
    scheme = pc.ascii_lower(pc.struct_field(parts, "scheme"))
    host = pc.ascii_lower(pc.struct_field(parts, "host"))
    rest = pc.struct_field(parts, "rest")
    # strip default ports — only the scheme's own default (http://h:80 ≡
    # http://h but https://h:80 is a distinct non-default-port URL)
    http = pc.equal(scheme, "http")
    host = pc.if_else(http, pc.replace_substring_regex(host, r":80$", ""), host)
    https = pc.equal(scheme, "https")
    host = pc.if_else(
        https, pc.replace_substring_regex(host, r":443$", ""), host
    )
    # empty path → "/"
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/"), rest)
    out = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def extract_scheme(urls: pa.Array | pa.ChunkedArray | list) -> pa.Array:
    """Lowercased scheme of each absolute http(s) URL; non-URLs → null."""
    urls = _as_chunkless(urls)
    parts = pc.extract_regex(urls, _URL_RE)
    out = pc.ascii_lower(pc.struct_field(parts, "scheme"))
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def extract_host(urls: pa.Array | pa.ChunkedArray | list) -> pa.Array:
    """Host (lowercased, port stripped) of each absolute URL; non-URLs → null."""
    urls = _as_chunkless(urls)
    parts = pc.extract_regex(urls, _URL_RE)
    host = pc.ascii_lower(pc.struct_field(parts, "host"))
    return pc.replace_substring_regex(host, r":\d+$", "")


def resolve_links(hrefs: pa.Array | list, base_scheme: pa.Array | str, base_host: pa.Array | str) -> pa.Array:
    """Resolve hrefs against their parent page, vectorized.

    ``base_scheme``/``base_host`` may be scalars (all links share one parent)
    or per-row arrays. Absolute http(s) hrefs pass through; hrefs starting
    with ``/`` are joined to the parent's scheme://host; everything else
    (mailto:, javascript:, bare words) → null — mirroring the reference's
    keep-predicate (HabrParser.scala:25) generalized to any host.
    """
    hrefs = _as_chunkless(hrefs)
    n = len(hrefs)
    if isinstance(base_scheme, str):
        base_scheme = pa.array([base_scheme] * n, pa.string())
    if isinstance(base_host, str):
        base_host = pa.array([base_host] * n, pa.string())
    is_abs = pc.match_substring_regex(hrefs, r"^https?://")
    is_rel = pc.starts_with(hrefs, "/")
    joined = pc.binary_join_element_wise(base_scheme, "://", base_host, hrefs, "")
    out = pc.if_else(is_abs, hrefs, pc.if_else(is_rel, joined, pa.scalar(None, pa.string())))
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def host_partition(hosts: pa.Array | np.ndarray | list, num_partitions: int, seed: int = 0) -> np.ndarray:
    """Stable partition id per host: ``hash(host) % P``.

    Politeness / robots decisions are per-host, so the frontier is
    partitioned by host-hash (SURVEY.md §4.4) — all rows for a host land in
    one partition regardless of cluster size.
    """
    from .hashing import hash64

    return (hash64(hosts, seed=seed) % np.uint64(num_partitions)).astype(np.int32)
