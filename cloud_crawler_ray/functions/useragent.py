"""Deterministic user-agent assignment.

The reference picks a random UA per HTTP client from a generated
Chrome/Firefox/Edge/Opera × OS matrix (UserAgentGenerator.scala:38-44 and
the four generators). Randomness breaks replay, so here the UA is a pure
function of the URL hash — same matrix idea, seeded choice (SURVEY.md §2.3
"determinism: hash(url)→UA, not Random").
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

_BROWSERS = [
    ("Chrome", "Mozilla/5.0 ({os}) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/{v}.0.0.0 Safari/537.36"),
    ("Firefox", "Mozilla/5.0 ({os}; rv:{v}.0) Gecko/20100101 Firefox/{v}.0"),
    ("Edge", "Mozilla/5.0 ({os}) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/{v}.0.0.0 Safari/537.36 Edg/{v}.0"),
    ("Opera", "Mozilla/5.0 ({os}) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/{v}.0.0.0 Safari/537.36 OPR/{v}.0"),
]

_OSES = [
    "Windows NT 10.0; Win64; x64",
    "Macintosh; Intel Mac OS X 13_5",
    "X11; Linux x86_64",
    "X11; Ubuntu; Linux x86_64",
]

_VERSIONS = list(range(110, 126))

# the whole matrix is only 4×4×16 = 256 strings — render it once so a batch
# lookup is one fancy-index instead of len(batch) .format() calls
_UA_TABLE = np.array(
    [b[1].format(os=o, v=v) for b in _BROWSERS for o in _OSES for v in _VERSIONS],
    dtype=object,
)


def user_agents(url_hashes: np.ndarray) -> list[str]:
    """Deterministic UA per url_hash from the browser × OS × version matrix."""
    h = splitmix64(np.asarray(url_hashes, np.uint64) ^ np.uint64(0x0A9E27))
    bi = (h % np.uint64(len(_BROWSERS))).astype(np.int64)
    oi = ((h >> np.uint64(8)) % np.uint64(len(_OSES))).astype(np.int64)
    vi = ((h >> np.uint64(16)) % np.uint64(len(_VERSIONS))).astype(np.int64)
    return _UA_TABLE[(bi * len(_OSES) + oi) * len(_VERSIONS) + vi].tolist()
