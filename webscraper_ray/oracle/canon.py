"""URL validation + canonicalization (SURVEY.md §2 E1/E2).

The reference delegates canonicalization to crawlee's request ``uniqueKey``
(reference ``src/crawler.ts:50-51,104``; crawlee normalizes the URL by
trimming, lowercasing scheme+host, stripping the fragment, dropping
``utm_*`` query params and sorting the remaining params). The canonical URL
is stored as the document's ``url`` and keys every dedup decision
(crawlee's RequestQueue dedupes on uniqueKey — ``src/crawler.ts:99-104``).

We implement the same normalization as a pure function. It is used

1. by the oracle crawl simulator,
2. inside ``map_batches`` when canonicalizing outlink batches, and
3. as the key of the URL-seen filter in frontier shard actors,

so pipeline and oracle agree by construction. Validity mirrors
``isValidUrl`` (reference ``src/api.ts:192-200``): a string starting with
``https://`` that the URL parser accepts.
"""

from __future__ import annotations

from functools import lru_cache
from urllib.parse import urlsplit, parse_qsl, quote, urlencode

__all__ = ["is_valid_url", "canonicalize", "host_of"]

# RFC 3986 'unreserved' + sub-delims we leave untouched in paths.
_PATH_SAFE = "/-._~!$&'()*+,;=:@%"
_DEFAULT_PORTS = {"https": "443", "http": "80"}


def is_valid_url(url: object) -> bool:
    """True iff ``url`` is a string, starts with ``https://`` and parses.

    Mirrors reference ``src/api.ts:192-200`` (scheme check is
    case-sensitive there — ``startsWith('https://')`` — so ``HTTPS://``
    seeds are rejected, as in the reference).
    """
    if not isinstance(url, str) or not url.startswith("https://"):
        return False
    try:
        parts = urlsplit(url)
    except ValueError:
        return False
    # ``new URL('https://')`` throws: a host is required.
    return bool(parts.netloc)


@lru_cache(maxsize=65536)
def canonicalize(url: str) -> str:
    """crawlee-style uniqueKey normalization of ``url``.

    Memoized (pure function of the string): dense link graphs repeat the
    same outlink across many pages of a batch, and canonicalization is a
    measured hot path of both the extract stage and the route stage.

    Steps (documented contract; both pipeline and oracle use this single
    implementation):

    - trim surrounding whitespace
    - lowercase scheme and host
    - drop a default port (``:443`` for https, ``:80`` for http)
    - empty path -> ``/``
    - strip the fragment
    - drop query params whose key starts with ``utm_`` (case-insensitive)
    - sort remaining query params by (key, value), re-encoded

    Raises ``ValueError`` on unparsable input — callers filter with
    :func:`is_valid_url` first.
    """
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"

    path = quote(parts.path, safe=_PATH_SAFE) or "/"

    query = ""
    if parts.query:
        kept = [
            (k, v)
            for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if not k.lower().startswith("utm_")
        ]
        kept.sort()
        query = urlencode(kept)

    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out


def host_of(canon_url: str) -> str:
    """Host of an (already canonical) URL — the frontier partition key.

    The frontier is hash-partitioned by host (north_rule): politeness
    budgets, robots rules and the seen-filter shard are all per-host, so
    one shard owns all URLs of a host.
    """
    return urlsplit(canon_url).hostname or ""
