"""Paginated STAC-search source (the reference's S3 operator, Ray-native).

The reference walks the /search ``links[rel=='next']`` chain serially,
validating cumulative ``context.returned`` against ``context.matched``
(pagination.py:5-61).  The Ray-native shape: a DRIVER-SIDE page-chain
walk that only enumerates page URLs (cheap, metadata-only), then a
parallel ``read_pages`` fan-out where each Ray task fetches and parses
one page — pages become read tasks, exactly the fragments-replace-pages
mapping from SURVEY.md §2.1.

No network exists in this sandbox, so the transport is pluggable: a
``fetch`` callable maps url -> JSON dict.  Tests exercise the full
chain walk + validation + parallel parse against a directory of local
JSON page files; a real deployment passes ``requests.get(...).json``.
"""

from __future__ import annotations

import json
from collections.abc import Callable


class PageValidationError(RuntimeError):
    pass


def walk_pages(first_url: str, fetch: Callable[[str], dict],
               max_pages: int = 100_000) -> list[str]:
    """Enumerate the next-link chain; validate returned vs matched.

    Mirrors pagination.py semantics: accumulate ``context.returned``
    per page and require the total to equal ``context.matched`` at the
    end of the chain; raise on mismatch (the reference logs + aborts).
    """
    urls = []
    url: str | None = first_url
    total_returned = 0
    matched = None
    while url and len(urls) < max_pages:
        page = fetch(url)
        urls.append(url)
        ctx = page.get("context", {})
        total_returned += int(ctx.get("returned", 0))
        if ctx.get("matched") is not None:
            matched = int(ctx["matched"])
        url = next((l.get("href") for l in page.get("links", [])
                    if l.get("rel") == "next"), None)
    if matched is not None and total_returned != matched:
        raise PageValidationError(
            f"returned {total_returned} != matched {matched}")
    return urls


def read_pages(urls: list[str], fetch: Callable[[str], dict],
               parallelism: int | None = None):
    """Parallel page fetch+parse -> Dataset of STAC item rows.

    One Ray task per page (the reference fetched pages serially in the
    driver loop, app.py:142-146).
    """
    import ray
    import ray.data as rd

    fetch_ref = ray.put(fetch)

    def load(batch):
        import pyarrow as pa
        f = ray.get(fetch_ref)
        rows = []
        for url in batch["url"]:
            page = f(url)
            for feat in page.get("features", []):
                rows.append({
                    "item_id": feat.get("id"),
                    "collection_id": feat.get("collection"),
                    "bbox": feat.get("bbox"),
                    "datetime": (feat.get("properties") or {}).get("datetime"),
                    "raw": json.dumps(feat, ensure_ascii=False),
                })
        return pa.Table.from_pylist(rows) if rows else pa.table(
            {"item_id": pa.array([], type=pa.string())})

    ds = rd.from_items([{"url": u} for u in urls])
    return ds.map_batches(load, batch_format="numpy", batch_size=1,
                          concurrency=parallelism)


def file_fetcher(directory: str) -> Callable[[str], dict]:
    """Local-file transport for tests: url 'page-N' -> directory/page-N.json."""
    def fetch(url: str) -> dict:
        name = url.rsplit("/", 1)[-1]
        with open(f"{directory}/{name}.json") as f:
            return json.load(f)
    return fetch


class _UrllibResponse:
    def __init__(self, code: int, body: bytes):
        self.status_code = code
        self._body = body

    def json(self) -> dict:
        return json.loads(self._body.decode("utf-8"))


class UrllibSession:
    """Zero-dependency stdlib transport with the ``requests.Session``
    surface ``http_fetcher`` needs (``.get(url, timeout)`` returning an
    object with ``status_code`` / ``.json()``).  Picklable (stateless),
    so ``read_pages`` can ship the fetcher to Ray tasks.  Used where
    ``requests`` is absent; the live-HTTP integration test drives it
    against a real local socket."""

    def get(self, url: str, timeout: float = 30.0) -> _UrllibResponse:
        import urllib.error
        import urllib.request
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                return _UrllibResponse(resp.status, resp.read())
        except urllib.error.HTTPError as exc:      # 4xx/5xx carry a body
            return _UrllibResponse(exc.code, exc.read())


def http_fetcher(timeout: float = 30.0, retries: int = 3,
                 backoff: float = 1.5, session=None) -> Callable[[str], dict]:
    """HTTP transport (the reference's requests.get path, app.py:54,80,
    143) behind an import probe — ``requests`` is absent in this
    sandbox (no network), so construction raises NotImplementedError
    here, while a real deployment gets retrying GETs with backoff.

    ``session``: optional pre-built requests.Session (or stub exposing
    ``.get``), injected by tests to exercise the retry logic without a
    network.
    """
    if session is None:
        try:
            import requests
        except ImportError as exc:
            raise NotImplementedError(
                "requests is not importable in this environment; pass a "
                "session or use file_fetcher") from exc
        session = requests.Session()

    class _ClientError(RuntimeError):
        """Non-retryable HTTP error (4xx other than 429)."""

    def fetch(url: str) -> dict:
        import time as _time
        last: Exception | None = None
        for attempt in range(retries):
            try:
                resp = session.get(url, timeout=timeout)
                code = getattr(resp, "status_code", 200)
                # retry only transient statuses; a 404/403 error body must
                # NOT be returned as a normal page (a paged harvest against
                # a bad URL would terminate quietly with garbage data)
                if code >= 500 or code == 429:
                    raise RuntimeError(f"server error {code}")
                if code >= 400:
                    raise _ClientError(f"GET {url} -> HTTP {code}")
                return resp.json()
            except _ClientError:
                raise
            except Exception as exc:          # retry transient failures
                last = exc
                if attempt + 1 < retries:
                    _time.sleep(backoff ** attempt * 0.1)
        raise RuntimeError(f"GET {url} failed after {retries} tries") from last
    return fetch
