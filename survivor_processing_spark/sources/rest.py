"""Keyset-paginated REST source (SURVEY.md §2 A9/N1).

The reference crawls the pushshift API by ``created_utc`` cursor
until an empty page, with retry + jittered sleep (reference
reddit_extract.py:47-83; watermark start :86-100).  Spark-native
shape: a Spark 4 Python DataSource whose reader pages forward from a
watermark.  The fetch function is injected (module-level registry) so
tests and offline runs use a deterministic in-process backend; the
paging/cursor/retry logic — the part that IS the operator — is real.

Scale note: one keyset cursor is inherently sequential, so a single
cursor maps to ONE input partition (like one Kafka partition).
Parallelism comes from *multiple* cursors — per type, per time-range
— each its own partition via ``partitions()``; the planner fans them
out across executors.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator, Sequence

# page fetcher: (entity_type, after_cursor, limit) -> list[dict]
Fetcher = Callable[[str, int, int], list[dict]]


class PermanentFetchError(RuntimeError):
    """A fetch failure retrying cannot cure (wrong response shape,
    4xx semantics surfaced as payload).  ``paged_fetch`` re-raises it
    immediately instead of burning the retry budget."""


_FETCHERS: dict[str, Fetcher] = {}


def register_fetcher(name: str, fn: Fetcher) -> None:
    """NOTE: the reader resolves fetchers by name INSIDE the Python
    worker process, where this module is imported fresh — a fetcher
    must therefore be registered at module import time (defined here,
    or in a module the job imports on every worker)."""
    _FETCHERS[name] = fn


def _synthetic_fetcher(entity_type: str, after: int, limit: int) -> list[dict]:
    """Deterministic in-process 'API' for tests/offline runs: events
    every 60 s from epoch 1_600_000_000 to 1_600_086_400 (1 day),
    ids derived from (type, ts)."""
    base, step, end = 1_600_000_000, 60, 1_600_086_400
    first = base + ((after - base) // step + 1) * step if after >= base else base
    out = []
    ts = first
    while ts <= end and len(out) < limit:
        out.append(
            {
                "id": f"{entity_type[0]}{ts}",
                "created_utc": ts,
                "body": f"{entity_type} at {ts}",
            }
        )
        ts += step
    return out


register_fetcher("synthetic", _synthetic_fetcher)
register_fetcher("default", _synthetic_fetcher)


def make_http_fetcher(base_url: str, timeout_s: float = 10.0) -> Fetcher:
    """A real HTTP page fetcher (stdlib urllib — no extra deps) for
    the same keyset contract: GET
    ``{base_url}?type=<entity>&after=<cursor>&limit=<n>`` returning a
    JSON list of records (or ``{"data": [...]}``, the pushshift shape
    the reference consumed — reddit_extract.py:47-83).  Timeouts and
    HTTP errors raise; :func:`paged_fetch`'s bounded retry loop is
    the policy layer, exactly as it is for any other fetcher."""
    import json
    import urllib.parse
    import urllib.request

    def fetch(entity_type: str, after: int, limit: int) -> list[dict]:
        q = urllib.parse.urlencode(
            {"type": entity_type, "after": after, "limit": limit}
        )
        with urllib.request.urlopen(
            f"{base_url}?{q}", timeout=timeout_s
        ) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        if isinstance(payload, dict):
            if "data" not in payload:
                # dict-shaped error body with HTTP 200 (rate-limit /
                # error JSON): permanent — retrying re-fetches the
                # same shape; fail fast with the payload keys visible
                raise PermanentFetchError(
                    f"response has no 'data' field (keys: {sorted(payload)})"
                )
            return payload["data"]
        return payload

    return fetch


def resolve_fetcher(name: str) -> Fetcher:
    """Fetcher lookup used inside the Python worker.  A registered
    name wins; otherwise an ``http(s)://`` name IS the endpoint — the
    worker builds an HTTP fetcher bound to it, so real endpoints need
    no import-time registration ritual (DataSource options are plain
    strings and this is how the URL rides along)."""
    if name in _FETCHERS:
        return _FETCHERS[name]
    if name.startswith(("http://", "https://")):
        return make_http_fetcher(name)
    raise KeyError(f"unknown fetcher {name!r}")


def paged_fetch(
    fetcher: Fetcher,
    entity_type: str,
    start: int,
    stop: int | None = None,
    limit: int = 1000,
    max_retries: int = 10,
    sleep_s: float = 0.0,
) -> Iterator[dict]:
    """Keyset pagination: advance the cursor to max(created_utc) of
    each page; empty page (or cursor past ``stop``) ends the scan.
    Retries with bounded attempts mirror reference
    reddit_extract.py:61-73."""
    cursor = start
    while True:
        page: list[dict] | None = None
        for attempt in range(max_retries):
            try:
                page = fetcher(entity_type, cursor, limit)
                break
            except PermanentFetchError:
                raise
            except Exception:  # noqa: BLE001 - retry loop
                if attempt == max_retries - 1:
                    raise
                time.sleep(sleep_s * (attempt + 1))
        if not page:
            return
        advanced = cursor
        for rec in page:
            cu = int(rec["created_utc"])
            if stop is not None and cu > stop:
                return
            advanced = max(advanced, cu)
            yield rec
        if advanced == cursor:  # no forward progress → stop
            return
        cursor = advanced


try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _RestPartition(InputPartition):
        def __init__(self, entity_type: str, start: int, stop: int | None):
            self.entity_type = entity_type
            self.start = start
            self.stop = stop

    class RestDataSourceReader(DataSourceReader):
        def __init__(self, options: dict):
            self.fetcher_name = options.get("fetcher", "default")
            self.types = options.get("types", "submission,comment").split(",")
            self.start = int(options.get("start", "0"))
            self.stop = int(options["stop"]) if "stop" in options else None
            self.limit = int(options.get("limit", "1000"))

        def partitions(self) -> Sequence[InputPartition]:
            # one sequential cursor per entity type; finer time-range
            # splits would go here when start/stop bounds are known
            return [_RestPartition(t, self.start, self.stop) for t in self.types]

        def read(self, partition: _RestPartition):
            fetcher = resolve_fetcher(self.fetcher_name)
            for rec in paged_fetch(
                fetcher,
                partition.entity_type,
                partition.start,
                partition.stop,
                self.limit,
            ):
                yield (
                    str(rec.get("id")),
                    partition.entity_type,
                    int(rec["created_utc"]),
                    str(rec.get("body", "")),
                )

    class RestDataSource(DataSource):
        """spark.read.format('rest_keyset').option('start', ...)"""

        @classmethod
        def name(cls) -> str:
            return "rest_keyset"

        def schema(self) -> str:
            return "id string, entity_type string, created_utc bigint, body string"

        def reader(self, schema) -> DataSourceReader:
            return RestDataSourceReader(self.options)

    def register_rest_source(spark) -> None:
        spark.dataSource.register(RestDataSource)

except ImportError:  # pragma: no cover - pyspark<4 fallback

    def register_rest_source(spark) -> None:  # type: ignore[misc]
        raise NotImplementedError("Python DataSource API requires pyspark>=4")
