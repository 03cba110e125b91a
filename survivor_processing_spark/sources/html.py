"""HTML page source (SURVEY.md §2 A3/A4).

The reference scrapes fandom wiki pages with BeautifulSoup:
``data-source`` attribute extraction from infobox markup and a
section state machine over ``<p>``/``<li>`` elements (reference
season_extract.py:27-78, contestant_extract.py:52-126), plus
link-list crawls for child pages (episodes_extract.py:68-86).  Here
the parser is the stdlib ``html.parser`` state machine — the same
capabilities, no bs4 dependency.  At scale, pages land as files (or a
binary column) and parse partition-parallel via
``sources.binary.parse_binary_files``.
"""

from __future__ import annotations

from html.parser import HTMLParser


class _DataSourceParser(HTMLParser):
    """Collect text under elements carrying ``data-source=...`` —
    the infobox convention the reference reads field values from."""

    def __init__(self) -> None:
        super().__init__()
        self.values: dict[str, str] = {}
        self._stack: list[str | None] = []
        self._bufs: dict[str, list[str]] = {}

    def handle_starttag(self, tag, attrs):
        key = dict(attrs).get("data-source")
        if key is not None:
            self._bufs.setdefault(key, [])
        self._stack.append(key)

    def handle_endtag(self, tag):
        if self._stack:
            key = self._stack.pop()
            if key is not None and key in self._bufs:
                self.values[key] = " ".join(
                    " ".join(self._bufs[key]).split()
                )

    def handle_data(self, data):
        for key in (k for k in self._stack if k is not None):
            self._bufs.setdefault(key, []).append(data)


def extract_data_sources(html: str) -> dict[str, str]:
    """{data-source attr: collapsed text} for one page."""
    p = _DataSourceParser()
    p.feed(html)
    p.close()
    return p.values


class _LinkParser(HTMLParser):
    def __init__(self, href_prefix: str | None) -> None:
        super().__init__()
        self.links: list[tuple[str, str]] = []
        self._prefix = href_prefix
        self._href: str | None = None
        self._text: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            href = dict(attrs).get("href")
            if href and (self._prefix is None or href.startswith(self._prefix)):
                self._href = href
                self._text = []

    def handle_endtag(self, tag):
        if tag == "a" and self._href is not None:
            self.links.append((self._href, " ".join("".join(self._text).split())))
            self._href = None

    def handle_data(self, data):
        if self._href is not None:
            self._text.append(data)


def extract_links(html: str, href_prefix: str | None = None) -> list[tuple[str, str]]:
    """(href, anchor-text) pairs, optionally filtered by prefix — the
    link-list crawl primitive (A4).  Driver lists pages; fetching and
    parsing the children is then a distributed map over the URL list."""
    p = _LinkParser(href_prefix)
    p.feed(html)
    p.close()
    return p.links


def fetch_url(
    url: str, timeout_s: float = 10.0, max_retries: int = 3
) -> tuple[int, str | None]:
    """One real HTTP GET (stdlib urllib) with bounded retry —
    (status, body) on success, (-1, None) after exhausted retries.
    The per-URL error is DATA, not an exception: at a million URLs a
    dead link must not kill the task (reference retried per page too,
    reddit_extract.py:61-73).

    4xx is permanent (retrying won't help) EXCEPT 429 Too Many
    Requests and 408 Request Timeout — the two 4xx a crawler must
    back off and retry, honoring ``Retry-After`` when the server
    sends one (capped at ``timeout_s``); classing them permanent
    would drop whole partitions of URLs under rate limiting
    (ADVICE r05)."""
    import time
    import urllib.error
    import urllib.request

    for attempt in range(max_retries):
        delay = 0.05 * (attempt + 1)
        try:
            with urllib.request.urlopen(url, timeout=timeout_s) as resp:
                return resp.status, resp.read().decode("utf-8", "replace")
        except urllib.error.HTTPError as e:
            retryable_4xx = e.code in (408, 429)
            if 400 <= e.code < 500 and not retryable_4xx:
                return e.code, None  # permanent: retrying won't help
            if attempt == max_retries - 1:
                return e.code, None
            if retryable_4xx:
                ra = e.headers.get("Retry-After") if e.headers else None
                try:
                    delay = max(delay, min(float(ra), timeout_s))
                except (TypeError, ValueError):
                    pass  # absent or http-date Retry-After: keep backoff
        except Exception:  # noqa: BLE001 - network errors retry
            if attempt == max_retries - 1:
                return -1, None
        time.sleep(delay)
    return -1, None


def fetch_pages(
    urls_df,
    url_col: str = "url",
    timeout_s: float = 10.0,
    max_retries: int = 3,
    fetch_partitions: int | None = None,
):
    """Distributed page fetch: the A4 crawl's second half.  The driver
    holds only the URL LIST (seed-page ``extract_links`` output); the
    GETs run executor-side through ``mapInPandas``, so page bodies
    never pass through the driver.  Output: (url, status, html) with
    failures as ``status=-1, html NULL`` rows (quarantine semantics).

    ``fetch_partitions`` round-robins the URL list first — a crawl is
    latency-bound, not data-bound, so parallelism should be set by
    target-host politeness x executor count, not by the accident of
    the input file's partitioning."""
    import pandas as pd

    if fetch_partitions is not None:
        urls_df = urls_df.repartition(fetch_partitions)

    def run(batches):
        for pdf in batches:
            rows = []
            for u in pdf[url_col]:
                status, body = fetch_url(u, timeout_s, max_retries)
                rows.append((u, status, body))
            yield pd.DataFrame(rows, columns=["url", "status", "html"])

    return urls_df.mapInPandas(run, schema="url string, status int, html string")
