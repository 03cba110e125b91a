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
