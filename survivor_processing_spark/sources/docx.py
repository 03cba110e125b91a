""".docx paragraph source (SURVEY.md §2 A7).

The reference parses Word confessional transcripts with python-docx
(reference confessional_extract.py:26-47 ``dfize_doc``: per-paragraph
regex → contestant, n/total, content, day, order; filename regex
``(\\d+)x(\\d+)_ (.*)`` for season/episode, :50-68).  docx is ZIP +
WordprocessingML; paragraphs are ``<w:p>`` and text runs ``<w:t>`` —
stdlib zipfile + ElementTree covers the reference's usage without
python-docx.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

# paragraph shape the reference consumes: "Name (3/15): text ... Day 7"
_CONF_RE = re.compile(r"^(?P<name>[^(]+?)\s*\((?P<n>\d+)/(?P<total>\d+)\):\s*(?P<content>.*)$")
_DAY_RE = re.compile(r"Day\s+(\d+)\s*$")
_FNAME_RE = re.compile(r"(\d+)x(\d+)_ (.*)\.docx$")


def docx_paragraphs(content: bytes) -> list[str]:
    """All non-empty paragraph texts, in document order."""
    zf = zipfile.ZipFile(io.BytesIO(content))
    root = ET.fromstring(zf.read("word/document.xml"))
    out = []
    for p in root.iter(f"{_W}p"):
        text = "".join(t.text or "" for t in p.iter(f"{_W}t"))
        if text.strip():
            out.append(text)
    return out


def parse_confessional_docx(path: str, content: bytes) -> list[tuple]:
    """One row per confessional paragraph:
    (season, episode, contestant, n_in_episode, total_in_episode,
     content, day, order) — the A7 output shape.  Season/episode come
    from the filename; ``day`` carries forward from 'Day N' trailer
    lines; ``order`` is the paragraph ordinal (the explicit
    ingestion-order column SURVEY §2.F3 requires)."""
    m = _FNAME_RE.search(path)
    season, episode = (int(m.group(1)), int(m.group(2))) if m else (None, None)
    rows = []
    day = None
    for order, para in enumerate(docx_paragraphs(content)):
        dm = _DAY_RE.search(para)
        if dm and not _CONF_RE.match(para):
            day = int(dm.group(1))
            continue
        cm = _CONF_RE.match(para)
        if not cm:
            continue
        rows.append(
            (
                season,
                episode,
                cm.group("name").strip(),
                int(cm.group("n")),
                int(cm.group("total")),
                cm.group("content").strip(),
                day,
                order,
            )
        )
    return rows


CONFESSIONAL_SCHEMA = (
    "season int, episode int, contestant string, n_in_episode int, "
    "total_in_episode int, content string, day int, para_order int"
)


def write_minimal_docx(paragraphs: list[str]) -> bytes:
    """Valid minimal docx for fixtures/tests."""
    from xml.sax.saxutils import escape

    body = "".join(
        f"<w:p><w:r><w:t>{escape(p)}</w:t></w:r></w:p>" for p in paragraphs
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
            "</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "word/document.xml",
            '<?xml version="1.0"?><w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
            f"<w:body>{body}</w:body></w:document>",
        )
    return buf.getvalue()
