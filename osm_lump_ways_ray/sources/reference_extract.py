"""Oracle text extractor — the per-url byte-identity invariant.

The BASELINE.json input_hint requires "byte-identical extracted text per url vs the
reference extractor". The OSM reference has no HTML extractor, so FIXTURES.md
defines the invariant over our synthetic pages: ``html`` embeds ``text`` inside an
``<article>`` element and ``extract(html) == text`` byte-for-byte.

This module is the *oracle* implementation: a deliberately independent,
slow-but-obviously-correct extractor built on html.parser. The engine's fast
vectorized extractor (sources/pages.py) is tested against it row by row
(tests/test_pages.py); `python -m pytest -x -q` is the gate.
"""

from __future__ import annotations

from html.parser import HTMLParser


class _ArticleText(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=False)
        self.depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "article":
            self.depth += 1

    def handle_endtag(self, tag):
        if tag == "article" and self.depth > 0:
            self.depth -= 1

    def handle_data(self, data):
        if self.depth > 0:
            self.parts.append(data)


def reference_extract(html: bytes) -> bytes:
    """Extract the article text of a page, byte-identical to the embedded text."""
    parser = _ArticleText()
    parser.feed(html.decode("utf-8"))
    return "".join(parser.parts).encode("utf-8")
