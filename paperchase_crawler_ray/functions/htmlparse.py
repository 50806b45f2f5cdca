"""HTML extraction (SURVEY.md M4) — stdlib html.parser, no bs4.

Extracts from a page body:
  * outlinks: every ``<a href>`` resolved relative -> absolute vs base URL
  * images:   every ``<img src>`` with a caption — the enclosing
    ``<figure>``'s ``<figcaption>`` text if present, else the ``alt`` attr

Shared by the Ray parse stage and the oracle crawler.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urljoin


@dataclass
class ParsedPage:
    outlinks: list[str] = field(default_factory=list)
    images: list[tuple[str, str]] = field(default_factory=list)  # (src, caption)


class _Extractor(HTMLParser):
    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.page = ParsedPage()
        self._figure_depth = 0
        self._figure_imgs: list[str] = []
        self._in_figcaption = False
        self._caption_parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        ad = dict(attrs)
        if tag == "a":
            href = ad.get("href")
            if href:
                self.page.outlinks.append(urljoin(self.base, href))
        elif tag == "figure":
            self._figure_depth += 1
            self._figure_imgs = []
            self._caption_parts = []
        elif tag == "figcaption" and self._figure_depth:
            self._in_figcaption = True
        elif tag == "img":
            src = ad.get("src")
            if not src:
                return
            abs_src = urljoin(self.base, src)
            if self._figure_depth:
                self._figure_imgs.append(abs_src)
            else:
                self.page.images.append((abs_src, (ad.get("alt") or "").strip()))

    def handle_endtag(self, tag):
        if tag == "figcaption":
            self._in_figcaption = False
        elif tag == "figure" and self._figure_depth:
            caption = "".join(self._caption_parts).strip()
            for src in self._figure_imgs:
                self.page.images.append((src, caption))
            self._figure_depth -= 1
            self._figure_imgs = []
            self._caption_parts = []

    def handle_data(self, data):
        if self._in_figcaption:
            self._caption_parts.append(data)


def parse_page(body: bytes | str, base_url: str) -> ParsedPage:
    """Parse an HTML body -> outlinks + (image src, caption) pairs."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", errors="replace")
    ex = _Extractor(base_url)
    try:
        ex.feed(body)
        ex.close()
    except Exception:
        pass  # salvage whatever was extracted from malformed HTML
    return ex.page
