"""Article extraction chain E1-E8 + E12/E13 (SURVEY.md §2.2).

Pure-function mirror of the reference's CheerioCrawler ``requestHandler``
(``src/crawler.ts:31-85``), in the exact order the reference executes:

1. title element select: all ``<h1>``; if none, all ``<h2>``; if still none
   the scrape FAILS with ``"not found"`` (``src/crawler.ts:32-40``).
2. ``getCheerioText``: per matched element ``.text().trim()``, joined with a
   single space (``src/crawler.ts:42-47``).
3. ``page`` captured as the full serialized document — BEFORE script
   removal (``src/crawler.ts:55``).
4. og-meta loop over ``head > meta[property][content]`` in document order:
   ``og:title`` overrides the title (trimmed, NOT added to meta); any other
   ``og:*`` / ``article:*`` property is recorded in the meta map, keys and
   values trimmed, insertion order = document order (``src/crawler.ts:58-71``).
5. ``$('script').remove()`` over the whole page (``src/crawler.ts:73``).
6. article container = parents of the title elements; expanded upward at
   most twice while ``len(container_text) < 2 * len(title)`` — where
   ``title`` is the (possibly og-overridden) current title
   (``src/crawler.ts:74-82``).
7. ``article_html`` = inner HTML of the FIRST element of the container
   selection (cheerio ``.html()`` semantics) (``src/crawler.ts:83``).
8. model setters: title ``\n``->space then trim (``src/db/model.ts:56-61``);
   html/page trimmed (``src/db/model.ts:73-79``).

The per-row invariant column (BASELINE.json input_hint: "byte-identical
extracted text per url") is defined as::

    text = normalized_title + "\n" + article_text

with ``article_text`` = ``getCheerioText`` of the final container selection
(after script removal). The reference keeps article HTML rather than text;
this is the text projection of the same container, fixed here once and
used identically by oracle and pipeline.

Outlinks (ours — the reference is a single-URL service, the batch crawler
needs the link graph): every ``<a href>`` in the page, resolved against the
page URL, kept iff valid https (E1) and then canonicalized (E2).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urljoin

from .canon import canonicalize, is_valid_url
from .dom import Document, Element, parse_html

__all__ = ["ExtractResult", "extract", "get_text_join"]


@dataclass
class ExtractResult:
    ok: bool
    url: str = ""          # canonical URL (uniqueKey) — reference doc.url
    src: str = ""          # raw fetch URL — reference doc.src
    title: str = ""
    meta: dict[str, str] = field(default_factory=dict)
    page: str = ""         # full serialized page (pre script-strip), trimmed
    article_html: str = "" # inner HTML of the article container, trimmed
    text: str = ""         # invariant column: title + "\n" + article text
    outlinks: list[str] = field(default_factory=list)
    err: str = ""          # non-empty iff not ok ("not found")


def get_text_join(selection: list[Element]) -> str:
    """``getCheerioText`` (src/crawler.ts:42-47): per-element trim, space-join."""
    return " ".join(el.text().strip() for el in selection)


def _parents(selection: list[Element | Document]) -> list[Element | Document]:
    """cheerio ``.parent()``: unique parents, first-occurrence order.

    The document root is a valid parent (cheerio's root node); going above
    it yields an empty selection — we clamp to the current selection then
    (the reference would crash on a null ``.html()``; unreachable for pages
    whose <h1>/<h2> sits under <html>, which is every generated page).
    """
    seen: set[int] = set()
    out: list[Element | Document] = []
    for el in selection:
        p = el.parent if isinstance(el, Element) and el.parent is not None else None
        if isinstance(el, Document):
            p = None
        if p is not None and id(p) not in seen:
            seen.add(id(p))
            out.append(p)
    return out if out else selection


def _normalize_title(title: str) -> str:
    """setTitle (src/db/model.ts:56-61): newline->space, trim."""
    return title.replace("\n", " ").strip()


def extract(src_url: str, html: str) -> ExtractResult:
    """Run the full extraction chain on one page. Never raises on content."""
    doc = parse_html(html)

    # E3: title element selection, h1 -> h2 -> fail
    title_sel = doc.select("h1")
    if not title_sel:
        title_sel = doc.select("h2")
    canon = canonicalize(src_url)
    if not title_sel:
        return ExtractResult(ok=False, url=canon, src=src_url, err="not found")

    title = get_text_join(title_sel)
    page = doc.html()  # before script strip (src/crawler.ts:55)

    # E5: og meta — head > meta direct children, document order
    meta: dict[str, str] = {}
    for head in doc.select("head"):
        for child in head.children:
            if isinstance(child, Element) and child.tag == "meta":
                prop = child.attrs.get("property")
                content = child.attrs.get("content")
                if isinstance(prop, str) and isinstance(content, str):
                    if prop == "og:title":
                        title = content.strip()
                    elif prop.startswith("og:") or prop.startswith("article:"):
                        meta[prop.strip()] = content.strip()

    # E6: strip scripts before content selection
    doc.remove_all("script")

    # E7: parent expansion, twice, threshold 2 * len(current title)
    container: list[Element | Document] = _parents(list(title_sel))
    if len(get_text_join(container)) < len(title) * 2:
        container = _parents(container)
    if len(get_text_join(container)) < len(title) * 2:
        container = _parents(container)

    # E8: inner HTML of the FIRST container element (cheerio .html())
    article_html = container[0].inner_html() if container else ""
    article_text = get_text_join(container)

    # Outlinks for the crawl graph (ours)
    outlinks: list[str] = []
    for a in doc.select("a"):
        href = a.attrs.get("href")
        if not href:
            continue
        absolute = urljoin(canon, href.strip())
        if is_valid_url(absolute):
            outlinks.append(canonicalize(absolute))

    norm_title = _normalize_title(title)
    return ExtractResult(
        ok=True,
        url=canon,
        src=src_url,
        title=norm_title,
        meta=meta,
        page=page.strip(),
        article_html=article_html.strip(),
        text=norm_title + "\n" + article_text,
        outlinks=outlinks,
    )
