"""Converters C1-C5 (SURVEY.md §2.3; reference ``src/converting.ts``).

MIME-dispatched parsers producing amended document trees:

- C1 :func:`get_converter` — registry (``src/converting.ts:10-27``); unknown
  MIME raises ``ValueError`` (reference: HTTP 400). This is the reference's
  user-extension seam; new formats register here.
- C2 :func:`convert_html` — utf-8 decode -> E9 parse -> E10 amend
  (``src/converting.ts:29-34``).
- C3 :func:`convert_markdown` — markdown -> HTML -> C2
  (``src/converting.ts:36-41``; the reference uses ``marked.parse``, we
  implement the common-markdown subset below deterministically).
- C4 :func:`convert_pdf_items` — the reference's pdfjs heading heuristic
  (``src/converting.ts:43-145``) over text-item streams; :func:`convert_pdf`
  feeds it REAL byte decoding via the from-scratch extractor in
  ``oracle/pdf.py`` (documented PDF subset; no external libraries).
  Malformed / out-of-subset PDFs raise ``ValueError`` into the converter
  error channel.
- C5 :func:`convert_text` — split on CR/LF/CRLF, trim, drop empties, one
  paragraph per line (``src/converting.ts:147-170``).

Markdown subset (documented contract, tracking what ``marked.parse``
with GFM defaults handles): ATX ``#``-``######`` and setext (``===`` /
``---`` underline) headings, paragraphs with hard breaks (trailing two
spaces), ``-``/``*`` bullet lists, ``1.`` ordered lists, GFM task lists
(``- [ ]`` / ``- [x]``), GFM pipe tables, fenced code blocks with a
language info string, ``>`` blockquotes, ``---`` rules, inline
``**bold**``/``__bold__``, ``*italic*``/``_italic_``, ``~~strike~~``,
`` `code` ``, ``[text](url)`` links, ``![alt](src)`` images,
reference-style links (``[label]: url`` definitions; full/collapsed/
shortcut forms), recursive blockquote content (lists/headings/quotes
inside quotes), raw HTML block passthrough. Not covered (documented
out of subset, pinned in ``tests/test_md_conformance.py``):
indent-nested sublists (flatten), blockquote lazy continuation,
footnotes.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

from .tree import Amender, DeterministicIds, parse_and_amend

__all__ = [
    "get_converter",
    "convert_html",
    "convert_markdown",
    "convert_pdf",
    "convert_pdf_items",
    "convert_text",
    "markdown_to_html",
    "HeadingLevel",
]


# ---------------------------------------------------------------------------
# C1 — registry
# ---------------------------------------------------------------------------

def get_converter(mime: str) -> Callable[[bytes], dict]:
    registry: dict[str, Callable[[bytes], dict]] = {
        "text/html": convert_html,
        "text/markdown": convert_markdown,
        "text/x-markdown": convert_markdown,
        "application/pdf": convert_pdf,
        "application/x-pdf": convert_pdf,
        "text/plain": convert_text,
    }
    conv = registry.get(mime)
    if conv is None:
        raise ValueError(f"not implemented: {mime}")
    return conv


# ---------------------------------------------------------------------------
# C2 — HTML
# ---------------------------------------------------------------------------

def convert_html(buf: bytes, seed: str = "") -> dict:
    return parse_and_amend(buf.decode("utf-8"), seed=seed)


# ---------------------------------------------------------------------------
# C3 — Markdown
# ---------------------------------------------------------------------------

_BR_SENTINEL = "\x00br\x00"

# code spans, images and links resolve FIRST and their output is stashed
# behind placeholders, so emphasis never rewrites underscores/stars inside
# a URL or a code span (marked/GFM does not emphasize link destinations)
_MD_STASH_PATTERNS = [
    (re.compile(r"`([^`]+)`"), lambda m: f"<code>{m.group(1)}</code>"),
    # image BEFORE link: '![alt](src)' must not parse as '!' + link
    (
        re.compile(r"!\[([^\]]*)\]\(([^)\s]+)\)"),
        lambda m: f'<img src="{m.group(2)}" alt="{m.group(1)}">',
    ),
    # link text still takes emphasis (marked renders inline content there)
    (re.compile(r"\[([^\]]+)\]\(([^)\s]+)\)"), lambda m: f'<a href="{m.group(2)}">{_md_em(m.group(1))}</a>'),
]
_MD_INLINE_PATTERNS = [
    (re.compile(r"\*\*([^*]+)\*\*"), lambda m: f"<strong>{m.group(1)}</strong>"),
    (re.compile(r"__([^_]+)__"), lambda m: f"<strong>{m.group(1)}</strong>"),
    (re.compile(r"\*([^*]+)\*"), lambda m: f"<em>{m.group(1)}</em>"),
    (re.compile(r"\b_([^_]+)_\b"), lambda m: f"<em>{m.group(1)}</em>"),
    (re.compile(r"~~([^~]+)~~"), lambda m: f"<s>{m.group(1)}</s>"),
]

_TABLE_SEP = re.compile(r"^\|?\s*:?-{2,}:?\s*(\|\s*:?-{2,}:?\s*)*\|?$")
_TASK_ITEM = re.compile(r"^\[( |x|X)\]\s+(.*)$")


def _md_em(text: str) -> str:
    for pattern, repl in _MD_INLINE_PATTERNS:
        text = pattern.sub(repl, text)
    return text


def _esc_url(url: str) -> str:
    return (
        url.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _norm_label(label: str) -> str:
    return " ".join(label.lower().split())


# reference-style links (CommonMark §link reference definitions):
# full [text][label], collapsed [label][], shortcut [label]
_REF_FULL = re.compile(r"\[([^\]]+)\]\[([^\]]*)\]")
_REF_SHORTCUT = re.compile(r"\[([^\]]+)\]")


def _md_inline(text: str, refs: "dict[str, str] | None" = None) -> str:
    text = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    stash: list[str] = []

    def keep(html: str) -> str:
        stash.append(html)
        return f"\x01{len(stash) - 1}\x01"

    for pattern, repl in _MD_STASH_PATTERNS:
        text = pattern.sub(lambda m, r=repl: keep(r(m)), text)
    if refs:
        def full(m: "re.Match[str]") -> str:
            label = _norm_label(m.group(2)) or _norm_label(m.group(1))
            url = refs.get(label)
            if url is None:
                return m.group(0)  # undefined label: literal text (marked)
            return keep(f'<a href="{_esc_url(url)}">{_md_em(m.group(1))}</a>')

        def shortcut(m: "re.Match[str]") -> str:
            url = refs.get(_norm_label(m.group(1)))
            if url is None:
                return m.group(0)
            return keep(f'<a href="{_esc_url(url)}">{_md_em(m.group(1))}</a>')

        text = _REF_FULL.sub(full, text)
        text = _REF_SHORTCUT.sub(shortcut, text)
    text = _md_em(text)
    text = re.sub(r"\x01(\d+)\x01", lambda m: stash[int(m.group(1))], text)
    return text.replace(_BR_SENTINEL, "<br>")


def _md_cells(line: str) -> list[str]:
    return [c.strip() for c in line.strip().strip("|").split("|")]


_REF_DEF = re.compile(
    r"^ {0,3}\[([^\]]+)\]:\s*<?([^\s>]+)>?"
    r"(?:\s+(?:\"[^\"]*\"|'[^']*'|\([^)]*\)))?\s*$"
)
_QUOTE_STRIP = re.compile(r"^ {0,3}> ?")
_HTML_BLOCK_START = re.compile(r"^<[A-Za-z/!]")


def markdown_to_html(
    md: str, _depth: int = 0, _refs: "dict[str, str] | None" = None
) -> str:
    """Deterministic markdown -> HTML for the documented subset.

    Documented divergences from marked's full CommonMark (pinned by
    ``tests/test_md_conformance.py``): indent-nested sublists flatten
    into their parent list; blockquote "lazy continuation" lines (quoted
    paragraph continuing on an un-prefixed line) end the quote; setext
    underlines require the paragraph line directly above. Blockquote
    CONTENT recurses through the full converter (nested lists, headings
    and quotes inside a quote all work), reference-style links resolve
    (full/collapsed/shortcut), and raw HTML blocks pass through to the
    tree parser like marked passes them to the sanitizer.
    """
    lines = md.split("\n")
    # link reference definitions: collect + remove first (CommonMark:
    # first definition of a label wins; labels case/space-normalized;
    # definitions are document-global, so outer ones flow into recursed
    # blockquote content via _refs)
    refs: dict[str, str] = dict(_refs) if _refs else {}
    kept: list[str] = []
    in_fence = False
    for line in lines:
        if line.strip().startswith("```"):
            in_fence = not in_fence
        m = None if in_fence else _REF_DEF.match(line)
        if m:
            refs.setdefault(_norm_label(m.group(1)), m.group(2))
        else:
            kept.append(line)
    lines = kept
    html: list[str] = []
    paragraph: list[str] = []
    i = 0

    def _inline(text: str) -> str:
        return _md_inline(text, refs)

    def flush_paragraph() -> None:
        if paragraph:
            html.append(f"<p>{_inline(' '.join(paragraph))}</p>")
            paragraph.clear()

    while i < len(lines):
        line = lines[i]
        stripped = line.strip()
        if not stripped:
            flush_paragraph()
            i += 1
        elif paragraph and re.match(r"^(=+|-{2,})$", stripped):
            # setext heading: '===' under a paragraph line -> h1, '---' -> h2
            level = 1 if stripped.startswith("=") else 2
            text = _inline(" ".join(paragraph))
            paragraph.clear()
            html.append(f"<h{level}>{text}</h{level}>")
            i += 1
        elif stripped.startswith("```"):
            flush_paragraph()
            lang = stripped[3:].strip().split()[0] if stripped[3:].strip() else ""
            i += 1
            code: list[str] = []
            while i < len(lines) and not lines[i].strip().startswith("```"):
                code.append(lines[i])
                i += 1
            i += 1  # closing fence
            escaped = "\n".join(code).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            cls = f' class="language-{lang}"' if lang else ""
            html.append(f"<pre><code{cls}>{escaped}</code></pre>")
        elif re.match(r"^#{1,6}\s", stripped):
            flush_paragraph()
            hashes, _, rest = stripped.partition(" ")
            html.append(f"<h{len(hashes)}>{_inline(rest.strip())}</h{len(hashes)}>")
            i += 1
        elif re.match(r"^(-{3,}|\*{3,})$", stripped):
            flush_paragraph()
            html.append("<hr>")
            i += 1
        elif (
            "|" in stripped
            and i + 1 < len(lines)
            and "|" in lines[i + 1]
            and _TABLE_SEP.match(lines[i + 1].strip())
        ):
            # GFM pipe table: header | separator | rows
            flush_paragraph()
            header = _md_cells(stripped)
            i += 2
            rows: list[list[str]] = []
            while i < len(lines) and "|" in lines[i] and lines[i].strip():
                rows.append(_md_cells(lines[i]))
                i += 1
            head = "".join(f"<th>{_inline(c)}</th>" for c in header)
            body = "".join(
                "<tr>" + "".join(f"<td>{_inline(c)}</td>" for c in row) + "</tr>"
                for row in rows
            )
            html.append(f"<table><tr>{head}</tr>{body}</table>")
        elif stripped.startswith(("- ", "* ")) or re.match(r"^\d+\.\s", stripped):
            flush_paragraph()
            ordered = bool(re.match(r"^\d+\.\s", stripped))
            items: list[str] = []
            while i < len(lines):
                s = lines[i].strip()
                if not ordered and s.startswith(("- ", "* ")):
                    items.append(s[2:].strip())
                elif ordered and re.match(r"^\d+\.\s", s):
                    items.append(re.sub(r"^\d+\.\s*", "", s))
                else:
                    break
                i += 1
            tasks = [_TASK_ITEM.match(item) for item in items]
            if not ordered and items and all(tasks):
                # GFM task list -> the tiptap taskList/taskItem shape
                body = "".join(
                    '<li data-type="taskItem" data-checked="{}">{}</li>'.format(
                        "true" if m.group(1).lower() == "x" else "false",
                        _inline(m.group(2)),
                    )
                    for m in tasks
                )
                html.append(f'<ul data-type="taskList">{body}</ul>')
            else:
                tag = "ol" if ordered else "ul"
                body = "".join(f"<li>{_inline(item)}</li>" for item in items)
                html.append(f"<{tag}>{body}</{tag}>")
        elif stripped.startswith(">"):
            flush_paragraph()
            quoted: list[str] = []
            while i < len(lines) and lines[i].strip().startswith(">"):
                # strip exactly ONE quote level; inner '>' nests on recurse
                quoted.append(_QUOTE_STRIP.sub("", lines[i], count=1))
                i += 1
            if _depth < 16:
                inner = markdown_to_html("\n".join(quoted), _depth + 1, refs)
            else:  # depth bomb: flatten instead of recursing further
                inner = f"<p>{_inline(' '.join(q.strip() for q in quoted))}</p>"
            html.append(f"<blockquote>{inner}</blockquote>")
        elif _HTML_BLOCK_START.match(stripped):
            # raw HTML block (CommonMark §4.6 simplified): pass through to
            # the tree parser until a blank line, like marked does
            flush_paragraph()
            raw: list[str] = []
            while i < len(lines) and lines[i].strip():
                raw.append(lines[i])
                i += 1
            html.append("\n".join(raw))
        else:
            # trailing two spaces = GFM hard break
            if line.rstrip("\r").endswith("  "):
                paragraph.append(stripped + _BR_SENTINEL)
            else:
                paragraph.append(stripped)
            i += 1
    flush_paragraph()
    return "".join(html)


def convert_markdown(buf: bytes, seed: str = "") -> dict:
    return parse_and_amend(markdown_to_html(buf.decode("utf-8")), seed=seed)


# ---------------------------------------------------------------------------
# C4 — PDF heading-height histogram (src/converting.ts:43-145,172-217)
# ---------------------------------------------------------------------------


class HeadingLevel:
    """Per-page histogram of text-item heights -> heading scale.

    Port of the reference class (``src/converting.ts:172-217``): heights are
    binned by ``(h - 0.01)`` rounded to 2 decimals; the most frequent bin is
    body text; bins strictly larger than it, sorted ascending, truncated to
    6, reversed, become heading levels 1..6 (largest = level 1).
    """

    def __init__(self) -> None:
        self.sample: dict[str, int] = {}
        self.levels: list[float] = []

    @staticmethod
    def _key(height: float) -> str:
        # JS (h - 0.01).toFixed(2) — round-half-away-from-zero on the
        # decimal repr; Python format() rounds half-even, so nudge.
        value = height - 0.01
        return f"{value + 1e-9:.2f}"

    def add(self, height: float) -> None:
        key = self._key(height)
        self.sample[key] = self.sample.get(key, 0) + 1

    def finalize(self) -> None:
        if not self.sample:
            return
        keys = sorted(self.sample, key=lambda k: -self.sample[k])
        body = float(keys[0])
        levels = sorted(float(k) for k in keys[1:] if float(k) > body)
        self.levels = sorted(levels[:6], reverse=True)

    def level(self, height: float) -> int:
        for i, lvl in enumerate(self.levels):
            if height >= lvl:
                return i + 1
        return 0


def convert_pdf_items(pages: Iterable[Iterable[dict]], seed: str = "") -> dict:
    """The reference's page loop over pre-extracted text items.

    Each item: ``{"str": str, "height": float, "hasEOL": bool, "dir": str}``
    (the pdfjs TextItem fields the reference reads). Mirrors
    ``src/converting.ts:48-141`` exactly: accumulate text until ``hasEOL``;
    ``ttb`` direction converts newlines to spaces; line height = max item
    height seen; heading level from the per-page histogram; consecutive
    same-level headings merge into one node; leftover text becomes a
    trailing paragraph.
    """
    doc: dict = {"type": "doc", "content": []}
    for items in pages:
        items = list(items)
        hl = HeadingLevel()
        for item in items:
            if item.get("height", 0) > 0:
                hl.add(item["height"])
        hl.finalize()

        texts: list[str] = []
        height = 0.0
        prev_node: dict | None = None
        for item in items:
            text = item.get("str")
            if text is None:
                continue
            if item.get("dir") == "ttb":
                text = text.replace("\n", " ")
            if text != "":
                texts.append(text)
            if item.get("height", 0) > height:
                height = item["height"]
            if item.get("hasEOL"):
                level = hl.level(height)
                if level == 0:
                    prev_node = {
                        "type": "paragraph",
                        "content": [{"type": "text", "text": "".join(texts)}],
                    }
                    doc["content"].append(prev_node)
                elif (
                    prev_node is not None
                    and prev_node["type"] == "heading"
                    and prev_node["attrs"]["level"] == level
                ):
                    prev_node["content"].append({"type": "text", "text": "".join(texts)})
                else:
                    prev_node = {
                        "type": "heading",
                        "attrs": {"id": None, "level": level},
                        "content": [{"type": "text", "text": "".join(texts)}],
                    }
                    doc["content"].append(prev_node)
                texts = []
                height = 0.0

        if texts:
            doc["content"].append(
                {"type": "paragraph", "content": [{"type": "text", "text": "".join(texts)}]}
            )

    out = Amender(DeterministicIds(seed)).amend_node(doc)
    return out if out is not None else {"type": "doc", "content": []}


def convert_pdf(buf: bytes, seed: str = "") -> dict:
    """C4 byte decode: from-scratch PDF text extraction (no external
    libs) feeding the heading-histogram heuristic.

    ``oracle.pdf.extract_pdf_items`` parses the documented PDF subset
    (classic objects + object streams, Flate or raw content streams,
    BT/ET text operators) into pdfjs-shaped items, which
    :func:`convert_pdf_items` converts exactly like the reference's page
    loop (src/converting.ts:43-145). Malformed or out-of-subset PDFs
    raise ``ValueError`` -> the converter error channel (HTTP 400
    analog)."""
    from .pdf import extract_pdf_items

    return convert_pdf_items(extract_pdf_items(buf), seed=seed)


# ---------------------------------------------------------------------------
# C5 — plain text
# ---------------------------------------------------------------------------

_LINE_SPLIT = re.compile(r"\r\n|\r|\n")


def convert_text(buf: bytes, seed: str = "") -> dict:
    doc: dict = {"type": "doc", "content": []}
    for line in _LINE_SPLIT.split(buf.decode("utf-8")):
        txt = line.strip()
        if not txt:
            continue
        doc["content"].append(
            {"type": "paragraph", "content": [{"type": "text", "text": txt}]}
        )
    out = Amender(DeterministicIds(seed)).amend_node(doc)
    return out if out is not None else {"type": "doc", "content": []}
