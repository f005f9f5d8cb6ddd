"""Minimal cheerio-compatible DOM on top of stdlib ``html.parser``.

The reference extracts articles with cheerio (htmlparser2 DOM) — see
``src/crawler.ts:31-85``. We need exactly the operations that code path
uses, with matching semantics:

- ``select(tag)``        — document-order descendants by tag name (``$('h1')``)
- ``Element.text()``     — concatenation of ALL descendant text nodes, in
                           document order, with no separators inserted
                           (cheerio/htmlparser2 ``.text()`` behavior)
- ``Element.parent``     — ``$el.parent()``
- ``Element.inner_html()`` / ``outer_html()`` — ``$el.html()`` / serializer
- ``remove_all(tag)``    — ``$('script').remove()``
- ``Document.html()``    — ``$.html()`` (serialize whole document)

Entity handling mirrors htmlparser2 defaults: character references are
decoded while parsing; text is re-escaped (``& < >``, and quotes inside
attribute values) on serialization.

This parser targets well-formed HTML (our synthetic Common-Crawl-style
pages are generated well-formed); it recovers from simple misnesting by
scanning the open-element stack for the matching tag and ignores stray
end tags. It does NOT do full HTML5 tree construction (no implied
<html>/<head>/<body> insertion) — documented limitation, irrelevant for
the generated corpus where those tags are explicit.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

__all__ = ["TextNode", "Element", "Document", "parse_html"]

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Elements whose raw text content htmlparser2 keeps as text (CDATA mode).
_RAWTEXT_TAGS = frozenset(("script", "style"))

# Untrusted web HTML can nest arbitrarily deep; every walk over the tree
# (text/serialize/tree-build) recurses, so cap the parse depth — elements
# past the cap attach as siblings at the cap instead of nesting further.
# 256 is far beyond real documents (browsers flatten around ~512 too).
MAX_DEPTH = 256


class TextNode:
    __slots__ = ("data", "parent")

    def __init__(self, data: str, parent: "Optional[Element]" = None):
        self.data = data
        self.parent = parent


class Element:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Optional[Element]" = None):
        self.tag = tag
        self.attrs = attrs
        self.children: list[TextNode | Element] = []
        self.parent = parent

    # --- traversal -------------------------------------------------------

    def iter_desc(self) -> Iterator["TextNode | Element"]:
        """All descendants, document order (pre-order).

        Iterative with an explicit stack: recursive ``yield from`` costs
        O(depth) per yielded node in generator delegation — measurably
        the hottest line of the extract profile on deep real pages."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if isinstance(node, Element) and node.children:
                stack.extend(reversed(node.children))

    def select(self, tag: str) -> list["Element"]:
        return [n for n in self.iter_desc() if isinstance(n, Element) and n.tag == tag]

    def text(self) -> str:
        """cheerio ``.text()``: all descendant text data concatenated."""
        parts: list[str] = []
        for n in self.iter_desc():
            if isinstance(n, TextNode):
                parts.append(n.data)
        return "".join(parts)

    # --- mutation --------------------------------------------------------

    def remove_all(self, tag: str) -> None:
        """Remove every descendant element with this tag (``$(tag).remove()``)."""
        doomed = self.select(tag)
        for el in doomed:
            if el.parent is not None:
                el.parent.children = [c for c in el.parent.children if c is not el]
                el.parent = None

    # --- serialization ---------------------------------------------------

    def inner_html(self) -> str:
        return "".join(_serialize(c) for c in self.children)

    def outer_html(self) -> str:
        return _serialize(self)


class Document(Element):
    """Root node; ``tag`` is the pseudo-tag ``#root`` and never serialized."""

    def __init__(self) -> None:
        super().__init__("#root", {})

    def html(self) -> str:
        """``$.html()`` — serialize the full parsed document."""
        return self.inner_html()


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


def _serialize(node: TextNode | Element) -> str:
    """Iterative serializer (explicit stack with pending close-tag
    markers): the recursive version built one nested generator join per
    element, dominating serialization time on real pages."""
    out: list[str] = []
    stack: list[TextNode | Element | str] = [node]
    while stack:
        item = stack.pop()
        if isinstance(item, str):  # pending close tag
            out.append(item)
        elif isinstance(item, TextNode):
            if item.parent is not None and item.parent.tag in _RAWTEXT_TAGS:
                out.append(item.data)
            else:
                out.append(_escape_text(item.data))
        else:
            attrs = "".join(
                f' {k}="{_escape_attr(v)}"' for k, v in item.attrs.items()
            )
            out.append(f"<{item.tag}{attrs}>")
            if item.tag not in VOID_TAGS:
                stack.append(f"</{item.tag}>")
                stack.extend(reversed(item.children))
    return "".join(out)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Document()
        self.stack: list[Element] = [self.root]

    # html.parser lowercases tag names already; attrs arrive as [(k, v|None)]
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in VOID_TAGS and len(self.stack) < MAX_DEPTH:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore (htmlparser2 recovery)

    def handle_data(self, data: str) -> None:
        if data:
            parent = self.stack[-1]
            parent.children.append(TextNode(data, parent))

    def handle_comment(self, data: str) -> None:  # comments dropped from text()
        pass

    def handle_decl(self, decl: str) -> None:  # <!DOCTYPE html> dropped
        pass


def parse_html(html: str) -> Document:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
