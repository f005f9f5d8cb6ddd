"""ProseMirror-style document tree: parse / amend / serialize / findTitle.

Reimplements the documented subset of the reference's tiptap chain
(SURVEY.md §2.2 E9-E11, E15):

- :func:`html_to_tree`  — E9, ``generateJSON`` (``src/html.ts:5-13``,
  ``src/tiptap.ts:190-194``): HTML fragment -> recursive
  ``{type, attrs?, text?, marks?, content?}`` dict tree.
- :class:`Amender`      — E10, ``JSONDocumentAmender`` (``src/tiptap.ts:115-188``):
  drop invalid nodes, assign unique ids to the 10 ``uidTypes``, rewrite
  link marks. The reference uses ``nanoid(6)`` (random —
  ``src/tiptap.ts:97,124``); we use a seeded, position-derived 6-char id
  so runs are reproducible at any parallelism (SURVEY.md §7 hard-part 1).
- :func:`tree_to_html`  — E11, ``generateHTML`` (``src/html.ts:15-31``,
  ``src/tiptap.ts:196-198``): deterministic serializer for the same node
  subset. ``data-id`` is rendered for uid-typed nodes except table cells
  (matching the reference fixture ``sample/doc_html.html``); link marks
  render ``target`` / ``rel`` / ``href`` in that order.
- :func:`find_title`    — E15 (``src/tiptap.ts:200-220``): DFS for the first
  heading of a given level, joining its direct text children with ' '.

Node grammar (subset of the reference's ~30 tiptap extension types,
``src/tiptap.ts:46-102``): doc, heading(1-6), paragraph, text, hardBreak,
blockquote, codeBlock, bulletList, orderedList, listItem, table, tableRow,
tableHeader, tableCell, image, horizontalRule, taskList/taskItem
(``ul/li[data-type]`` + ``data-checked``, like tiptap extension-task-*),
details/detailsSummary/detailsContent (``<details><summary>`` + persisted
``open``), emoji and mention inline spans (``span[data-type]``), youtube
embeds (``div[data-youtube-video] > iframe``); marks bold, italic, strike,
underline, code, subscript, superscript, link, textStyle (color — the
reference's Color extension over TextStyle renders ``span[style*=color]``);
block attr textAlign (TextAlign extension configured for exactly
heading/paragraph/codeBlock/blockquote/table/tableCell —
``src/tiptap.ts:80-89``, note tableHeader is NOT in the list; default
``left`` omitted, matching tiptap's renderHTML contract). The reference's
Mathematics extension is a katex DECORATION over plain text ($...$ stays
a text node) and Typography is editor input rules only (smart quotes on
typing — inert through generateJSON/generateHTML), so neither needs a
node type here. Unknown elements are
transparent containers; stray inline content at block level is wrapped
into paragraphs (ProseMirror DOMParser behavior — visible in the fixture
where ``<dt>``/``<dd>`` text becomes paragraphs). Whitespace: runs collapse
to a single space in inline content; whitespace-only text between blocks
is dropped; ``<pre>`` content is preserved verbatim.
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable, Optional

from .dom import Element, TextNode, parse_html

__all__ = [
    "UID_TYPES",
    "DeterministicIds",
    "Amender",
    "html_to_tree",
    "tree_to_html",
    "find_title",
    "tree_text",
    "parse_and_amend",
]

# src/tiptap.ts:34-45 (detailsSummary/detailsContent/taskItem kept for parity
# even though the HTML subset parser does not emit them).
UID_TYPES = frozenset(
    (
        "blockquote",
        "codeBlock",
        "detailsSummary",
        "detailsContent",
        "heading",
        "listItem",
        "paragraph",
        "tableHeader",
        "tableCell",
        "taskItem",
    )
)

_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_MARK_TAGS = {
    "strong": "bold",
    "b": "bold",
    "em": "italic",
    "i": "italic",
    "u": "underline",
    "s": "strike",
    "del": "strike",
    "strike": "strike",
    "code": "code",
    "sub": "subscript",
    "sup": "superscript",
}
_LIST_TAGS = {"ul": "bulletList", "ol": "orderedList"}

# nanoid's default alphabet — ids look like the reference's ("P0IIc7").
_ID_ALPHABET = "useandom-26T198340PX75pxJACKVERYMINDBUSHWOLF_GQZbfghjklqvwyzrict"


class DeterministicIds:
    """Seeded position-derived 6-char id generator (nanoid(6) replacement).

    ``seed`` is typically the document's canonical URL, so ids are stable
    per (document, position) across runs and across parallelism levels —
    the property the reference's random nanoid lacks and the reason its
    fixtures can only be compared id-insensitively (SURVEY.md §5).
    """

    def __init__(self, seed: str):
        self.seed = seed
        self.counter = 0

    def __call__(self) -> str:
        digest = hashlib.blake2b(
            f"{self.seed}\x00{self.counter}".encode(), digest_size=8
        ).digest()
        self.counter += 1
        n = int.from_bytes(digest, "big")
        chars = []
        for _ in range(6):
            chars.append(_ID_ALPHABET[n & 63])
            n >>= 6
        return "".join(chars)


# ---------------------------------------------------------------------------
# E9 — HTML -> tree
# ---------------------------------------------------------------------------


def _collapse_ws(s: str) -> str:
    return " ".join(s.split()) if s.strip() else (" " if s else "")


class _FragmentBuilder:
    """Builds block content for one container (doc, listItem, cell, ...)."""

    def __init__(self) -> None:
        self.blocks: list[dict] = []
        self._inline: list[dict] = []

    # -- inline accumulation ------------------------------------------------

    def add_text(self, text: str, marks: list[dict]) -> None:
        collapsed = _collapse_ws(text)
        if not collapsed:
            return
        if collapsed == " " and not self._inline:
            return  # leading whitespace at block start is dropped
        node: dict = {"type": "text", "text": collapsed}
        if marks:
            node["marks"] = [dict(m, attrs=dict(m["attrs"])) if "attrs" in m else dict(m) for m in marks]
        self._inline.append(node)

    def add_inline(self, node: dict) -> None:
        self._inline.append(node)

    # -- block boundaries ---------------------------------------------------

    def flush(self) -> None:
        if not self._inline:
            return
        inline = _merge_text_runs(self._inline)
        self._inline = []
        if inline:
            self.blocks.append({"type": "paragraph", "attrs": {"id": None}, "content": inline})

    def add_block(self, node: dict) -> None:
        self.flush()
        self.blocks.append(node)

    def finish(self) -> list[dict]:
        self.flush()
        return self.blocks


def _merge_text_runs(inline: list[dict]) -> list[dict]:
    """Merge adjacent text nodes with identical marks; trim edge whitespace."""
    out: list[dict] = []
    for node in inline:
        if (
            out
            and node["type"] == "text"
            and out[-1]["type"] == "text"
            and out[-1].get("marks") == node.get("marks")
        ):
            out[-1]["text"] += node["text"]
        else:
            out.append(node)
    # trim whitespace at the fragment edges (ProseMirror collapse behavior)
    if out and out[0]["type"] == "text":
        out[0]["text"] = out[0]["text"].lstrip()
    if out and out[-1]["type"] == "text":
        out[-1]["text"] = out[-1]["text"].rstrip()
    return [n for n in out if not (n["type"] == "text" and n["text"] == "")]


def _style_prop(el: Element, prop: str) -> Optional[str]:
    """Value of one CSS property from an inline ``style`` attribute."""
    style = el.attrs.get("style")
    if not style:
        return None
    for decl in style.split(";"):
        key, sep, value = decl.partition(":")
        if sep and key.strip().lower() == prop:
            return value.strip() or None
    return None


# TextAlign is configured for these types in the reference
# (src/tiptap.ts:81-89); tiptap omits the style when the value is the
# default 'left'.
_TEXT_ALIGN_VALUES = frozenset(("left", "right", "center", "justify"))


def _text_align(el: Element) -> Optional[str]:
    value = _style_prop(el, "text-align")
    if value and value.lower() in _TEXT_ALIGN_VALUES and value.lower() != "left":
        return value.lower()
    return None


def _int_attr(el: Element, name: str, default: int) -> int:
    raw = el.attrs.get(name)
    if raw is None:
        return default
    try:
        return int(raw.strip())
    except ValueError:
        return default


def _walk_inline(el: Element, builder: _FragmentBuilder, marks: list[dict]) -> None:
    for child in el.children:
        _dispatch(child, builder, marks)


def _cell_content(el: Element) -> list[dict]:
    inner = _FragmentBuilder()
    _walk_inline(el, inner, [])
    content = inner.finish()
    return content if content else [{"type": "paragraph", "attrs": {"id": None}, "content": []}]


def _dispatch(node: TextNode | Element, builder: _FragmentBuilder, marks: list[dict]) -> None:
    if isinstance(node, TextNode):
        builder.add_text(node.data, marks)
        return
    tag = node.tag

    if tag in _HEADINGS:
        inner = _FragmentBuilder()
        _walk_inline(node, inner, [])
        inner.flush()
        content: list[dict] = []
        for blk in inner.blocks:  # nested blocks inside a heading: inline only
            content.extend(blk.get("content") or [])
        head_attrs: dict[str, Any] = {"id": None, "level": _HEADINGS[tag]}
        align = _text_align(node)
        if align:
            head_attrs["textAlign"] = align
        builder.add_block({"type": "heading", "attrs": head_attrs, "content": content})
    elif tag == "p":
        inner = _FragmentBuilder()
        _walk_inline(node, inner, marks)
        inner.flush()
        align = _text_align(node)
        first = True
        for blk in inner.blocks:
            # a <p> containing block children contributes them as siblings;
            # the <p>'s own text-align applies to its first paragraph only
            if first and blk["type"] == "paragraph":
                if align:
                    blk["attrs"]["textAlign"] = align
                first = False
            builder.add_block(blk)
    elif tag == "br":
        builder.add_inline({"type": "hardBreak"})
    elif tag == "img":
        builder.add_block(
            {
                "type": "image",
                "attrs": {
                    "src": node.attrs.get("src"),
                    "alt": node.attrs.get("alt"),
                    "title": node.attrs.get("title"),
                },
            }
        )
    elif tag == "hr":
        builder.add_block({"type": "horizontalRule"})
    elif tag == "blockquote":
        inner = _FragmentBuilder()
        _walk_inline(node, inner, [])
        bq_attrs: dict[str, Any] = {"id": None}
        align = _text_align(node)
        if align:
            bq_attrs["textAlign"] = align
        builder.add_block(
            {"type": "blockquote", "attrs": bq_attrs, "content": inner.finish()}
        )
    elif tag == "pre":
        raw = node.text()
        if raw.startswith("\n"):
            raw = raw[1:]
        language = None  # tiptap CodeBlock: language from code.language-*
        for child in node.children:
            if isinstance(child, Element) and child.tag == "code":
                for cls in (child.attrs.get("class") or "").split():
                    if cls.startswith("language-"):
                        language = cls[len("language-"):]
                        break
                break
        code_attrs: dict[str, Any] = {"id": None, "language": language}
        align = _text_align(node)
        if align:
            code_attrs["textAlign"] = align
        builder.add_block(
            {
                "type": "codeBlock",
                "attrs": code_attrs,
                "content": ([{"type": "text", "text": raw}] if raw else []),
            }
        )
    elif tag == "ul" and node.attrs.get("data-type") == "taskList":
        items = []
        for child in node.children:
            if isinstance(child, Element) and child.tag == "li":
                items.append(
                    {
                        "type": "taskItem",
                        "attrs": {
                            "id": None,
                            "checked": child.attrs.get("data-checked") == "true",
                        },
                        "content": _cell_content(child),
                    }
                )
        builder.add_block({"type": "taskList", "content": items})
    elif tag in _LIST_TAGS:
        items: list[dict] = []
        for child in node.children:
            if isinstance(child, Element) and child.tag == "li":
                items.append(
                    {"type": "listItem", "attrs": {"id": None}, "content": _cell_content(child)}
                )
        attrs: dict[str, Any] = {"id": None}
        block = {"type": _LIST_TAGS[tag], "content": items}
        if tag == "ol":
            block["attrs"] = {"start": _int_attr(node, "start", 1)}
        builder.add_block(block)
    elif tag == "details":
        content = []
        rest = _FragmentBuilder()
        for child in node.children:
            if isinstance(child, Element) and child.tag == "summary":
                inner = _FragmentBuilder()
                _walk_inline(child, inner, [])
                inner.flush()
                spans: list[dict] = []
                for blk in inner.blocks:  # summary is inline-only
                    spans.extend(blk.get("content") or [])
                content.append(
                    {"type": "detailsSummary", "attrs": {"id": None}, "content": spans}
                )
            else:
                _dispatch(child, rest, [])
        content.append(
            {"type": "detailsContent", "attrs": {"id": None}, "content": rest.finish()}
        )
        builder.add_block(
            {
                "type": "details",
                "attrs": {"open": "open" in node.attrs},
                "content": content,
            }
        )
    elif tag == "span" and node.attrs.get("data-type") == "emoji":
        name = node.attrs.get("data-name")
        if name:
            builder.add_inline({"type": "emoji", "attrs": {"name": name}})
    elif tag == "span" and node.attrs.get("data-type") == "mention":
        builder.add_inline(
            {
                "type": "mention",
                "attrs": {
                    "id": node.attrs.get("data-id"),
                    "label": node.attrs.get("data-label"),
                },
            }
        )
    elif tag == "span" and _style_prop(node, "color"):
        # textStyle mark carrying the Color extension's value; a nested
        # colored span overrides the outer color (tiptap mark semantics).
        color = _style_prop(node, "color")
        kept = [m for m in marks if m["type"] != "textStyle"]
        _walk_inline(node, builder, kept + [{"type": "textStyle", "attrs": {"color": color}}])
    elif tag == "div" and "data-youtube-video" in node.attrs:
        for child in node.children:
            if isinstance(child, Element) and child.tag == "iframe":
                src = child.attrs.get("src")
                if src:
                    builder.add_block({"type": "youtube", "attrs": {"src": src}})
                break
    elif tag == "input":
        return  # taskItem checkbox state lives on the li's data-checked
    elif tag == "table":
        rows: list[dict] = []
        for tr in node.select("tr"):
            cells: list[dict] = []
            for child in tr.children:
                if isinstance(child, Element) and child.tag in ("td", "th"):
                    cell_attrs: dict[str, Any] = {
                        "colspan": _int_attr(child, "colspan", 1),
                        "rowspan": _int_attr(child, "rowspan", 1),
                        "colwidth": None,
                    }
                    # TextAlign covers tableCell but not tableHeader
                    if child.tag == "td":
                        align = _text_align(child)
                        if align:
                            cell_attrs["textAlign"] = align
                    cells.append(
                        {
                            "type": "tableHeader" if child.tag == "th" else "tableCell",
                            "attrs": cell_attrs,
                            "content": _cell_content(child),
                        }
                    )
            if cells:
                rows.append({"type": "tableRow", "content": cells})
        if rows:
            block = {"type": "table", "content": rows}
            align = _text_align(node)
            if align:
                block["attrs"] = {"textAlign": align}
            builder.add_block(block)
    elif tag == "a":
        href = node.attrs.get("href")
        if href:
            attrs = {"href": href}
            for extra in ("target", "rel", "class"):
                if extra in node.attrs:
                    attrs[extra] = node.attrs[extra]
            _walk_inline(node, builder, marks + [{"type": "link", "attrs": attrs}])
        else:
            _walk_inline(node, builder, marks)
    elif tag in _MARK_TAGS:
        mark = {"type": _MARK_TAGS[tag]}
        if any(m["type"] == mark["type"] for m in marks):
            _walk_inline(node, builder, marks)
        else:
            _walk_inline(node, builder, marks + [mark])
    elif tag in ("script", "style", "template", "head", "title"):
        return  # non-content subtrees contribute nothing
    elif tag in ("tr", "td", "th", "li"):
        # structural tags outside their parent context: treat as container
        _walk_inline(node, builder, marks)
    else:
        # transparent container (div, span, section, dl, dt, dd, ...)
        _walk_inline(node, builder, marks)
        if tag in ("div", "section", "article", "dt", "dd", "dl", "header",
                   "footer", "main", "aside", "nav", "figure", "figcaption",
                   "body", "html"):
            builder.flush()  # block-level container closes the open paragraph


def html_to_tree(html: str) -> dict:
    """E9: parse an HTML fragment into an (un-amended) document tree."""
    dom = parse_html(html)
    builder = _FragmentBuilder()
    for child in dom.children:
        _dispatch(child, builder, [])
    return {"type": "doc", "content": builder.finish()}


# ---------------------------------------------------------------------------
# E10 — Amender (JSONDocumentAmender port, src/tiptap.ts:115-188)
# ---------------------------------------------------------------------------


class Amender:
    """Depth-first normalizer; mirrors ``JSONDocumentAmender`` exactly.

    ``gen_id`` defaults to a :class:`DeterministicIds` seeded with ''; pass
    one seeded with the document URL for cross-run-stable ids.
    """

    def __init__(self, gen_id: Optional[Callable[[], str]] = None):
        self.ids: set[str] = set()
        self.gen_id = gen_id or DeterministicIds("")

    def amend_id(self, node_id: Any) -> str:
        if not isinstance(node_id, str) or node_id == "":
            node_id = self.gen_id()
        while node_id in self.ids:
            node_id = self.gen_id()
        self.ids.add(node_id)
        return node_id

    def amend_node(self, node: Optional[dict]) -> Optional[dict]:
        if not node or node.get("type") == "invalid":
            return None

        if node.get("type") == "image" and not (node.get("attrs") or {}).get("src"):
            node["type"] = "invalid"
            return node

        content = node.get("content")
        if node.get("type") == "paragraph" and (
            not content or (len(content) == 1 and content[0].get("type") == "hardBreak")
        ):
            node["type"] = "invalid"
            return node

        attrs = node.get("attrs")
        if node["type"] in UID_TYPES and attrs is None:
            node["attrs"] = {"id": self.amend_id("")}
        elif attrs is not None:
            attrs = dict(attrs)  # clone (reference works around a tiptap aliasing bug)
            node["attrs"] = attrs
            if node["type"] in UID_TYPES:
                attrs["id"] = self.amend_id(attrs.get("id"))

        marks = node.get("marks")
        if marks is not None:
            for mark in marks:
                if mark.get("type") == "link" and mark.get("attrs") is not None:
                    mark["attrs"].pop("class", None)
                    mark["attrs"]["rel"] = "noopener noreferrer"
                    mark["attrs"]["target"] = "_blank"

        if content is not None:
            for child in content:
                self.amend_node(child)
            node["content"] = [c for c in content if c.get("type") != "invalid"]

        return node


def parse_and_amend(html: str, seed: str = "") -> dict:
    """E9 + E10 — the reference's ``parseHTML`` (src/tiptap.ts:190-194)."""
    tree = html_to_tree(html)
    out = Amender(DeterministicIds(seed)).amend_node(tree)
    return out if out is not None else {"type": "doc", "content": []}


# ---------------------------------------------------------------------------
# E11 — tree -> clean HTML
# ---------------------------------------------------------------------------

_MARK_RENDER = {
    "bold": "strong",
    "italic": "em",
    "underline": "u",
    "strike": "s",
    "code": "code",
    "subscript": "sub",
    "superscript": "sup",
}
# uid types whose data-id the serializer renders (table cells omit it in
# the reference fixture sample/doc_html.html).
_DATA_ID_TYPES = frozenset(
    ("blockquote", "codeBlock", "heading", "listItem", "paragraph",
     "detailsSummary", "detailsContent", "taskItem")
)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


def _data_id(node: dict) -> str:
    nid = (node.get("attrs") or {}).get("id")
    if node["type"] in _DATA_ID_TYPES and isinstance(nid, str) and nid:
        return f' data-id="{_esc_attr(nid)}"'
    return ""


def _align_style(attrs: dict) -> str:
    """TextAlign renderHTML: style only when the value isn't the default."""
    align = attrs.get("textAlign")
    if align and align != "left":
        return f' style="text-align: {_esc_attr(str(align))}"'
    return ""


def _render_text(node: dict) -> str:
    out = _esc(node.get("text") or "")
    for mark in reversed(node.get("marks") or []):
        mtype = mark.get("type")
        if mtype == "link":
            attrs = mark.get("attrs") or {}
            pieces = []
            for key in ("target", "rel", "href"):
                if attrs.get(key) is not None:
                    pieces.append(f' {key}="{_esc_attr(str(attrs[key]))}"')
            out = f"<a{''.join(pieces)}>{out}</a>"
        elif mtype == "textStyle":
            color = (mark.get("attrs") or {}).get("color")
            if color:
                out = f'<span style="color: {_esc_attr(str(color))}">{out}</span>'
        elif mtype in _MARK_RENDER:
            tag = _MARK_RENDER[mtype]
            out = f"<{tag}>{out}</{tag}>"
    return out


def _render(node: dict) -> str:
    ntype = node["type"]
    content = "".join(_render(c) for c in node.get("content") or [])
    attrs = node.get("attrs") or {}
    if ntype == "doc":
        return content
    if ntype == "text":
        return _render_text(node)
    if ntype == "hardBreak":
        return "<br>"
    if ntype == "horizontalRule":
        return "<hr>"
    if ntype == "heading":
        level = int(attrs.get("level") or 1)
        return f"<h{level}{_data_id(node)}{_align_style(attrs)}>{content}</h{level}>"
    if ntype == "paragraph":
        return f"<p{_data_id(node)}{_align_style(attrs)}>{content}</p>"
    if ntype == "blockquote":
        return f"<blockquote{_data_id(node)}{_align_style(attrs)}>{content}</blockquote>"
    if ntype == "codeBlock":
        lang = attrs.get("language")
        cls = f' class="language-{_esc_attr(str(lang))}"' if lang else ""
        return f"<pre{_data_id(node)}{_align_style(attrs)}><code{cls}>{content}</code></pre>"
    if ntype == "bulletList":
        return f"<ul>{content}</ul>"
    if ntype == "orderedList":
        start = attrs.get("start")
        s = f' start="{start}"' if start not in (None, 1) else ""
        return f"<ol{s}>{content}</ol>"
    if ntype == "listItem":
        return f"<li{_data_id(node)}>{content}</li>"
    if ntype == "table":
        return f"<table{_align_style(attrs)}><tbody>{content}</tbody></table>"
    if ntype == "tableRow":
        return f"<tr>{content}</tr>"
    if ntype in ("tableCell", "tableHeader"):
        tag = "th" if ntype == "tableHeader" else "td"
        colspan = attrs.get("colspan") or 1
        rowspan = attrs.get("rowspan") or 1
        return (
            f'<{tag} colspan="{colspan}" rowspan="{rowspan}"'
            f"{_align_style(attrs)}>{content}</{tag}>"
        )
    if ntype == "image":
        pieces = []
        for key in ("src", "alt", "title"):
            if attrs.get(key) is not None:
                pieces.append(f' {key}="{_esc_attr(str(attrs[key]))}"')
        return f"<img{''.join(pieces)}>"
    if ntype == "taskList":
        return f'<ul data-type="taskList">{content}</ul>'
    if ntype == "taskItem":
        checked = "true" if attrs.get("checked") else "false"
        box = "<label><input type=\"checkbox\"{}><span></span></label>".format(
            ' checked="checked"' if attrs.get("checked") else ""
        )
        return (
            f'<li data-type="taskItem" data-checked="{checked}"{_data_id(node)}>'
            f"{box}<div>{content}</div></li>"
        )
    if ntype == "details":
        open_attr = " open" if attrs.get("open") else ""
        return f"<details{open_attr}>{content}</details>"
    if ntype == "detailsSummary":
        return f"<summary{_data_id(node)}>{content}</summary>"
    if ntype == "detailsContent":
        return f'<div data-type="detailsContent"{_data_id(node)}>{content}</div>'
    if ntype == "emoji":
        name = attrs.get("name")
        return f'<span data-type="emoji" data-name="{_esc_attr(str(name))}"></span>'
    if ntype == "mention":
        pieces = []
        for key, html_attr in (("id", "data-id"), ("label", "data-label")):
            if attrs.get(key) is not None:
                pieces.append(f' {html_attr}="{_esc_attr(str(attrs[key]))}"')
        return f'<span data-type="mention"{"".join(pieces)}></span>'
    if ntype == "youtube":
        src = attrs.get("src")
        return (
            f'<div data-youtube-video><iframe src="{_esc_attr(str(src))}">'
            "</iframe></div>"
        )
    return content  # unknown node type: render children only


def tree_to_html(tree: dict) -> str:
    """E11: deterministic clean-HTML serializer for the node subset."""
    return _render(tree)


# ---------------------------------------------------------------------------
# E15 — findTitle (src/tiptap.ts:200-220)
# ---------------------------------------------------------------------------


def find_title(node: dict, level: int) -> str:
    if node.get("type") == "heading":
        if (node.get("attrs") or {}).get("level") == level and node.get("content") is not None:
            return " ".join(
                c.get("text") or ""
                for c in node["content"]
                if c.get("type") == "text"
            )
    elif node.get("content") is not None:
        for child in node["content"]:
            title = find_title(child, level)
            if title != "":
                return title
    return ""


def tree_text(node: dict) -> str:
    """All text content of a tree, document order (for fixture comparison)."""
    parts: list[str] = []

    def rec(n: dict) -> None:
        if n.get("type") == "text":
            parts.append(n.get("text") or "")
        for c in n.get("content") or []:
            rec(c)

    rec(node)
    return " ".join(" ".join(parts).split())
