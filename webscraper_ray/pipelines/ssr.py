"""S9 serving templates as a batch operator (``src/ssr.ts:51-312``).

The reference SSR-renders stored documents back into web pages: load a
page template, set ``<title>`` / OpenGraph metas / ``lang`` + RTL
``dir``, decode the CBOR content tree, serialize it to HTML and append a
permalink paragraph (``src/ssr.ts:84-160``). Here that render is a
stateless ``map_batches`` transform over doc rows — the engine analog of
the template source: docs in, one rendered page string per row out.

Rows render independently, so the stage is embarrassingly parallel and
streams; no shuffle, no driver involvement.
"""

from __future__ import annotations

import html as _html

import pyarrow as pa

from ..oracle.cbor import loads as cbor_loads
from ..oracle.lang import is_rtl, lang639_3
from ..oracle.tree import tree_to_html

__all__ = ["render_page", "render_doc_pages"]

_TEMPLATE = """<!DOCTYPE html>
<html lang="{lang}"{dir_attr}>
<head>
<meta charset="utf-8">
<title>{title}</title>
<meta property="og:url" content="{url}">
<meta property="og:title" content="{title}">
{extra_meta}</head>
<body>
<h1 id="title">{title}</h1>
<div id="content">{content_html}
<p><a title="Permalink" href="{url}" target="_blank">Permalink: {url}</a></p></div>
</body>
</html>"""


def render_page(
    url: str,
    title: str,
    content_cbor: bytes | None,
    meta: dict[str, str] | None = None,
    lang: str = "",
) -> str:
    """One document -> one HTML page (the reference's render loop,
    ``src/ssr.ts:84-160``: title/og metas, lang + RTL dir, CBOR content
    -> HTML + permalink)."""
    meta = meta or {}
    lang3 = lang639_3(lang or meta.get("og:locale", "") or "")
    dir_attr = ' dir="rtl"' if is_rtl(lang3) else ""
    extra = []
    desc = meta.get("og:description") or meta.get("description")
    if desc:
        e = _html.escape(desc, quote=True)
        extra.append(f'<meta property="og:description" content="{e}">\n')
        extra.append(f'<meta name="description" content="{e}">\n')
    image = meta.get("og:image")
    if image:
        extra.append(
            f'<meta property="og:image" content="{_html.escape(image, quote=True)}">\n'
        )
    content_html = ""
    if content_cbor:
        content_html = tree_to_html(cbor_loads(content_cbor))
    return _TEMPLATE.format(
        lang=_html.escape(lang3 or lang, quote=True),
        dir_attr=dir_attr,
        title=_html.escape(title or "", quote=True),
        url=_html.escape(url, quote=True),
        extra_meta="".join(extra),
        content_html=content_html,
    )


def render_doc_pages(docs: "object") -> "object":
    """Dataset stage: doc rows (id, url, title, meta, content[, lang]) ->
    (id, url, page_html)."""

    def render_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        urls = batch.column("url").to_pylist()
        titles = batch.column("title").to_pylist()
        metas = (
            batch.column("meta").to_pylist()
            if "meta" in batch.column_names
            else [None] * n
        )
        contents = (
            batch.column("content").to_pylist()
            if "content" in batch.column_names
            else [None] * n
        )
        langs = (
            batch.column("lang").to_pylist()
            if "lang" in batch.column_names
            else [""] * n
        )
        pages = []
        for url, title, meta, content, lang in zip(
            urls, titles, metas, contents, langs
        ):
            if isinstance(meta, list):
                meta = dict(meta)
            pages.append(
                render_page(url or "", title or "", content, meta, lang or "")
            )
        return pa.table(
            {
                "id": batch.column("id"),
                "url": batch.column("url"),
                "page_html": pa.array(pages, pa.large_string()),
            }
        )

    return docs.map_batches(render_batch, batch_format="pyarrow")
