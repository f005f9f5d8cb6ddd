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

__all__ = [
    "render_page",
    "render_doc_pages",
    "render_list_page",
    "list_docs_page",
    "render_collection_page",
    "render_group_page",
    "group_docs_page",
    "render_index_page",
    "index_docs_page",
]

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


# --- list pages (src/ssr.ts:313-460 renderList + :703-744 page loop) ---------

_LIST_TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>{title}</title>
</head>
<body>
<h1 id="title">{title}</h1>
<ul id="{ul_id}">{items}</ul>
</body>
</html>"""


def render_list_page(title: str, items: list[dict], ul_id: str = "publications") -> str:
    """The reference's ``renderList`` shape (``src/ssr.ts:400-460``): one
    ``<li lang id>`` per item with a titled anchor and an optional
    ``<p title="summary">``."""
    return _LIST_TEMPLATE.format(
        title=_html.escape(title or "", quote=True),
        ul_id=_html.escape(ul_id, quote=True),
        items=_list_items(items),
    )


_COLLECTION_TEMPLATE = """<!DOCTYPE html>
<html lang="{lang}"{dir_attr}>
<head>
<meta charset="utf-8">
<title>{title}</title>
<meta property="og:url" content="{url}">
<meta property="og:title" content="{og_title}">
{extra_meta}</head>
<body>
<h1 id="title">{og_title}</h1>
{summary_p}<div id="authors">{authors}</div>
<div id="keywords">{keywords}</div>
<p><a id="group" href="{group_url}">Group: {group_url}</a></p>
<p id="updated_time">Updated: {updated}</p>
<ul id="children">{children}</ul>
</body>
</html>"""


def _spans(values: list[str] | None) -> str:
    return "".join(
        f"<span>{_html.escape(v, quote=True)}</span>" for v in (values or [])
    )


def _list_items(items: list[dict]) -> str:
    """The reference's ``renderList`` li shape (``src/ssr.ts:403-460``):
    ``<li lang id>`` with a titled anchor and an optional summary ``<p>``."""
    parts = []
    for item in items:
        esc_title = _html.escape(item.get("title") or "", quote=True)
        li = (
            f'<li lang="{_html.escape(item.get("language") or "", quote=True)}"'
            f' id="{_html.escape(str(item.get("id") or ""), quote=True)}">'
            f'<a href="{_html.escape(item.get("url") or "", quote=True)}"'
            f' title="{esc_title}">{esc_title}</a>'
        )
        summary = item.get("summary")
        if summary:
            li += f'<p title="summary">{_html.escape(summary)}</p>'
        parts.append(li + "</li>")
    return "".join(parts)


def render_collection_page(
    info: dict, children: list[dict] | None = None, lang: str = ""
) -> str:
    """The reference's collection endpoint render
    (``src/ssr.ts:175-261``): og url/title/description/image metas, lang
    + RTL dir, author/keyword spans, the ``#group`` backlink, the
    ``#updated_time`` line, and the children as ``renderList`` items in
    ``<ul id="children">`` (``src/ssr.ts:366-401`` — collection-kind
    children are skipped by the CALLER there; pass pre-filtered items).

    ``info``: title, summary?, authors?, keywords?, cover?, updated_at?,
    language?, url (the collection permalink), group_url.
    """
    lang3 = lang639_3(info.get("language") or lang or "")
    dir_attr = ' dir="rtl"' if is_rtl(lang3) else ""
    extra = []
    summary = info.get("summary") or ""
    if summary:
        e = _html.escape(summary, quote=True)
        extra.append(f'<meta property="og:description" content="{e}">\n')
        extra.append(f'<meta name="description" content="{e}">\n')
    cover = info.get("cover")
    if cover:
        extra.append(
            f'<meta property="og:image" content="{_html.escape(cover, quote=True)}">\n'
        )
    title = info.get("title") or ""
    group_url = info.get("group_url") or ""
    return _COLLECTION_TEMPLATE.format(
        lang=_html.escape(lang3 or lang, quote=True),
        dir_attr=dir_attr,
        title=_html.escape(title, quote=True),
        og_title=_html.escape(title, quote=True),
        url=_html.escape(info.get("url") or "", quote=True),
        extra_meta="".join(extra),
        summary_p=(
            f'<p id="summary">{_html.escape(summary)}</p>\n' if summary else ""
        ),
        authors=_spans(info.get("authors")),
        keywords=_spans(info.get("keywords")),
        group_url=_html.escape(group_url, quote=True),
        updated=_html.escape(str(info.get("updated_at") or ""), quote=True),
        children=_list_items(children or []),
    )


_GROUP_TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>{name}</title>
<meta property="og:url" content="{url}">
<meta property="og:title" content="{name}">
<meta property="og:description" content="{slogan}">
{extra_meta}</head>
<body>
<h1 id="group_name">{name}</h1>
<p id="group_slogan">{slogan}</p>
<ul id="collections">{collections}</ul>
<ul id="publications">{publications}</ul>
</body>
</html>"""


def render_group_page(
    group: dict,
    collections: list[dict] | None = None,
    publications: list[dict] | None = None,
) -> str:
    """The reference's group endpoint render (``src/ssr.ts:263-313``):
    og url/title/description/image from the group record, then the
    group's collections and publications as two ``renderList`` uls
    (``src/ssr.ts:314-364``).

    ``group``: name, slogan?, logo?, url.
    """
    extra = []
    logo = group.get("logo")
    if logo:
        extra.append(
            f'<meta property="og:image" content="{_html.escape(logo, quote=True)}">\n'
        )
    return _GROUP_TEMPLATE.format(
        name=_html.escape(group.get("name") or "", quote=True),
        slogan=_html.escape(group.get("slogan") or "", quote=True),
        url=_html.escape(group.get("url") or "", quote=True),
        extra_meta="".join(extra),
        collections=_list_items(collections or []),
        publications=_list_items(publications or []),
    )


def group_docs_page(
    docs_dir: str,
    host: str,
    page_size: int = 100,
) -> str:
    """Group endpoint over the engine's docs layout: a "group" is a host
    (the engine analog of the reference's DB-backed group record), its
    "collections" are the host's first URL path segments, and its
    "publications" are the host's first ``page_size`` docs by id.

    Reads the basic projection only (id/url/title/meta) and keeps the
    driver result bounded by ``page_size`` + distinct-segment count.
    """
    from urllib.parse import urlsplit

    from .docs_api import paginate_docs, read_docs

    docs = read_docs(docs_dir, output="basic")

    def of_host(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hosts = [urlsplit(u).netloc for u in batch.column("url").to_pylist()]
        return batch.filter(pc.equal(pa.array(hosts, pa.string()), host))

    mine = docs.map_batches(of_host, batch_format="pyarrow")
    page, _token = paginate_docs(mine, page_size=page_size)
    pubs, segments = [], {}
    for row in page.to_pylist():
        meta = dict(row.get("meta") or [])
        rid = row.get("id")
        url = row.get("url") or ""
        path = urlsplit(url).path
        seg = path.split("/", 2)[1] if path.count("/") >= 1 else ""
        if seg:
            segments.setdefault(seg, f"https://{host}/{seg}")
        pubs.append(
            {
                "id": rid.hex() if isinstance(rid, bytes) else str(rid),
                "url": url,
                "title": row.get("title"),
                "language": meta.get("og:locale", ""),
                "summary": meta.get("description")
                or meta.get("og:description")
                or "",
            }
        )
    collections = [
        {"id": seg, "url": url, "title": seg, "language": ""}
        for seg, url in sorted(segments.items())
    ]
    return render_group_page(
        {"name": host, "slogan": "", "url": f"https://{host}/"},
        collections=collections,
        publications=pubs,
    )


def list_docs_page(
    docs_dir: str,
    title: str = "Publications",
    page_size: int = 100,
    max_pages: int = 7,
) -> str:
    """The reference's list endpoint loop (``src/ssr.ts:703-744``:
    ``page_size`` 100, ``let i = 7`` bounded token walk) over the on-disk
    docs layout, then one rendered list page.

    Uses the file-pruned paginator, so each of the <=7 fetches opens only
    the parquet files its id window crosses — the whole endpoint touches
    at most ``max_pages * page_size`` rows regardless of corpus size.
    """
    from .docs_api import paginate_docs_dir

    items: list[dict] = []
    token = None
    for _ in range(max_pages):
        page, token = paginate_docs_dir(
            docs_dir, page_size=page_size, page_token=token, output="basic"
        )
        for row in page.to_pylist():
            meta = dict(row.get("meta") or [])
            rid = row.get("id")
            items.append(
                {
                    "id": rid.hex() if isinstance(rid, bytes) else str(rid),
                    "url": row.get("url"),
                    "title": row.get("title"),
                    "language": meta.get("og:locale", ""),
                    "summary": meta.get("description")
                    or meta.get("og:description")
                    or "",
                }
            )
        if token is None:
            break
    return render_list_page(title, items)


# --- index page (src/ssr.ts:51-82 renderIndex) -------------------------------

_INDEX_TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>{title}</title>
<meta name="description" content="{desc}">
</head>
<body>
<div id="content">{content}</div>
<ul id="collections">{collections}</ul>
<ul id="publications">{publications}</ul>
</body>
</html>"""

# The reference's per-language site title/description table
# (``src/ssr.ts:21-49`` metaInfos) is deployment CONFIG — marketing copy
# fed from its config store, keyed by ISO 639-3 with an ``eng``
# fallback. The engine models the same lookup+fallback contract with
# neutral defaults; pass ``site_meta`` to brand a deployment.
SITE_META: dict[str, dict[str, str]] = {
    lang: {
        "title": f"Webscraper Ray — latest publications [{lang}]",
        "desc": f"Index of the latest collections and publications ({lang}).",
    }
    for lang in ("zho", "eng", "fra", "rus", "ara", "spa")
}


def render_index_page(
    collections: list[dict] | None = None,
    publications: list[dict] | None = None,
    lang: str = "eng",
    not_found_url: str | None = None,
    site_meta: dict[str, dict[str, str]] | None = None,
) -> str:
    """The reference's index composition (``src/ssr.ts:51-82``): site
    title + meta description looked up by language with ``eng``
    fallback, then the latest collections and latest publications as the
    two ``renderList`` uls. Each list is error-tolerant in the reference
    (``ignoreError`` leaves its ul empty) — pass an empty list for the
    same render. The 404 branch (both fetches failed AND an
    ``x-request-url`` header was present) writes "<url> not found" into
    ``#content``; ``not_found_url`` reproduces it."""
    meta = site_meta or SITE_META
    info = meta.get(lang639_3(lang or "eng")) or meta["eng"]
    content = ""
    if not_found_url is not None:
        content = _html.escape(f"{not_found_url} not found")
    return _INDEX_TEMPLATE.format(
        title=_html.escape(info["title"], quote=True),
        desc=_html.escape(info["desc"], quote=True),
        content=content,
        collections=_list_items(collections or []),
        publications=_list_items(publications or []),
    )


def index_docs_page(
    docs_dir: str,
    lang: str = "eng",
    page_size: int = 100,
    site_meta: dict[str, dict[str, str]] | None = None,
) -> str:
    """Index endpoint over the engine's docs layout — the composition the
    round-4 review flagged missing: latest publications are the newest
    ``page_size`` docs platform-wide (per-block partial top-k by id
    DESC, then one sort+limit over the ``page_size x n_blocks``
    survivors — the :func:`~.docs_api.paginate_docs` discipline, never a
    full-corpus gather); latest collections are the distinct
    host/first-path-segment pairs seen in that window (the
    :func:`group_docs_page` collection analog, across hosts). An
    empty/unreadable docs dir renders both uls empty, matching the
    reference's ``ignoreError`` tolerance."""
    from urllib.parse import urlsplit

    from .docs_api import read_docs

    pubs: list[dict] = []
    segments: dict[tuple, str] = {}
    try:
        docs = read_docs(docs_dir, output="basic")

        def block_topk(t: pa.Table, k=page_size) -> pa.Table:
            return t.sort_by([("id", "descending")]).slice(0, k)

        reduced = docs.map_batches(block_topk, batch_format="pyarrow")
        page = reduced.sort("id", descending=True).limit(page_size).to_pandas()
        rows = page.to_dict("records")
    except Exception:  # noqa: BLE001 — the reference's ignoreError branch
        rows = []
    for row in rows:
        raw_meta = row.get("meta")  # numpy array via to_pandas; no `or []`
        meta = dict(raw_meta) if raw_meta is not None and len(raw_meta) else {}
        rid = row.get("id")
        url = row.get("url") or ""
        parts = urlsplit(url)
        seg = parts.path.split("/", 2)[1] if parts.path.count("/") >= 1 else ""
        if seg and parts.netloc:
            segments.setdefault(
                (parts.netloc, seg), f"https://{parts.netloc}/{seg}"
            )
        pubs.append(
            {
                "id": rid.hex() if isinstance(rid, bytes) else str(rid),
                "url": url,
                "title": row.get("title"),
                "language": meta.get("og:locale", ""),
                "summary": meta.get("description")
                or meta.get("og:description")
                or "",
            }
        )
    collections = [
        {"id": f"{host}/{seg}", "url": url, "title": seg, "language": ""}
        for (host, seg), url in sorted(segments.items())
    ]
    return render_index_page(
        collections, pubs, lang=lang, site_meta=site_meta
    )
