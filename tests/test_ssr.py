"""S9 serving templates: doc rows -> rendered HTML pages (src/ssr.ts)."""

import pyarrow as pa

from webscraper_ray.oracle.cbor import dumps as cbor_dumps
from webscraper_ray.oracle.tree import tree_to_html
from webscraper_ray.pipelines.ssr import render_doc_pages, render_page

TREE = {
    "type": "doc",
    "content": [
        {
            "type": "heading",
            "attrs": {"id": "h1", "level": 1},
            "content": [{"type": "text", "text": "Hello"}],
        },
        {
            "type": "paragraph",
            "content": [{"type": "text", "text": "Body <escaped> text"}],
        },
    ],
}


def test_render_page_structure_and_escaping():
    page = render_page(
        "https://a.x/doc?x=1&y=2",
        'Ti<tle & "quotes"',
        cbor_dumps(TREE),
        meta={"og:description": "A <desc>", "og:image": "https://a.x/i.png"},
        lang="en",
    )
    assert page.startswith("<!DOCTYPE html>")
    assert '<html lang="eng">' in page  # normalized ISO-639-3, LTR -> no dir
    assert "<title>Ti&lt;tle &amp; &quot;quotes&quot;</title>" in page
    assert '<meta property="og:description" content="A &lt;desc&gt;">' in page
    assert '<meta property="og:image" content="https://a.x/i.png">' in page
    # content html is the tree serialization verbatim + permalink
    assert tree_to_html(TREE) in page
    assert 'Permalink: https://a.x/doc?x=1&amp;y=2' in page


def test_render_rtl_language_sets_dir():
    page = render_page("https://a.x/", "t", None, lang="ar")
    assert '<html lang="ara" dir="rtl">' in page


def test_render_doc_pages_stage(ray_session):
    import ray.data

    rows = [
        {
            "id": b"\x00" * 12,
            "url": f"https://a.x/{i}",
            "title": f"T{i}",
            "meta": [("og:description", f"d{i}")],
            "content": cbor_dumps(TREE),
            "lang": "fr",
        }
        for i in range(5)
    ]
    out = render_doc_pages(ray.data.from_items(rows)).to_pandas()
    assert list(out.columns) == ["id", "url", "page_html"]
    assert len(out) == 5
    assert all('<html lang="fra">' in p for p in out.page_html)
    out = out.sort_values("url").reset_index(drop=True)  # row order is not part of the contract
    assert all(f"<title>T{i}</title>" in p for i, p in enumerate(out.page_html))


def test_list_docs_page_bounded_walk(tmp_path):
    """S9 list endpoint: <=7 token-walk pages of 100 over the on-disk
    layout (src/ssr.ts:703-744), rendered as the renderList li shape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webscraper_ray.oracle.xid import make_xid
    from webscraper_ray.pipelines.ssr import list_docs_page, render_list_page

    rows = [
        {
            "id": make_xid(100 + i, 0, f"u{i}"),
            "url": f"https://a.x/{i}",
            "src": f"https://a.x/{i}",
            "title": f"Doc {i}",
            "meta": [("description", f"summary {i}"), ("og:locale", "en")],
        }
        for i in range(250)
    ]
    rows.sort(key=lambda r: r["id"])
    for w in range(5):
        d = tmp_path / f"wave={w}"
        d.mkdir()
        pq.write_table(
            pa.Table.from_pylist(rows[w * 50 : (w + 1) * 50]), d / "part.parquet"
        )
    html = list_docs_page(str(tmp_path), title="Pubs", page_size=100, max_pages=2)
    # page budget: 2 pages of 100 out of 250 rows
    assert html.count("<li ") == 200
    assert '<p title="summary">summary' in html
    assert '<h1 id="title">Pubs</h1>' in html
    assert 'lang="en"' in html
    # unbounded walk collects everything
    full = list_docs_page(str(tmp_path), page_size=100, max_pages=7)
    assert full.count("<li ") == 250
    # escaping in the renderList shape
    page = render_list_page("T", [{"id": "x", "url": "u", "title": 'a"<b>'}])
    assert "a&quot;&lt;b&gt;" in page


def test_render_collection_page_shape():
    """Collection endpoint render (src/ssr.ts:175-261): og metas, RTL
    dir, author/keyword spans, #group backlink, children renderList."""
    from webscraper_ray.pipelines.ssr import render_collection_page

    html = render_collection_page(
        {
            "title": "My Collection",
            "summary": 'sum "x"',
            "authors": ["A One", "B Two"],
            "keywords": ["k1"],
            "cover": "https://img.x/c.png",
            "updated_at": "Mon, 01 Jan 2024 00:00:00 GMT",
            "language": "ara",
            "url": "https://site.x/group/g1?cid=c1",
            "group_url": "https://site.x/group/g1",
        },
        children=[
            {"id": "g1-d1", "url": "https://site.x/pub/d1", "title": "Child 1",
             "language": "eng", "summary": "s1"},
        ],
    )
    assert '<html lang="ara" dir="rtl">' in html
    assert '<meta property="og:title" content="My Collection">' in html
    assert '<meta property="og:description" content="sum &quot;x&quot;">' in html
    assert '<meta property="og:image" content="https://img.x/c.png">' in html
    assert html.count("<span>") == 3  # 2 authors + 1 keyword
    assert '<a id="group" href="https://site.x/group/g1">' in html
    assert 'id="updated_time">Updated: Mon, 01 Jan 2024' in html
    assert '<ul id="children"><li lang="eng" id="g1-d1">' in html
    assert '<p title="summary">s1</p>' in html


def test_render_group_page_shape():
    """Group endpoint render (src/ssr.ts:263-313): group metas + the
    collections and publications renderList uls."""
    from webscraper_ray.pipelines.ssr import render_group_page

    html = render_group_page(
        {"name": "G", "slogan": "s", "logo": "https://img.x/l.png",
         "url": "https://site.x/group/g1"},
        collections=[{"id": "c1", "url": "u1", "title": "C1", "language": ""}],
        publications=[
            {"id": "p1", "url": "u2", "title": "P1", "language": "eng"},
            {"id": "p2", "url": "u3", "title": "P2", "language": "eng"},
        ],
    )
    assert '<h1 id="group_name">G</h1>' in html
    assert '<p id="group_slogan">s</p>' in html
    assert '<meta property="og:image" content="https://img.x/l.png">' in html
    assert html.count('<ul id="collections"><li') == 1
    assert html.count("<li ") == 3


def test_group_docs_page_over_layout(ray_session, tmp_path):
    """group_docs_page: host-filtered publications + path-segment
    collections over the on-disk docs layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webscraper_ray.oracle.xid import make_xid
    from webscraper_ray.pipelines.ssr import group_docs_page

    rows = [
        {
            "id": make_xid(100 + i, 0, f"u{i}"),
            "url": f"https://{'a.x' if i % 2 == 0 else 'b.x'}/sec{i % 3}/p{i}",
            "src": f"https://a.x/{i}",
            "title": f"Doc {i}",
            "meta": [("description", f"s{i}")],
        }
        for i in range(30)
    ]
    rows.sort(key=lambda r: r["id"])
    d = tmp_path / "wave=0"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), d / "part.parquet")
    html = group_docs_page(str(tmp_path), "a.x", page_size=100)
    assert '<h1 id="group_name">a.x</h1>' in html
    # 15 docs on host a.x; their sections are sec0/sec1/sec2
    pubs = html.split('<ul id="publications">', 1)[1]
    assert pubs.count("<li ") == 15
    colls = html.split('<ul id="collections">', 1)[1].split("</ul>", 1)[0]
    assert colls.count("<li ") == 3
    assert 'href="https://a.x/sec0"' in colls


def test_render_index_page_shape_and_lang_fallback():
    from webscraper_ray.pipelines.ssr import SITE_META, render_index_page

    colls = [{"id": "a.x/sec", "url": "https://a.x/sec", "title": "sec"}]
    pubs = [
        {"id": "p1", "url": "https://a.x/sec/p1", "title": "P1",
         "language": "fra", "summary": "s1"}
    ]
    html = render_index_page(colls, pubs, lang="fr")
    # ISO-639-3 lookup: "fr" normalizes to fra
    assert f"<title>{SITE_META['fra']['title']}</title>" in html
    colls_ul = html.split('<ul id="collections">', 1)[1].split("</ul>", 1)[0]
    pubs_ul = html.split('<ul id="publications">', 1)[1].split("</ul>", 1)[0]
    assert colls_ul.count("<li ") == 1 and pubs_ul.count("<li ") == 1
    assert '<p title="summary">s1</p>' in pubs_ul
    # unknown language falls back to eng (reference: metaInfos[lang] || eng)
    html2 = render_index_page([], [], lang="xx-klingon")
    assert f"<title>{SITE_META['eng']['title']}</title>" in html2
    # the 404 branch writes "<url> not found" into #content
    html3 = render_index_page(lang="eng", not_found_url="https://a.x/nope")
    assert '<div id="content">https://a.x/nope not found</div>' in html3


def test_index_docs_page_over_layout(ray_session, tmp_path):
    """index_docs_page composes latest publications (id DESC window) +
    the window's host/segment collections — the reference's renderIndex
    over the engine docs layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webscraper_ray.oracle.xid import make_xid
    from webscraper_ray.pipelines.ssr import index_docs_page

    rows = [
        {
            "id": make_xid(100 + i, 0, f"u{i}"),
            "url": f"https://{'a.x' if i % 2 == 0 else 'b.x'}/sec{i % 3}/p{i}",
            "src": f"https://a.x/{i}",
            "title": f"Doc {i}",
            "meta": [("description", f"s{i}")],
        }
        for i in range(30)
    ]
    rows.sort(key=lambda r: r["id"])
    d = tmp_path / "wave=0"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), d / "part.parquet")
    html = index_docs_page(str(tmp_path), lang="eng", page_size=10)
    pubs = html.split('<ul id="publications">', 1)[1].split("</ul>", 1)[0]
    assert pubs.count("<li ") == 10
    # newest docs first: the max-timestamp xid (Doc 29) leads the list
    first_li_title = pubs.split('title="', 1)[1].split('"', 1)[0]
    assert first_li_title == "Doc 29"
    colls = html.split('<ul id="collections">', 1)[1].split("</ul>", 1)[0]
    # the 10-newest window (docs 20..29) covers both hosts, sections 0-2
    assert 1 <= colls.count("<li ") <= 6
    # empty dir renders both uls empty (ignoreError tolerance)
    empty = index_docs_page(str(tmp_path / "nope"), lang="eng")
    assert '<ul id="collections"></ul>' in empty
    assert '<ul id="publications"></ul>' in empty
