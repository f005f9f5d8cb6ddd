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
