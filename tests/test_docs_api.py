"""Read-side doc queries + batch converter pipeline (SURVEY.md §3.2/3.3)."""

import pyarrow as pa
import pytest

from webscraper_ray.oracle.cbor import loads as cbor_loads
from webscraper_ray.oracle.xid import make_xid
from webscraper_ray.pipelines.docs_api import (
    OUTPUT_LEVELS,
    convert_uploads,
    latest_docs,
    projection_columns,
    search_by_urls,
)


def _docs_table():
    rows = []
    for url, versions in {
        "https://a.x/1": [(100, "old title"), (200, "new title")],
        "https://a.x/2": [(150, "only")],
        "https://a.x/3": [(160, "")],  # untitled -> excluded by findLatest
    }.items():
        for ts, title in versions:
            rows.append(
                {
                    "id": make_xid(ts, 0, url),
                    "url": url,
                    "src": url,
                    "title": title,
                    "meta": [],
                    "content": b"",
                }
            )
    return pa.Table.from_pylist(rows)


def test_projection_levels():
    assert projection_columns("basic") == ["id", "url", "src", "title", "meta"]
    assert "page" in projection_columns("full")
    assert projection_columns("bogus") == projection_columns("detail")
    assert set(OUTPUT_LEVELS) == {"basic", "detail", "full"}


def test_latest_docs_argmax(ray_session):
    import ray.data

    out = latest_docs(ray.data.from_arrow(_docs_table())).to_pandas()
    by_url = dict(zip(out["url"], out["title"]))
    assert by_url["https://a.x/1"] == "new title"  # byte-max id wins
    assert by_url["https://a.x/2"] == "only"
    assert "https://a.x/3" not in by_url  # no titled row


def test_search_by_urls_semi_join(ray_session):
    import ray.data

    out = search_by_urls(
        ray.data.from_arrow(_docs_table()), ["https://a.x/1", "https://missing.x/"]
    ).to_pandas()
    assert list(out["url"]) == ["https://a.x/1"]


def test_convert_uploads_dispatch(ray_session):
    import ray.data

    uploads = ray.data.from_items(
        [
            {"upload_id": 1, "payload": b"<h1>HTML Doc</h1><p>body</p>", "mime": "text/html"},
            {"upload_id": 2, "payload": b"# MD Doc\n\ntext\n", "mime": "text/markdown"},
            {"upload_id": 3, "payload": b"line one\nline two", "mime": "text/plain"},
            {"upload_id": 4, "payload": b"%PDF-1.4", "mime": "application/pdf"},
            {"upload_id": 5, "payload": b"x", "mime": "image/png"},
            {"upload_id": 6, "payload": b"y" * (1024 * 1024 + 1), "mime": "text/plain"},
        ]
    )
    out = convert_uploads(uploads).to_pandas().set_index("upload_id").sort_index()
    assert out.loc[1, "ok"] and out.loc[1, "title"] == "HTML Doc"
    assert out.loc[2, "ok"] and out.loc[2, "title"] == "MD Doc"
    assert out.loc[3, "ok"] and out.loc[3, "title"] == ""  # no headings
    tree = cbor_loads(out.loc[3, "content"])
    assert [n["type"] for n in tree["content"]] == ["paragraph", "paragraph"]
    assert not out.loc[4, "ok"]  # pdf byte-decode stubbed
    assert not out.loc[5, "ok"] and "not implemented" in out.loc[5, "err"]
    assert not out.loc[6, "ok"] and "too large" in out.loc[6, "err"]


def test_latest_docs_shuffle_view_is_light(ray_session):
    """The argmax shuffle payload is exactly (url, id) — heavy columns
    (content/html/page) must not enter the groupby."""
    import ray

    from webscraper_ray.pipelines.docs_api import _titled_url_id_view

    view = _titled_url_id_view(ray.data.from_arrow(_docs_table()))
    assert view.schema().names == ["url", "id"]


def test_pagination_token_windows(ray_session):
    """O3: id-ordered pages with resume tokens cover the table exactly
    once, in order, honoring the reference's <=7-page loop bound."""
    import ray.data

    from webscraper_ray.pipelines.docs_api import iter_doc_pages, paginate_docs

    rows = [{"id": make_xid(100 + i, 0, f"u{i}"), "url": f"https://a.x/{i}"} for i in range(25)]
    docs = ray.data.from_items(rows)
    pages = list(iter_doc_pages(docs, page_size=10))
    assert [p.num_rows for p in pages] == [10, 10, 5]
    seen = [i for p in pages for i in p.column("id").to_pylist()]
    assert seen == sorted(r["id"] for r in rows)
    # explicit resume from a mid-stream token
    page1, tok = paginate_docs(docs, page_size=10)
    page2, _ = paginate_docs(docs, page_size=10, page_token=tok)
    assert page2.column("id").to_pylist() == seen[10:20]
    # page budget stops the loop like the reference's i=7 counter
    assert len(list(iter_doc_pages(docs, page_size=3, max_pages=2))) == 2


def test_paginate_docs_dir_prunes_files(tmp_path, monkeypatch):
    """The on-disk paginator must open only the files whose id window
    crosses the page: pages 2..n never re-open page-1 files (the round-2
    complaint was 7 full sorts for 7 pages)."""
    import pyarrow.parquet as pq

    from webscraper_ray.pipelines.docs_api import paginate_docs_dir

    # 3 id-ordered "wave" files of 10 rows each, like the crawl layout
    rows = [
        {
            "id": make_xid(100 + i, 0, f"u{i}"),
            "url": f"https://a.x/{i}",
            "src": f"https://a.x/{i}",
            "title": f"t{i}",
            "meta": [],
            "content": b"",
        }
        for i in range(30)
    ]
    rows.sort(key=lambda r: r["id"])
    for w in range(3):
        d = tmp_path / f"wave={w}"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows[w * 10 : (w + 1) * 10]), d / "part.parquet")

    opened: list[str] = []
    real = pq.read_table

    def spy(path, *a, **kw):
        opened.append(str(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(pq, "read_table", spy)  # function-level imports resolve here

    all_ids = [r["id"] for r in rows]
    page1, tok1 = paginate_docs_dir(str(tmp_path), page_size=10)
    assert page1.column("id").to_pylist() == all_ids[:10]
    opened.clear()
    page2, tok2 = paginate_docs_dir(str(tmp_path), page_size=10, page_token=tok1)
    assert page2.column("id").to_pylist() == all_ids[10:20]
    assert all("wave=0" not in p for p in opened), opened  # page-1 file untouched
    opened.clear()
    page3, tok3 = paginate_docs_dir(str(tmp_path), page_size=10, page_token=tok2)
    assert page3.column("id").to_pylist() == all_ids[20:30]
    assert all("wave=0" not in p and "wave=1" not in p for p in opened), opened
    page4, tok4 = paginate_docs_dir(str(tmp_path), page_size=10, page_token=tok3)
    assert page4.num_rows == 0 and tok4 is None
