"""Extraction as a Ray Data ``map_batches`` stage (SURVEY.md M1, E3-E15).

``ExtractPages`` is a callable CLASS: pass it to
``ds.map_batches(ExtractPages, fn_constructor_kwargs=..., concurrency=N,
batch_format="pyarrow")`` so each actor builds its (tiny) state once and
processes zero-copy Arrow batches. HTML parsing is inherently per-row
(a recursive-descent parser, like the reference's cheerio pass —
``src/crawler.ts:31-85``); everything around it stays Arrow-native:
batches arrive as ``pyarrow.Table``, outputs are built column-wise and
returned as one ``pyarrow.Table`` per batch with no pandas round-trip.

Modes:
- ``light`` — crawl-parity columns only (url, src, title, meta, text,
  outlinks, ok, err). Used by the wave loop; matches the oracle
  simulator's per-doc fields.
- ``full``  — adds the document-construction chain of the reference's
  scrape path (``src/api.ts:94-104``): amended tree -> CBOR ``content``,
  clean ``html``, raw ``page``, plus the reference's 1 MiB cell-size guard
  (``src/db/model.ts:7,142-147``): oversize rows get ok=False,
  err='too large' and empty heavy columns (the reference fails the save).

Large-binary hygiene: heavy columns are ``large_string``/``large_binary``;
callers use a small ``batch_size`` (html blobs can reach ~1 MiB each) so a
batch × pool fits comfortably in worker heap (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import pyarrow as pa

from ..oracle.cbor import dumps as cbor_dumps
from ..oracle.extract import extract
from ..oracle.tree import parse_and_amend, tree_to_html
from ..oracle.xid import make_xid

__all__ = ["ExtractPages", "extract_pages_batch", "LIGHT_SCHEMA", "FULL_SCHEMA"]

MAX_CELL_SIZE = 1024 * 1024 - 1  # src/db/model.ts:7

_META_TYPE = pa.map_(pa.string(), pa.string())

LIGHT_SCHEMA = pa.schema(
    [
        ("id", pa.binary(12)),
        ("url", pa.string()),
        ("src", pa.string()),
        ("title", pa.string()),
        ("meta", _META_TYPE),
        ("text", pa.large_string()),
        ("outlinks", pa.large_list(pa.string())),
        ("ok", pa.bool_()),
        ("err", pa.string()),
        ("wave", pa.int32()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),  # parent priority, inherited by outlinks
    ]
)

FULL_SCHEMA = pa.schema(
    list(LIGHT_SCHEMA)
    + [
        ("content", pa.large_binary()),
        ("html", pa.large_string()),
        ("page", pa.large_string()),
    ]
)


class ExtractPages:
    """Stateful batch extractor; construct once per actor."""

    def __init__(self, mode: str = "light", wave: int = 0, xid_ts: int = 1_700_000_000):
        if mode not in ("light", "full"):
            raise ValueError(f"mode must be 'light' or 'full', got {mode!r}")
        self.mode = mode
        self.wave = wave
        self.xid_ts = xid_ts

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        depths_col = (
            batch.column("depth").to_pylist()
            if "depth" in batch.column_names
            else [0] * len(urls)
        )
        priority_col = (
            batch.column("priority").to_pylist()
            if "priority" in batch.column_names
            else [0] * len(urls)
        )

        ids: list[bytes] = []
        out_url: list[str] = []
        out_src: list[str] = []
        titles: list[str] = []
        metas: list[list[tuple[str, str]]] = []
        texts: list[str] = []
        outlinks: list[list[str]] = []
        oks: list[bool] = []
        errs: list[str] = []
        contents: list[bytes | None] = []
        clean_htmls: list[str] = []
        pages: list[str] = []

        for url, html in zip(urls, htmls):
            if isinstance(html, bytes):
                html = html.decode("utf-8", errors="replace")
            r = extract(url, html)
            ids.append(make_xid(self.xid_ts + self.wave, self.wave, r.url))
            out_url.append(r.url)
            out_src.append(r.src)
            titles.append(r.title)
            metas.append(list(r.meta.items()))
            texts.append(r.text)
            outlinks.append(r.outlinks)
            ok, err = r.ok, r.err
            content, clean, page = b"", "", ""
            if self.mode == "full" and ok:
                tree = parse_and_amend(r.article_html, seed=r.url)
                content = cbor_dumps(tree)
                clean = tree_to_html(tree).strip()
                page = r.page
                if len(page.encode("utf-8")) > MAX_CELL_SIZE or len(content) > MAX_CELL_SIZE:
                    # reference: save() throws 'document ... is too large'
                    ok, err = False, "too large"
                    content, clean, page = b"", "", ""
            oks.append(ok)
            errs.append(err)
            contents.append(content)
            clean_htmls.append(clean)
            pages.append(page)

        columns: dict = {
            "id": pa.array(ids, pa.binary(12)),
            "url": pa.array(out_url, pa.string()),
            "src": pa.array(out_src, pa.string()),
            "title": pa.array(titles, pa.string()),
            "meta": pa.array(metas, _META_TYPE),
            "text": pa.array(texts, pa.large_string()),
            "outlinks": pa.array(outlinks, pa.large_list(pa.string())),
            "ok": pa.array(oks, pa.bool_()),
            "err": pa.array(errs, pa.string()),
            "wave": pa.array([self.wave] * len(urls), pa.int32()),
            "depth": pa.array(depths_col, pa.int32()),
            "priority": pa.array(priority_col, pa.int32()),
        }
        schema = LIGHT_SCHEMA
        if self.mode == "full":
            columns["content"] = pa.array(contents, pa.large_binary())
            columns["html"] = pa.array(clean_htmls, pa.large_string())
            columns["page"] = pa.array(pages, pa.large_string())
            schema = FULL_SCHEMA
        return pa.table(columns, schema=schema)


def extract_pages_batch(
    batch: pa.Table, mode: str = "light", wave: int = 0, xid_ts: int = 1_700_000_000
) -> pa.Table:
    """Task-based form of :class:`ExtractPages` for short per-wave
    pipelines: plain tasks are elastic (no actor-pool CPU reservation),
    and the extractor's construction cost is negligible. Use the class
    form when construction becomes expensive (e.g. a loaded model)."""
    return ExtractPages(mode=mode, wave=wave, xid_ts=xid_ts)(batch)
