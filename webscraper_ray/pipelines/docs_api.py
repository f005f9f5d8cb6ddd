"""Read-side document queries over crawl output (SURVEY.md §3.3).

Mirrors the reference's read APIs as batch operators over the docs
Parquet written by the crawl:

- :func:`latest_docs`  — ``findLatest`` (J1/A3/O1, ``src/db/model.ts:161-191``):
  newest doc per url with a non-empty title; the 12-byte id is
  timestamp-prefixed so byte-wise max(id) = newest (same trick as the
  reference's byte-descending sort).
- :func:`projection_columns` / :func:`read_docs` — ``documentAPI`` output
  levels (E17, ``src/api.ts:144-150``): basic / detail (default) / full.
- :func:`search_by_urls` — ``searchAPI`` (S5, ``src/api.ts:38-56``):
  latest docs for a (small) url list, broadcast semi-join then argmax.
- :func:`convert_uploads` — ``convertingAPI`` (§3.2, C1-C5): batch
  conversion of (payload, mime) rows into amended trees (CBOR + title),
  MIME-dispatched per row like ``getConverter``.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa

import ray.data

from ..oracle.cbor import dumps as cbor_dumps
from ..oracle.convert import get_converter
from ..oracle.tree import find_title

__all__ = [
    "OUTPUT_LEVELS",
    "projection_columns",
    "read_docs",
    "latest_docs",
    "search_by_urls",
    "paginate_docs",
    "paginate_docs_dir",
    "iter_doc_pages",
    "convert_uploads",
]

# src/api.ts:144-150
OUTPUT_LEVELS = {
    "basic": ["url", "src", "title", "meta"],
    "detail": ["url", "src", "title", "meta", "content"],
    "full": ["url", "src", "title", "meta", "content", "html", "page"],
}


def projection_columns(output: str = "detail") -> list[str]:
    return ["id"] + OUTPUT_LEVELS.get(output, OUTPUT_LEVELS["detail"])


def read_docs(docs_dir: str, output: str = "detail") -> "ray.data.Dataset":
    """Column-pruned docs read at an output level (E17 at the source)."""
    return ray.data.read_parquet(docs_dir, columns=projection_columns(output))


def _argmax_id(group: pa.Table) -> pa.Table:
    # byte-max id = newest (A3); rows are pre-filtered to titled ones.
    # Pure-Arrow (sort desc + take 1) so the id column keeps its exact
    # type (fixed_size_binary(12)) for the join back — a pandas roundtrip
    # would widen it to plain binary and break the join key match.
    return group.sort_by([("id", "descending")]).slice(0, 1)


def _titled_url_id_view(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(url, id) of titled rows — the ONLY columns the argmax shuffles."""
    import pyarrow.compute as pc

    def project(batch: pa.Table) -> pa.Table:
        titled = batch.filter(
            pc.and_kleene(
                pc.is_valid(batch.column("title")),
                pc.not_equal(batch.column("title"), ""),
            )
        )
        return titled.select(["url", "id"])

    return docs.map_batches(project, batch_format="pyarrow")


def latest_docs(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Newest titled doc per url.

    Heavy columns NEVER shuffle: the per-url argmax runs over a projected
    (url, id) view of titled rows (the only all-to-all payload is those
    two columns), and the winning ids then semi-join back against the
    full-width dataset with a partitioned hash join on the unique doc id
    (A5) to recover content/html/page. At ``output='full'`` the round-1
    version shuffled MB-sized rows just to pick max(id)."""
    winners = (
        _titled_url_id_view(docs)
        .groupby("url")
        .map_groups(_argmax_id, batch_format="pyarrow")
        .select_columns(["id"])
    )
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    joined = _pack_meta(docs).join(
        winners,
        "inner",
        num_partitions=max(2, min(8, cpus // 2)),
        on=("id",),
    )
    return _unpack_meta(joined)


def _pack_meta(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Serialize the map-typed ``meta`` column to binary for the join
    (Arrow's hash join rejects map/nested non-key fields); the original
    type is restored by :func:`_unpack_meta`."""
    import pickle

    def pack(batch: pa.Table) -> pa.Table:
        if "meta" not in batch.column_names:
            return batch
        idx = batch.column_names.index("meta")
        blob = pa.array(
            [pickle.dumps(v) for v in batch.column("meta").to_pylist()],
            pa.large_binary(),
        )
        return batch.set_column(idx, "meta", blob)

    return docs.map_batches(pack, batch_format="pyarrow")


def _unpack_meta(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    import pickle

    def unpack(batch: pa.Table) -> pa.Table:
        if "meta" not in batch.column_names:
            return batch
        idx = batch.column_names.index("meta")
        vals = [pickle.loads(v) for v in batch.column("meta").to_pylist()]
        typ = pa.map_(pa.string(), pa.string())
        col = pa.array(
            [None if v is None else list(v.items()) if isinstance(v, dict) else v for v in vals],
            typ,
        )
        return batch.set_column(idx, "meta", col)

    return docs.map_batches(unpack, batch_format="pyarrow")


def search_by_urls(docs: "ray.data.Dataset", urls: Iterable[str]) -> "ray.data.Dataset":
    """searchAPI batch analog: broadcast the (small) url list and
    semi-join before the per-url argmax — docs never shuffle for urls
    outside the request set."""
    # build the Arrow value_set ONCE in the closure, not per batch
    wanted = pa.array(sorted(set(urls)), pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("url"), value_set=wanted))

    return latest_docs(docs.map_batches(keep, batch_format="pyarrow"))


def paginate_docs(
    docs: "ray.data.Dataset",
    page_size: int = 100,
    page_token: bytes | None = None,
) -> tuple[pa.Table, bytes | None]:
    """O3 pagination window (reference loop: ``src/ssr.ts:713-744`` —
    ``page_size`` rows per call, resume via ``next_page_token``).

    Token = the last returned doc id; a page is the ``page_size`` id-
    ordered rows AFTER it. The token filter AND a per-block partial
    top-k run inside ``map_batches`` first, so the only all-to-all sort
    is over ``page_size × n_blocks`` survivor rows — never the dataset.
    For docs stored on disk prefer :func:`paginate_docs_dir`, which
    prunes whole FILES by their id-range footer stats. Returns
    ``(page_table, next_page_token)``; token ``None`` when exhausted.
    """
    import pyarrow.compute as pc

    def block_topk(t: pa.Table, tok=page_token, k=page_size) -> pa.Table:
        if tok is not None:
            t = t.filter(pc.greater(t.column("id"), tok))
        return t.sort_by("id").slice(0, k)

    reduced = docs.map_batches(block_topk, batch_format="pyarrow")
    page = pa.Table.from_pandas(
        reduced.sort("id").limit(page_size).to_pandas(), preserve_index=False
    )
    if page.num_rows < page_size:
        return page, None
    last = page.column("id")[page.num_rows - 1].as_py()
    return page, last


# per-FILE cache: path -> (size, mtime_ns, min_id, max_id, n_rows). A new
# wave indexes only its new files; a rewritten file replaces its own entry
# (no dead whole-file-set entries accumulate across waves).
_PAGE_FILE_INDEX: dict[str, tuple] = {}


def _docs_file_index(docs_dir: str) -> list[tuple]:
    """Per-directory index of ``(min_id, max_id, n_rows, path)`` per
    parquet file, sorted by min_id — built from footer statistics
    (falling back to a one-column id read when a writer omitted stats)
    and cached per file, so page fetches never re-open files outside
    their id window and growing docs dirs only index their NEW files."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = []
    for root, _dirs, names in os.walk(docs_dir):
        files.extend(
            os.path.join(root, n) for n in names if n.endswith(".parquet")
        )
    entries = []
    for path in sorted(files):
        fstat = os.stat(path)
        hit = _PAGE_FILE_INDEX.get(path)
        if hit is not None and hit[0] == fstat.st_size and hit[1] == fstat.st_mtime_ns:
            entries.append((hit[2], hit[3], hit[4], path))
            continue
        pf = pq.ParquetFile(path)
        idx = pf.schema_arrow.get_field_index("id")
        mins, maxs = [], []
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                mins.clear()
                break
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            mn, mx = min(mins), max(maxs)
        else:  # stats absent: one-time single-column scan at index build
            ids = pq.read_table(path, columns=["id"]).column("id")
            mm = pc.min_max(ids).as_py()
            mn, mx = mm["min"], mm["max"]
        _PAGE_FILE_INDEX[path] = (
            fstat.st_size, fstat.st_mtime_ns, mn, mx, pf.metadata.num_rows
        )
        entries.append((mn, mx, pf.metadata.num_rows, path))
    entries.sort()
    return entries


def paginate_docs_dir(
    docs_dir: str,
    page_size: int = 100,
    page_token: bytes | None = None,
    output: str = "detail",
) -> tuple[pa.Table, bytes | None]:
    """File-pruned pagination over an on-disk docs layout.

    The crawl writes id-ordered wave dirs, so a page is contained in the
    few files whose ``[min_id, max_id]`` window crosses the token. Files
    with ``max_id <= token`` are never opened again (the complaint with
    sort-per-page), and files are added in min_id order only until every
    unread candidate's ``min_id`` exceeds the page's last id — minimal
    reads, correct even when file id-ranges overlap within a wave.
    Reads are column-pruned to the output level. Same return contract as
    :func:`paginate_docs`.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cols = projection_columns(output)
    entries = _docs_file_index(docs_dir)
    cands = [
        e for e in entries if page_token is None or e[1] > page_token
    ]
    # the kth-smallest-id threshold that bounds further reads is computed
    # over the ID COLUMN only; the full tables (which carry text/html at
    # detail level) concat+sort exactly ONCE at loop exit
    read_tables: list[pa.Table] = []
    ids_acc: list = []
    n_acc = 0
    i = 0
    kth = None
    while i < len(cands) and (kth is None or cands[i][0] <= kth):
        t = pq.read_table(cands[i][3], columns=cols)
        if page_token is not None:
            t = t.filter(pc.greater(t.column("id"), page_token))
        read_tables.append(t)
        ids_acc.extend(t.column("id").chunks)
        n_acc += t.num_rows
        i += 1
        if n_acc >= page_size:
            ids = pa.chunked_array(ids_acc).combine_chunks()
            kth = ids.take(pc.sort_indices(ids)[page_size - 1 : page_size])[0].as_py()
    if read_tables:
        filtered = pa.concat_tables(read_tables).sort_by("id")
    else:
        filtered = pa.table({c: [] for c in cols})
    page = filtered.slice(0, page_size)
    if page.num_rows < page_size:
        return page, None
    return page, page.column("id")[page.num_rows - 1].as_py()


def iter_doc_pages(
    docs: "ray.data.Dataset", page_size: int = 100, max_pages: int = 7
):
    """The reference's bounded pagination loop (≤7 pages of 100): yields
    page tables until exhaustion or the page budget."""
    token: bytes | None = None
    for _ in range(max_pages):
        page, token = paginate_docs(docs, page_size=page_size, page_token=token)
        if page.num_rows:
            yield page
        if token is None:
            break


class _ConvertBatch:
    """C1 dispatch as a stage: (upload_id, payload, mime) -> converted doc.

    Unknown MIME and converter errors mirror the reference's HTTP 400:
    the row lands in the error channel (ok=False, err=...). The 1 MiB
    upload cap (src/api.ts:163) is enforced per row.
    """

    MAX_UPLOAD = 1024 * 1024  # '1024kb' raw-body limit

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("upload_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        mimes = batch.column("mime").to_pylist()
        titles, contents, oks, errs = [], [], [], []
        for uid, payload, mime in zip(ids, payloads, mimes):
            title, content, ok, err = "", b"", True, ""
            try:
                if len(payload) > self.MAX_UPLOAD:
                    raise ValueError("request entity too large")
                conv = get_converter(mime)
                tree = conv(payload, seed=f"upload:{uid}")
                title = find_title(tree, 1) or find_title(tree, 2)
                content = cbor_dumps(tree)
            except NotImplementedError as exc:  # pdf byte-decode stub
                ok, err = False, str(exc)
            except Exception as exc:  # noqa: BLE001 - mirrors HTTP 400 catch-all
                ok, err = False, str(exc)
            titles.append(title)
            contents.append(content)
            oks.append(ok)
            errs.append(err)
        return pa.table(
            {
                "upload_id": batch.column("upload_id"),
                "title": pa.array(titles, pa.string()),
                "content": pa.array(contents, pa.large_binary()),
                "ok": pa.array(oks, pa.bool_()),
                "err": pa.array(errs, pa.string()),
            }
        )


def convert_uploads(
    uploads: "ray.data.Dataset", batch_size: int = 32, concurrency: int = 2
) -> "ray.data.Dataset":
    """Batch ``POST /v1/converting``: uploads(upload_id, payload, mime)
    -> (upload_id, title, content, ok, err). Actor pool: converter
    registry/parser tables built once per actor (ST5)."""
    return uploads.map_batches(
        _ConvertBatch,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
