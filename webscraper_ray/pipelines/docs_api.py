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

import pandas as pd
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


def _argmax_id(group: pd.DataFrame) -> pd.DataFrame:
    # filter rows with a title, then byte-max id = newest (A3)
    titled = group[(group["title"].notna()) & (group["title"] != "")]
    if titled.empty:
        return titled
    return titled.loc[[titled["id"].idxmax()]]


def latest_docs(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Newest titled doc per url. groupby(url) is the single shuffle;
    the group fn is an idxmax over the time-prefixed id."""
    return docs.groupby("url").map_groups(_argmax_id, batch_format="pandas")


def search_by_urls(docs: "ray.data.Dataset", urls: Iterable[str]) -> "ray.data.Dataset":
    """searchAPI batch analog: broadcast the (small) url list and
    semi-join before the per-url argmax — docs never shuffle for urls
    outside the request set."""
    wanted = set(urls)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.is_in(batch.column("url"), value_set=pa.array(list(wanted), pa.string()))
        )

    return latest_docs(docs.map_batches(keep, batch_format="pyarrow"))


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
