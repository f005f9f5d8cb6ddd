"""webscraper_ray — a from-scratch Ray-Data-native batch crawler / document engine.

Re-expresses the query and data-processing capabilities of the reference
(yiwen-ai/webscraper, a Koa/crawlee/ScyllaDB scraping service) as an idiomatic
Ray Data pipeline: `ray.data.Dataset` + `map_batches` over zero-copy Arrow
batches, stateful frontier shards as Ray actors, Parquet sources/sinks.

Layout:
- ``oracle/``    pure-Python single-process reference semantics (E1-E20, C1-C5
                 per SURVEY.md §2) — defines correctness before distribution.
- ``stages/``    Ray Data batch transforms (extract, fetch-join, outlinks).
- ``state/``     stateful components (cuckoo filter, frontier shard actors).
- ``pipelines/`` crawl wave driver, checkpoint/resume.
- ``functions/`` training-data ops (dedup, text stats, ANN, multimodal stubs).
- ``queries.py`` relational query layer exposed through ``__ray_entry__``.

Nothing in this package calls ``ray.init()`` — sessions are owned by the
driver, ``bench.py`` and the pytest fixture only.
"""

__version__ = "0.1.0"
