"""Bench/driver contract pins (no Ray): every benched query is
registered, every registered query has an oracle, and the two
registries stay key-aligned."""

from __future__ import annotations


def test_bench_queries_are_registered():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from webscraper_ray.queries import QUERIES

    missing = [q for q in bench.BENCH_QUERIES if q not in QUERIES]
    assert not missing, f"bench list names unregistered queries: {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_registry_oracle_alignment():
    from webscraper_ray.queries import ORACLE_SQL, QUERIES

    assert set(QUERIES) == set(ORACLE_SQL)
    assert all(callable(v) for v in QUERIES.values())
    assert all(isinstance(v, str) and "SELECT" in v.upper() for v in ORACLE_SQL.values())


def test_readme_operator_count_matches_registry():
    """The README's advertised operator count has drifted twice; pin it
    to the registry so the third drift fails a test instead of a
    review."""
    import os
    import re

    from webscraper_ray.queries import QUERIES

    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md")
    ).read()
    m = re.search(r"`webscraper_ray/queries\.py`\): (\d+) operators", readme)
    assert m, "README no longer states the operator count"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} operators, registry has {len(QUERIES)}"
    )
