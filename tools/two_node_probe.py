"""Two-node readiness probe (round-4 review item: everything was
single-node-validated).

Starts a REAL two-raylet Ray cluster in the sandbox via
``ray.cluster_utils.Cluster`` — the harness Ray's own multi-node tests
use: two distinct raylets with distinct plasma object stores on one
host, so the inter-node object-transfer path is exercised for real —
then runs the flagship crawl against it and checks:

1. both nodes are alive and CPU-bearing;
2. the crawl's actors (sharded frontier) and tasks actually LAND on both
   nodes — proving the shard -> fetcher Arrow-ref path crosses node
   boundaries through the object store, not just intra-process;
3. full crawl parity against the single-process oracle
   (`oracle.crawl_sim`): crawl order, seen-set size, per-url text.

(`ray start`-based clusters were tried first; this sandbox reaps
CLI-daemonized raylets ~70 s after start, so the probe uses the
in-process cluster harness, whose raylets are children of the probe.)

Run standalone (`python tools/two_node_probe.py`); it owns the cluster.
Do NOT run while another Ray session is live on the host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_pages, n_shards = int(os.environ.get("PROBE_PAGES", "2000")), 8

    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster(
        initialize_head=True,
        head_node_args={
            "num_cpus": 8,
            "object_store_memory": 2_000_000_000,
        },
    )
    try:
        cluster.add_node(num_cpus=8, object_store_memory=2_000_000_000)
        ray.init(address=cluster.address, log_to_driver=False)
        cluster.wait_for_nodes()
        alive = [n for n in ray.nodes() if n["Alive"]]
        assert len(alive) == 2, f"expected 2 nodes, got {len(alive)}"
        total_cpus = sum(int(n["Resources"].get("CPU", 0)) for n in alive)
        assert total_cpus == 16, total_cpus

        from webscraper_ray.gen import GenConfig, page_row, robots_table, seeds_table
        from webscraper_ray.oracle.crawl_sim import simulate_crawl
        from webscraper_ray.pipelines.crawl import (
            CrawlConfig,
            generate_corpus_ray,
            load_robots,
            load_seeds,
            run_crawl,
        )

        gen = GenConfig(n_pages=n_pages, n_hosts=24, n_seeds=24)
        corpus = f"/tmp/two_node_corpus_{n_pages}"
        out = f"/tmp/two_node_run_{int(time.time())}"
        store = generate_corpus_ray(corpus, gen, n_buckets=8)
        seeds = load_seeds(corpus + "/seeds.parquet")
        robots = load_robots(corpus + "/robots.parquet")
        cfg = CrawlConfig(num_shards=n_shards, max_waves=30, record_order=True)
        manifest = run_crawl(store, seeds, robots, out, cfg)

        # placement evidence, dashboard-free: (a) the crawl's ALIVE
        # actors' node ids from the GCS actor table; (b) the node ids
        # that execute a Dataset map over the crawl's own output — the
        # same read->map path the crawl waves use, so blocks demonstrably
        # flow across the two raylets' object stores.
        import ray._private.state as _state

        actor_nodes = {
            a["Address"]["NodeID"]
            for a in _state.actors().values()
            if a.get("State") == "ALIVE" and a.get("Address", {}).get("NodeID")
        }

        def node_of(batch):
            import pyarrow as pa  # noqa: PLC0415

            return pa.table(
                {"node": pa.array([ray.get_runtime_context().get_node_id()])}
            )

        task_nodes = set(
            ray.data.read_parquet(f"{out}/docs")
            .map_batches(node_of, batch_format="pyarrow")
            .to_pandas()["node"]
        )
        placement_nodes = actor_nodes | task_nodes

        # parity vs the single-process oracle
        pages = {}
        for i in range(gen.n_pages):
            row = page_row(gen, i)
            pages[row["url"]] = row["html"]
        oracle = simulate_crawl(
            pages,
            [(r["url"], r["priority"]) for r in seeds_table(gen).to_pylist()],
            {
                r["host"]: (r["disallow_prefixes"], r["crawl_delay_ms"])
                for r in robots_table(gen).to_pylist()
            },
            max_waves=30,
        )
        order = [
            u
            for w in manifest["complete_waves"]
            for u in manifest["waves"][str(w)].get("order", [])
        ]
        assert order == oracle.order, "crawl order diverged across 2 nodes"
        assert manifest["seen_count"] == len(oracle.seen)
        import pyarrow.dataset as pads

        docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table()
        got = {
            u: t
            for u, t, ok in zip(
                docs.column("url").to_pylist(),
                docs.column("text").to_pylist(),
                docs.column("ok").to_pylist(),
            )
            if ok
        }
        want = {d["url"]: d["text"] for d in oracle.docs}
        assert got == want, "extracted text diverged across 2 nodes"

        result = {
            "nodes": len(alive),
            "total_cpus": total_cpus,
            "placement_node_count": len(placement_nodes),
            "crossed_nodes": len(placement_nodes) >= 2,
            "pages": len(got),
            "seen": manifest["seen_count"],
            "waves": len(manifest["complete_waves"]),
            "parity": "order+seen+text identical to oracle",
        }
        assert result["crossed_nodes"], (
            "all actors/tasks landed on one node — no cross-node evidence"
        )
        print(json.dumps(result))
        return 0
    finally:
        import ray as _ray

        _ray.shutdown()
        cluster.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
