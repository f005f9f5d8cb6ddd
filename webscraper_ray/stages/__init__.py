"""Ray Data batch transforms (map_batches stages) for the crawl pipeline."""
