"""End-to-end pipelines: crawl wave loop, corpus generation, resume."""
