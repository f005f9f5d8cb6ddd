"""Stateful crawl components: URL-seen filters, frontier core, Ray shard actors."""
