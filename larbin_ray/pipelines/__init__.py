"""End-to-end pipelines: flagship extract, the generation-synchronous
crawl loop, and the training-data pipelines (dedup / text analysis /
similarity search)."""
