"""Ray Data stages of the crawl engine: fetch join, parse/extract,
seen-set shard actors, host/IP scheduler shard actors."""
