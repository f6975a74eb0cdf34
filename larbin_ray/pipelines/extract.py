"""Flagship extract pipeline (SURVEY.md §7 phase 1): pages table ->
parse HTTP -> extract text + links, as a stateless-per-row Ray Data
map_batches — no frontier, no actors-with-state beyond the per-actor
compiled config.

This proves the per-row invariant of BASELINE.json's input_hint: for
every 2xx text/html row, the engine's extracted ``text`` equals the
body bytes after the header terminator — byte-identical to what the
reference's ``html::getPage()`` returns (file.cxx:275-289,318-326) and
to the ``text`` oracle column of the pages table.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from larbin_ray.config import CrawlConfig
from larbin_ray.stages.parse import ParseExtract


def from_table(t: pa.Table, num_blocks: int = 8) -> rd.Dataset:
    """Arrow table -> Dataset pre-split into blocks (avoids a Repartition
    all-to-all barrier in front of the first actor-pool stage)."""
    n = t.num_rows
    num_blocks = max(1, min(num_blocks, n))
    step = (n + num_blocks - 1) // num_blocks
    slices = [t.slice(i, step) for i in range(0, n, step)]
    return rd.from_arrow(slices)


def load_pages(source: "str | rd.Dataset | pa.Table",
               columns: list[str] | None = None) -> rd.Dataset:
    if isinstance(source, str):
        return rd.read_parquet(source, columns=columns)
    if isinstance(source, pa.Table):
        return from_table(source if columns is None else source.select(columns))
    return source


def extract_pipeline(source: "str | rd.Dataset", cfg: CrawlConfig | None = None,
                     concurrency: int | None = None,
                     batch_size: int = 256) -> rd.Dataset:
    """pages(url, warc_ts, html, text?, lang) -> parsed dataset with
    (url, status, text, links, ...) — `text` column of the input is NOT
    read (pruned at the source): the engine recomputes it from html."""
    cfg = cfg or CrawlConfig()
    ds = load_pages(source, columns=["url", "warc_ts", "html", "lang"])
    return ds.map_batches(
        ParseExtract,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or 4,
    )


def _summarize(batch: pa.Table) -> pa.Table:
    n_links = pc.list_value_length(batch["links"]).cast(pa.int32())
    n_links = pc.if_else(pc.is_valid(n_links), n_links, pa.scalar(0, pa.int32()))
    return pa.table({
        "url": batch["url"],
        "status": batch["status"],
        "lang": batch["lang"],
        "text_len": pc.binary_length(batch["text"]).cast(pa.int64()),
        "n_links": n_links,
    })


def extract_summary(source: "str | rd.Dataset", cfg: CrawlConfig | None = None,
                    **kw) -> rd.Dataset:
    """Compact schema for smoke checks: (url, status, lang, text_len, n_links)."""
    return extract_pipeline(source, cfg, **kw).map_batches(
        _summarize, batch_format="pyarrow")
