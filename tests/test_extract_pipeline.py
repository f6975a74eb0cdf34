"""Phase-1 end-to-end: synthetic web -> Ray Data extract pipeline.

Checks the per-row invariant from BASELINE.json input_hint: extracted
``text`` is byte-identical to the pages table's oracle ``text`` column
for every successfully parsed page."""

import pyarrow as pa
import pytest

from larbin_ray.config import CrawlConfig
from larbin_ray.sources.synthweb import default_seeds, gen_web


@pytest.fixture(scope="module")
def web():
    return gen_web(240, 12, seed=42)


def test_generator_deterministic(web):
    again = gen_web(240, 12, seed=42)
    assert web.equals(again)


def test_generator_schema(web):
    # input_hint columns + latency_ms (simulated server latency for the
    # timeout FetchError class)
    assert [f.name for f in web.schema] == ["url", "warc_ts", "html", "text",
                                            "lang", "latency_ms"]
    assert web.schema.field("html").type == pa.binary()
    assert str(web.schema.field("warc_ts").type) == "timestamp[us]"


def test_seeds_exist(web):
    urls = set(web["url"].to_pylist())
    for s in default_seeds(12):
        assert s in urls, s


def test_extract_pipeline_text_invariant(ray_session, web):
    from larbin_ray.pipelines.extract import extract_pipeline, from_table

    ds = from_table(web, 4)
    out = extract_pipeline(ds, CrawlConfig(), concurrency=2, batch_size=64).to_pandas()
    assert len(out) == web.num_rows
    fixture = dict(zip(web["url"].to_pylist(), web["text"].to_pylist()))
    succ = out[out["status"] == "success"]
    assert len(succ) > 200
    for u, txt in zip(succ["url"], succ["text"]):
        assert txt.decode("latin-1") == fixture[u], u
    # the special pages produce their designed error taxonomy
    counts = out["status"].value_counts().to_dict()
    for expected in ("badType", "err30X", "err40X", "tooBig", "earlyStop"):
        assert counts.get(expected, 0) >= 1, expected


def test_extract_links_nonempty(ray_session, web):
    from larbin_ray.pipelines.extract import extract_summary, from_table

    out = extract_summary(from_table(web, 4), CrawlConfig(),
                          concurrency=2, batch_size=64).to_pandas()
    assert (out[out["status"] == "success"]["n_links"] > 0).mean() > 0.9
