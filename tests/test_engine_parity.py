"""End-to-end crawl parity: Spark engine vs pure-Python reference
simulator on the same corpus + seed list + config (north rule: same
crawl ordering, same URL-seen set, same fetch codes; BASELINE.json).
"""

import pytest
from pyspark.sql import functions as F

from pycrawler_spark.config import CrawlConfig
from pycrawler_spark.plans.crawl import CrawlEngine
from pycrawler_spark.simulator import simulate
from pycrawler_spark.sources.corpus import write_corpus, generate_corpus

CFG = CrawlConfig(depth=3, max_urls=25)


@pytest.fixture(scope="module")
def crawl_outputs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("crawl")
    corpus_dir = root / "corpus"
    pages_path, seeds_path, robots_path = write_corpus(
        str(corpus_dir), seed=42, n_hosts=6, pages_per_host=12, mega_factor=4
    )
    pages, seeds, robots = generate_corpus(
        seed=42, n_hosts=6, pages_per_host=12, mega_factor=4
    )
    sim = simulate({p["url"]: p["html"] for p in pages}, seeds, CFG.copy())

    engine = CrawlEngine(spark, str(root / "work"), CFG.copy(), job="parity")
    engine.init_job(spark.read.parquet(seeds_path), pages_path)
    stats = engine.run()
    return engine, sim, stats


def test_fetch_codes_match(crawl_outputs):
    engine, sim, _ = crawl_outputs
    rows = engine.table("fetches").select(
        "task_id", "url", "depth", "repetition", "code"
    ).collect()
    got = {(r.task_id, r.url, r.depth, r.repetition): r.code for r in rows}
    want = {(t, u, d, rep): c for (t, u, d, rep, c) in sim.fetches}
    assert got == want


def test_visit_order_matches(crawl_outputs):
    """Engine visit order (depth, seq, repetition) == simulator's
    serial visit order, per task."""
    engine, sim, _ = crawl_outputs
    rows = (
        engine.table("fetches")
        .select("task_id", "url", "depth", "seq", "repetition")
        .collect()
    )
    by_task = {}
    for r in sorted(rows, key=lambda r: (r.task_id, r.depth, r.seq, r.repetition)):
        by_task.setdefault(r.task_id, []).append((r.url, r.depth, r.repetition))
    assert set(by_task) == set(sim.visits)
    for tid, visits in sim.visits.items():
        assert by_task[tid] == visits, f"task {tid} order mismatch"


def test_seen_sets_match(crawl_outputs):
    engine, sim, _ = crawl_outputs
    rows = engine.table("seen").collect()
    got = {}
    for r in rows:
        got.setdefault(r.task_id, set()).add(r.url_norm)
    want = {t: s for t, s in sim.seen.items() if s}
    assert got == want


def test_frontier_insertion_order_matches(crawl_outputs):
    engine, sim, _ = crawl_outputs
    rows = (
        engine.table("frontier")
        .filter(F.col("repetition") == 1)
        .select("task_id", "url", "depth", "seq")
        .collect()
    )
    by_task = {}
    for r in sorted(rows, key=lambda r: (r.task_id, r.seq)):
        by_task.setdefault(r.task_id, []).append((r.url, r.depth))
    for tid, ins in sim.inserted.items():
        assert by_task[tid] == [(u, d) for (u, d, _) in ins], f"task {tid}"


def test_budgets_match(crawl_outputs):
    engine, sim, _ = crawl_outputs
    m = engine._load_manifest()
    last_tasks = max(engine._committed(m, "tasks"))
    rows = engine._read("tasks", [last_tasks]).select("task_id", "budget").collect()
    got = {r.task_id: r.budget for r in rows}
    for t in sim.tasks:
        assert got[t.task_id] == t.budget, f"task {t.task_id}"


def test_extracted_text_byte_identical(crawl_outputs, spark):
    """input_hint invariant: engine-extracted text per url is
    byte-identical to the corpus ``text`` column."""
    engine, _, _ = crawl_outputs
    m = engine._load_manifest()
    pages = spark.read.parquet(m["pages_path"]).select(
        F.col("url").alias("url_final"), "text"
    )
    # the rendered document is url_final (post-redirect-chain)
    fetched = engine.table("fetches").filter(F.col("code") == 200)
    joined = fetched.join(pages, "url_final").select(
        "url_final", "extracted_text", "text"
    )
    bad = joined.filter(
        F.col("extracted_text") != F.col("text")
    ).count()
    assert bad == 0
    assert joined.count() > 0


def test_redirect_chains_match(crawl_outputs):
    """K2/J5: engine redirect_chain (per requested url) == simulator
    chain walk; chains are present and non-trivial in the corpus."""
    engine, sim, _ = crawl_outputs
    rows = (
        engine.table("fetches")
        .filter((F.col("repetition") == 1) & (F.size("redirect_chain") > 0))
        .select("task_id", "url", "url_final", "redirect_chain")
        .collect()
    )
    got = {
        (r.task_id, r.url): (
            r.url_final,
            [(h.url, h.code, h.location) for h in r.redirect_chain],
        )
        for r in rows
    }
    assert got == sim.chains
    assert len(got) > 0, "corpus should exercise redirects"
    assert any(len(c) >= 2 for (_, c) in got.values()), "2-hop chain"
    assert any(f is None for (f, _) in got.values()), "broken chain"


def test_throughput_metric_present(crawl_outputs):
    _, _, stats = crawl_outputs
    assert all("urls_per_sec" in s for s in stats)
    assert sum(s["scheduled"] for s in stats) > 0
