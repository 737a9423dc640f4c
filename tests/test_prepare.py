"""End-to-end corpus preparation: every stage non-vacuous and the counters
arithmetic consistent, on the deterministic 500-page corpus."""

import math

from pyspark.sql import functions as F

from pii_detection_redaction_spark.plans.prepare import prepare_corpus
from pii_detection_redaction_spark.testing.corpus import ensure_pages_parquet


def test_prepare_corpus_end_to_end(spark, tmp_path):
    c = prepare_corpus(spark, ensure_pages_parquet(), str(tmp_path / "out"))
    # stage 1: the pinned pipeline counters (verify-skill goldens, corpus v8)
    assert c["docs_seen"] == 500 and c["docs_kept"] == 335
    assert c["entities_scrubbed"] == 596 and c["tox_masked"] == 33
    # stage 2/3: corpus has no byte-identical dups; the planted near-dup
    # families ARE removed (transitively, in O(log d) CC rounds)
    assert c["exact_dups_removed"] == 0
    assert c["near_dups_removed"] > 0
    assert c["cc_rounds"] <= 4
    # stage 4: the planted 30-37-token boilerplate lines get excised
    assert c["exsub_chars_removed"] > 0
    # stage 5 skipped (no budgets): nothing sampled out
    assert c["docs_sampled_out"] == 0
    assert c["docs_final"] == c["docs_kept"] - c["near_dups_removed"]
    # stage 6: shards fill to ~shard_tokens (greedy fill, oversized spill):
    # shard count within 1 of ceil(total/2000)
    want = math.ceil(c["total_tokens"] / 2000)
    assert abs(c["n_shards"] - want) <= 1
    # the written table is readable and consistent with the counters
    out = spark.read.parquet(str(tmp_path / "out" / "final"))
    assert out.count() == c["docs_final"]
    assert {r.lang_pred for r in out.select("lang_pred").distinct().collect()} >= {
        "en", "de"
    }


def test_prepare_corpus_with_budgets(spark, tmp_path):
    c = prepare_corpus(
        spark,
        ensure_pages_parquet(),
        str(tmp_path / "out"),
        budgets={"en": 30_000, "fr": 5_000},
    )
    out = spark.read.parquet(str(tmp_path / "out" / "final"))
    mix = {
        r.lang_pred: r.toks
        for r in out.groupBy("lang_pred")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    }
    # mixture spec names what goes in: only budgeted languages survive
    assert set(mix) == {"en", "fr"}
    # realized token mass concentrates under/near each budget
    assert mix["en"] <= 30_000 * 1.2 and mix["en"] >= 30_000 * 0.6
    assert mix["fr"] <= 5_000 * 1.2
    assert c["docs_sampled_out"] > 0


def test_prepare_corpus_quality_threshold_gate(spark, tmp_path):
    """--quality-threshold drops rule-kept docs the classifier scores low,
    WITHOUT touching the frozen rule keep/drop counters (kept docs mean
    ~0.58, dropped ~0.16 on this corpus — a 0.5 gate bites)."""
    c = prepare_corpus(
        spark,
        ensure_pages_parquet(),
        str(tmp_path / "out"),
        quality_threshold=0.5,
    )
    assert c["docs_seen"] == 500 and c["docs_kept"] + c["model_gated_out"] == 335
    assert 0 < c["model_gated_out"] < 335
    out = spark.read.parquet(str(tmp_path / "out" / "final"))
    assert out.agg(F.min("quality_prob")).collect()[0][0] >= 0.5


def test_prepare_corpus_jsonl_export(spark, tmp_path):
    c = prepare_corpus(
        spark,
        ensure_pages_parquet(),
        str(tmp_path / "out"),
        output_format="jsonl",
    )
    import glob
    import gzip
    import json

    files = glob.glob(str(tmp_path / "out" / "final_jsonl" / "*.json.gz"))
    assert files
    n = 0
    for f in files:
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            for line in fh:
                row = json.loads(line)
                assert "scrubbed_text" in row and "shard_id" in row
                n += 1
    assert n == c["docs_final"]


def test_prepare_corpus_decontamination(spark, tmp_path):
    """--decontam drops prepared docs sharing an n-gram with the eval set:
    plant an eval parquet built from three final docs' own text, re-prepare,
    and those urls must be gone with the counter balancing exactly."""
    base = prepare_corpus(spark, ensure_pages_parquet(), str(tmp_path / "o1"))
    final1 = spark.read.parquet(str(tmp_path / "o1" / "final"))
    planted = (
        final1.select("url", "scrubbed_text")
        # longest docs: guaranteed >= NGRAM_N words, deterministic tiebreak
        .orderBy(F.length("scrubbed_text").desc(), "url")
        .limit(3)
        .collect()
    )
    eval_path = str(tmp_path / "eval.parquet")
    spark.createDataFrame(
        [(r["scrubbed_text"],) for r in planted], "text string"
    ).write.parquet(eval_path)

    c = prepare_corpus(
        spark,
        ensure_pages_parquet(),
        str(tmp_path / "o2"),
        decontam_path=eval_path,
    )
    out = spark.read.parquet(str(tmp_path / "o2" / "final"))
    planted_urls = {r["url"] for r in planted}
    assert out.filter(F.col("url").isin(*planted_urls)).count() == 0
    # at least the three planted docs go; near-dup family members sharing
    # their grams may legitimately go with them
    assert c["decontaminated_out"] >= 3
    assert (
        c["docs_final"]
        == c["docs_kept"] - c["near_dups_removed"] - c["decontaminated_out"]
    )
    # without the flag the counter is zero and arithmetic unchanged
    assert base["decontaminated_out"] == 0
    assert base["docs_final"] == base["docs_kept"] - base["near_dups_removed"]


def test_ingest_increment_admits_only_never_seen(spark, tmp_path):
    import re

    from pii_detection_redaction_spark.operators.web import canonical_url_col
    from pii_detection_redaction_spark.plans.ingest import ingest_increment
    from pii_detection_redaction_spark.testing.corpus import ensure_batch_parquet

    root = str(tmp_path / "corpus")
    prepare_corpus(spark, ensure_pages_parquet(), root)
    c = ingest_increment(spark, ensure_batch_parquet(), root, "day2")
    # the batch is pages 450-550: half overlaps history (some under
    # re-spelled URLs that only canonicalization collapses), half is new
    assert c["docs_seen"] == 100
    assert c["url_dups_skipped"] > 0
    assert c["docs_ingested"] > 0
    assert (
        c["docs_ingested"]
        == c["docs_kept"] - c["url_dups_skipped"] - c["content_dups_skipped"]
        - c["increment_exact_dups_removed"] - c["increment_near_dups_removed"]
    )
    assert c["increment_near_dups_removed"] == 1  # 511~531 collapse in-batch
    hist = {
        r.k
        for r in spark.read.parquet(root + "/final")
        .select(canonical_url_col().alias("k"))
        .collect()
    }
    inc = spark.read.parquet(root + "/increments/day2/final")
    inc_keys = [r.k for r in inc.select(canonical_url_col().alias("k")).collect()]
    assert hist.isdisjoint(inc_keys)
    # every ingested page is from the genuinely-new half (id >= 500)
    for r in inc.select("url").collect():
        assert int(re.search(r"page-(\d+)", r.url).group(1)) >= 500
    assert c["decontaminated_out"] == 0

    # decontamination gates ingest exactly like prepare: an eval set built
    # from one ingested doc's own text keeps that doc out of a fresh run
    target = (
        inc.orderBy(F.length("scrubbed_text").desc(), "url").limit(1).collect()[0]
    )
    eval_path = str(tmp_path / "eval.parquet")
    spark.createDataFrame(
        [(target["scrubbed_text"],)], "text string"
    ).write.parquet(eval_path)
    root2 = str(tmp_path / "corpus2")
    prepare_corpus(spark, ensure_pages_parquet(), root2)
    c2 = ingest_increment(
        spark, ensure_batch_parquet(), root2, "day2", decontam_path=eval_path
    )
    assert c2["decontaminated_out"] >= 1
    inc2 = spark.read.parquet(root2 + "/increments/day2/final")
    assert inc2.filter(F.col("url") == target["url"]).count() == 0
    assert c2["docs_ingested"] == c["docs_ingested"] - c2["decontaminated_out"]


def test_compact_corpus_removes_cross_batch_near_dups(spark, tmp_path):
    """Family 8 (pages 491/511/531, one marker token apart) straddles the
    base/increment boundary: 491 lives in the base corpus, 511+531 arrive
    in the increment (new URLs, so ingestion rightly admits them).
    Compaction's corpus-wide near-dedup collapses the family to one
    keeper."""
    import re

    from pii_detection_redaction_spark.plans.ingest import (
        compact_corpus,
        ingest_increment,
    )
    from pii_detection_redaction_spark.testing.corpus import ensure_batch_parquet

    root = str(tmp_path / "corpus")
    prepare_corpus(spark, ensure_pages_parquet(), root)
    ingest_increment(spark, ensure_batch_parquet(), root, "day2")
    c = compact_corpus(spark, root, "c1")
    # 511/531 already collapsed inside the increment; the survivor and the
    # base corpus's 491 are the remaining cross-batch pair
    assert c["cross_near_dups_removed"] == 1
    assert c["docs_out"] == c["docs_in"] - 1
    out = spark.read.parquet(root + "/compacted/c1/final")
    fam = [
        int(re.search(r"page-(\d+)", r.url).group(1))
        for r in out.select("url").collect()
        if re.search(r"page-(491|511|531)(\D|$)", r.url)
    ]
    assert len(fam) == 1  # exactly one family member survives
    # shard packing is fresh and consistent
    assert c["n_shards"] >= 1 and c["total_tokens"] > 0


def test_ingest_content_gate_covers_prior_increments(spark, tmp_path):
    """A page ingested by increment day2 and re-crawled by day3 under a NEW
    canonical URL (content unchanged) must be skipped by the content gate —
    which therefore has to cover prior increments' finals, not just the
    base corpus. Also: re-ingesting day2's whole batch as day3 admits
    nothing (the seen-URL registry spans increments)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pii_detection_redaction_spark.plans.ingest import ingest_increment
    from pii_detection_redaction_spark.testing.corpus import (
        ensure_batch_parquet,
        page_row,
    )

    root = str(tmp_path / "corpus")
    prepare_corpus(spark, ensure_pages_parquet(), root)
    c2 = ingest_increment(spark, ensure_batch_parquet(), root, "day2")
    assert c2["docs_ingested"] > 0

    # day3a: the same batch again — every canonical URL is now registered
    c3 = ingest_increment(spark, ensure_batch_parquet(), root, "day3a")
    assert c3["docs_ingested"] == 0 and c3["url_dups_skipped"] == c3["docs_kept"]

    # day3b: one day2-ingested page under a brand-new URL, content identical
    inc = spark.read.parquet(root + "/increments/day2/final")
    some_url = sorted(r.url for r in inc.select("url").collect())[0]
    i = int(some_url.rsplit("page-", 1)[1].split("?")[0])
    r = page_row(i)
    r["url"] = "https://moved.example.new/relocated-page"
    df = pd.DataFrame([r])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], utc=True).dt.tz_localize(None)
    from pii_detection_redaction_spark.testing.corpus import _pages_schema

    p = str(tmp_path / "day3b.parquet")
    pq.write_table(
        pa.Table.from_pandas(df, schema=_pages_schema(), preserve_index=False), p
    )
    c3b = ingest_increment(spark, p, root, "day3b")
    assert c3b["docs_kept"] == 1
    assert c3b["url_dups_skipped"] == 0  # genuinely new URL
    assert c3b["content_dups_skipped"] == 1  # caught by the increment-aware gate
    assert c3b["docs_ingested"] == 0
