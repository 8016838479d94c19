"""Round-5 pins: one test per VERDICT-r4 / ADVICE-r4 item closed this
round."""

import os

import pytest

from conftest import SF_SMOKE as SF


def test_simhash_near_pairs_wide_recall(spark, tmp_path):
    """Manku pigeonhole recall at PRODUCTION parameters (VERDICT r4
    item 1): 63-bit hash, 4 x 16-bit bands, k=3 < 4 bands. The banded
    join must produce EXACTLY the brute-force set of hamming<=3 pairs
    — including planted near-dup families whose hashes differ in only
    a few bits — and, unlike the saturated 16-bit twin, candidate
    volume collapses to ~the true near-dups."""
    from parsee_pdf_reader_spark.operators.dedup import (
        _toks, q_simhash_near_pairs_wide, simhash_col,
    )

    d = str(tmp_path)
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    rows = [(r.doc_id, r.text) for r in base.select("doc_id", "text")
            .collect()]
    nxt = max(i for i, _ in rows) + 1
    planted = []
    for k in range(4):
        # near-dup family: same long text +- one trailing token — at
        # 63 bits the frequency-weighted hash moves only a few bits
        t = rows[k][1]
        planted.append((nxt + 2 * k, t))
        planted.append((nxt + 2 * k + 1, t + " zq"))
    spark.createDataFrame(rows + planted, "doc_id long, text string") \
        .write.parquet(os.path.join(d, "documents.parquet"))

    got = {(r.doc_a, r.doc_b): r.hamming
           for r in q_simhash_near_pairs_wide(spark, d).collect()}
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    hs = {r.doc_id: r.sh for r in docs.select(
        "doc_id", simhash_col(_toks(), 63).alias("sh")).collect()}
    ids = sorted(hs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(hs[a] ^ hs[b]).count("1")
            if ham <= 3:
                want[(a, b)] = ham
    assert got == want
    # the exact-dup copies of the planted bases must be found
    for k in range(4):
        assert (rows[k][0], nxt + 2 * k) in got
    # wide bands are NOT saturated: pairs ~ dups, not ~C(n,2)/16
    n = len(ids)
    assert len(got) < n * (n - 1) / 2 / 16


def test_stream_neardup_same_batch_one_survivor(spark, tmp_path):
    """VERDICT r4 item 2 / ADVICE r4: two near-dups arriving in the
    SAME micro-batch must leave exactly ONE survivor (the min doc_id),
    never zero. Round 4's dropDuplicatesWithinWatermark picked an
    arbitrary per-bucket winner, so the pair could split band
    ownership and both drop; the min-claim windowed aggregation is
    arrival-order-free. All three docs land in one file = one
    micro-batch."""
    import datetime

    from parsee_pdf_reader_spark.streaming.incremental import (
        run_stream_neardup,
    )

    inp = os.path.join(str(tmp_path), "docs_stream")
    outp = os.path.join(str(tmp_path), "neardup")
    ck = os.path.join(str(tmp_path), "ck")
    os.makedirs(inp)
    t0 = datetime.datetime(2025, 6, 1, 10, 0, 0)

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank today")
    near = ("the quick brown fox jumps over the lazy dog near the "
            "river bank tonight")
    other = ("completely different content about quarterly revenue "
             "and operating expenses growth")
    schema = ("doc_id long, ingest_ts timestamp, text string, "
              "lang string")
    b1 = [(7, t0, base, "en"),
          (8, t0 + datetime.timedelta(minutes=1), near, "en"),
          (9, t0 + datetime.timedelta(minutes=2), other, "en")]
    b2 = [(99, t0 + datetime.timedelta(hours=3), "late sentinel", "en")]
    for batch in (b1, b2):
        spark.createDataFrame(batch, schema).coalesce(1) \
            .write.mode("append").parquet(inp)

    # sanity: the pair IS a near-dup family under the band arithmetic
    from parsee_pdf_reader_spark.operators.dedup import (
        minhash_band_hashes,
    )
    from pyspark.sql import functions as F
    bh = spark.createDataFrame(b1, schema).select(
        "doc_id", F.explode(minhash_band_hashes("text")).alias("x"))
    shared = (bh.groupBy("x").count().where("count > 1").count())
    assert shared >= 1

    q = run_stream_neardup(spark, inp, outp, ck,
                           max_files_per_trigger=1)
    q.awaitTermination(180)
    kept = {r.doc_id for r in spark.read.parquet(outp).collect()}
    assert 7 in kept, kept        # min doc_id of the family survives
    assert 8 not in kept, kept    # its same-batch near-dup drops
    assert 9 in kept, kept        # unrelated doc untouched


def test_stream_neardup_audit_side_output(spark, tmp_path):
    """ADVICE r4: the audit variant routes band-losing docs to a side
    output (survived=false) instead of silently dropping them, so a
    false-positive band collision can be re-checked by the batch
    verifier. Same corpus as the same-batch test: doc 8 loses >=1
    band to doc 7 and must surface with survived=false."""
    import datetime

    from parsee_pdf_reader_spark.streaming.incremental import (
        stream_dedup_neardup_audit,
    )

    inp = os.path.join(str(tmp_path), "docs_stream")
    outp = os.path.join(str(tmp_path), "audit")
    ck = os.path.join(str(tmp_path), "ck")
    os.makedirs(inp)
    t0 = datetime.datetime(2025, 6, 1, 10, 0, 0)
    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank today")
    near = ("the quick brown fox jumps over the lazy dog near the "
            "river bank tonight")
    schema = ("doc_id long, ingest_ts timestamp, text string, "
              "lang string")
    b1 = [(7, t0, base, "en"),
          (8, t0 + datetime.timedelta(minutes=1), near, "en")]
    b2 = [(99, t0 + datetime.timedelta(hours=3), "late sentinel", "en")]
    for batch in (b1, b2):
        spark.createDataFrame(batch, schema).coalesce(1) \
            .write.mode("append").parquet(inp)

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", "1").parquet(inp))
    q = (stream_dedup_neardup_audit(src)
         .writeStream.format("parquet").option("path", outp)
         .option("checkpointLocation", ck).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = {r.doc_id: r for r in spark.read.parquet(outp).collect()}
    assert rows[7].survived and rows[7].n_bands > 0
    assert 8 in rows and not rows[8].survived, rows.get(8)
    assert 0 < rows[8].n_bands < rows[7].n_bands


def test_stream_extract_to_catalog_table(spark, tmp_path):
    """r5: the streaming sink dispatches like the batch sink — a table
    identifier streams through writeStream.toTable (the Iceberg
    streaming-append path; session catalog in-sandbox)."""
    from parsee_pdf_reader_spark.sources.synth import (
        synthesize_pages_df,
    )
    from parsee_pdf_reader_spark.streaming.incremental import (
        stream_extract,
    )

    inp = os.path.join(str(tmp_path), "pages_in")
    ck = os.path.join(str(tmp_path), "ck")
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .where("doc_id < 12")
    synthesize_pages_df(spark, docs).write.parquet(inp)
    tbl = "r5_stream_extracted"
    spark.sql(f"drop table if exists {tbl}")
    try:
        q = stream_extract(spark, inp, tbl, ck)
        q.awaitTermination(180)
        got = spark.read.table(tbl)
        assert got.count() > 0
        assert "extracted_text" in got.columns or "url" in got.columns
    finally:
        spark.sql(f"drop table if exists {tbl}")


def test_cc_label_prop_escalates_to_star_on_long_chain(spark):
    """VERDICT r4 item 5: a component whose diameter exceeds the
    label_prop round budget (path graph of 30 nodes > _CC_MAX_ITERS=25
    rounds) must CONVERGE via automatic escalation to the star
    contraction instead of raising — same labels (min doc_id), correct
    sizes, stats recording both phases."""
    from parsee_pdf_reader_spark.operators.dedup import (
        _CC_MAX_ITERS, connected_components_df,
    )

    n = _CC_MAX_ITERS + 5
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    stats = {}
    rows = connected_components_df(pairs, stats=stats).collect()
    assert stats["algorithm"] == "label_prop->star", stats
    assert stats["escalated"] and stats["rounds"] == _CC_MAX_ITERS
    assert stats["star_rounds"] <= 7, stats
    assert len(rows) == n
    assert all(r.cluster_id == 0 and r.cluster_size == n for r in rows)


def test_tfidf_builds_without_running_a_job(spark):
    """VERDICT r4 minor: round 4 ran an eager driver-side
    ``docs.count()`` while BUILDING the tfidf DataFrame — one extra
    full-scan Spark job per invocation. The corpus count is now a
    one-row aggregate broadcast inside the plan, so construction
    submits ZERO SQL executions (and the oracle stays green, checked
    by the gate)."""
    import time

    from parsee_pdf_reader_spark.operators.textstats import (
        q_tfidf_top_terms,
    )

    store = spark._jsparkSession.sharedState().statusStore()
    before = store.executionsCount()
    q_tfidf_top_terms(spark, SF)  # build only, no action
    time.sleep(1.0)  # the status store updates asynchronously
    assert store.executionsCount() - before == 0


def test_sink_dispatch_iceberg_vs_parquet(spark, tmp_path):
    """VERDICT r4 item 6: the production sink path
    (writeTo().overwritePartitions() against a configured catalog)
    exists in code behind an explicit, testable dispatch; the sandbox
    exercises the parquet branch end-to-end and the decision logic for
    all three cases."""
    import pytest as _pytest

    from parsee_pdf_reader_spark.pipeline import (
        resolve_sink, write_partitioned,
    )

    # path -> parquet branch, real write, hive layout
    out = os.path.join(str(tmp_path), "sink")
    df = spark.range(4).selectExpr(
        "id", "cast(date_add(date'2025-06-01', cast(id % 2 as int)) "
        "as date) as ds")
    assert resolve_sink(spark, out) == ("parquet", out)
    assert write_partitioned(df, spark, out) == "parquet"
    parts = {p for p in os.listdir(out) if p.startswith("ds=")}
    assert parts == {"ds=2025-06-01", "ds=2025-06-02"}
    assert spark.read.parquet(out).count() == 4

    # table ident + configured catalog -> iceberg branch selected
    spark.conf.set("spark.sql.catalog.lake",
                   "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert resolve_sink(spark, "lake.db.pages") == \
            ("iceberg", "lake.db.pages")
    finally:
        spark.conf.unset("spark.sql.catalog.lake")

    # table ident, NO catalog -> loud error, never a fake parquet dir
    with _pytest.raises(ValueError, match="no catalog"):
        resolve_sink(spark, "nocat.db.pages")


def test_read_pages_dispatch(spark, tmp_path):
    """read_pages mirrors the sink dispatch: a path reads parquet, a
    bare identifier resolves through the catalog (temp view here;
    Iceberg catalogs resolve the same way), and a bad identifier gets
    Spark's own not-found error rather than a silent parquet guess."""
    from pyspark.sql.utils import AnalysisException

    from parsee_pdf_reader_spark.pipeline import read_pages

    p = os.path.join(str(tmp_path), "pages")
    spark.range(3).write.parquet(p)
    assert read_pages(spark, p).count() == 3
    spark.range(5).createOrReplaceTempView("r5_pages_tbl")
    try:
        assert read_pages(spark, "r5_pages_tbl").count() == 5
    finally:
        spark.catalog.dropTempView("r5_pages_tbl")
    import pytest as _pytest
    with _pytest.raises(AnalysisException):
        read_pages(spark, "no_such_table_r5").collect()


def test_dedup_stack_planted_recall(spark, tmp_path):
    """VERDICT r4 item 8: seeded corpus with planted near-dup families
    -> every shipped candidate generator (MinHash-LSH, the verified
    pipeline, wide SimHash bands) finds 100% of the planted pairs at
    the SHIPPED batch parameters."""
    from parsee_pdf_reader_spark.operators.evaluation import (
        dedup_recall_report, plant_near_dup_corpus,
    )

    d = str(tmp_path)
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80)
    planted = plant_near_dup_corpus(spark, docs, d, n_families=12)
    assert planted.count() == 12
    report = {r.method: r for r in
              dedup_recall_report(spark, d, planted).collect()}
    assert set(report) == {"minhash_lsh", "minhash_lsh_verified",
                           "simhash_wide_bands"}
    for name, r in report.items():
        assert r.n_planted == 12, r
        assert r.recall == 1.0, (name, r)
        assert r.n_emitted >= r.n_found
    # MinHash's contract covers every planted one-token edit
    assert report["minhash_lsh"].n_eligible == 12
    assert report["minhash_lsh_verified"].n_eligible == 12
    # the simhash envelope (hamming<=3 of the 63-bit hash) must be
    # non-vacuous — several planted edits land inside it
    assert report["simhash_wide_bands"].n_eligible >= 4


def test_dedup_recall_exact_dups_invariant(spark):
    """The gate-registered recall invariant: planted exact duplicates
    must be found by every candidate generator with recall exactly
    1.0 (identical text -> identical signatures -> same bands)."""
    from parsee_pdf_reader_spark.operators.evaluation import (
        q_dedup_recall_exact_dups,
    )

    rows = {r.method: r for r in
            q_dedup_recall_exact_dups(spark, SF).collect()}
    assert set(rows) == {"minhash_lsh", "simhash_wide_bands"}
    for r in rows.values():
        assert r.n_truth == 30 and r.n_found == 30 and r.recall == 1.0


def test_kmeans_r3_refines_beyond_r1(spark):
    """r5: the three-round gate row is non-vacuous — iteration moves a
    meaningful fraction of assignments past the one-round oracle, and
    total within-cluster distance does not increase (Lloyd
    monotonicity on the same seed)."""
    from pyspark.sql import functions as F

    from parsee_pdf_reader_spark.operators.similarity import (
        q_kmeans_assign, q_kmeans_assign_r3,
    )

    r1 = {r.vec_id: (r.cluster, r.dist)
          for r in q_kmeans_assign(spark, SF).collect()}
    r3 = {r.vec_id: (r.cluster, r.dist)
          for r in q_kmeans_assign_r3(spark, SF).collect()}
    assert set(r1) == set(r3)
    moved = sum(1 for k in r1 if r1[k][0] != r3[k][0])
    assert moved > 0
    assert sum(d for _c, d in r3.values()) <= \
        sum(d for _c, d in r1.values()) + 1e-6


def test_pii_redaction_behavior(spark, tmp_path):
    """r5 PII scrub: emails/IPs/phones replaced with typed tokens,
    counts accurate, application order prevents the phone pattern
    from swallowing already-redacted digit runs."""
    from parsee_pdf_reader_spark.operators.textstats import (
        q_text_redact_pii,
    )

    d = str(tmp_path)
    rows = [
        (1, "contact jane.doe+x@ex-ample.org or 10.0.255.7 today"),
        (2, "call +1 415 555 0199 or (020) 7946-0958 now"),
        (3, "no pii here at all"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r.doc_id: r for r in q_text_redact_pii(spark, d).collect()}
    assert got[1].n_emails == 1 and got[1].n_ipv4 == 1
    assert "<EMAIL>" in got[1].redacted and "<IP>" in got[1].redacted
    assert "@" not in got[1].redacted
    assert got[2].n_phones >= 1 and "<PHONE>" in got[2].redacted
    assert got[3].redacted == rows[2][1]
    assert got[3].n_emails == got[3].n_ipv4 == got[3].n_phones == 0


def test_pii_redaction_matches_python_re(spark, tmp_path):
    """Randomized cross-check: Spark's (Java-regex) redaction must
    byte-match a pure-Python `re` reference on 80 seeded strings mixing
    emails, IPs, phone runs, and near-miss noise — the driver gate
    corpus contains no real PII, so this test carries the semantic
    load for PII-shaped inputs. The patterns are restricted to the
    Java/RE2/`re`-agreeing subset, and this proves it empirically for
    Java vs `re` (the gate proves Java vs RE2 on clean text)."""
    import random
    import re as pyre

    from parsee_pdf_reader_spark.operators.textstats import (
        _PII_EMAIL, _PII_IPV4, _PII_PHONE, q_text_redact_pii,
    )

    rng = random.Random(7)
    frags = [
        "plain words here", "a.b+c_d@mail-host.example.com",
        "user@sub.domain.org", "not@an@email", "10.0.0.1",
        "999.999.1.2", "1.2.3.4.5", "+44 20 7946 0958",
        "(415) 555-0199", "12345", "v1.2.3", "x@y.z",
        "tel: 0049 (0)30 123456", "a@b.co", "semver 10.20.30",
        "... 172.16.254.3 ...", "+-+-", "e@e.ee e@e.ee",
    ]
    rows = []
    for i in range(80):
        k = rng.randint(1, 6)
        rows.append((i, " ".join(rng.choice(frags) for _ in range(k))))
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r.doc_id: r for r in q_text_redact_pii(spark, d).collect()}

    for i, text in rows:
        t1 = pyre.sub(_PII_EMAIL, "<EMAIL>", text)
        t2 = pyre.sub(_PII_IPV4, "<IP>", t1)
        want = pyre.sub(_PII_PHONE, "<PHONE>", t2)
        g = got[i]
        assert g.redacted == want, (text, g.redacted, want)
        assert g.n_emails == len(pyre.findall(_PII_EMAIL, text))
        assert g.n_ipv4 == len(pyre.findall(_PII_IPV4, text))
        assert g.n_phones == len(pyre.findall(_PII_PHONE, t2))

    # and the RE2 engine (DuckDB twin) agrees on the SAME pii-laden
    # corpus — the driver gate only ever feeds it clean synth text
    import duckdb

    from parsee_pdf_reader_spark.plans.queries import REGISTRY

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"parquet_scan('{os.path.join(d, 'documents.parquet')}"
        "/*.parquet')")
    duck = {r[0]: r for r in con.execute(
        REGISTRY["text_redact_pii"][1]).fetchall()}
    for i, _text in rows:
        g = got[i]
        assert duck[i][1:] == (g.n_emails, g.n_ipv4, g.n_phones,
                               g.redacted), (i, duck[i], g)


def test_doc_sentences_ordinals(spark, tmp_path):
    """r5 sentence segmentation: stable 0-based ordinals from split
    position, terminators stripped, empties dropped."""
    from parsee_pdf_reader_spark.operators.textstats import (
        q_doc_sentences,
    )

    d = str(tmp_path)
    spark.createDataFrame(
        [(1, "One two. Three four! Five?  Six")],
        "doc_id long, text string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = sorted((r.sent_idx, r.sentence)
                 for r in q_doc_sentences(spark, d).collect())
    assert got == [(0, "One two"), (1, "Three four"),
                   (2, "Five"), (3, "Six")]


def test_sentence_boilerplate_flags_planted_template(spark, tmp_path):
    """r5 C4-style line dedup signal: a sentence planted across >= 3
    docs is boilerplate; unique sentences are not. (The synth gate
    corpus has no cross-doc repeated sentences, so this test carries
    the behavioral load.)"""
    from parsee_pdf_reader_spark.operators.textstats import (
        q_sentence_boilerplate,
    )

    d = str(tmp_path)
    nav = "Subscribe to our newsletter today."
    rows = [(i, f"{nav} Unique body text number {i} here.")
            for i in range(5)]
    rows.append((99, "Totally standalone document. Two sentences."))
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r.doc_id: r for r in
           q_sentence_boilerplate(spark, d).collect()}
    for i in range(5):
        assert got[i].n_sents == 2 and got[i].n_boiler == 1
        assert abs(got[i].boiler_frac - 0.5) < 1e-9
    assert got[99].n_boiler == 0 and got[99].boiler_frac == 0.0


def test_seq_pack_plan_invariants(spark):
    """r5 sequence packing: per shard, docs fill packs greedily in
    doc_id order — offsets stay under the budget, packs never exceed
    budget + one doc's tokens (docs are unsplit), pack ids are
    monotone in doc_id, and every doc appears exactly once."""
    from collections import defaultdict

    from parsee_pdf_reader_spark.operators.textstats import (
        _PACK_BUDGET, q_seq_pack_plan,
    )

    rows = q_seq_pack_plan(spark, SF).collect()
    n_docs = (spark.read.parquet(f"{SF}/documents.parquet").count())
    assert len(rows) == n_docs
    by_shard = defaultdict(list)
    for r in rows:
        assert 0 <= r.offset_in_pack < _PACK_BUDGET
        by_shard[r.shard].append(r)
    packs = defaultdict(int)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        last_pack = -1
        for r in rs:
            assert r.pack_id >= last_pack  # monotone fill order
            last_pack = r.pack_id
            packs[(shard, r.pack_id)] += r.n_tokens
    max_doc = max(r.n_tokens for r in rows)
    assert max(packs.values()) < _PACK_BUDGET + max_doc
    assert len(packs) > n_docs * 40 // _PACK_BUDGET  # non-degenerate


def test_corpus_sample_deterministic_and_stratified(spark):
    """r5 sampling plan: decisions are a pure function of doc_id (two
    runs identical), per-language keep fractions track the configured
    rates, and the oracle arithmetic (md5 u32 draw) matches the
    shipped thresholds."""
    from pyspark.sql import functions as F

    from parsee_pdf_reader_spark.operators.curation import (
        _SAMPLE_DEFAULT, _SAMPLE_RATES, q_corpus_sample,
    )

    a = q_corpus_sample(spark, SF).collect()
    b = q_corpus_sample(spark, SF).collect()
    assert {(r.doc_id, r.sampled) for r in a} == \
        {(r.doc_id, r.sampled) for r in b}
    stats = (q_corpus_sample(spark, SF)
             .groupBy("lang", "sample_rate")
             .agg(F.avg(F.col("sampled").cast("int")).alias("frac"),
                  F.count(F.lit(1)).alias("n")).collect())
    for r in stats:
        want = _SAMPLE_RATES.get(r.lang, _SAMPLE_DEFAULT)
        assert r.sample_rate == want
        # binomial noise bound at these n (>=60 per lang): 4 sigma
        sigma = (want * (1 - want) / r.n) ** 0.5
        assert abs(r.frac - want) < 4 * sigma + 1e-9, (r.lang, r.frac)


def test_decontam_flags_planted_benchmark_copy(spark, tmp_path):
    """r5 decontamination: a training doc that embeds a benchmark
    doc's text must be flagged contaminated; clean docs (templated
    boilerplate overlap only) must NOT trip the 8-gram threshold."""
    from parsee_pdf_reader_spark.operators.curation import (
        _BENCH_MAX_ID, q_decontam_ngram_overlap,
    )

    d = str(tmp_path)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench_text = docs.where(f"doc_id = {_BENCH_MAX_ID - 1}") \
        .collect()[0].text
    next_id = 100000
    leaked = [(next_id, "intro words then " + bench_text + " outro")]
    corpus = docs.select("doc_id", "text", "lang").unionByName(
        spark.createDataFrame(
            [(i, t, "en") for i, t in leaked],
            "doc_id long, text string, lang string"))
    corpus.write.parquet(os.path.join(d, "documents.parquet"))
    rows = {r.doc_id: r for r in
            q_decontam_ngram_overlap(spark, d).collect()}
    assert rows[next_id].contaminated, rows[next_id]
    # 8-gram shingles keep the false-trip rate low on templated text
    n_contam = sum(1 for r in rows.values() if r.contaminated)
    assert n_contam <= len(rows) * 0.05, n_contam


def _font_pdf(content: str, font_body: bytes) -> bytes:
    """Minimal 1-page PDF with a single parameterized /F1 font."""
    objs = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        (b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
         b"/Resources<</Font<</F1 5 0 R>>>>/Contents 4 0 R>>"),
        (f"<</Length {len(content)}>>\nstream\n{content}\nendstream"
         ).encode(),
        font_body,
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<</Size {len(objs) + 1}/Root 1 0 R>>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def test_symbol_afm_advances_and_builtin_encoding():
    """VERDICT r4 item 3 'done' criterion: a Symbol font with NO
    /Widths must (a) decode bytes through the font's BUILT-IN encoding
    (0x61 is alpha, not 'a'; 0xB9 is notequal) and (b) advance every
    glyph by the published Symbol AFM metric."""
    from test_pdf_mini_units import _pdf_chars

    from parsee_pdf_reader_spark.sources.afm14 import STD14_WIDTHS

    # 'a' 'b' 'g' -> alpha beta gamma; \271 (0xB9) -> notequal
    pdf = _font_pdf(
        "BT /F1 10 Tf 1 0 0 1 72 700 Tm (abg\\271) Tj ET",
        b"<</Type/Font/Subtype/Type1/BaseFont/Symbol>>")
    chars = _pdf_chars(pdf)
    assert [c.text for c in chars] == ["α", "β", "γ", "≠"]
    afm = STD14_WIDTHS["Symbol"]
    assert [afm[c.text] for c in chars] == [631, 549, 411, 549]
    x = 72.0
    for c in chars:
        adv = afm[c.text] * 10 / 1000.0
        assert abs(c.x0 - x) < 5e-3, (c.text, c.x0, x)
        assert abs(c.x1 - (x + adv)) < 5e-3, (c.text, c.x1, x + adv)
        x += adv


def test_latin1_extras_afm_advances():
    """VERDICT r4 item 3 (full-Latin AFM): WinAnsi bytes beyond ASCII
    (emdash 0x97, germandbls 0xDF, questiondown 0xBF, onehalf 0xBD)
    must advance by their published AFM widths, not the 500
    MissingWidth fallback round 4 applied."""
    from test_pdf_mini_units import _pdf_chars

    from parsee_pdf_reader_spark.sources.afm14 import STD14_WIDTHS

    pdf = _font_pdf(
        "BT /F1 10 Tf 1 0 0 1 72 700 Tm (\\227\\337\\277\\275) Tj ET",
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica"
        b"/Encoding/WinAnsiEncoding>>")
    chars = _pdf_chars(pdf)
    assert [c.text for c in chars] == ["—", "ß", "¿", "½"]
    afm = STD14_WIDTHS["Helvetica"]
    assert ([afm[c.text] for c in chars] == [1000, 611, 611, 834])
    x = 72.0
    for c in chars:
        adv = afm[c.text] * 10 / 1000.0
        assert abs(c.x1 - (x + adv)) < 5e-3, (c.text, c.x1, x + adv)
        x += adv
