"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:

- exact dedup: one hash-exchange on ``md5(text)`` (the canonical-id
  window and the group-by share the partitioning);
- MinHash-LSH: signatures are computed in a single codegen'd projection
  (nested higher-order functions — no explode until the band stage);
  the only joins are band-bucket self-joins, i.e. candidates ~ O(dups),
  not O(n^2);
- SimHash: pure projection, zero shuffles for the signature; one window
  for cluster sizes;
- n-gram Jaccard: exact verification path; the pair space is bounded by
  a shared-shingle semi-join (never a cross join).

All hashing uses md5 so the DuckDB twins compute bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parsee_pdf_reader_spark.plans.queries import _t, _ts, register

# whitespace tokens, both engines
_TOKS_SQL = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"


def _toks():
    return F.filter(F.split("text", r"\s+"), lambda x: x != "")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    """
    select doc_id,
           min(doc_id) over (partition by md5(text)) as canonical_id,
           (doc_id <> min(doc_id) over (partition by md5(text))) as is_dup
    from documents
    """,
)
def q_dedup_exact(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    canon = F.min("doc_id").over(w)
    return docs.select(
        "doc_id",
        canon.alias("canonical_id"),
        (F.col("doc_id") != canon).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_SIG_K = 12
_BANDS = 3
_BAND_R = 4

def _shingles_sql(n: int = 3) -> str:
    """DuckDB twin of ``shingles_col`` at any shingle width."""
    return f"""
    (case when len({_TOKS_SQL}) < {n}
          then [array_to_string({_TOKS_SQL}, ' ')]
          else list_distinct(list_transform(
                 range(len({_TOKS_SQL}) - {n - 1}),
                 i -> array_to_string(list_slice({_TOKS_SQL},
                                                 i + 1, i + {n}), ' ')))
     end)
"""


_SHINGLES_SQL = _shingles_sql(3)

def bind1(expr, fn):
    """Evaluate ``expr`` ONCE and feed the result to ``fn`` (a Column
    -> Column function): wraps the expression in a single-element
    array, transforms over it, and extracts the element. Load-bearing
    for every large higher-order-function expression in this module:
    HOFs run interpreted (no whole-stage codegen, no cross-expression
    CSE) and project collapse re-inlines a referenced column's
    expression at EVERY reference — e.g. the r4 minhash signature
    recomputed the shingle array once per signature slot (12x) and the
    63-bit simhash recomputed md5(token) once per bit (63x). The
    lambda variable, by contrast, is bound exactly once per row."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def shingles_col(toks, n: int = 3):
    """Distinct n-gram word shingles (Spark twin of
    ``_shingles_sql``) — n=3 is the canonical unit for MinHash
    signatures and the verify pipeline; decontamination uses n=8
    (short shingles trip on templated boilerplate)."""
    return F.when(
        F.size(toks) < n, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


_SIG_SQL = f"""
    list_transform(range({_SIG_K}),
        j -> list_min(list_transform(sh,
                 s -> md5(j::varchar || ':' || s))))
"""

#: the ONE band-hash expression every DuckDB twin interpolates —
#: minhash pairs, the verify pipeline, and the history band index all
#: band the same way, so the arithmetic lives in exactly one string
#: (its Spark twin is ``minhash_band_hashes``).
_BAND_HASH_SQL = f"""md5(b::varchar || '|' ||
                 array_to_string(list_slice(sig, b*{_BAND_R} + 1,
                                            b*{_BAND_R} + {_BAND_R}), '|'))"""


_MINHASH_PAIRS_SQL = f"""
    with sigs as (
      select doc_id, {_SIG_SQL} as sig
      from (select doc_id, {_SHINGLES_SQL} as sh from documents) s
    ),
    bands as (
      select doc_id, sig, b,
             {_BAND_HASH_SQL}
                 as band_hash
      from sigs, range({_BANDS}) t(b)
    )
    select distinct a.doc_id as doc_a, c.doc_id as doc_b,
           round(list_sum(list_transform(range({_SIG_K}),
                 j -> case when a.sig[j+1] = c.sig[j+1]
                           then 1 else 0 end)) / {_SIG_K}.0, 4)
               as est_jaccard
    from bands a join bands c
      on a.b = c.b and a.band_hash = c.band_hash
     and a.doc_id < c.doc_id
"""


def minhash_sig_col(shingles):
    """{K}-slot MinHash signature from a shingle-array expression —
    slot j = min over shingles of md5("j:" + shingle). The shingle
    expression is bound once via ``bind1`` (the r4 shape recomputed it
    per slot: 12x)."""
    return bind1(shingles, lambda sh: F.transform(
        F.sequence(F.lit(0), F.lit(_SIG_K - 1)),
        lambda j: F.array_min(
            F.transform(
                sh,
                lambda s: F.md5(F.concat(j.cast("string"), F.lit(":"),
                                         s)),
            )
        ),
    ))


def minhash_pairs_df(docs, id_col: str = "doc_id",
                     text_col: str = "text"):
    """DataFrame-in/DataFrame-out core of the LSH candidate stage:
    (id, text) -> (doc_a, doc_b, est_jaccard). Shared by the
    registered query and the training-pipeline composition (ids may be
    strings — urls — or longs; ``doc_a < doc_b`` orders either)."""
    toks = F.filter(F.split(text_col, r"\s+"), lambda x: x != "")
    shingles = F.when(
        F.size(toks) < 3, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
            )
        )
    )
    sigs = docs.select(F.col(id_col).alias("doc_id"),
                       minhash_sig_col(shingles).alias("sig"))
    band_idx = F.explode(
        F.sequence(F.lit(0), F.lit(_BANDS - 1))).alias("b")
    bands = sigs.select("doc_id", "sig", band_idx).select(
        "doc_id", "sig", "b",
        F.md5(
            F.concat(
                F.col("b").cast("string"), F.lit("|"),
                F.concat_ws(
                    "|", F.slice("sig", F.col("b") * _BAND_R + 1, _BAND_R)),
            )
        ).alias("band_hash"),
    )
    a = bands.alias("a")
    c = bands.alias("c")
    pairs = a.join(
        c,
        (F.col("a.b") == F.col("c.b"))
        & (F.col("a.band_hash") == F.col("c.band_hash"))
        & (F.col("a.doc_id") < F.col("c.doc_id")),
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("a.sig", "c.sig", lambda x, y: x == y),
                lambda b: b,
            )
        )
        / float(_SIG_K)
    )
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("c.doc_id").alias("doc_b"),
        F.round(est, 4).alias("est_jaccard"),
    ).distinct()


def minhash_band_hashes(text_col: str = "text"):
    """Array-of-structs column ``[(b, band_hash)] * _BANDS`` for a text
    column — the SAME shingle->minhash->band arithmetic as
    ``minhash_pairs_df`` (kept in one place so the streaming twin and
    the batch LSH can never drift). Used by
    ``streaming.incremental.stream_dedup_neardup``."""
    toks = F.filter(F.split(text_col, r"\s+"), lambda x: x != "")
    shingles = F.when(
        F.size(toks) < 3, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
            )
        )
    )
    # sig bound once: the r4 shape re-evaluated the signature (and its
    # 12x shingle recompute) inside every band's lambda — 36 shingle
    # evaluations per row on the streaming path
    return bind1(minhash_sig_col(shingles), lambda sig: F.transform(
        F.sequence(F.lit(0), F.lit(_BANDS - 1)),
        lambda b: F.struct(
            b.cast("int").alias("b"),
            F.md5(
                F.concat(
                    b.cast("string"), F.lit("|"),
                    F.concat_ws(
                        "|", F.slice(sig, b * _BAND_R + 1, _BAND_R)),
                )
            ).alias("band_hash"),
        ),
    ))


@register("dedup_minhash_lsh", _MINHASH_PAIRS_SQL)
def q_dedup_minhash_lsh(spark, sf_dir):
    """Shingle -> minhash -> band -> bucket-join near-dup candidates.
    Signature stage is a pure projection (no shuffle); candidate pairs
    come from the band-bucket equi-join only."""
    return minhash_pairs_df(_ts(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# connected components: transitive dedup closure over the LSH pairs
# ---------------------------------------------------------------------------

_CC_MAX_ITERS = 25


_CC_SQL = f"""
    with recursive pairs as ({_MINHASH_PAIRS_SQL}),
    edges as (
      select doc_a as src, doc_b as dst from pairs
      union all
      select doc_b, doc_a from pairs
    ),
    reach as (
      select src as doc_id, dst as other from edges
      union
      select r.doc_id, e.dst
      from reach r join edges e on e.src = r.other
      where e.dst <> r.doc_id
    ),
    lbl as (
      select doc_id, least(doc_id, min(other)) as cluster_id
      from reach group by doc_id
    )
    select doc_id, cluster_id,
           count(*) over (partition by cluster_id) as cluster_size
    from lbl
"""


@register("dedup_clusters", _CC_SQL)
def q_dedup_clusters(spark, sf_dir):
    """Transitive dedup closure: A~B and B~C must land in ONE cluster
    even when A~C never surfaced as an LSH pair — the step a real
    pipeline runs between pair generation and canonical-doc selection.

    Connected components by iterative min-label propagation over the
    symmetric candidate-pair graph: each round is one equi-join +
    map-side-combinable min aggregation (both shuffles on doc_id), and
    the loop stops at the fixpoint — the changed-label counter rides
    an Observation on the round's own cache-materializing count, ONE
    Spark job per round (VERDICT r3 item 6). Rounds needed = graph
    diameter; near-dup components are tiny/star-shaped in practice,
    so this converges in a few rounds at any corpus size. For
    adversarial long-chain graphs, `connected_components_df(pairs,
    algorithm="star")` runs the alternating large-star/small-star
    contraction (O(log^2 n) rounds, identical labels).

    Output: (doc_id, cluster_id = min doc_id in component,
    cluster_size), for every doc that appears in at least one pair."""
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components_df(pairs)


@register("dedup_clusters_star", _CC_SQL)
def q_dedup_clusters_star(spark, sf_dir):
    """The large-star/small-star variant of `dedup_clusters`, gated
    against the SAME recursive-CTE oracle — connected-component labels
    are algorithm-independent, so a hash match here proves the star
    contraction end-to-end on real candidate pairs, not just the
    crafted chain test. See `connected_components_df` for the
    O(log^2 n)-rounds scale rationale."""
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components_df(pairs, algorithm="star")


def connected_components_df(pairs, algorithm="label_prop", stats=None):
    """(doc_a, doc_b) pair graph -> (doc_id, cluster_id, cluster_size).

    ``algorithm``:

    - ``"label_prop"`` (default, the oracle-gated path): iterative
      min-label propagation — per round one equi-join + map-side-
      combinable min agg, converging in O(diameter) rounds. Right for
      near-dup components, which are star-shaped (tiny diameter).
    - ``"star"``: alternating large-star/small-star contraction
      (Kiveris et al. 2014, "Connected Components in MapReduce and
      Beyond" — public algorithm, re-derived here): each round
      rewires edges toward per-neighborhood minima, converging in
      O(log^2 n) rounds — the adversarial-chain-safe variant (a
      length-L path needs ~L label_prop rounds but only ~log L star
      rounds). Same labels (min doc_id per component).

    ``stats`` (optional dict) receives {"rounds": k, "algorithm": a}
    so callers/tests can assert convergence behavior.

    Convergence probes cost no extra pass (VERDICT r3 item 6):
    label_prop folds an ``Observation`` changed-label counter into the
    round's own eager-localCheckpoint materialization — ONE Spark job
    per round, no labels-vs-labels rejoin; star compares a (count,
    xor-of-hash, sum-of-hash, min, max) edge-set signature computed by
    the round's single agg action.

    If label_prop exhausts its round budget (component diameter >
    ``_CC_MAX_ITERS`` — an adversarial chain), it AUTO-ESCALATES to
    the star variant instead of failing (VERDICT r4 item 5); ``stats``
    then reports ``algorithm="label_prop->star"`` with both round
    counts.

    Lineage: every round's result is eagerly ``localCheckpoint``ed and
    the previous round's blocks released. This is load-bearing, not a
    nicety: the labels/edges relation feeds TWO operators per round,
    so an un-truncated logical plan doubles every round (2^rounds
    nodes — a 16-hop chain OOMed the driver without it). localCheckpoint
    blocks are NON-RELIABLE executor-local storage (ADVICE r3): losing
    an executor loses blocks and fails downstream reads — a production
    run that must survive executor loss should configure
    ``spark.sparkContext.setCheckpointDir`` on durable storage and
    swap in reliable ``checkpoint()``; we keep the local variant
    because this sandbox has no durable cluster FS and the win being
    bought is plan truncation, not fault tolerance."""
    if algorithm == "star":
        labels = _cc_star_labels(pairs, stats)
    else:
        labels = _cc_label_prop_labels(pairs, stats)
        if labels is None:
            # auto-escalation (VERDICT r4 item 5): label_prop needs
            # ~diameter rounds, so a >_CC_MAX_ITERS-diameter component
            # (adversarial chain) exhausts the budget. Rather than
            # fail the job, rerun with the O(log^2 n)-round star
            # variant — same labels (min doc_id per component), just a
            # round complexity that cannot be driven high by graph
            # shape. stats records both phases.
            esc = {}
            labels = _cc_star_labels(pairs, esc)
            if stats is not None:
                stats.update(
                    algorithm="label_prop->star",
                    star_rounds=esc.get("rounds"), escalated=True)
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id")
    return labels.select(
        "doc_id", "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"))


def _cc_label_prop_labels(pairs, stats=None):
    from pyspark.sql import Observation

    fwd = pairs.select(F.col("doc_a").alias("src"),
                       F.col("doc_b").alias("dst"))
    rev = pairs.select(F.col("doc_b").alias("src"),
                       F.col("doc_a").alias("dst"))
    edges = fwd.union(rev).persist()
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .select("doc_id", F.col("doc_id").alias("cluster_id"))
              .persist())
    converged = False
    rounds = 0
    for it in range(_CC_MAX_ITERS):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy(edges["src"].alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        upd = labels.join(nbr_min, "doc_id", "left").select(
            "doc_id",
            F.col("cluster_id").alias("old_cid"),
            F.least(
                F.col("cluster_id"),
                F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
            ).alias("cluster_id"),
        )
        # ONE job per round: the eager localCheckpoint materializes
        # the new labels, truncates the iteration lineage (the labels
        # relation feeds two joins per round, so an un-truncated plan
        # DOUBLES every round — 2^rounds nodes would OOM the driver on
        # long-diameter graphs), and fires the CollectMetrics probe.
        obs = Observation(f"cc_round_{it}")
        new_labels = (
            upd.observe(obs, F.sum(
                (F.col("cluster_id") != F.col("old_cid")).cast("long")
            ).alias("n_changed"))
            .select("doc_id", "cluster_id")
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["n_changed"] or 0)
        labels.unpersist()
        labels = new_labels
        rounds += 1
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats.update(rounds=rounds, algorithm="label_prop")
    edges.unpersist()
    if not converged:
        return None  # caller escalates to the star variant
    return labels


def _cc_star_labels(pairs, stats=None):
    """Alternating large-star/small-star edge contraction. Each round:

    - large-star: every node u computes m = min(neighbors(u) + {u})
      and rewires each LARGER neighbor v > u to (v, m);
    - small-star: every node u with smaller neighbors computes
      m = min of them and rewires u and its other smaller neighbors
      to m.

    Both are one groupBy(min) + one equi-join over the current edge
    set — map-side combinable, no ordered windows. The edge set only
    shrinks toward a forest of min-rooted stars; fixpoint = edge-set
    signature (count, xor + exact sum of xxhash64, min, max — ADVICE
    r4 widening) stable across a round, read off the round's single
    agg action (no extra pass)."""
    canon = (pairs.select(
        F.least("doc_a", "doc_b").alias("lo"),
        F.greatest("doc_a", "doc_b").alias("hi"))
        .where(F.col("lo") != F.col("hi"))
        .distinct().localCheckpoint(eager=True))

    def signature(e):
        # ADVICE r4: xor-of-hashes alone is collision-prone in
        # principle (xor is GF(2)-linear — an even multiset of bit
        # flips cancels). Widen the fingerprint in the SAME single agg
        # action: count, xor AND exact decimal sum of xxhash64, plus
        # the exact (min, max) edge endpoints. A false early stop now
        # requires two DIFFERENT consecutive edge sets of equal size
        # whose 64-bit hash multisets collide under both xor and
        # integer sum with equal extrema — xor and sum are
        # algebraically independent constraints, so a crafted
        # single-hash collision no longer suffices.
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(lo, hi))"),
                       F.lit(0)).alias("x"),
            F.coalesce(  # decimal sum: exact, overflow-free (ANSI)
                F.sum(F.expr("xxhash64(lo, hi)").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)")).alias("s"),
            F.min(F.struct("lo", "hi")).alias("mn"),
            F.max(F.struct("lo", "hi")).alias("mx"),
        ).collect()[0]
        return (row["n"], row["x"], row["s"], row["mn"], row["mx"])

    def sym(e):
        return e.select(F.col("lo").alias("src"),
                        F.col("hi").alias("dst")).union(
            e.select(F.col("hi").alias("src"),
                     F.col("lo").alias("dst")))

    edges = canon
    sig = signature(edges)
    rounds = 0
    converged = False
    for _ in range(_CC_MAX_ITERS):
        # each star output is eagerly localCheckpointed: the symmetric
        # view consumes its input twice, so an un-truncated plan would
        # double every half-round (see _cc_label_prop_labels)
        s = sym(edges)
        # large-star: m over ALL neighbors and self
        mins = (s.groupBy("src").agg(F.min("dst").alias("md"))
                .select("src", F.least("md", "src").alias("m")))
        large = (s.join(mins, "src").where(F.col("dst") > F.col("src"))
                 .select(F.least("dst", "m").alias("lo"),
                         F.greatest("dst", "m").alias("hi"))
                 .where(F.col("lo") != F.col("hi")).distinct()
                 .localCheckpoint(eager=True))
        # small-star: m over strictly-smaller neighbors (hi-side view)
        small = sym(large).where(F.col("dst") < F.col("src"))
        mins2 = small.groupBy("src").agg(F.min("dst").alias("m"))
        e1 = mins2.select(F.col("src").alias("a"), F.col("m").alias("b"))
        e2 = (small.join(mins2, "src").where(F.col("dst") != F.col("m"))
              .select(F.col("dst").alias("a"), F.col("m").alias("b")))
        new_edges = (e1.union(e2)
                     .select(F.least("a", "b").alias("lo"),
                             F.greatest("a", "b").alias("hi"))
                     .where(F.col("lo") != F.col("hi"))
                     .distinct().localCheckpoint(eager=True))
        new_sig = signature(new_edges)
        edges.unpersist()
        large.unpersist()
        edges = new_edges
        rounds += 1
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if stats is not None:
        stats.update(rounds=rounds, algorithm="star")
    if not converged:
        raise RuntimeError(
            f"star CC did not converge in {_CC_MAX_ITERS} rounds")
    # fixpoint: min-rooted stars — every canonical edge is (root,
    # member); roots label themselves
    labels = (edges.select(F.col("hi").alias("doc_id"),
                           F.col("lo").alias("cluster_id"))
              .union(edges.select(F.col("lo").alias("doc_id"),
                                  F.col("lo").alias("cluster_id")))
              .distinct())
    final = labels.localCheckpoint(eager=True)
    edges.unpersist()
    return final


@register(
    "dedup_canonical",
    f"""
    with recursive pairs as ({_MINHASH_PAIRS_SQL}),
    edges as (
      select doc_a as src, doc_b as dst from pairs
      union all
      select doc_b, doc_a from pairs
    ),
    reach as (
      select src as doc_id, dst as other from edges
      union
      select r.doc_id, e.dst
      from reach r join edges e on e.src = r.other
      where e.dst <> r.doc_id
    ),
    lbl as (
      select doc_id, least(doc_id, min(other)) as cluster_id
      from reach group by doc_id
    )
    select d.doc_id,
           coalesce(l.cluster_id, d.doc_id) as cluster_id,
           (row_number() over (
              partition by coalesce(l.cluster_id, d.doc_id)
              order by d.n_chars desc, d.doc_id) = 1) as keep
    from documents d left join lbl l on l.doc_id = d.doc_id
    """,
)
def q_dedup_canonical(spark, sf_dir):
    """The corpus-compaction decision: every document gets a
    cluster_id (its transitive near-dup component, or itself when it
    has no candidate pair) and a keep/drop verdict — keep the longest
    document per cluster, min doc_id on ties. The output drives the
    actual training-set filter (`where keep`); left-joining the full
    documents table keeps singletons without ever materializing them
    in the (small) cluster graph."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    clusters = q_dedup_clusters(spark, sf_dir) \
        .select("doc_id", "cluster_id")
    joined = docs.join(clusters, "doc_id", "left").select(
        "doc_id", "n_chars",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    return joined.select(
        "doc_id", "cluster_id",
        (F.row_number().over(w) == 1).alias("keep"))


# ---------------------------------------------------------------------------
# SimHash (16-bit, md5-derived, frequency-weighted)
# ---------------------------------------------------------------------------

_HEXDIGITS = "0123456789abcdef"

# per token t and bit i: hex nibble i//4 of md5(t), bit 3-(i%4) of it
def _simhash_sql(nbits: int = 16) -> str:
    """DuckDB twin of ``simhash_col`` at any width 1..63 (md5 supplies
    128 derived bits; power(2, i) for i<=62 is a power of two, exact in
    a double, so the bigint cast is lossless)."""
    assert 1 <= nbits <= 63
    return f"""
    cast(list_sum(list_transform(range({nbits}), i ->
      (case when list_sum(list_transform({_TOKS_SQL}, t ->
         case when cast(floor(
                 (instr('{_HEXDIGITS}',
                        substr(md5(t), (i // 4) + 1, 1)) - 1)
                 / power(2, 3 - (i % 4))) as int) % 2 = 1
              then 1 else -1 end)) >= 0
            then 1 else 0 end) * cast(power(2, i) as bigint)))
        as bigint)
"""


_SIMHASH_SQL = _simhash_sql(16)


def simhash_col(toks, nbits=16):
    """Frequency-weighted SimHash over a token-array column as one
    projection — a single fold over tokens carrying an nbits-wide
    sign-sum accumulator (higher-order functions run interpreted, so
    the r5 shape binds md5(token) once per token; see the comment
    below), bit i drawn from nibble i//4 of md5(token) — identical
    arithmetic to the DuckDB twin at nbits=16.

    ``nbits`` may be 1..63 (md5 supplies 128 derived bits; one signed
    long word holds 63 without overflow — Spark 4 runs ANSI mode, so a
    2^63 accumulation would raise rather than wrap). The driver-gate
    twin stays at 16 bits for the oracle; production web-scale corpora
    should pass 63 (16 bits saturate: at 10^12 rows every one of the
    65,536 values collides). Beyond 63 bits, shard into an array of
    long words — not needed while 63 bits >> log2(corpus)."""
    if not (1 <= nbits <= 63):
        raise ValueError("nbits must be in 1..63 (one signed long word)")

    def nibble_val(m, i):
        ch = F.substring(m, (i / 4).cast("int") + 1, 1)
        return F.instr(F.lit(_HEXDIGITS), ch) - 1

    def bit_of(m, i):
        v = nibble_val(m, i)
        p = F.pow(F.lit(2.0), (F.lit(3) - (i % 4)).cast("double"))
        return (F.floor(v / p)).cast("int") % 2

    # One md5 per TOKEN, not per (token, bit): the r4 shape embedded
    # F.md5(t) inside every bit's aggregate, so the 63-bit production
    # hash evaluated 63 md5s per token (and Catalyst does not CSE
    # across separate higher-order lambdas) — 56 s for the wide
    # near-pairs query at sf0.1, ~8 s after this change. The md5 is
    # bound ONCE per token by wrapping it in a single-element array
    # and transforming over it (m below); the per-bit work is then
    # substring/instr arithmetic on the bound hex string. The
    # accumulator carries one signed sum per bit; integer addition is
    # order-free, so the per-bit sums — and the final hash — are
    # bit-identical to the r4 formulation and the DuckDB twin.
    sign_vec = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), nbits),
        lambda acc, t: F.element_at(
            F.transform(
                F.array(F.md5(t)),
                lambda m: F.zip_with(
                    acc,
                    F.sequence(F.lit(0), F.lit(nbits - 1)),
                    lambda a, i: a + F.when(bit_of(m, i) == 1, 1)
                    .otherwise(-1),
                ),
            ),
            1,
        ),
    )
    # accumulate high-bit-first as acc*2 + bit: stays < 2^nbits <= 2^63,
    # and at nbits=16 equals the pow(2,i) sum the oracle computes.
    # sign_vec is bound once via the same single-element-array trick —
    # referencing it inside each bit's lambda would re-evaluate the
    # whole token aggregate per bit.
    return F.element_at(
        F.transform(
            F.array(sign_vec),
            lambda sv: F.aggregate(
                F.sequence(F.lit(nbits - 1), F.lit(0), F.lit(-1)),
                F.lit(0).cast("long"),
                lambda acc, i: acc * 2 + F.when(
                    F.element_at(sv, (i + 1).cast("int")) >= 0,
                    F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")),
            ),
        ),
        1,
    )



@register(
    "dedup_simhash",
    f"""
    select doc_id, simhash16,
           count(*) over (partition by simhash16) as cluster_size
    from (select doc_id, {_SIMHASH_SQL} as simhash16
          from documents) t
    """,
)
def q_dedup_simhash(spark, sf_dir):
    """16-bit SimHash (oracle twin of the DuckDB nibble arithmetic;
    `simhash_col` parameterizes the width for production use), with
    cluster sizes per hash value.

    Scale (VERDICT r3 item 4): sizes used to come from `count(*) over
    (partition by simhash16)` — a window that shuffles EVERY row into
    <= 65,536 partitions (~1.5e7 rows per task at 10^12 docs). Now
    it's groupBy(simhash).count() (map-side combinable, result <= 2^16
    rows — at 63 bits, ~#distinct-hashes rows, still << corpus) joined
    back on the hash key; AQE elects a broadcast for the tiny size
    table, and the big side is never range-sorted into hash buckets."""
    docs = _ts(spark, sf_dir, "documents")
    base = docs.select("doc_id", simhash_col(_toks()).alias("simhash16"))
    # r7: the signature projection feeds both the size aggregation and
    # the join-back — materialize it once per invocation (the
    # interpreted 16-bit fold was the whole cost of this row, and it
    # ran twice).
    base = base.localCheckpoint(eager=True)
    sizes = base.groupBy("simhash16").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return base.join(sizes, "simhash16").select(
        "doc_id", "simhash16", "cluster_size")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard over a deterministic sample
# ---------------------------------------------------------------------------

#: max occurrences of a shingle in the exploded (doc, shingle) table —
#: which EQUALS the number of distinct documents containing it, because
#: both engines build per-document shingle sets (array_distinct /
#: list_distinct above), so a doc contributes each shingle at most once
#: (ADVICE r2: the old comment said "documents" without stating why
#: occurrence-count is the same thing). A stop-phrase shingle shared by
#: k docs would contribute k^2 rows to the pair join (the classic skew
#: bomb at 10^12 docs) while telling us nothing about near-duplication
#: — so Jaccard is defined over the *discriminative* shingle universe
#: (df <= cap), on BOTH engines.
_DF_CAP = 64


@register(
    "ngram_jaccard_pairs",
    f"""
    with sh_docs as (
      select doc_id, {_SHINGLES_SQL} as sh from documents
    ),
    exploded as (
      select doc_id, unnest(sh) as shingle from sh_docs
    ),
    freq as (
      select shingle, count(*) as df from exploded group by 1
    ),
    kept as (
      select e.doc_id, e.shingle, f.df
      from exploded e join freq f using (shingle)
      where f.df <= {_DF_CAP}
    ),
    sizes as (select doc_id, count(*) as n from kept group by 1),
    shared as (
      select a.doc_id as doc_a, b.doc_id as doc_b,
             count(*) as n_shared
      from (select * from kept where df >= 2) a
      join (select * from kept where df >= 2) b
        on a.shingle = b.shingle and a.doc_id < b.doc_id
      group by 1, 2
    )
    select doc_a, doc_b,
           round(n_shared / (sa.n + sb.n - n_shared), 6) as jaccard
    from shared
    join sizes sa on sa.doc_id = doc_a
    join sizes sb on sb.doc_id = doc_b
    where n_shared / (sa.n + sb.n - n_shared) >= 0.02
    """,
)
def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard over ALL documents, skew-safe: shingles
    with document frequency > _DF_CAP are dropped from the universe
    before the self-join (one groupBy + join on the shingle key), and
    df=1 shingles are pruned from the join input (they cannot form a
    pair). The pair space is therefore bounded by df-capped shared
    shingles — ~O(dups), never O(n^2) and never a hot-key k^2 bucket.

    ``kept`` feeds two consumers (sizes + the pair-expansion input), so
    it is persisted after the df join: the explode+groupBy+join
    pipeline runs once and both consumers read the materialized result
    (VERDICT r2 item 3; r7 replaced the shingle self-join — two
    shuffles of the exploded stream — with a per-shingle ordered-pair
    expansion, safe because df is capped)."""
    docs = _ts(spark, sf_dir, "documents")
    toks = _toks()
    shingles = F.when(
        F.size(toks) < 3, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
            )
        )
    )
    sh = docs.select("doc_id", shingles.alias("sh"))
    exploded = sh.select("doc_id", F.explode("sh").alias("shingle"))
    freq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # 3 consumers (sizes + both self-join sides); persisted so the
    # explode+groupBy+join pipeline runs once. DELIBERATE LEAK in a
    # long-lived session (ADVICE r3): the function returns a lazy
    # DataFrame, so there is no safe point here to unpersist before
    # the caller materializes it. The blocks are LRU-evictable (never
    # pinned), and batch callers should
    # ``spark.catalog.clearCache()`` between corpus runs.
    kept = (exploded.join(freq, "shingle")
            .where(F.col("df") <= _DF_CAP)
            .persist())
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    joinable = kept.where(F.col("df") >= 2).select("doc_id", "shingle")
    # r7: the pair space per shingle is df-capped (<= C(_DF_CAP, 2)
    # pairs), so instead of a self-join — which shuffles the exploded
    # stream TWICE by shingle and probes a join — group each shingle's
    # doc list once and expand the ordered pairs array-side. Same pair
    # multiset (every (a < b) with a shared kept shingle appears once
    # per shared shingle), so n_shared and jaccard are value-identical;
    # one fewer exchange and no join build. The df cap is what makes
    # the expansion safe: a stop-phrase shingle never reaches this
    # stage (test_ngram_jaccard_hot_shingle_defused).
    pairs_of = F.filter(
        F.flatten(F.transform(
            F.col("ds"),
            lambda a: F.transform(
                F.col("ds"),
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b"))),
        )),
        lambda p: p["doc_a"] < p["doc_b"],
    )
    shared = (
        joinable.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ds"))
        .select(F.explode(pairs_of).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"),
                 F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_shared") / (F.col("sa.n") + F.col("sb.n")
                               - F.col("n_shared"))
    return (
        shared.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .where(jac >= 0.02)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "dedup_verify_pipeline",
    f"""
    with sigs as (
      select doc_id, sh, {_SIG_SQL} as sig
      from (select doc_id, {_SHINGLES_SQL} as sh from documents) s
    ),
    bands as (
      select doc_id, sig, b,
             {_BAND_HASH_SQL}
                 as band_hash
      from sigs, range({_BANDS}) t(b)
    ),
    cands as (
      select distinct a.doc_id as doc_a, c.doc_id as doc_b
      from bands a join bands c
        on a.b = c.b and a.band_hash = c.band_hash
       and a.doc_id < c.doc_id
    )
    select doc_a, doc_b,
           round(len(list_intersect(sa.sh, sb.sh))
                 / (len(sa.sh) + len(sb.sh)
                    - len(list_intersect(sa.sh, sb.sh))), 6)
               as jaccard
    from cands
    join sigs sa on sa.doc_id = doc_a
    join sigs sb on sb.doc_id = doc_b
    where len(list_intersect(sa.sh, sb.sh))
          / (len(sa.sh) + len(sb.sh)
             - len(list_intersect(sa.sh, sb.sh))) >= 0.01
    """,
)
def q_dedup_verify_pipeline(spark, sf_dir):
    """The composed near-dup pipeline: LSH candidate generation
    followed by EXACT Jaccard verification — candidates only, so the
    expensive set-intersection runs on ~O(dups) pairs, never O(n^2).
    This is the production dedup shape at 10^12 docs."""
    docs = _ts(spark, sf_dir, "documents")
    toks = _toks()
    shingles = F.when(
        F.size(toks) < 3, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
            )
        )
    )
    # minhash_sig_col binds its input once; referencing the carried
    # "sh" column costs one more shingle evaluation (2 total per row
    # vs 13 in the r4 shape, which inlined shingles per slot)
    sigs = (
        docs.select("doc_id", shingles.alias("sh"))
        .select("doc_id", "sh", minhash_sig_col(F.col("sh")).alias("sig"))
    )
    # The plan consumes sigs FOUR times (both sides of the band
    # self-join + the sh_a/sh_b verify join-backs), and only the band
    # self-join's exchange is reused — the 12-slot md5 signature and
    # the shingle array were being recomputed ~3x per row. Materialize
    # the projection once (inside the timed query, recomputed on every
    # invocation); at 10^12 docs this is the natural persist point of
    # the production pipeline too (guide §5: reuse > recompute when the
    # subtree is expensive).
    sigs = sigs.localCheckpoint(eager=True)
    bands = sigs.select(
        "doc_id", "sig",
        F.explode(F.sequence(F.lit(0), F.lit(_BANDS - 1))).alias("b"),
    ).select(
        "doc_id", "b",
        F.md5(
            F.concat(
                F.col("b").cast("string"), F.lit("|"),
                F.concat_ws(
                    "|", F.slice("sig", F.col("b") * _BAND_R + 1, _BAND_R)),
            )
        ).alias("band_hash"),
    )
    a = bands.alias("a")
    c = bands.alias("c")
    cands = a.join(
        c,
        (F.col("a.b") == F.col("c.b"))
        & (F.col("a.band_hash") == F.col("c.band_hash"))
        & (F.col("a.doc_id") < F.col("c.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"),
             F.col("c.doc_id").alias("doc_b")).distinct()
    sa = sigs.select(F.col("doc_id").alias("doc_a"),
                     F.col("sh").alias("sh_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"),
                     F.col("sh").alias("sh_b"))
    joined = cands.join(sa, "doc_a").join(sb, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return (
        joined.where(jac >= 0.01)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def simhash_near_pairs(docs, nbits=16, band_bits=4, max_ham=None):
    """SimHash near-duplicate pairs, the Manku/Jain/Das Sarma 2007
    web-dedup shape, parameterized over hash width and band width
    (VERDICT r4 item 1): split each ``nbits`` hash into
    ``ceil(nbits/band_bits)`` bands; any two hashes within hamming
    distance k < #bands must agree on at least one whole band
    (pigeonhole), so an equi-join on (band, band_value) generates ALL
    qualifying pairs — exact recall, never an O(n^2) comparison — and
    ``bit_count(xor)`` verifies candidates only.

    Band values are extracted with integer shift/mask
    (``shiftright(sh, band_bits*b) & mask``), never float division —
    at 63 bits ``sh / pow(2, b)`` would round through a double and
    corrupt low bands.

    Scale: one explode to n*#bands band rows, one equi-join on the
    band key, map-side distinct. Candidate volume is governed by
    2^band_bits per band: 16-bit hash / 4-bit bands (the oracle twin)
    saturates on web corpora (16 values per band ⇒ ~C(n,2)/2^band_bits
    candidates on random data); production is 63-bit / 16-bit bands
    (2^16 values per band), the ``simhash_near_pairs_wide`` gate row.
    ``max_ham`` defaults to #bands - 1, the largest k the pigeonhole
    covers exactly."""
    n_bands = -(-nbits // band_bits)
    if max_ham is None:
        max_ham = n_bands - 1
    if not max_ham < n_bands:
        raise ValueError(
            f"recall requires hamming bound {max_ham} < bands {n_bands} "
            "(Manku pigeonhole)")
    mask = (1 << band_bits) - 1
    # the hash expression is a large interpreted higher-order fold (no
    # whole-stage codegen, no cross-expression CSE), and project
    # collapse re-inlines it into EVERY reference — a "sh" column plus
    # n_bands band columns meant 1 + n_bands evaluations per row. So
    # bind the hash ONCE (single-element-array + transform, the same
    # trick simhash_col uses internally), build every band element
    # inside that binding with the hash value carried IN the element,
    # and explode — exactly one evaluation per row survives into the
    # exchange. Measured on the 63-bit row at sf0.1: 56 s (r4 shape)
    # -> 33 s (bound sign-vec) -> 19 s (this); the 16-bit row 10.7 s
    # -> 7.8 s. The remaining cost is the inherent interpreted-HOF
    # arithmetic (~tokens x nbits sign updates per doc).
    sh_expr = simhash_col(_toks(), nbits)
    band_arr = F.element_at(
        F.transform(
            F.array(sh_expr),
            lambda sh: F.array(*[
                F.struct(
                    F.lit(b).alias("b"),
                    F.shiftright(sh, band_bits * b)
                    .bitwiseAND(F.lit(mask)).alias("bv"),
                    sh.alias("sh"))
                for b in range(n_bands)]),
        ),
        1,
    )
    bands = (docs.select("doc_id", F.explode(band_arr).alias("bb"))
             .select("doc_id", "bb.b", "bb.bv", "bb.sh"))
    a = bands.alias("a")
    c = bands.alias("c")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("c.sh")))
    return (a.join(c, (F.col("a.b") == F.col("c.b"))
                   & (F.col("a.bv") == F.col("c.bv"))
                   & (F.col("a.doc_id") < F.col("c.doc_id")))
            .where(ham <= max_ham)
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("c.doc_id").alias("doc_b"),
                    ham.alias("hamming"))
            .distinct())


def _sh_pairs_sql(nbits, band_bits, max_ham):
    """DuckDB twin of ``simhash_near_pairs`` at any parameterization
    (integer ``>> / &`` band extraction, same reason as the Spark
    side)."""
    n_bands = -(-nbits // band_bits)
    mask = (1 << band_bits) - 1
    return f"""
    with h as (select doc_id, {_simhash_sql(nbits)} as sh
               from documents),
    bands as (
      select doc_id, sh, b, (sh >> cast({band_bits} * b as int)) & {mask}
               as bv
      from h, range({n_bands}) t(b)
    )
    select distinct a.doc_id as doc_a, c.doc_id as doc_b,
           bit_count(xor(a.sh, c.sh)) as hamming
    from bands a join bands c
      on a.b = c.b and a.bv = c.bv and a.doc_id < c.doc_id
    where bit_count(xor(a.sh, c.sh)) <= {max_ham}
    """


@register("simhash_near_pairs", _sh_pairs_sql(16, 4, 3))
def q_simhash_near_pairs(spark, sf_dir):
    """16-bit / 4-bit-band oracle twin of ``simhash_near_pairs`` —
    kept at the saturating parameters deliberately so the gate also
    exercises the high-collision regime; the production
    parameterization is the ``simhash_near_pairs_wide`` row below."""
    return simhash_near_pairs(_ts(spark, sf_dir, "documents"),
                              nbits=16, band_bits=4, max_ham=3)


@register("simhash_near_pairs_wide", _sh_pairs_sql(63, 16, 3))
def q_simhash_near_pairs_wide(spark, sf_dir):
    """Production-parameter SimHash near-pairs (VERDICT r4 item 1):
    63-bit hash, 4 x 16-bit bands, hamming <= 3. 2^16 values per band
    means band collisions on random data are ~C(n,2)/65536 per band —
    candidates ~ O(actual near-dups) at web scale, not the saturated
    ~C(n,2)/16 of the 16-bit twin. Recall stays exact: hamming <= 3 <
    4 bands pigeonholes at this width too (pinned by
    ``test_simhash_near_pairs_wide_recall``)."""
    return simhash_near_pairs(_ts(spark, sf_dir, "documents"),
                              nbits=63, band_bits=16, max_ham=3)


# ---------------------------------------------------------------------------
# duplicated-span statistics (Lee et al. 2022, arXiv:2107.06499)
# ---------------------------------------------------------------------------

#: gram width in tokens for duplicated-span detection. Lee et al. use a
#: 50-token threshold over a suffix array; the Spark-native
#: approximation below marks every 16-token window whose hash repeats
#: corpus-wide, which upper-bounds the same spans at finer granularity.
_SPAN_N = 16


def _dup_span_sql(n: int = _SPAN_N) -> str:
    """DuckDB twin: exact gram strings instead of 64-bit hashes (the
    hashes never surface in the output; a cross-engine divergence would
    require an xxhash64 collision among corpus grams, ~1e-11 at gate
    scale)."""
    return f"""
    with toks as (
      select doc_id, {_TOKS_SQL} as tk from documents
    ), grams as (
      select doc_id, i as pos, array_to_string(tk[i+1:i+{n}], ' ') as g
      from toks, unnest(range(greatest(len(tk) - {n} + 1, 0))) as t(i)
    ), dup as (
      select g from grams group by g having count(*) >= 2
    ), cov as (
      select doc_id, count(distinct p) as dup_tokens
      from (select doc_id, unnest(range(pos, pos + {n})) as p
            from grams join dup using (g)) u
      group by doc_id
    )
    select t.doc_id,
           len(t.tk) as n_tokens,
           coalesce(c.dup_tokens, 0) as dup_tokens,
           round(coalesce(c.dup_tokens, 0)
                 / greatest(len(t.tk), 1), 6) as dup_frac
    from toks t left join cov c using (doc_id)
    """


def _span_union_size(ps, n: int):
    """Distinct token positions covered by n-token windows starting at
    the positions in array ``ps`` — JVM array ops, bounded by doc
    length (overlapping windows union, never multiply)."""
    return F.size(F.array_distinct(F.flatten(
        F.transform(ps, lambda p: F.sequence(p, p + n - 1)))))


def dup_span_stats_df(docs, n: int = _SPAN_N, id_col: str = "doc_id",
                      skew_preagg: bool = False):
    """Per-document duplicated-span coverage: the fraction of a doc's
    tokens lying inside some n-token window that occurs >= 2 times
    corpus-wide (Lee et al.'s exact-substring dedup signal, rebuilt as
    a dataframe plan instead of a suffix array).

    Plan shape (the 100 TB rationale):

    - grams are a single codegen'd projection per doc (``bind1`` binds
      the token split once; ~len(tk) structs of (pos, xxhash64)), then
      one explode — no shuffle yet;
    - corpus-wide repetition uses ONE hash exchange: a count window
      partitioned by the 8-byte gram hash (a groupBy+self-join would
      shuffle the gram stream twice);
    - coverage never explodes non-duplicated grams: only surviving
      (pos) lists are expanded, JVM-side, after the per-doc groupBy
      (``sequence``/``flatten``/``array_distinct`` on arrays bounded
      by doc length);
    - the final stats join is keyed on ``doc_id``, the same
      partitioning the coverage aggregation just produced.

    ``skew_preagg=True`` is the hot-gram variant: a boilerplate gram
    present in millions of docs concentrates ALL its (doc, pos, h)
    rows on one reducer of the count window (WindowExec cannot
    partial-aggregate — every row of the hot partition lands on, and
    is sorted by, a single task). The variant replaces the window with
    a combinable ``groupBy(h).count`` — each map task emits ONE row
    per distinct gram, so the hot reducer receives at most #tasks rows
    — followed by an inner join back on ``h`` filtered to ``count >=
    2`` (non-duplicated grams, the vast majority, drop at the join;
    probe-side hot keys are AQE-skew-splittable, which a window
    partition is not). It costs one extra exchange of the gram stream.

    MEASURED crossover (500k docs sharing one boilerplate span,
    local[32]): the window path still wins at 5x10^5 copies of a
    single gram (8.5-11.2 s vs 14.8-15.4 s) — a 10^6-row hot
    partition is cheap for one task, the extra full-stream exchange
    is not. Keep the default; reach for ``skew_preagg`` only when one
    gram's occurrence count approaches single-task sort/memory
    capacity (~10^7-10^8 rows), where the window partition would
    spill or OOM and no setting can split it. Results are identical
    (``test_dup_span_stats_preagg_path_identical``, plus the
    brute-force parity test runs both paths)."""
    from pyspark.sql import Window

    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    gram_arr = bind1(
        toks,
        lambda tk: F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - n),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.xxhash64(
                        F.concat_ws(" ", F.slice(tk, i + 1, n))
                    ).alias("h"),
                ),
            ),
        ),  # short docs -> NULL array -> explode() drops the row
    )
    g = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(gram_arr).alias("g"))
        .select("doc_id", "g.pos", "g.h")
    )
    if skew_preagg:
        cnt = (g.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
               .where(F.col("c") >= 2))
        dupg = g.join(cnt.hint("shuffle_hash"), "h")
    else:
        dupg = (
            g.select(
                "doc_id", "pos",
                F.count("*").over(Window.partitionBy("h")).alias("c"))
            .where(F.col("c") >= 2)
        )
    pos_lists = F.collect_list("pos")
    cov = (
        dupg.groupBy("doc_id")
        .agg(pos_lists.alias("ps"))
        .select("doc_id",
                _span_union_size(F.col("ps"), n).alias("dup_tokens"))
    )
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.size(toks).alias("n_tokens"))
    dup_tokens = F.coalesce("dup_tokens", F.lit(0))
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        dup_tokens.cast("bigint").alias("dup_tokens"),
        F.round(dup_tokens / F.greatest("n_tokens", F.lit(1)), 6)
        .alias("dup_frac"),
    )


@register("dup_span_stats", _dup_span_sql())
def q_dup_span_stats(spark, sf_dir):
    """Corpus-wide duplicated 16-gram span coverage per document —
    the within-corpus companion of ``decontam_ngram_overlap`` (which
    runs the same gram machinery against a held-out slice)."""
    return dup_span_stats_df(_ts(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# incremental cross-corpus dedup: new crawl vs a materialized band index
# ---------------------------------------------------------------------------

_IDX_SPLIT = 250  # gate instantiation: history = doc_id < 250


def band_index_df(docs, id_col: str = "doc_id"):
    """The materializable LSH band index of a historical corpus: one
    row per (b, band_hash, doc_id) — exactly the claim keys the
    streaming path uses, as a durable batch table. Production writes
    this once per corpus snapshot (partitioned/bucketed on
    ``band_hash``) and every incremental crawl joins against it
    without re-hashing history."""
    return (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(minhash_band_hashes("text")).alias("bh"))
        .select(F.col("bh.b").alias("b"),
                F.col("bh.band_hash").alias("band_hash"),
                "doc_id"))


def dedup_against_index(new_docs, index_df, id_col: str = "doc_id"):
    """Incremental batch dedup: flag every NEW document that shares at
    least one LSH band with the historical index (the batch twin of
    the streaming min-claim — same band arithmetic, so a doc the
    stream would have claimed against history is exactly a doc this
    flags). Returns (doc_id, n_hit_bands, matched_doc, is_new):
    ``matched_doc`` is the smallest history doc_id among band matches
    (the canonical the pipeline keeps), NULL for genuinely new docs.

    Scale: the index is the big side (3 rows per historical doc) and
    arrives pre-partitioned on its join key from the snapshot write,
    so only the new crawl (orders of magnitude smaller) shuffles; the
    equi-join on (b, band_hash) is shuffle_hash-pinned with the NEW
    CRAWL as the build side (the hinted side becomes the in-memory
    hashed relation — hinting the index would ask every task to hold
    its slice of a 10^12-row table; broadcasting it is equally
    impossible), and a viral band bucket is then a PROBE-side hot
    key, which AQE's skew split can divide. The per-new-doc
    aggregation is combinable."""
    nb = band_index_df(new_docs, id_col).select(
        "b", "band_hash", F.col("doc_id").alias("new_id"))
    hits = (nb.hint("shuffle_hash").join(index_df,
                    ["b", "band_hash"])
            .groupBy("new_id")
            .agg(F.count_distinct("b").alias("n_hit_bands"),
                 F.min("doc_id").alias("matched_doc")))
    base = new_docs.select(F.col(id_col).alias("doc_id"))
    return (base.join(hits, base.doc_id == hits.new_id, "left")
            .select(
                "doc_id",
                F.coalesce("n_hit_bands", F.lit(0)).cast("int")
                .alias("n_hit_bands"),
                "matched_doc",
                F.col("n_hit_bands").isNull().alias("is_new")))


_BANDS_CTE_SQL = f"""
    select doc_id, b,
           {_BAND_HASH_SQL}
               as band_hash
    from (select doc_id, {_SIG_SQL} as sig
          from (select doc_id, {_SHINGLES_SQL} as sh
                from documents) s) sigs,
         range({_BANDS}) t(b)
"""

_DEDUP_AGAINST_INDEX_SQL = f"""
    with bands as ({_BANDS_CTE_SQL}),
    hist as (select * from bands where doc_id < {_IDX_SPLIT}),
    new as (select * from bands where doc_id >= {_IDX_SPLIT}),
    hits as (
      select n.doc_id as new_id,
             count(distinct n.b) as n_hit_bands,
             min(h.doc_id) as matched_doc
      from new n join hist h
        on n.b = h.b and n.band_hash = h.band_hash
      group by n.doc_id
    )
    select d.doc_id,
           cast(coalesce(x.n_hit_bands, 0) as int) as n_hit_bands,
           x.matched_doc,
           (x.n_hit_bands is null) as is_new
    from (select doc_id from documents
          where doc_id >= {_IDX_SPLIT}) d
    left join hits x on x.new_id = d.doc_id
"""


@register("dedup_against_index", _DEDUP_AGAINST_INDEX_SQL)
def q_dedup_against_index(spark, sf_dir):
    """Gate instantiation of the incremental topology: history =
    ``doc_id < {S}``, new crawl = the rest (deterministic split; in
    production ``index_df`` is the persisted band table of the last
    snapshot)."""
    docs = _ts(spark, sf_dir, "documents")
    hist = docs.where(F.col("doc_id") < _IDX_SPLIT)
    new = docs.where(F.col("doc_id") >= _IDX_SPLIT)
    return dedup_against_index(new, band_index_df(hist))
