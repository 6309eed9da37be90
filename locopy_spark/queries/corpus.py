"""Corpus-construction operators, batch 3: deterministic mixture
sampling, exact-K reservoir selection, and exact n-gram heavy hitters.

These are the pretraining-pipeline steps downstream of the cleaning /
dedup families in ``docs.py`` / ``docs_ext.py``: once mixture weights
exist (``p_mix_weights``), actually EMIT the rebalanced sample; pull a
fixed-size uniform document sample for eval/inspection; and find the
n-grams dominating the corpus (boilerplate detection) without
shuffling the full n-gram tail.

Determinism: all sampling gates are md5-based (identical hex in Spark
and DuckDB), so the selected row set is identical on any engine, any
partitioning, any re-run — rand()-based sampling can never
hash-match an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from locopy_spark.functions.text import (
    shingles_expr,
    sql_shingles,
    sql_tokens,
    tokens_expr,
)
from locopy_spark.sources.tables import load_table

SAMPLE_ALPHA = 0.5  # global downsample factor applied to mix weights
HASH_DENOM = 4294967296.0  # 2^32: md5-prefix → uniform u in [0, 1)
RESERVOIR_K = 200
HH_K = 5000  # heavy hitter = n-gram with count ≥ n_total / HH_K
HH_CAP = 6000  # per-partition Misra-Gries capacity (must be ≥ HH_K)

# u = first 8 md5 hex chars as an integer, scaled to [0, 1).
_U_SPARK = (
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
    f" AS BIGINT) / {HASH_DENOM}"
)
_U_DUCK = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
    f" AS BIGINT) / {HASH_DENOM}"
)


def p_sample_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emit the mixture-rebalanced corpus sample: each source keeps
    documents at rate ``min(1, α·mix_weight)``, so over-represented
    domains are downsampled toward the uniform mixture target.

    The keep decision is a pure row-local predicate (md5 gate vs the
    source's broadcast rate) — no shuffle touches the corpus rows; the
    only shuffles aggregate the handful of per-source rows. The same
    gate applied on 1000 executors selects the same documents.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        "source",
        F.expr(f"size({tokens_expr('text')})").alias("n_toks"),
        F.expr(_U_SPARK).alias("u"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    rates = per_src.join(F.broadcast(totals)).select(
        "source",
        "n_docs",
        F.least(
            F.lit(1.0),
            F.lit(SAMPLE_ALPHA)
            * (
                (F.lit(1.0) / F.col("n_sources"))
                / (F.col("n_tokens").cast("double") / F.col("tot_tokens"))
            ),
        ).alias("rate"),
    )
    kept = per_doc.join(F.broadcast(rates.select("source", "rate")), "source")
    return (
        kept.filter(F.col("u") < F.col("rate"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_toks").alias("kept_tokens"),
        )
        .join(rates, "source")
        .select("source", "n_docs", "n_kept", "kept_tokens", "rate")
        .orderBy("source")
    )


def d_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-K uniform document sample without replacement: the K
    smallest md5 keys over the whole corpus.

    Equivalent to a seeded reservoir sample, but deterministic and
    mergeable: Catalyst plans the orderBy+limit as
    TakeOrderedAndProject — each partition keeps its local top-K and
    one reducer merges P×K candidates. No global sort, no full
    shuffle, identical selection at any parallelism.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            F.expr("md5(CAST(doc_id AS STRING))").alias("hk"),
        )
        .orderBy("hk")
        .limit(RESERVOIR_K)
    )


def t_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-dominating 3-gram shingles (boilerplate scan):
    every 3-gram with count ≥ n_total/{HH_K}, exact counts and shares.

    Two-pass Misra-Gries + exact recount (operators/heavyhitters.py):
    the candidate pass shuffles ≤ P×capacity summary rows instead of
    the full distinct-n-gram tail (billions at 100 TB), the recount
    aggregates only candidate keys, and the final exact filter makes
    the output independent of sketch internals — so it hash-matches
    the plain GROUP BY/HAVING oracle exactly.
    """
    from locopy_spark.operators.heavyhitters import exact_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.expr(tokens_expr("text")).alias("tk"))
    grams = toks.select(
        F.explode(F.expr(shingles_expr("tk", 3))).alias("g")
    )
    # total 3-gram count computed row-locally from array sizes — no
    # explode, no extra pass over the gram stream
    total = toks.agg(
        F.sum(F.expr("greatest(size(tk) - 2, 0)")).alias("n_total")
    )
    return exact_heavy_hitters(
        grams, "g", k=HH_K, capacity=HH_CAP, total=total
    ).orderBy("g")


ORACLE: dict[str, str] = {
    "p_sample_corpus": f"""
      WITH d AS (
        SELECT doc_id, source,
               len({sql_tokens('text')}) AS n_toks,
               {_U_DUCK} AS u
        FROM documents
      ),
      p AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        FROM d GROUP BY source
      ),
      t AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_sources FROM p
      ),
      r AS (
        SELECT p.source, p.n_docs,
               LEAST(1.0, {SAMPLE_ALPHA} *
                 ((1.0 / t.n_sources) /
                  (CAST(p.n_tokens AS DOUBLE) / t.tot_tokens))) AS rate
        FROM p, t
      )
      SELECT r.source, r.n_docs,
             COUNT(*) AS n_kept,
             CAST(SUM(d.n_toks) AS BIGINT) AS kept_tokens,
             r.rate
      FROM d JOIN r ON d.source = r.source
      WHERE d.u < r.rate
      GROUP BY r.source, r.n_docs, r.rate
      ORDER BY r.source
    """,
    "d_reservoir_sample": f"""
      SELECT doc_id, source, n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS hk
      FROM documents ORDER BY hk LIMIT {RESERVOIR_K}
    """,
    "t_heavy_hitters": f"""
      WITH toks AS (
        SELECT {sql_tokens('text')} AS tk FROM documents
      ),
      g AS (
        SELECT UNNEST({sql_shingles('tk', 3)}) AS g FROM toks
      ),
      c AS (
        SELECT g, COUNT(*) AS n_occ FROM g GROUP BY g
      ),
      n AS (
        SELECT CAST(SUM(n_occ) AS BIGINT) AS n_total FROM c
      )
      SELECT c.g, c.n_occ,
             CAST(c.n_occ AS DOUBLE) / n.n_total AS share
      FROM c, n
      WHERE c.n_occ * {HH_K} >= n.n_total
      ORDER BY c.g
    """,
}


N_SHARDS = 16


def p_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment: documents stream into
    ``N_SHARDS`` output shards in md5 order, cut by cumulative token
    count — every shard carries ~total/N tokens regardless of the doc
    size distribution (naive count-based sharding skews bytes).

    shard = floor(prefix_tokens · N / total): a pure function of the
    exclusive running sum, computed by the distributed prefix-sum
    operator (range partition + O(P) per-partition sums through the
    driver + per-partition window — no one-partition global window).
    Output is the per-shard plan (doc/token totals); writing is then
    ``df.write.partitionBy("shard")``.
    """
    from locopy_spark.operators.ranking import global_running_sum

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        F.expr(f"size({tokens_expr('text')})").cast("long").alias("n_toks"),
        F.expr("md5(CAST(doc_id AS STRING))").alias("hk"),
    )
    run = global_running_sum(
        per_doc, order_cols=["hk"], value_col="n_toks", out_col="prefix_toks"
    )
    total = per_doc.agg(F.sum("n_toks").alias("tot"))
    return (
        run.join(F.broadcast(total))
        .select(
            "doc_id",
            "n_toks",
            # integer division: float '/' + cast disagrees across
            # engines at shard boundaries (truncate vs round)
            F.expr(f"prefix_toks * {N_SHARDS} div tot").alias("shard"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("shard_tokens"),
        )
        .orderBy("shard")
    )


def t_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-character-pair frequencies over the corpus — the
    counting step of the first BPE tokenizer merge.

    The classic BPE-training trick applied distributively: aggregate
    the corpus to (distinct word, count) FIRST (vocabulary-sized, tiny
    vs the corpus), then expand each distinct word's pairs once and
    weight by its count — pair expansion cost is O(vocab), not
    O(corpus tokens). All JVM-side array expressions; no Python in the
    hot path.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.expr(tokens_expr("text"))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = words.select(
        "n",
        F.explode(
            F.expr(
                # guard 1-char words: Spark's sequence(1, 0) DESCENDS
                # ([1, 0]) rather than returning empty
                "case when length(w) >= 2 then "
                "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2)) "
                "else array() end"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("n_occ"))
        .orderBy("pair")
    )


ORACLE["p_shard_plan"] = f"""
  WITH d AS (
    SELECT doc_id,
           CAST(len({sql_tokens('text')}) AS BIGINT) AS n_toks,
           md5(CAST(doc_id AS VARCHAR)) AS hk
    FROM documents
  ),
  r AS (
    SELECT doc_id, n_toks,
           COALESCE(SUM(n_toks) OVER (
             ORDER BY hk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS prefix_toks
    FROM d
  ),
  t AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS tot FROM d)
  SELECT CAST((r.prefix_toks * {N_SHARDS}) // t.tot AS BIGINT) AS shard,
         COUNT(*) AS n_docs,
         CAST(SUM(r.n_toks) AS BIGINT) AS shard_tokens
  FROM r, t
  GROUP BY 1 ORDER BY 1
"""

ORACLE["t_bpe_pairs"] = f"""
  WITH w AS (
    SELECT UNNEST({sql_tokens('text')}) AS w FROM documents
  ),
  v AS (
    SELECT w, COUNT(*) AS n FROM w GROUP BY w
  ),
  p AS (
    SELECT n, UNNEST(list_transform(generate_series(1, len(w) - 1),
                                    i -> substr(w, i, 2))) AS pair
    FROM v
  )
  SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occ
  FROM p GROUP BY pair ORDER BY pair
"""


SPAN_K = 5  # shingle width: targets shared spans of >= 5 tokens
SPAN_P = 4  # keep fingerprints with hash % P == 0 (1/P sampling)
SPAN_MIN_SHARED = 3  # pairs must share >= this many sampled fingerprints


def d_span_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-shared-span near-dup detection via sampled content
    fingerprints — the scalable stand-in for exact substring dedup
    (suffix-array style): documents sharing ≥ {SPAN_MIN_SHARED}
    sampled {SPAN_K}-gram fingerprints almost surely share long
    copied spans.

    The 0-mod-p selection keeps a deterministic 1/{SPAN_P} of each
    doc's shingle hashes (both docs of a copied span keep the SAME
    survivors — unlike random sampling), so the exploded fingerprint
    table, the groupBy, and the bucket self-join all shrink by
    {SPAN_P}x. Buckets are distinctive {SPAN_K}-grams, so candidate
    buckets stay tiny (bucket-bounded equi-join, never all-pairs).
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_expr("tk", SPAN_K)
    fps = (
        docs.select(
            "doc_id", F.expr(tokens_expr("text")).alias("tk")
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(f"transform({sh}, s -> md5(s))")
            ).alias("h"),
        )
        .filter(
            F.expr(
                f"CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT)"
                f" % {SPAN_P} = 0"
            )
        )
        .distinct()
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= SPAN_MIN_SHARED)
        .orderBy("doc_a", "doc_b")
    )


ORACLE["d_span_overlap"] = f"""
  WITH toks AS (
    SELECT doc_id, {sql_tokens('text')} AS tk FROM documents
  ),
  g AS (
    SELECT doc_id,
           UNNEST(list_transform({sql_shingles('tk', SPAN_K)},
                                 s -> md5(s))) AS h
    FROM toks
  ),
  s AS (
    SELECT DISTINCT doc_id, h FROM g
    WHERE CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % {SPAN_P} = 0
  )
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         COUNT(*) AS n_shared
  FROM s a JOIN s b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {SPAN_MIN_SHARED}
  ORDER BY 1, 2
"""


CLS_QUERY_IDS = list(range(10))
CLS_K = 5


def d_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label prediction: classify query vectors by the majority
    label of their 5 exact cosine neighbors — the eval-side companion
    of the ANN family (auto-labeling / label-noise detection in
    embedding space).

    Reuses the fixed-point brute-force kNN (broadcast query side, one
    top-k window); the vote is two tiny aggregates over q×k rows.
    Ties break deterministically: vote count desc, best (lowest)
    neighbor rank asc, label asc.
    """
    from locopy_spark.operators.similarity import knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    nbrs = knn_bruteforce(emb, query_ids=CLS_QUERY_IDS, k=CLS_K)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    votes = (
        nbrs.join(labels, "neighbor_id")
        .groupBy("query_id", "n_label")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("rk").alias("best_rk"),
        )
    )
    pred = votes.groupBy("query_id").agg(
        F.expr(
            "max_by(n_label, struct(cnt, -best_rk, -n_label))"
        ).alias("pred_label"),
        F.max("cnt").alias("n_votes"),
    )
    truth = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        pred.join(truth, "query_id")
        .select("query_id", "true_label", "pred_label", "n_votes")
        .orderBy("query_id")
    )


def _oracle_knn_classify() -> str:
    from locopy_spark.functions.vectors import cosine_from_fixed, sql_fixed_dot

    cos = cosine_from_fixed("dot_fix", "na", "nb")
    ids = ", ".join(str(i) for i in CLS_QUERY_IDS)
    return f"""
      WITH e AS (
        SELECT vec_id, embedding, label,
               {sql_fixed_dot('embedding', 'embedding')} AS norm_fix
        FROM embeddings
      ),
      scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               n.label AS n_label,
               {sql_fixed_dot('q.embedding', 'n.embedding')} AS dot_fix,
               q.norm_fix AS na, n.norm_fix AS nb
        FROM e q JOIN e n ON q.vec_id != n.vec_id
        WHERE q.vec_id IN ({ids})
      ),
      ranked AS (
        SELECT query_id, neighbor_id, n_label,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY {cos} DESC, neighbor_id ASC
               ) AS rk
        FROM scored
      ),
      votes AS (
        SELECT query_id, n_label, COUNT(*) AS cnt, MIN(rk) AS best_rk
        FROM ranked WHERE rk <= {CLS_K}
        GROUP BY 1, 2
      ),
      win AS (
        SELECT query_id, n_label AS pred_label,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY cnt DESC, best_rk ASC, n_label ASC
               ) AS vrk,
               MAX(cnt) OVER (PARTITION BY query_id) AS n_votes
        FROM votes
      )
      SELECT w.query_id, e.label AS true_label, w.pred_label,
             CAST(w.n_votes AS BIGINT) AS n_votes
      FROM win w JOIN e ON w.query_id = e.vec_id
      WHERE w.vrk = 1
      ORDER BY w.query_id
    """


ORACLE["d_knn_classify"] = _oracle_knn_classify()


KMV_K = 256  # sketch size: stderr ≈ sqrt(J(1-J)/256) ≈ 0.03 worst-case


def d_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix from KMV shingle sketches.

    The "which crawls duplicate each other" question, answered without
    any pairwise corpus scan: one pass builds a 256-value KMV sketch of
    each source's distinct 3-gram shingles (operators.sketches — no
    input-sized shuffle: HLL count → md5-prefix admission filter →
    bounded salted top-k), then all S² Jaccard estimates come from the
    S-row sketch table alone. Deterministic md5 order end-to-end, so
    the DuckDB oracle matches exact values (measured accuracy at
    sf0.001: mean |est − exact| = 0.007, max 0.029).
    """
    from locopy_spark.operators.sketches import kmv_jaccard_matrix, kmv_sketch

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "source", F.expr(tokens_expr("text")).alias("toks")
    ).select(
        "source", F.explode(F.expr(shingles_expr("toks", 3))).alias("sh")
    )
    sk = kmv_sketch(sh, "source", "sh", k=KMV_K)
    return kmv_jaccard_matrix(sk, "source", KMV_K).orderBy(
        "source_a", "source_b"
    )


ORACLE["d_kmv_overlap"] = f"""
  WITH t AS (SELECT source, {sql_tokens('text')} AS toks FROM documents),
  sh AS (
    SELECT DISTINCT source, s FROM (
      SELECT source, unnest({sql_shingles('toks', 3)}) AS s FROM t
    )
  ),
  h AS (SELECT source, md5(s) AS h FROM sh),
  rk AS (SELECT source, h,
                row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         FROM h),
  kmv AS (SELECT source, list_sort(list(h)) AS vals,
                 CAST(count(*) AS INT) AS n
          FROM rk WHERE rn <= {KMV_K} GROUP BY source)
  SELECT a.source AS source_a, b.source AS source_b,
         a.n AS n_a, b.n AS n_b,
         CAST(len(list_intersect(
               list_sort(list_distinct(a.vals || b.vals))
                 [1:least({KMV_K}, len(list_distinct(a.vals || b.vals)))],
               list_intersect(a.vals, b.vals))) AS DOUBLE)
           / least({KMV_K}, len(list_distinct(a.vals || b.vals)))
           AS est_jaccard
  FROM kmv a JOIN kmv b ON a.source < b.source
  ORDER BY source_a, source_b
"""


TRAIN_ORDER_N = 200  # emitted prefix of the order (the gate's window)


def train_order_vt(docs: DataFrame) -> DataFrame:
    """The full deterministic stride-scheduled ordering state
    ``(source, doc_id, n_toks, vt)`` — ONE copy of the virtual-time
    construction, shared by ``p_train_order`` (emits the head) and
    ``p_interleave_eval`` (scores the whole order)."""
    from locopy_spark.functions.cache import managed_persist
    from locopy_spark.operators.ranking import grouped_global_row_number

    # persist: the stride aggregate and the rank path both consume the
    # tokenized projection — without it the corpus tokenize runs twice
    per_doc = managed_persist(
        docs.select(
            "source",
            "doc_id",
            F.expr(f"size({tokens_expr('text')})").alias("n_toks"),
            F.md5(F.col("doc_id").cast("string")).alias("__h"),
        ),
        "train_order",
    )
    per_src = per_doc.groupBy("source").agg(
        F.sum("n_toks").cast("long").alias("ntok")
    )
    rk = grouped_global_row_number(
        per_doc, ["source"], ["__h", "doc_id"], out_col="rn"
    )
    return rk.join(F.broadcast(per_src), "source").withColumn(
        "vt", F.col("rn").cast("long") * F.col("ntok")
    )


def p_train_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic interleaved training order: stride scheduling of
    documents across sources, so a trainer consuming the stream head
    sees every source early instead of whole sources back-to-back.

    Each source's r-th doc (r = md5-rank within source — reproducible
    shuffle) gets virtual time vt = r × n_tokens(source): token-heavy
    sources stride slower per doc, token-light sources surface more
    often, equalizing per-source progress weighted by token mass —
    the ordering twin of p_mix_weights' uniform-token target. All vt
    arithmetic is exact bigint (rank × exact token sum), so the global
    (vt, source, doc_id) order is engine-portable with no float ties.

    Scale shape: per-source ranks via grouped_global_row_number (range
    partition + O(P+G) offsets — no one-task-per-source window), a
    G-row broadcast for the strides, and a TakeOrdered head for the
    emitted prefix; the full ordering is a plain range-partitioned
    sort when materializing shards. Emits the first TRAIN_ORDER_N
    positions.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    vt = train_order_vt(docs)
    head = vt.orderBy("vt", "source", "doc_id").limit(TRAIN_ORDER_N)
    w = W.orderBy("vt", "source", "doc_id")  # 200 rows: single task is fine
    return head.select(
        F.row_number().over(w).alias("pos"),
        "source",
        "doc_id",
        "n_toks",
        "vt",
    )


# The shared virtual-time CTE prefix (DuckDB twin of train_order_vt).
# per_doc is referenced by per_src + rk (+ the interleave margins), so
# it is MATERIALIZED — DuckDB inlines multiply-referenced CTEs (the
# q_kcore 3^depth lesson) and would re-tokenize the corpus per ref.
_TRAIN_VT_CTES = f"""per_doc AS MATERIALIZED (
    SELECT source, doc_id,
           CAST(len({sql_tokens('text')}) AS INT) AS n_toks,
           md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents
  ),
  per_src AS (
    SELECT source, CAST(SUM(n_toks) AS BIGINT) AS ntok
    FROM per_doc GROUP BY source
  ),
  rk AS (
    SELECT d.source, d.doc_id, d.n_toks,
           row_number() OVER (
             PARTITION BY d.source ORDER BY d.h, d.doc_id
           ) AS rn
    FROM per_doc d
  ),
  vt AS (
    SELECT rk.source, rk.doc_id, rk.n_toks,
           CAST(rk.rn * per_src.ntok AS BIGINT) AS vt
    FROM rk JOIN per_src USING (source)
  )"""

ORACLE["p_train_order"] = f"""
  WITH {_TRAIN_VT_CTES},
  ord AS (
    SELECT *, row_number() OVER (ORDER BY vt, source, doc_id) AS pos
    FROM vt
  )
  SELECT CAST(pos AS INT) AS pos, source, doc_id, n_toks, vt
  FROM ord WHERE pos <= {TRAIN_ORDER_N} ORDER BY pos
"""


def p_interleave_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz-style interleaving audit of the FULL training
    order: does the stride schedule actually mix sources, or does the
    stream degenerate into same-source blocks? Reports the observed
    number of source-runs against the multinomial-null expectation
    E[R] = N − Σ nᵢ(nᵢ−1)/N as an exact ppm ratio (1e6 ≈ "as mixed
    as a random shuffle"; stride scheduling should land ABOVE — it
    anti-clusters) — the eval that closes the loop on p_train_order
    the way d_lsh_calibration closes it on the MinHash bands.

    Scale shape: shares ``train_order_vt`` (one tokenize, persisted);
    the global position comes from the range-partitioned
    global_row_number (no single-task sort), adjacent positions meet
    in a co-partitioned self-join on pos+1, and the verdict closes
    from three exact counters through DECIMAL(38)/HUGEINT.
    """
    from locopy_spark.operators.ranking import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    vt = train_order_vt(docs)
    ordered = global_row_number(
        vt.select("source", "doc_id", "vt"),
        ["vt", "source", "doc_id"],
        out_col="pos",
    ).select("pos", "source")
    nxt = ordered.select(
        (F.col("pos") - 1).alias("pos"), F.col("source").alias("next_source")
    )
    changes = ordered.join(nxt, "pos").agg(
        F.sum(
            F.expr("case when source <> next_source then 1 else 0 end")
        ).alias("changes")
    )
    margins = (
        vt.groupBy("source")
        .agg(F.count(F.lit(1)).alias("ni"))
        .agg(
            F.sum("ni").alias("n"),
            F.count(F.lit(1)).alias("n_sources"),
            F.expr(
                "sum(cast(ni as decimal(38,0)) * (ni - 1))"
            ).alias("coll"),
        )
    )
    return changes.crossJoin(F.broadcast(margins)).selectExpr(
        "n as n_docs",
        "n_sources",
        "cast(changes + 1 as bigint) as n_runs",
        "cast(cast(changes + 1 as decimal(38,0)) * n * 1000000"
        " div (cast(n as decimal(38,0)) * n - coll) as bigint)"
        " as ratio_ppm",
    )


ORACLE["p_interleave_eval"] = f"""
  WITH {_TRAIN_VT_CTES},
  ord2 AS MATERIALIZED (
    SELECT source, row_number() OVER (ORDER BY vt, source, doc_id) AS pos
    FROM vt
  ),
  ch AS (
    SELECT SUM(CASE WHEN a.source <> b.source THEN 1 ELSE 0 END)
             AS changes
    FROM ord2 a JOIN ord2 b ON b.pos = a.pos + 1
  ),
  m AS (
    SELECT CAST(SUM(ni) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           SUM(CAST(ni AS HUGEINT) * (ni - 1)) AS coll
    FROM (SELECT COUNT(*) AS ni FROM per_doc GROUP BY source)
  )
  SELECT n AS n_docs, n_sources,
         CAST(changes + 1 AS BIGINT) AS n_runs,
         CAST(CAST(changes + 1 AS HUGEINT) * n * 1000000
              // (CAST(n AS HUGEINT) * n - coll) AS BIGINT) AS ratio_ppm
  FROM ch, m
"""


BUDGET_TOKENS_PER_SOURCE = 1000  # uniform per-source token budget (trims at every test SF)


def p_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-budget enforcement: per source, keep the md5-order
    prefix of documents whose cumulative token count stays within the
    budget — the EMIT step that turns p_epoch_plan/p_mix_weights
    budgets into an actual document set (p_sample_corpus emits by
    RATE; this emits by exact cumulative cap, so the kept set's token
    total is the largest achievable ≤ budget in the deterministic
    md5 order). A doc is kept iff the running sum INCLUDING it fits.

    Output: per-source kept/dropped doc and token totals (the trim
    report the corpus build logs). Shape here: one window per source
    (fine at any per-source doc count that fits a task's scan — the
    window is a running SUM, not a sort buffer); at extreme per-source
    cardinality the ranking.global_running_sum prefix-sum operator
    applies per source exactly as p_shard_plan uses it globally.
    Oracle: the same windowed cumulative sum in DuckDB.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        "doc_id",
        F.expr(f"size({tokens_expr('text')})").cast("long").alias("n_toks"),
        F.md5(F.col("doc_id").cast("string")).alias("__h"),
    )
    w = W.partitionBy("source").orderBy("__h", "doc_id")
    cum = per_doc.withColumn("cum", F.sum("n_toks").over(w))
    kept = F.col("cum") <= F.lit(BUDGET_TOKENS_PER_SOURCE)
    return (
        cum.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_toks")).otherwise(F.lit(0))).alias(
                "tokens_kept"
            ),
            F.sum("n_toks").alias("tokens_total"),
        )
        .orderBy("source")
    )


ORACLE["p_budget_trim"] = f"""
  WITH per_doc AS (
    SELECT source, doc_id,
           CAST(len({sql_tokens('text')}) AS BIGINT) AS n_toks,
           md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents
  ),
  cum AS (
    SELECT source, n_toks,
           SUM(n_toks) OVER (
             PARTITION BY source ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM per_doc
  )
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN cum <= {BUDGET_TOKENS_PER_SOURCE}
              THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(CASE WHEN cum <= {BUDGET_TOKENS_PER_SOURCE}
              THEN n_toks ELSE 0 END) AS BIGINT) AS tokens_kept,
         CAST(SUM(n_toks) AS BIGINT) AS tokens_total
  FROM cum GROUP BY source ORDER BY source
"""


# -- sequence-length planning -----------------------------------------------

LEN_BIN_TOKENS = 64  # histogram bin width (tokens)
LEN_BIN_MAX = 32     # overflow bucket: everything ≥ 2048 tokens


def p_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length planning histogram: doc token counts binned at
    {LEN_BIN_TOKENS}-token width (overflow bucket {LEN_BIN_MAX}), with
    per-bin doc count, token mass, and exact cumulative token share
    (ppm) — the table that picks the packing target for
    ``p_pack_sequences`` (what context length wastes the least padding
    for THIS corpus) and sizes truncation loss.

    One partial-aggregated groupBy over the corpus; the cumulative
    window runs over the ≤{LEN_BIN_MAX}+1-row AGGREGATE, so the
    unpartitioned sort is bounded at any SF. The ppm is exact integer
    arithmetic via a DECIMAL(38) product (bigint cum × 1e6 would
    overflow past ~9e12 corpus tokens — a real 100 TB number), floored
    identically on both engines.

    Split into :func:`length_bins` (additive monoid — the streaming
    twin ``streaming.stateful.stream_length_histogram`` maintains it
    per batch) and :func:`length_report` (the bounded finisher both
    sides share).
    """
    return length_report(
        length_bins(load_table(spark, sf_dir, "documents"))
    )


def length_bins(docs: DataFrame) -> DataFrame:
    """Per-bin (n_docs, tokens) counts — a commutative additive monoid,
    shared by the batch query and the streaming state maintainer."""
    n_toks = f"cast(size({tokens_expr('text')}) as bigint)"
    per_doc = docs.select(
        F.expr(
            f"cast(least(({n_toks}) div {LEN_BIN_TOKENS}, {LEN_BIN_MAX}) as int)"
        ).alias("bin"),
        F.expr(n_toks).alias("n_toks"),
    )
    return per_doc.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("tokens"),
    )


def length_report(bins: DataFrame) -> DataFrame:
    """Cumulative-share finisher over the ≤{LEN_BIN_MAX}+1 bin rows."""
    from pyspark.sql.window import Window as W

    w_cum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy()
    return (
        bins.withColumn("cum_tokens", F.sum("tokens").over(w_cum))
        .withColumn("total_tokens", F.sum("tokens").over(w_all))
        .select(
            "bin",
            "n_docs",
            "tokens",
            F.expr(
                "cast((cast(cum_tokens as decimal(38,0)) * 1000000)"
                " div total_tokens as bigint)"
            ).alias("cum_token_ppm"),
        )
        .orderBy("bin")
    )


ORACLE["p_length_histogram"] = f"""
  WITH per_doc AS (
    SELECT CAST(LEAST(CAST(len({sql_tokens('text')}) AS BIGINT)
                      // {LEN_BIN_TOKENS}, {LEN_BIN_MAX}) AS INT) AS bin,
           CAST(len({sql_tokens('text')}) AS BIGINT) AS n_toks
    FROM documents
  ),
  agg AS (
    SELECT bin, COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS tokens
    FROM per_doc GROUP BY 1
  )
  SELECT bin, n_docs, tokens,
         CAST((SUM(tokens) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1000000) // SUM(tokens) OVER () AS BIGINT)
           AS cum_token_ppm
  FROM agg ORDER BY bin
"""


# -- quality-curriculum staging ---------------------------------------------

CURRICULUM_STAGES = 10


def p_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum plan: rank every document by the corpus
    quality score (``t_quality_score``'s formula) and cut the ranking
    into {CURRICULUM_STAGES} exact NTILE stages — the schedule a
    curriculum trainer consumes (stage 1 = highest quality first),
    reported as per-stage doc count, token mass, and mean quality.

    The global ranking uses ``operators.ranking.global_ntile``
    (range-partition + per-partition rank + P-number driver offsets)
    — no one-partition ``Window.orderBy`` — so the sort scales like
    any range-partitioned sort. Mean quality is an exact fixed-point
    sum (floor(q·1e6 + 0.5) bigints) divided once, so the double is
    bit-identical cross-engine.
    """
    from locopy_spark.functions.text import quality_score_expr
    from locopy_spark.operators.ranking import global_ntile

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "text", F.expr(tokens_expr("text")).alias("toks")
    )
    scored = (
        toks.select(
            "doc_id",
            F.expr("cast(size(toks) as bigint)").alias("n_tokens"),
            # the shared single-source quality kernel (functions/text.py)
            F.expr(quality_score_expr("toks", "text")).alias("q"),
        )
        # descending quality via an ascending negated key (global_ntile
        # range-partitions ascending); doc_id makes the order total
        .withColumn("neg_q", -F.col("q"))
    )
    staged = global_ntile(
        scored, ["neg_q", "doc_id"], CURRICULUM_STAGES, out_col="stage"
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.expr(
                "cast(sum(cast(floor(q * 1000000 + 0.5) as bigint))"
                " as double) / 1000000 / count(1)"
            ).alias("mean_quality"),
        )
        .orderBy("stage")
    )


def _oracle_curriculum() -> str:
    from locopy_spark.functions.text import sql_quality_score

    return f"""
      WITH t AS (
        SELECT doc_id, text, {sql_tokens('text')} AS toks FROM documents
      ),
      q AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               {sql_quality_score('toks', 'text')} AS q
        FROM t
      ),
      r AS (
        SELECT n_tokens, q,
               NTILE({CURRICULUM_STAGES}) OVER (ORDER BY q DESC, doc_id)
                 AS stage
        FROM q
      )
      SELECT CAST(stage AS INT) AS stage,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens,
             CAST(SUM(CAST(FLOOR(q * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000 / COUNT(*) AS mean_quality
      FROM r GROUP BY 1 ORDER BY 1
    """


ORACLE["p_curriculum_stages"] = _oracle_curriculum()


# -- tokenizer fertility ----------------------------------------------------

def p_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility report per (source, lang): chars per
    BPE-ish token and BPE tokens per whitespace word — the planning
    numbers that turn a byte budget into a token budget per domain
    (fertility varies by language/domain; a corpus plan priced in
    bytes mis-budgets tokens without this table).

    One partial-aggregated groupBy over the corpus (both token counts
    are row-local regexp/array work inside the scan projection — no
    explode, nothing but the (source, lang) aggregate ever shuffles).
    Ratios are exact milli-units via DECIMAL(38) products (bigint
    chars × 1000 overflows past ~9e15 corpus chars — a 100 TB-real
    number), floored identically on both engines.

    Split into :func:`fertility_counts` (additive monoid — the
    streaming twin ``streaming.stateful.stream_fertility`` maintains
    it per batch) and :func:`fertility_report` (the shared ratio
    finisher).
    """
    return fertility_report(
        fertility_counts(load_table(spark, sf_dir, "documents"))
    )


def fertility_counts(docs: DataFrame) -> DataFrame:
    """Per-(source, lang) additive counts — a commutative monoid,
    shared by the batch query and the streaming state maintainer."""
    from locopy_spark.functions.text import BPE_ISH

    per = docs.select(
        "source",
        "lang",
        F.expr("cast(length(text) as bigint)").alias("n_chars"),
        F.expr(f"cast(regexp_count(text, '{BPE_ISH}') as bigint)").alias(
            "n_bpe"
        ),
        F.expr(f"cast(size({tokens_expr('text')}) as bigint)").alias("n_ws"),
    )
    return per.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
        F.sum("n_bpe").alias("bpe_tokens"),
        F.sum("n_ws").alias("ws_tokens"),
    )


def fertility_report(counts: DataFrame) -> DataFrame:
    """Exact milli-unit ratio finisher over the (source, lang) counts."""
    return counts.select(
        "source",
        "lang",
        "n_docs",
        "chars",
        "bpe_tokens",
        "ws_tokens",
        F.expr(
            "cast((cast(chars as decimal(38,0)) * 1000)"
            " div bpe_tokens as bigint)"
        ).alias("chars_per_bpe_milli"),
        F.expr(
            "cast((cast(bpe_tokens as decimal(38,0)) * 1000)"
            " div ws_tokens as bigint)"
        ).alias("bpe_per_ws_milli"),
    ).orderBy("source", "lang")


def _oracle_tokenizer_fertility() -> str:
    from locopy_spark.functions.text import BPE_ISH as _BPE

    return f"""
      WITH per AS (
        SELECT source, lang,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '{{bpe}}')) AS BIGINT)
                 AS n_bpe,
               CAST(len({sql_tokens('text')}) AS BIGINT) AS n_ws
        FROM documents
      )
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars,
             CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
             CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
             CAST(SUM(n_chars) * 1000 // SUM(n_bpe) AS BIGINT)
               AS chars_per_bpe_milli,
             CAST(SUM(n_bpe) * 1000 // SUM(n_ws) AS BIGINT)
               AS bpe_per_ws_milli
      FROM per GROUP BY 1, 2 ORDER BY 1, 2
    """.format(bpe=_BPE)


ORACLE["p_tokenizer_fertility"] = _oracle_tokenizer_fertility()


# -- PPS (probability-proportional-to-size) sampling ------------------------

PPS_K = 100  # sample slots


def d_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic PPS sample: {PPS_K} sample slots
    spread evenly over the corpus TOKEN mass in md5 order, each doc
    keeping as many slots as multiples of total/{PPS_K} its token
    interval covers — selection probability ∝ token count, the
    standard design for token-weighted eval/inspection samples
    (``d_reservoir_sample`` is the uniform-per-DOC counterpart; a
    10-token doc and a 10k-token doc are NOT equally representative
    of the training distribution).

    Exactness and scale: the token intervals come from
    ``operators.ranking.global_running_sum`` (range-partitioned
    exclusive prefix sums — no one-partition window), slot crossings
    are pure integer arithmetic (DECIMAL(38) products: cum × K
    overflows bigint at real corpus sizes), and the md5 order makes
    the selected set identical on any engine, partitioning, or rerun.
    """
    from locopy_spark.operators.ranking import global_running_sum

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        "source",
        F.expr(f"cast(size({tokens_expr('text')}) as bigint)").alias(
            "n_toks"
        ),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    cum = global_running_sum(
        per_doc, ["h", "doc_id"], "n_toks", out_col="cum_excl"
    )
    total = per_doc.agg(F.sum("n_toks").alias("total"))
    slots = (
        cum.join(F.broadcast(total))
        .withColumn(
            "n_slots",
            F.expr(
                f"cast((cast(cum_excl + n_toks as decimal(38,0)) * {PPS_K})"
                " div total as bigint)"
                f" - cast((cast(cum_excl as decimal(38,0)) * {PPS_K})"
                " div total as bigint)"
            ),
        )
    )
    return (
        slots.filter(F.col("n_slots") >= 1)
        .select("doc_id", "source", "n_toks", "n_slots")
        .orderBy("doc_id")
    )


ORACLE["d_pps_sample"] = f"""
  WITH per_doc AS (
    SELECT doc_id, source,
           CAST(len({sql_tokens('text')}) AS BIGINT) AS n_toks,
           md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents
  ),
  cum AS (
    SELECT doc_id, source, n_toks,
           COALESCE(SUM(n_toks) OVER (
             ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cum_excl,
           CAST(SUM(n_toks) OVER () AS BIGINT) AS total
    FROM per_doc
  )
  SELECT doc_id, source, n_toks,
         CAST(((cum_excl + n_toks) * {PPS_K}) // total
              - (cum_excl * {PPS_K}) // total AS BIGINT) AS n_slots
  FROM cum
  WHERE ((cum_excl + n_toks) * {PPS_K}) // total
        - (cum_excl * {PPS_K}) // total >= 1
  ORDER BY doc_id
"""


# -- per-source dataset card ------------------------------------------------


def p_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: the one-stop corpus report a data team
    publishes with a training set — document count, language
    diversity, exact-duplicate mass, token mass, and the length
    distribution's center (exact median chars) per source.

    Scale shape: every per-doc metric (tokens, normalized md5) is a
    row-local projection inside one scan; the duplicate count and the
    aggregates are source-keyed partial aggregations (shuffle rows =
    |sources| × small), and the median is the repo's type-1
    rank-select over per-source windows (each bounded by that
    source's doc count — at extreme scale swap in the
    range-partitioned global_ntile). Exact everywhere: token counts
    are integers, the mean closes as one double division of two exact
    bigints (identical IEEE op both engines).
    """
    from pyspark.sql.window import Window

    from locopy_spark.operators.dedup import normalized_text_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        "n_chars",
        F.expr(f"size({tokens_expr('text')})").alias("n_toks"),
        F.expr(f"md5({normalized_text_expr('text')})").alias("h"),
    )
    wr = Window.partitionBy("source").orderBy("n_chars")
    wn = Window.partitionBy("source")
    med = (
        base.withColumn("__rn", F.row_number().over(wr))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .groupBy("source")
        .agg(
            F.max(
                F.expr(
                    "case when __rn = cast(ceil(0.5 * __n) as bigint)"
                    " then n_chars end"
                )
            ).alias("median_chars")
        )
    )
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_exact_dups"),
        F.sum("n_toks").alias("total_tokens"),
        F.expr(
            "cast(sum(n_chars) as double) / cast(count(1) as double)"
        ).alias("avg_chars"),
    )
    return (
        agg.join(med, "source")
        .select(
            "source", "n_docs", "n_langs", "n_exact_dups",
            "total_tokens", "median_chars", "avg_chars",
        )
        .orderBy("source")
    )


ORACLE["p_dataset_card"] = f"""
  WITH base AS (
    SELECT source, lang, n_chars,
           CAST(len({sql_tokens("text")}) AS BIGINT) AS n_toks,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
    FROM documents
  ),
  r AS (
    SELECT source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS n
    FROM base
  ),
  med AS (
    SELECT source,
           MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                    THEN n_chars END) AS median_chars
    FROM r GROUP BY 1
  ),
  agg AS (
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(*) - COUNT(DISTINCT h) AS n_exact_dups,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE)
             AS avg_chars
    FROM base GROUP BY 1
  )
  SELECT a.source, n_docs, n_langs, n_exact_dups,
         total_tokens, median_chars, avg_chars
  FROM agg a JOIN med m ON a.source = m.source
  ORDER BY a.source
"""


# -- count-min sketch -------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_PROBE_K = 20


def _cms_col_spark(key: str, r: str) -> str:
    """Row-``r`` hash column of ``key`` (Spark SQL) — md5-seeded like
    the bloom positions (tpch_ext._bloom_pos_spark), identical hex on
    both engines."""
    return (
        f"cast(conv(substring(md5(concat(cast({r} as string), ':', {key})),"
        f" 1, 8), 16, 10) as bigint) % {CMS_WIDTH}"
    )


def _cms_col_duck(key: str, r: str) -> str:
    """DuckDB twin of :func:`_cms_col_spark`."""
    return (
        f"CAST(('0x' || substr(md5(CAST({r} AS VARCHAR) || ':' || {key}),"
        f" 1, 8)) AS BIGINT) % {CMS_WIDTH}"
    )


def cms_cells(docs: DataFrame) -> DataFrame:
    """Count-min sketch cells over the corpus token stream: for each
    of CMS_DEPTH md5-seeded hash rows, per-cell total occurrence
    counts — a CMS_DEPTH × CMS_WIDTH additive monoid (cells sum), so
    per-batch sketches merge into a stream-maintained one
    (stream_cms) and any batching equals the batch build.

    Build goes THROUGH the vocab aggregate (token → count) rather
    than hashing every occurrence: the per-doc token explosion
    reduces map-side to vocab size, and the depth expansion then runs
    over |vocab| rows, not |occurrences| — at 100 TB the hash work
    scales with vocabulary, the scan with the corpus."""
    toks = docs.select(
        F.explode(F.expr(tokens_expr("text"))).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    return (
        vocab.select(
            F.explode(F.expr(f"sequence(1, {CMS_DEPTH})")).alias("r"),
            "token",
            "c",
        )
        .select("r", F.expr(_cms_col_spark("token", "r")).alias("col"), "c")
        .groupBy("r", "col")
        .agg(F.sum("c").alias("v"))
    )


def cms_estimate(cells: DataFrame, probes: DataFrame) -> DataFrame:
    """Probe a CMS cell table with ``probes (token, true_c)``: min over
    the CMS_DEPTH row estimates, plus the overestimate mass.  Shared
    finisher between the batch ``t_cms_counts`` and the streaming
    maintainer (``streaming.stateful.stream_cms``) — both read the
    same d×w additive state through this."""
    probe_pos = probes.select(
        "token",
        "true_c",
        F.explode(F.expr(f"sequence(1, {CMS_DEPTH})")).alias("r"),
    ).select(
        "token", "true_c", "r",
        F.expr(_cms_col_spark("token", "r")).alias("col"),
    )
    est = (
        probe_pos.join(F.broadcast(cells), ["r", "col"])
        .groupBy("token", "true_c")
        .agg(F.min("v").alias("est_c"))
    )
    return est.select(
        "token", "true_c", "est_c",
        (F.col("est_c") - F.col("true_c")).alias("over"),
    ).orderBy(F.desc("true_c"), "token")


def t_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, measured: build a
    CMS_DEPTH×CMS_WIDTH CMS over the corpus token stream, probe it
    with the true top-CMS_PROBE_K tokens, and report estimated vs
    exact counts — the mergeable frequency sketch that answers "how
    often does token X occur" from O(d·w) state instead of a
    vocab-sized table (the sketch family's counter, next to HLL
    cardinality / KMV overlap / bloom membership / GK quantiles).

    Exactness story: the sketch is DETERMINISTIC given the md5 row
    seeds — each cell is an exact integer sum over the tokens hashing
    into it — so the DuckDB oracle rebuilds the identical sketch and
    the driver checks exact values, not tolerances. CMS guarantees
    est ≥ true (overestimate-only); ``over`` is the per-probe
    collision mass, the quantity a capacity decision reads.
    """
    from locopy_spark.functions.cache import managed_persist

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr(tokens_expr("text"))).alias("token")
    )
    vocab = managed_persist(
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("c")), "cms"
    )
    cells = (
        vocab.select(
            F.explode(F.expr(f"sequence(1, {CMS_DEPTH})")).alias("r"),
            "token",
            "c",
        )
        .select("r", F.expr(_cms_col_spark("token", "r")).alias("col"), "c")
        .groupBy("r", "col")
        .agg(F.sum("c").alias("v"))
    )
    probes = (
        vocab.orderBy(F.desc("c"), "token")
        .limit(CMS_PROBE_K)
        .select("token", F.col("c").alias("true_c"))
    )
    return cms_estimate(cells, probes)


ORACLE["t_cms_counts"] = f"""
  WITH toks AS (
    SELECT unnest({sql_tokens("text")}) AS token FROM documents
  ),
  vocab AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY 1),
  cells AS (
    SELECT r, {_cms_col_duck("token", "r")} AS col,
           CAST(SUM(c) AS BIGINT) AS v
    FROM vocab, (SELECT unnest(generate_series(1, {CMS_DEPTH})) AS r)
    GROUP BY 1, 2
  ),
  probes AS (
    SELECT token, c AS true_c FROM vocab
    ORDER BY c DESC, token LIMIT {CMS_PROBE_K}
  ),
  probe_pos AS (
    SELECT token, true_c, r, {_cms_col_duck("token", "r")} AS col
    FROM probes, (SELECT unnest(generate_series(1, {CMS_DEPTH})) AS r)
  )
  SELECT p.token, CAST(p.true_c AS BIGINT) AS true_c,
         MIN(ce.v) AS est_c,
         MIN(ce.v) - CAST(p.true_c AS BIGINT) AS over
  FROM probe_pos p JOIN cells ce ON p.r = ce.r AND p.col = ce.col
  GROUP BY 1, 2
  ORDER BY true_c DESC, token
"""


# -- vocabulary coverage curve ------------------------------------------------

VOCAB_COVERAGE_PCTS = [10, 25, 50]


def p_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — what share of all token
    occurrences the most-frequent p % of the vocabulary covers
    (p ∈ {VOCAB_COVERAGE_PCTS}) — the Zipf-head read behind
    tokenizer-vocab sizing: if 10 % of types already cover 95 % of
    occurrences, a smaller vocab trades little.

    Exact construction: one token-count aggregate (vocabulary-sized —
    the only data-volume shuffle), a range-partitioned global rank
    under the total order (count desc, token), then a broadcast
    3-row percentile table; head sizes are exact ceilings
    k_p = ⌈V·p/100⌉ and coverage closes as integer ppm through
    DECIMAL(38)/HUGEINT. No top-k heap, no one-partition sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage_report(vocab_counts(docs))


def vocab_counts(docs: DataFrame) -> DataFrame:
    """Additive vocabulary state ``(tok, c)`` — merges by token, so a
    streaming maintainer (``streaming.stateful.stream_vocab``) holds
    exactly this vocabulary-sized table."""
    return (
        docs.select(F.explode(F.expr(tokens_expr("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def vocab_coverage_report(counts: DataFrame) -> DataFrame:
    """The coverage-curve finisher over the vocabulary state — shared
    by the batch query and the streaming state view."""
    from locopy_spark.operators.ranking import global_row_number

    spark = counts.sparkSession
    ranked = global_row_number(
        counts.select("tok", "c", F.expr("-c").alias("negc")),
        ["negc", "tok"],
        out_col="rn",
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("v"), F.sum("c").alias("total_occ")
    )
    pcts = spark.createDataFrame(
        [(p,) for p in VOCAB_COVERAGE_PCTS], "pct long"
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(pcts))
        .filter(F.expr("rn <= (v * pct + 99) div 100"))
        .groupBy("pct")
        .agg(
            F.max(F.expr("(v * pct + 99) div 100")).alias("k_types"),
            F.max("v").alias("vocab"),
            F.sum("c").alias("covered_occ"),
            F.max("total_occ").alias("total_occ"),
        )
        .select(
            "pct",
            "vocab",
            "k_types",
            "covered_occ",
            "total_occ",
            F.expr(
                "CAST(CAST(covered_occ AS DECIMAL(38,0)) * 1000000"
                " div total_occ AS BIGINT)"
            ).alias("coverage_ppm"),
        )
        .orderBy("pct")
    )


ORACLE["p_vocab_coverage"] = f"""
  WITH counts AS (
    SELECT tok, COUNT(*) AS c
    FROM (SELECT UNNEST({sql_tokens('text')}) AS tok FROM documents)
    WHERE tok != ''
    GROUP BY tok
  ),
  ranked AS (
    SELECT c, ROW_NUMBER() OVER (ORDER BY -c, tok) AS rn FROM counts
  ),
  tot AS (
    SELECT COUNT(*) AS v, CAST(SUM(c) AS BIGINT) AS total_occ FROM counts
  ),
  pcts AS (SELECT UNNEST({VOCAB_COVERAGE_PCTS}) AS pct)
  SELECT pct, MAX(v) AS vocab,
         CAST(MAX((v * pct + 99) // 100) AS BIGINT) AS k_types,
         CAST(SUM(c) AS BIGINT) AS covered_occ,
         CAST(MAX(total_occ) AS BIGINT) AS total_occ,
         CAST(CAST(SUM(c) AS HUGEINT) * 1000000
              // MAX(total_occ) AS BIGINT) AS coverage_ppm
  FROM ranked, tot, pcts
  WHERE rn <= (v * pct + 99) // 100
  GROUP BY pct ORDER BY pct
"""


def p_dedup_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup savings report per source: how many documents and tokens
    token-SET fingerprint dedup (md5 of the sorted DISTINCT token
    list, keep-smallest-id) would remove from each source — the
    capacity/budget readout a pipeline owner checks before paying for
    a full MinHash pass.  The vocabulary fingerprint is the
    aggressive end of the dedup ladder (same word set = near-certain
    duplicate even under reordering/repetition — exactly the
    transformation this corpus's near-dups exhibit, where
    whitespace-normalized md5 fires on nothing).  A duplicate is
    charged to the source holding the REMOVED copy (its keeper may
    live elsewhere).

    Fingerprints are row-local; one shuffle on the uniform 128-bit
    hash key (join back to the keeper id), one |sources| rollup;
    exact ppm integers.
    """
    d = load_table(spark, sf_dir, "documents")
    return dedup_yield_report(dedup_yield_state(d))


def dedup_yield_state(docs: DataFrame) -> DataFrame:
    """(source, doc_id, fingerprint, n_tok) rows — row-local, a SET
    (doc_ids unique), the state shared with the streaming twin."""
    fp = (
        "md5(concat_ws(' ',"
        f" array_sort(array_distinct({tokens_expr('text')}))))"
    )
    return docs.select(
        "source",
        "doc_id",
        F.expr(fp).alias("h"),
        F.expr(f"size({tokens_expr('text')})").alias("n_tok"),
    )


def dedup_yield_report(base: DataFrame) -> DataFrame:
    """Savings finisher over the fingerprint state: keeper ids by
    hash, removed-copy charges per source, exact ppm."""
    keep = base.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    flagged = base.join(keep, "h").select(
        "source",
        F.expr("cast(doc_id != keep_id as int)").alias("is_dup"),
        "n_tok",
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("is_dup").alias("n_dup"),
            F.sum("n_tok").alias("tokens_total"),
            F.sum(F.expr("case when is_dup = 1 then n_tok else 0 end")).alias(
                "tokens_dup"
            ),
        )
        .select(
            "source",
            "n_docs",
            "n_dup",
            "tokens_total",
            "tokens_dup",
            F.expr(
                "CAST(CAST(n_dup AS DECIMAL(38,0)) * 1000000"
                " div n_docs AS BIGINT)"
            ).alias("dup_doc_ppm"),
            F.expr(
                "CAST(CAST(tokens_dup AS DECIMAL(38,0)) * 1000000"
                " div tokens_total AS BIGINT)"
            ).alias("dup_token_ppm"),
        )
        .orderBy("source")
    )


ORACLE["p_dedup_yield"] = f"""
  WITH base AS (
    SELECT source, doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))), ' ')) AS h,
           len({sql_tokens('text')}) AS n_tok
    FROM documents
  ),
  keep AS (SELECT h, MIN(doc_id) AS keep_id FROM base GROUP BY 1),
  f AS (
    SELECT source, CAST(doc_id != keep_id AS INT) AS is_dup, n_tok
    FROM base JOIN keep USING (h)
  )
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(is_dup) AS BIGINT) AS n_dup,
         CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
         CAST(SUM(CASE WHEN is_dup = 1 THEN n_tok ELSE 0 END) AS BIGINT)
           AS tokens_dup,
         CAST(CAST(SUM(is_dup) AS HUGEINT) * 1000000
              // COUNT(*) AS BIGINT) AS dup_doc_ppm,
         CAST(CAST(SUM(CASE WHEN is_dup = 1 THEN n_tok ELSE 0 END)
              AS HUGEINT) * 1000000 // SUM(n_tok) AS BIGINT)
           AS dup_token_ppm
  FROM f GROUP BY 1 ORDER BY source
"""


# -- checkpoint-resume plan ---------------------------------------------------

RESUME_PCTS = [25, 50, 90]


def p_resume_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-resume plan over the training stream: for each
    consumed-token checkpoint (RESUME_PCTS percent of the corpus
    budget), the exact resume position in the deterministic md5
    document order p_shard_plan shards by — documents/tokens already
    consumed, the first unconsumed document, and the shard it lives
    in (``prefix·N_SHARDS div total``, the same assignment formula) —
    the lookup a dataloader performs when restarting mid-epoch
    without replaying or re-shuffling anything.

    Shape: the one distributed prefix sum (operators.ranking.
    global_running_sum — range partition + O(P) driver offsets, no
    one-partition window) is shared by both aggregates; checkpoints
    ride as a broadcast 3-row table, so the cross join is a map-side
    constant expansion and both aggregations partial-combine.  A doc
    is consumed iff its INCLUSIVE prefix fits the checkpoint (docs
    are atomic — resume never splits a document); RESUME_PCTS < 100
    guarantees an unconsumed resume doc exists.  Exactness: integer
    token counts, integer div — no float anywhere.
    """
    from locopy_spark.functions.cache import managed_persist
    from locopy_spark.operators.ranking import global_running_sum

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        F.expr(f"size({tokens_expr('text')})").cast("long").alias("n_toks"),
        F.expr("md5(CAST(doc_id AS STRING))").alias("hk"),
    )
    run = managed_persist(
        global_running_sum(
            per_doc, order_cols=["hk"], value_col="n_toks",
            out_col="prefix_toks",
        ),
        "resume_plan",
    )
    cks = (
        run.agg(
            F.sum("n_toks").alias("tot"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            F.explode(
                F.array(*[F.lit(p) for p in RESUME_PCTS])
            ).alias("pct"),
            "tot",
            "n_docs",
        )
        .withColumn("ckpt", F.expr("tot * pct div 100"))
    )
    x = run.join(F.broadcast(cks))
    consumed = (
        x.filter("prefix_toks + n_toks <= ckpt")
        .groupBy("pct")
        .agg(
            F.count(F.lit(1)).alias("docs_done"),
            F.sum("n_toks").alias("toks_done"),
        )
    )
    resume = (
        x.filter("prefix_toks + n_toks > ckpt")
        .groupBy("pct")
        .agg(
            F.min_by("doc_id", "hk").alias("resume_doc"),
            F.min_by("prefix_toks", "hk").alias("resume_prefix"),
        )
    )
    return (
        cks.join(consumed, "pct", "left")
        .join(resume, "pct", "left")
        .select(
            "pct",
            F.col("ckpt").alias("checkpoint_toks"),
            F.coalesce("docs_done", F.lit(0)).alias("docs_done"),
            F.coalesce("toks_done", F.lit(0)).alias("toks_done"),
            (F.col("n_docs") - F.coalesce("docs_done", F.lit(0))).alias(
                "docs_left"
            ),
            (F.col("tot") - F.coalesce("toks_done", F.lit(0))).alias(
                "toks_left"
            ),
            "resume_doc",
            F.expr(f"resume_prefix * {N_SHARDS} div tot").alias(
                "resume_shard"
            ),
        )
        .orderBy("pct")
    )


ORACLE["p_resume_plan"] = f"""
  WITH d AS (
    SELECT doc_id,
           CAST(len({sql_tokens('text')}) AS BIGINT) AS n_toks,
           md5(CAST(doc_id AS VARCHAR)) AS hk
    FROM documents
  ),
  r AS (
    SELECT doc_id, n_toks, hk,
           COALESCE(SUM(n_toks) OVER (
             ORDER BY hk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS prefix_toks
    FROM d
  ),
  t AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS tot,
               COUNT(*) AS n_docs FROM d),
  c AS (
    SELECT pct, (t.tot * pct) // 100 AS ckpt, t.tot, t.n_docs
    FROM (SELECT unnest({RESUME_PCTS}) AS pct), t
  ),
  agg AS (
    SELECT c.pct, c.ckpt, c.tot, c.n_docs,
           COUNT(*) FILTER (r.prefix_toks + r.n_toks <= c.ckpt)
             AS docs_done,
           COALESCE(SUM(r.n_toks) FILTER (
             r.prefix_toks + r.n_toks <= c.ckpt), 0) AS toks_done,
           ARG_MIN(r.doc_id, r.hk) FILTER (
             r.prefix_toks + r.n_toks > c.ckpt) AS resume_doc,
           ARG_MIN(r.prefix_toks, r.hk) FILTER (
             r.prefix_toks + r.n_toks > c.ckpt) AS resume_prefix
    FROM c, r GROUP BY 1, 2, 3, 4
  )
  SELECT pct, CAST(ckpt AS BIGINT) AS checkpoint_toks,
         CAST(docs_done AS BIGINT) AS docs_done,
         CAST(toks_done AS BIGINT) AS toks_done,
         CAST(n_docs - docs_done AS BIGINT) AS docs_left,
         CAST(tot - toks_done AS BIGINT) AS toks_left,
         resume_doc,
         CAST(resume_prefix * {N_SHARDS} // tot AS BIGINT) AS resume_shard
  FROM agg ORDER BY pct
"""

# -- per-source unigram concentration (Simpson) + Zipf conformance -----------
#
# Shared scaffolding: ``source_token_counts`` reduces the corpus to the
# per-(source, token) count table ONCE (additive monoid — the streaming
# maintainer ``streaming.stateful.stream_simpson`` holds exactly this
# state); both finishers below consume it, so a pipeline that wants both
# reports pays one corpus scan.


def source_token_counts(docs: DataFrame) -> DataFrame:
    """Additive per-source vocabulary state ``(source, tok, c)`` —
    merges by (source, token); map-side partial aggregation reduces
    the shuffle to vocabulary size per source, never occurrences."""
    return (
        docs.select(
            "source",
            F.explode(F.expr(tokens_expr("text"))).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def simpson_report(counts: DataFrame) -> DataFrame:
    """Simpson-concentration finisher over the (source, tok, c) state:
    per source, the exact probability (ppm) that two tokens drawn
    without replacement are the same type — the lexical-concentration
    screen (high = templated/repetitive source; 1/Simpson is the
    "effective vocabulary").  Complements t_ttr (per-document
    diversity): Simpson is corpus-level, so cross-document repetition
    a per-doc TTR can't see moves it.

    Exactness: Σc(c-1) and N(N-1) widen through DECIMAL(38)/HUGEINT
    BEFORE the products (c and N are corpus-scale at 100 TB — the
    bigint squares would wrap); one non-negative integer floor
    division closes the ppm. One |sources|-bounded aggregate."""
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum(
                F.expr("CAST(c AS DECIMAL(38,0)) * (c - 1)")
            ).alias("sumc2"),
        )
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("vocab").cast("long").alias("vocab"),
            F.expr(
                "CAST(CASE WHEN n_tokens < 2 THEN 0 ELSE"
                " CAST(sumc2 AS DECIMAL(38,0)) * 1000000"
                " div (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1))"
                " END AS BIGINT)"
            ).alias("simpson_ppm"),
        )
        .orderBy("source")
    )


def t_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Simpson lexical concentration over unigram counts —
    see :func:`simpson_report` (the finisher) and
    :func:`source_token_counts` (the shared additive state)."""
    docs = load_table(spark, sf_dir, "documents")
    return simpson_report(source_token_counts(docs))


def _sql_source_token_counts() -> str:
    return f"""
    SELECT source, tok, COUNT(*) AS c
    FROM (SELECT source, UNNEST({sql_tokens('text')}) AS tok
          FROM documents)
    WHERE tok != ''
    GROUP BY source, tok
"""


ORACLE["t_simpson_diversity"] = f"""
  WITH counts AS ({_sql_source_token_counts()})
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(CASE WHEN SUM(c) < 2 THEN 0 ELSE
              SUM(CAST(c AS HUGEINT) * (c - 1)) * 1000000
              // (CAST(SUM(c) AS HUGEINT) * (SUM(c) - 1)) END
              AS BIGINT) AS simpson_ppm
  FROM counts GROUP BY source ORDER BY source
"""


ZIPF_TOP_K = 100


def zipf_report(counts: DataFrame) -> DataFrame:
    """Zipf-conformance finisher over the (source, tok, c) state: for
    each source's top-K tokens under the total order (count DESC,
    token ASC), the mean absolute deviation (ppm of the top count)
    of ``rank · count`` from the top count — exactly 0 under a
    perfect Zipf law (c_r = c_1 / r), growing as the head flattens
    or steepens.  No logarithms anywhere (a log-log regression slope
    is the textbook fit but log is not cross-engine exact); the
    rank-weighted residual is the integer-exact conformance statistic.

    Shape: ranks come from operators.ranking.grouped_global_row_number
    (range-partitioned — no one-task-per-source sort of a 100 TB
    source's vocabulary); c1 is a |sources|-row broadcast joined back
    to the ≤ K·|sources| surviving rows; products widen through
    DECIMAL(38) before the ppm division."""
    from locopy_spark.operators.ranking import grouped_global_row_number

    ranked = grouped_global_row_number(
        counts.select("source", "tok", "c", F.expr("-c").alias("negc")),
        group_cols=["source"],
        order_cols=["negc", "tok"],
        out_col="rn",
    ).filter(F.col("rn") <= ZIPF_TOP_K)
    c1 = ranked.filter("rn = 1").select(
        "source", F.col("c").alias("c1")
    )
    return (
        ranked.join(F.broadcast(c1), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("k_used"),
            F.max("c1").alias("top_count"),
            F.sum(
                F.expr("ABS(CAST(rn AS DECIMAL(38,0)) * c - c1)")
            ).alias("sum_abs"),
        )
        .select(
            "source",
            F.col("k_used").cast("long").alias("k_used"),
            F.col("top_count").cast("long").alias("top_count"),
            F.expr(
                "CAST(CAST(sum_abs AS DECIMAL(38,0)) * 1000000"
                " div (CAST(k_used AS DECIMAL(38,0)) * top_count)"
                " AS BIGINT)"
            ).alias("zipf_dev_ppm"),
        )
        .orderBy("source")
    )


def t_zipf_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf-law conformance of the unigram frequency head —
    see :func:`zipf_report`; shares :func:`source_token_counts` with
    t_simpson_diversity (one corpus scan serves both)."""
    docs = load_table(spark, sf_dir, "documents")
    return zipf_report(source_token_counts(docs))


ORACLE["t_zipf_deviation"] = f"""
  WITH counts AS ({_sql_source_token_counts()}),
  ranked AS (
    SELECT source, c,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY c DESC, tok) AS rn
    FROM counts
  ),
  top AS (SELECT * FROM ranked WHERE rn <= {ZIPF_TOP_K}),
  c1 AS (SELECT source, c AS c1 FROM top WHERE rn = 1)
  SELECT t.source, CAST(COUNT(*) AS BIGINT) AS k_used,
         CAST(MAX(c1.c1) AS BIGINT) AS top_count,
         CAST(SUM(ABS(CAST(t.rn AS HUGEINT) * t.c - c1.c1)) * 1000000
              // (CAST(COUNT(*) AS HUGEINT) * MAX(c1.c1))
              AS BIGINT) AS zipf_dev_ppm
  FROM top t JOIN c1 ON t.source = c1.source
  GROUP BY t.source ORDER BY t.source
"""


def hapax_report(counts: DataFrame) -> DataFrame:
    """Vocabulary-richness finisher over the (source, tok, c) state:
    per source, the hapax-legomenon share (types seen exactly once)
    and dis-legomenon share (exactly twice) of the vocabulary, in ppm
    — the OCR-noise / synthetic-text screen (corrupted extraction
    inflates hapaxes; templated generation starves them).  Third
    consumer of the shared ``source_token_counts`` scan/state after
    simpson_report and zipf_report — one corpus pass serves all three.

    Exactness: pure counts and two non-negative integer floor
    divisions (vocab-scaled products stay far below DECIMAL(38) but
    widen anyway for 100 TB headroom); one |sources|-bounded
    aggregate."""
    return (
        counts.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            F.sum(F.expr("CASE WHEN c = 1 THEN 1 ELSE 0 END")).alias(
                "hapax"
            ),
            F.sum(F.expr("CASE WHEN c = 2 THEN 1 ELSE 0 END")).alias(
                "dis"
            ),
        )
        .select(
            "source",
            F.col("vocab").cast("long").alias("vocab"),
            F.col("hapax").cast("long").alias("hapax"),
            F.expr(
                "CAST(CAST(hapax AS DECIMAL(38,0)) * 1000000 div vocab"
                " AS BIGINT)"
            ).alias("hapax_ppm"),
            F.expr(
                "CAST(CAST(dis AS DECIMAL(38,0)) * 1000000 div vocab"
                " AS BIGINT)"
            ).alias("dis_ppm"),
        )
        .orderBy("source")
    )


def t_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax/dis-legomenon vocabulary-richness shares —
    see :func:`hapax_report`; third finisher on the shared
    :func:`source_token_counts` state (stream twin:
    ``streaming.stateful.stream_simpson`` — same state view)."""
    docs = load_table(spark, sf_dir, "documents")
    return hapax_report(source_token_counts(docs))


ORACLE["t_hapax_ratio"] = f"""
  WITH counts AS ({_sql_source_token_counts()})
  SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
         CAST(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS HUGEINT)
              * 1000000 // COUNT(*) AS BIGINT) AS hapax_ppm,
         CAST(CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS HUGEINT)
              * 1000000 // COUNT(*) AS BIGINT) AS dis_ppm
  FROM counts GROUP BY source ORDER BY source
"""


# -- vocabulary growth (Heaps' law checkpoints) -------------------------------

VG_CHECKPOINTS = 10


def t_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth curve (Heaps' law audit): cumulative distinct
    vocabulary vs cumulative token count at 10 corpus checkpoints in
    doc-id order — the diagnostic that says whether a corpus is still
    contributing NEW vocabulary at its tail (a flattening curve means
    more data buys repetition, not coverage; a super-Heaps jump at one
    checkpoint localizes an injected-noise batch).

    Exactness: checkpoint boundaries are floor divisions of the exact
    doc count; each token's contribution point is the RANK of its
    first-occurrence doc (min doc_id, then the range-partitioned
    global rank — no one-partition window); cumulative tokens come
    from the same ranked table. Both "≤ boundary" rollups are one
    broadcast of the 10-row checkpoint table against bounded sides
    (|vocab| and |docs| rows × 10). Everything integer, bit-exact.
    """
    from locopy_spark.operators.ranking import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_expr("text")
    d = docs.select(
        "doc_id",
        F.expr(f"cast(size({toks}) as bigint)").alias("tok_n"),
        F.expr(f"array_distinct({toks})").alias("dtoks"),
    )
    ranked = global_row_number(d, order_cols=["doc_id"], out_col="rn")
    n = d.agg(F.count(F.lit(1)).alias("n"))
    cps = (
        spark.range(1, VG_CHECKPOINTS + 1)
        .withColumnRenamed("id", "checkpoint")
        .crossJoin(F.broadcast(n))
        .select(
            "checkpoint",
            F.expr(f"checkpoint * n div {VG_CHECKPOINTS}").alias("b"),
        )
    )
    # token → rank of its first-occurrence doc
    tf = (
        d.select("doc_id", F.explode("dtoks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("fd"))
        .join(
            ranked.select(F.col("doc_id").alias("fd"), "rn"), "fd"
        )
        .select(F.col("rn").alias("rf"))
    )
    vocab = (
        tf.crossJoin(F.broadcast(cps.select("checkpoint", "b")))
        .filter("rf <= b")
        .groupBy("checkpoint")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    tokens_cum = (
        ranked.select("rn", "tok_n")
        .crossJoin(F.broadcast(cps.select("checkpoint", "b")))
        .filter("rn <= b")
        .groupBy("checkpoint")
        .agg(F.sum("tok_n").alias("n_tokens"))
    )
    # left-join from the 10-row checkpoint table so a checkpoint with
    # zero contributing tokens (degenerate corpus: <10 docs gives b=0,
    # or an early checkpoint covering only zero-token docs) still
    # emits a row — matching the oracle's always-10-row shape
    return (
        cps.join(vocab, "checkpoint", "left")
        .join(tokens_cum, "checkpoint", "left")
        .selectExpr(
            "cast(checkpoint as bigint) as checkpoint",
            "b as n_docs",
            "cast(coalesce(n_tokens, 0) as bigint) as n_tokens",
            "cast(coalesce(vocab, 0) as bigint) as vocab",
        )
        .orderBy("checkpoint")
    )


def _sql_vocab_growth() -> str:
    toks = sql_tokens("text")
    return f"""
  WITH d AS MATERIALIZED (
    SELECT doc_id, CAST(len({toks}) AS BIGINT) AS tok_n,
           list_distinct({toks}) AS dtoks
    FROM documents
  ),
  r AS (
    SELECT doc_id, tok_n, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM d
  ),
  nn AS (SELECT COUNT(*) AS n FROM d),
  cp AS (
    SELECT c AS checkpoint, c * n // {VG_CHECKPOINTS} AS b
    FROM generate_series(1, {VG_CHECKPOINTS}) t(c), nn
  ),
  tf AS (
    SELECT tok, MIN(doc_id) AS fd
    FROM (SELECT doc_id, unnest(dtoks) AS tok FROM d) GROUP BY 1
  ),
  tr AS (SELECT r.rn AS rf FROM tf JOIN r ON r.doc_id = tf.fd)
  SELECT CAST(checkpoint AS BIGINT) AS checkpoint,
         CAST(b AS BIGINT) AS n_docs,
         CAST(COALESCE((SELECT SUM(tok_n) FROM r WHERE rn <= b), 0) AS BIGINT)
           AS n_tokens,
         CAST((SELECT COUNT(*) FROM tr WHERE rf <= b) AS BIGINT) AS vocab
  FROM cp ORDER BY checkpoint
"""


ORACLE["t_vocab_growth"] = _sql_vocab_growth()


# -- source vocabulary overlap matrix ------------------------------------------


def t_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources (src_a < src_b) —
    the "how redundant are my sources" matrix read BEFORE committing
    mixture weights (two sources with 80% shared vocabulary buy less
    diversity than their row counts suggest; d_source_dedup finds
    shared DOCUMENTS, this finds shared LANGUAGE).

    FOURTH finisher on the shared ``source_token_counts`` state (the
    simpson/zipf/hapax scan — one corpus pass serves four reports,
    and stream_simpson maintains the same state live): intersections
    come from the token-level inverted pairing (each token contributes
    its ≤|sources|² source pairs — never a vocab×vocab join), unions
    by inclusion-exclusion from the |sources|-bounded vocab sizes,
    Jaccard one exact ppm floor division.
    """
    docs = load_table(spark, sf_dir, "documents")
    return source_overlap_report(source_token_counts(docs))


def source_overlap_report(counts: DataFrame) -> DataFrame:
    """Close the overlap matrix over the (source, tok, c) state."""
    toks = counts.select("source", "tok")
    sizes = toks.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, F.expr("a.tok = b.tok AND a.source < b.source"))
        .groupBy(
            F.expr("a.source").alias("src_a"),
            F.expr("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"),
                                     F.col("v").alias("va"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"),
                                     F.col("v").alias("vb"))),
            "src_b",
        )
        .selectExpr(
            "src_a",
            "src_b",
            "n_shared",
            "va + vb - n_shared as n_union",
            "n_shared * 1000000 div (va + vb - n_shared) as jaccard_ppm",
        )
        .orderBy("src_a", "src_b")
    )


def _sql_source_overlap() -> str:
    return f"""
  WITH counts AS ({_sql_source_token_counts()}),
  toks AS (SELECT DISTINCT source, tok FROM counts),
  sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v
            FROM toks GROUP BY 1),
  inter AS (
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2
  )
  SELECT src_a, src_b, n_shared,
         sa.v + sb.v - n_shared AS n_union,
         CAST(n_shared * 1000000 //
              (sa.v + sb.v - n_shared) AS BIGINT) AS jaccard_ppm
  FROM inter
  JOIN sizes sa ON sa.source = src_a
  JOIN sizes sb ON sb.source = src_b
  ORDER BY src_a, src_b
"""


ORACLE["t_source_overlap"] = _sql_source_overlap()
