"""Training-data-pipeline queries, batch 2: duplicate-cluster
resolution, deterministic hash splits, quality filtering, PII /
denylist scrubbing.

Same portability rules as ``docs``: md5-only hashing, RE2∩Java regex
subset, exact integer arithmetic — every query has a byte-identical
DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from locopy_spark.functions.text import (
    PUNCT_CLASS,
    shingles_expr,
    sql_shingles,
    sql_tokens,
    tokens_expr,
    top_freq_expr,
)
from locopy_spark.operators import cluster, dedup, scrub, similarity
from locopy_spark.queries.docs import (
    KNN_QUERY_IDS,
    MINHASH_EST_T,
    SHINGLE_K,
    sql_minhash_pair_ctes,
)
from locopy_spark.sources.tables import load_table
from locopy_spark.functions.cache import managed_persist

# deterministic split fractions via md5 prefix: [00,0d) test ≈ 5%,
# [0d,1a) val ≈ 5%, rest train — stable under re-runs and resharding.
SPLIT_TEST_HI = "0d"
SPLIT_VAL_HI = "1a"

# quality gates tuned so the synthetic corpus splits both ways
QF_MIN_TOKENS = 24
QF_MAX_TOKENS = 90
QF_MIN_DISTINCT_RATIO = 0.35
QF_MAX_TOP_RATIO = 0.12

DENYLIST = ("customer", "vector")


def d_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve MinHash-LSH near-dup pairs into clusters (connected
    components, Hash-Min label propagation) and mark the kept doc."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, k=SHINGLE_K, est_threshold=MINHASH_EST_T
    )
    return cluster.dedup_resolution(pairs).orderBy("doc_id")


def d_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment from an md5 prefix of
    the doc id — reproducible on any engine, any partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    hk = F.expr("substring(md5(cast(doc_id as string)), 1, 2)")
    return (
        docs.select("doc_id", "lang", hk.alias("hk"))
        .withColumn(
            "split",
            F.when(F.col("hk") < SPLIT_TEST_HI, "test")
            .when(F.col("hk") < SPLIT_VAL_HI, "val")
            .otherwise("train"),
        )
        .orderBy("doc_id")
    )


def s_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, oracle-hardened like ``s_knn_lsh``: query count plus a
    deterministic regression boolean on total top-k hits vs brute force
    (see docs.LSH_MIN_HITS comment; per-query recall asserted in
    tests/test_similarity.py)."""
    from locopy_spark.queries.docs import IVF_MIN_HITS

    # shared normed table for the IVF path + brute-force recall check
    # (same persist win as s_knn_lsh)
    emb = managed_persist(
        similarity.with_fixed_norm(load_table(spark, sf_dir, "embeddings")),
        "knn_ivf",
    )
    qids = [0, 1, 2, 3, 4]
    approx = similarity.knn_ivf(emb, query_ids=qids, k=5, n_centroids=16, n_probe=4)
    exact = similarity.knn_bruteforce(emb, query_ids=qids, k=5)
    hits = approx.join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).agg(F.count(F.lit(1)).alias("n_hits"))
    return hits.select(
        F.lit(len(qids)).alias("n_queries"),
        (F.col("n_hits") >= F.lit(IVF_MIN_HITS)).alias("recall_ok"),
    )


def quality_metrics(docs: DataFrame) -> DataFrame:
    """Gopher/C4-style quality gate as a stateless column stage:
    token-count bounds, distinct-token ratio, max-single-token
    frequency → per-doc metrics + keep flag (all JVM array
    expressions, no UDFs). Shared by the batch query and the
    streaming twin (``streaming.jobs.stream_quality_filter``)."""
    toks = docs.select("doc_id", F.expr(tokens_expr("text")).alias("toks"))
    m = toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.expr("size(array_distinct(toks))").alias("n_distinct"),
        F.expr(top_freq_expr("toks")).alias("top_freq"),
    )
    return (
        m.withColumn(
            "distinct_ratio", F.expr("CAST(n_distinct AS DOUBLE) / n_tokens")
        )
        .withColumn("top_ratio", F.expr("CAST(top_freq AS DOUBLE) / n_tokens"))
        .withColumn(
            "keep",
            (F.col("n_tokens") >= QF_MIN_TOKENS)
            & (F.col("n_tokens") <= QF_MAX_TOKENS)
            & (F.col("distinct_ratio") >= QF_MIN_DISTINCT_RATIO)
            & (F.col("top_ratio") <= QF_MAX_TOP_RATIO),
        )
    )


def t_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch quality gate over the documents table (see
    :func:`quality_metrics`)."""
    return quality_metrics(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


def t_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pattern + denylist entity scrub: per-pattern match counts on
    the raw text and the md5 of the scrubbed text (chained JVM
    regexp_replace; RE2-safe patterns so DuckDB reproduces the bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    patterns = scrub.PII_PATTERNS + (
        ("denylist", scrub.denylist_pattern(DENYLIST), "[ENT]"),
    )
    return (
        docs.select(
            "doc_id",
            *scrub.match_counts("text", patterns),
            F.md5(scrub.scrub_expr("text", patterns)).alias("scrubbed_md5"),
        )
        .orderBy("doc_id")
    )


def t_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term statistics: document frequency, collection term
    frequency, and tf/df (linear inverse-doc-frequency weight — exact
    double division; natural-log idf is libm-dependent across engines
    and deliberately avoided in the oracle-checked output).

    One explode + one groupBy(term) — the canonical inverted-index
    build shape; partial aggregation keeps the shuffle at
    |vocabulary| not |tokens|.
    """
    docs = load_table(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    toks = docs.select(
        "doc_id", F.explode(F.expr(tokens_expr("text"))).alias("term")
    )
    return (
        toks.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("ctf"),
        )
        .join(F.broadcast(nd))
        .withColumn("idf_lin", F.col("n_docs") / F.col("df"))
        .drop("n_docs")
        .orderBy("term")
    )


def t_ngram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus trigrams by frequency — shingle explode +
    count + global top-k (rank ties broken by the shingle itself for a
    total order)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.expr(tokens_expr("text")).alias("toks"))
    from locopy_spark.functions.text import shingles_expr

    grams = toks.select(
        F.explode(F.expr(shingles_expr("toks", SHINGLE_K))).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "gram")
        .limit(20)
    )


def d_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of LSH candidates: MinHash proposes,
    levenshtein disposes. The expensive O(len²) distance runs ONLY on
    bucket-collision pairs — the standard two-stage near-dup design.
    Both engines implement classic Levenshtein, so the distances (and
    the normalized similarity) are oracle-comparable."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, k=SHINGLE_K, est_threshold=MINHASH_EST_T
    )
    norm = dedup.normalized_text_expr("text")
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.expr(norm).alias("txt_a")
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.expr(norm).alias("txt_b")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("txt_a", "txt_b").alias("edit_dist"),
            (
                F.lit(1.0)
                - F.levenshtein("txt_a", "txt_b")
                / F.greatest(F.length("txt_a"), F.length("txt_b"))
            ).alias("edit_sim"),
        )
        .orderBy("doc_a", "doc_b")
    )


EMB_DIM = 64
EMB_SCALE = 1_000_000_000  # 1e9: float32 → 9 digits kept, decimal-safe sums

# exact centroid kernel (shared by d_embedding_centroids and
# d_centroid_drift — ONE copy of the determinism-critical text)
V_FIX_EXPR = (
    f"cast(cast(floor(cast(val as double) * {EMB_SCALE} + 0.5)"
    " as bigint) as decimal(38,0))"
)


def centroid_mean_col():
    """Exact per-cell centroid mean: decimal sum → double, divided in
    the same order on both engines."""
    return (
        F.expr("CAST(SUM(v_fix) AS DOUBLE)")
        / F.lit(float(EMB_SCALE))
        / F.count(F.lit(1))
    )


def centroid_state(emb: DataFrame) -> DataFrame:
    """The additive per-(label, dim) centroid state ``(label,
    dim_idx, s, n)``: exact DECIMAL(38) fixed-point component sums +
    counts — a commutative monoid (both columns sum), so a streaming
    maintainer merges per-batch outputs by key and the on-demand
    report equals the batch pass on any arrival order
    (stream_centroids)."""
    ex = emb.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim_idx"),
        F.expr(V_FIX_EXPR).alias("v_fix"),
    )
    return ex.groupBy("label", "dim_idx").agg(
        F.sum("v_fix").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )


def centroid_report(state: DataFrame) -> DataFrame:
    """Close the centroid means over the exact state — the same
    double expression ``centroid_mean_col`` evaluates inside the
    one-pass aggregate (sum→double, ÷scale, ÷count), applied to the
    merged sums."""
    return state.select(
        "label",
        "dim_idx",
        (
            F.expr("CAST(s AS DOUBLE)") / F.lit(float(EMB_SCALE)) / F.col("n")
        ).alias("centroid_val"),
        "n",
    ).orderBy("label", "dim_idx")


def d_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (element-wise mean) of the embedding column —
    the mean-pooling / cluster-centroid primitive. posexplode →
    groupBy(label, dim) with exact fixed-point sums in DECIMAL(38)
    accumulators (overflow-safe and bit-stable at any row count); one
    shuffle on (label, dim) — uniform keys, scales linearly. Split as
    centroid_state + centroid_report so stream_centroids maintains
    the same state incrementally."""
    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_report(centroid_state(emb))


FRAME_BYTES = 64
FRAME_STEP = 4


def m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary frame sampling over the encoded payload (every 4th
    64-byte chunk). Oracle note: the synthetic corpus is pure ASCII, so
    byte offsets == character offsets and DuckDB can reproduce the
    chunk hashes with string slicing."""
    from locopy_spark.operators.multimodal import attach_payload, frame_sample

    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs)
    return frame_sample(
        media, frame_bytes=FRAME_BYTES, step=FRAME_STEP
    ).orderBy("doc_id", "frame_idx")


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def t_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length chunking: split each document into overlapping
    ``CHUNK_TOKENS``-token windows every ``CHUNK_STRIDE`` tokens — the
    pretraining pack/chunk step. Pure built-ins (split → sequence →
    explode → slice → array_join): a row-local generator, no shuffle
    except the output sort; chunk text is emitted as md5 so the output
    stays hashable and bytes-light."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    d = docs.select("doc_id", toks.alias("toks")).withColumn(
        "n_toks", F.size("toks")
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_toks") - 1, F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )
    return (
        d.select("doc_id", "toks", "n_toks", F.explode(starts).alias("chunk_start"))
        .filter(F.col("chunk_start") < F.col("n_toks"))
        .select(
            "doc_id",
            "chunk_start",
            F.least(
                F.lit(CHUNK_TOKENS), F.col("n_toks") - F.col("chunk_start")
            ).alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.slice(
                        F.col("toks"), F.col("chunk_start") + 1, CHUNK_TOKENS
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_start")
    )


def d_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced corpus rebalancing: at most 50 docs per language,
    selected by deterministic md5(doc_id) order. Salted two-level
    bounded top-K — no single-task-per-stratum window, shuffles are
    output-sized (strata × salts × K), not input-sized."""
    from locopy_spark.operators.sampling import balanced_sample

    docs = load_table(spark, sf_dir, "documents")
    return balanced_sample(docs, "lang", "doc_id", k=50).orderBy(
        "lang", "doc_id"
    )


def m_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched multimodal feature extraction (encoder stand-in):
    payload → L1-normalized high-nibble byte histogram as array<float>.
    Oracle-checkable projection: the float32 vector is exploded to
    (doc_id, bin, v_fix) fixed-point rows — the corpus is pure ASCII,
    so DuckDB reproduces the histogram from code points and the exact
    int/int division + float32 downcast is bit-identical cross-engine.
    (feat_l2 stays an operator output but is excluded here: numpy's
    pairwise summation order differs from SQL list aggregation.)"""
    from locopy_spark.operators.multimodal import attach_payload, feature_extract

    docs = load_table(spark, sf_dir, "documents")
    fe = feature_extract(attach_payload(docs))
    return (
        fe.select("doc_id", F.posexplode("feature").alias("bin", "v"))
        .select(
            "doc_id",
            "bin",
            F.expr(
                "cast(floor(cast(v as double) * 1000000 + 0.5) as bigint)"
            ).alias("v_fix"),
        )
        .orderBy("doc_id", "bin")
    )


def m_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize stage: stub decode → aspect-preserving scale
    geometry → deterministic resized digest. Fully oracle-checked: the
    stub dims are md5-derived and the corpus is ASCII, so DuckDB
    re-derives dims by hex-parsing md5(text), replays the identical
    double geometry (same operands ⇒ same IEEE results), and recomputes
    the resized digest."""
    from locopy_spark.operators.multimodal import attach_payload, resize_stub

    docs = load_table(spark, sf_dir, "documents")
    return resize_stub(attach_payload(docs)).orderBy("doc_id")


def p_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus cleaning pipeline:

    1. quality gate (token bounds, distinct ratio, repetition)
    2. exact dedup (normalized-md5, keep min doc id)
    3. near-dup resolution (MinHash-LSH pairs among survivors →
       connected components → keep cluster representative)

    Emits the surviving corpus. Each stage is one of the verified
    standalone operators; the composite is the shape a real 100 TB
    cleaning job runs nightly. Oracle: the same three stages as SQL
    CTEs (recursive CTE for the clusters)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.expr(tokens_expr("text")).alias("toks"))
    m = toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.expr("size(array_distinct(toks))").alias("n_distinct"),
        F.expr(top_freq_expr("toks")).alias("top_freq"),
    )
    quality = m.filter(
        (F.col("n_tokens") >= QF_MIN_TOKENS)
        & (F.col("n_tokens") <= QF_MAX_TOKENS)
        & (F.expr("CAST(n_distinct AS DOUBLE) / n_tokens") >= QF_MIN_DISTINCT_RATIO)
        & (F.expr("CAST(top_freq AS DOUBLE) / n_tokens") <= QF_MAX_TOP_RATIO)
    ).select("doc_id")
    qdocs = docs.join(quality, "doc_id", "left_semi")
    exact_keep = (
        qdocs.select(
            "doc_id",
            F.expr(f"md5({dedup.normalized_text_expr('text')})").alias("h"),
        )
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    sdocs = docs.join(exact_keep, "doc_id", "left_semi")
    pairs = dedup.minhash_lsh_pairs(
        sdocs, k=SHINGLE_K, est_threshold=MINHASH_EST_T
    )
    dropped = (
        cluster.connected_components(pairs)
        .filter(F.col("node") != F.col("cluster_id"))
        .select(F.col("node").alias("doc_id"))
    )
    return (
        sdocs.join(dropped, "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def _oracle_clean_corpus() -> str:
    return f"""
      WITH RECURSIVE
      qtok AS (
        SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
      ),
      qm AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct,
               list_max(list_transform(list_distinct(toks),
                    t2 -> len(list_filter(toks, x -> x = t2)))) AS top_freq
        FROM qtok
      ),
      quality AS (
        SELECT doc_id FROM qm
        WHERE n_tokens >= {QF_MIN_TOKENS} AND n_tokens <= {QF_MAX_TOKENS}
          AND CAST(n_distinct AS DOUBLE) / n_tokens >= {QF_MIN_DISTINCT_RATIO}
          AND CAST(top_freq AS DOUBLE) / n_tokens <= {QF_MAX_TOP_RATIO}
      ),
      exact_keep AS (
        SELECT MIN(doc_id) AS doc_id
        FROM documents
        WHERE doc_id IN (SELECT doc_id FROM quality)
        GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
      ),
      survivors AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id IN (SELECT doc_id FROM exact_keep)
      ),
      {sql_minhash_pair_ctes(src="survivors")},
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
      ),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      ),
      dropped AS (
        SELECT src AS doc_id FROM reach
        GROUP BY src HAVING src != LEAST(src, MIN(dst))
      )
      SELECT doc_id, lang, source FROM documents
      WHERE doc_id IN (SELECT doc_id FROM survivors)
        AND doc_id NOT IN (SELECT doc_id FROM dropped)
      ORDER BY doc_id
    """


def _oracle_dup_clusters() -> str:
    # full transitive closure by recursive CTE — fine at oracle scale;
    # the Spark side is the scalable path.
    return f"""
      WITH RECURSIVE {sql_minhash_pair_ctes()},
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
      ),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      )
      SELECT src AS doc_id,
             LEAST(src, MIN(dst)) AS cluster_id,
             src = LEAST(src, MIN(dst)) AS is_kept
      FROM reach GROUP BY src ORDER BY doc_id
    """


def _oracle_pii_scrub() -> str:
    patterns = scrub.PII_PATTERNS + (
        ("denylist", scrub.denylist_pattern(DENYLIST), "[ENT]"),
    )
    counts = ", ".join(scrub.sql_match_counts("text", patterns))
    return f"""
      SELECT doc_id, {counts},
             md5({scrub.sql_scrub("text", patterns)}) AS scrubbed_md5
      FROM documents ORDER BY doc_id
    """


ORACLE: dict[str, str] = {
    "t_doc_chunks": f"""
      WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
      ),
      s AS (
        SELECT doc_id, toks, len(toks) AS n_toks,
               unnest(range(0, GREATEST(len(toks), 1), {CHUNK_STRIDE})) AS chunk_start
        FROM t
      )
      SELECT doc_id, CAST(chunk_start AS INT) AS chunk_start,
             CAST(LEAST({CHUNK_TOKENS}, n_toks - chunk_start) AS INT) AS n_tokens,
             md5(array_to_string(
               toks[chunk_start + 1 : chunk_start + {CHUNK_TOKENS}], ' '
             )) AS chunk_md5
      FROM s WHERE chunk_start < n_toks
      ORDER BY doc_id, chunk_start
    """,
    "d_balanced_sample": """
      SELECT lang, doc_id FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents) t
      WHERE rn <= 50
      ORDER BY lang, doc_id
    """,
    "d_dup_clusters": _oracle_dup_clusters(),
    "p_clean_corpus": _oracle_clean_corpus(),
    "d_hash_split": f"""
      SELECT doc_id, lang,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hk,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_TEST_HI}' THEN 'test'
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SPLIT_VAL_HI}' THEN 'val'
                  ELSE 'train' END AS split
      FROM documents ORDER BY doc_id
    """,
    "t_quality_filter": f"""
      WITH t AS (
        SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
      ),
      m AS (
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
               CAST(list_max(list_transform(list_distinct(toks),
                    t2 -> len(list_filter(toks, x -> x = t2)))) AS INT) AS top_freq
        FROM t
      )
      SELECT doc_id, n_tokens, n_distinct, top_freq,
             CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
             CAST(top_freq AS DOUBLE) / n_tokens AS top_ratio,
             (n_tokens >= {QF_MIN_TOKENS} AND n_tokens <= {QF_MAX_TOKENS}
              AND CAST(n_distinct AS DOUBLE) / n_tokens >= {QF_MIN_DISTINCT_RATIO}
              AND CAST(top_freq AS DOUBLE) / n_tokens <= {QF_MAX_TOP_RATIO}) AS keep
      FROM m ORDER BY doc_id
    """,
    "t_pii_scrub": _oracle_pii_scrub(),
    "t_term_stats": f"""
      WITH t AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
      )
      SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS ctf,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / COUNT(DISTINCT doc_id) AS idf_lin
      FROM t GROUP BY term ORDER BY term
    """,
    "d_edit_verify": f"""
      WITH {{pair_ctes}},
      n AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS txt
        FROM documents
      )
      SELECT doc_a, doc_b,
             CAST(levenshtein(na.txt, nb.txt) AS INT) AS edit_dist,
             1.0 - levenshtein(na.txt, nb.txt)
                   / CAST(greatest(length(na.txt), length(nb.txt)) AS DOUBLE) AS edit_sim
      FROM pairs
      JOIN n na ON pairs.doc_a = na.doc_id
      JOIN n nb ON pairs.doc_b = nb.doc_id
      ORDER BY doc_a, doc_b
    """.format(pair_ctes=sql_minhash_pair_ctes()),
    "d_embedding_centroids": f"""
      WITH ex AS (
        SELECT label, i AS dim_idx,
               CAST(FLOOR(embedding[i]::DOUBLE * {EMB_SCALE} + 0.5) AS BIGINT) AS v_fix
        FROM embeddings, (SELECT unnest(generate_series(1, {EMB_DIM})) AS i)
      )
      SELECT label, CAST(dim_idx AS INT) AS dim_idx,
             CAST(SUM(v_fix) AS DOUBLE) / {EMB_SCALE}.0 / COUNT(*) AS centroid_val,
             COUNT(*) AS n
      FROM ex GROUP BY label, dim_idx ORDER BY label, dim_idx
    """,
    "m_frame_sample": f"""
      WITH t AS (
        SELECT doc_id, text, length(text) AS bl FROM documents
      ),
      idx AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(bl / {FRAME_BYTES}.0) AS INT), {FRAME_STEP})) AS frame_idx
        FROM t
      )
      SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             md5(substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5,
             CAST(length(substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS INT) AS frame_len
      FROM idx ORDER BY doc_id, frame_idx
    """,
    "t_ngram_top": f"""
      WITH t AS (SELECT {sql_tokens('text')} AS toks FROM documents),
      g AS (SELECT unnest({{shingles}}) AS gram FROM t)
      SELECT gram, COUNT(*) AS n FROM g
      GROUP BY gram ORDER BY n DESC, gram LIMIT 20
    """.format(shingles=sql_shingles("toks", SHINGLE_K)),
    # Corpus is pure ASCII ⇒ byte == code point, so DuckDB reproduces
    # the high-nibble histogram; int/int division then float32 downcast
    # is bit-identical cross-engine, fixed-pointed at 1e6.
    "m_feature_extract": """
      WITH pos AS (
        SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        FROM documents
      ),
      hist AS (
        SELECT doc_id, unicode(substr(text, CAST(i AS INT), 1)) // 16 AS nib,
               COUNT(*) AS cnt
        FROM pos GROUP BY 1, 2
      ),
      tot AS (SELECT doc_id, SUM(cnt) AS s FROM hist GROUP BY 1),
      bins AS (
        SELECT d.doc_id, CAST(b.bin AS INT) AS bin, COALESCE(h.cnt, 0) AS cnt, t.s
        FROM (SELECT DISTINCT doc_id FROM documents) d
        CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
        LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.nib = b.bin
        JOIN tot t ON t.doc_id = d.doc_id
      )
      SELECT doc_id, bin,
             CAST(FLOOR(
               CAST(CAST(CAST(cnt AS DOUBLE) / s AS FLOAT) AS DOUBLE)
               * 1000000 + 0.5) AS BIGINT) AS v_fix
      FROM bins ORDER BY doc_id, bin
    """,
    # Stub dims are md5-derived: hex-parse md5(text) for bytes 0/1,
    # replay the identical double geometry (same operands ⇒ same IEEE
    # doubles), recompute the resized digest.
    "m_resize": """
      WITH hx AS (SELECT doc_id, text, md5(text) AS h FROM documents),
      b AS (
        SELECT doc_id, text,
          64 + ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 4 AS width,
          64 + ((strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
               + strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 4 AS height
        FROM hx
      ),
      g AS (
        SELECT doc_id, text, width, height,
               LEAST(CAST(1.0 AS DOUBLE),
                     CAST(256.0 AS DOUBLE) / GREATEST(width, height)) AS scale
        FROM b
      ),
      o AS (
        SELECT doc_id, text, width, height, scale,
               CAST(GREATEST(1, FLOOR(width * scale + 0.5)) AS INT) AS out_w,
               CAST(GREATEST(1, FLOOR(height * scale + 0.5)) AS INT) AS out_h
        FROM g
      )
      SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
             out_w, out_h, scale,
             md5(text || CAST(out_w AS VARCHAR) || 'x'
                      || CAST(out_h AS VARCHAR)) AS resized_md5
      FROM o ORDER BY doc_id
    """,
}


# TF-IDF pair similarity. Two pruning layers:
#   * semantic: stopword removal — only terms with df/n_docs <= 0.3 get
#     nonzero weight (mirrored exactly in the oracle);
#   * candidate generation: ppjoin-style SYMMETRIC PREFIX FILTERING
#     (Bayardo et al. WWW'07 / Xiao et al. ppjoin) — each doc indexes
#     only its rarest terms (the "prefix"), chosen so the leftover
#     "suffix" has squared norm strictly < (tau/2)^2 of the doc's total.
#     If a pair shares no term in BOTH prefixes, then
#     cos <= |a_suf|/|a| + |b_suf|/|b| < tau — so joining prefix
#     postings with themselves generates a complete candidate set
#     while dissimilar docs (which only share common terms) produce
#     ZERO pair rows. Round 1 self-joined the FULL posting lists,
#     which is O(n^2) pair rows at a fractional df cap; candidates are
#     now bounded by genuinely-similar pairs plus rare-term collisions.
# Linear inverse-collection-frequency (floor(1000·n/df)) instead of
# ln-idf keeps the weights integral and engine-portable; the prefix
# test uses exact decimal arithmetic (cum·400 < ss·81 for tau=0.9,
# (tau/2)^2 = 81/400) so candidate completeness never hinges on float
# rounding.
TFIDF_MAXDF_NUM = 3  # keep term iff 10*df <= 3*n_docs
TFIDF_TAU = 0.9
TFIDF_TAU_SQ_NUM = 81  # (TFIDF_TAU/2)^2 == 81/400, kept as an exact ratio
TFIDF_TAU_SQ_DEN = 400


def s_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine document-pair similarity via a sparse inverted
    index with prefix-filtered candidate generation: tokenize → tf per
    (doc,term) → df-pruned integer weights → per-doc rarity-ordered
    prefix (suffix sq-norm < (τ/2)²·total, exact decimal test) →
    prefix-postings self-join → candidate pairs → exact decimal dot
    over the FULL vectors of each candidate → cosine ≥ τ.  The result
    set is provably identical to the all-postings self-join (see module
    comment), so the oracle is the straightforward exact SQL.  All
    accumulation is integer/decimal (order-independent); the only float
    ops are the final sqrt/divide with identical expression text on
    both engines."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    toks = docs.select(
        "doc_id", F.explode(F.expr(tokens_expr("text"))).alias("term")
    )
    # tf feeds df-counts AND weights; w feeds norms, prefix selection
    # AND both verify-join sides.  Catalyst re-executes multi-consumer
    # subtrees (ReusedExchange does not fire across broadcast-join
    # inputs), so persist both — same lesson as the minhash signature
    # table (4x speedup there).
    tf = managed_persist(
        toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")), "tfidf"
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    keep = (
        dfreq.join(F.broadcast(nd))
        .filter(F.lit(10) * F.col("df") <= F.lit(TFIDF_MAXDF_NUM) * F.col("n_docs"))
        .select(
            "term",
            "df",
            F.expr("cast(floor(1000.0 * n_docs / df) as bigint)").alias("icf"),
        )
    )
    w = managed_persist(
        tf.join(F.broadcast(keep), "term").select(
            "doc_id", "term", "df", (F.col("tf") * F.col("icf")).alias("w")
        ),
        "tfidf",
    )
    wsq = F.expr("cast(w as decimal(19,0)) * cast(w as decimal(19,0))")
    # norms/prefix are multi-consumer too, but persisting them LOSES
    # (A/B at sf0.1: best 2.99 s persisted vs 2.32 s replayed): their
    # recomputation is one cheap agg/window over the already-persisted
    # w, less than the cache-materialization barrier they'd introduce.
    # The analyzed-plan shuffle count in PLANS.md counts these replays.
    norms = w.groupBy("doc_id").agg(F.sum(wsq).alias("ss"))
    # Prefix selection: walk each doc's terms commonest-first, absorb
    # terms into the suffix while the running sq-norm stays strictly
    # under (tau/2)^2 of the total (exact: cum*DEN < ss*NUM).  The
    # complement — the rarest terms — is the indexed prefix.  Window is
    # per-doc (n_docs keys, uniform) and each partition is one doc's
    # term list, so no skew ceiling.
    order = Window.partitionBy("doc_id").orderBy(
        F.col("df").desc(), F.col("term").desc()
    )
    cum = F.sum(wsq).over(order.rowsBetween(Window.unboundedPreceding, 0))
    flagged = (
        w.join(norms, "doc_id")
        .withColumn(
            "in_suffix",
            cum * F.lit(TFIDF_TAU_SQ_DEN) < F.col("ss") * F.lit(TFIDF_TAU_SQ_NUM),
        )
    )
    prefix = flagged.filter(~F.col("in_suffix")).select("term", "doc_id")
    cand = (
        prefix.select("term", F.col("doc_id").alias("doc_a"))
        .join(prefix.select("term", F.col("doc_id").alias("doc_b")), "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Verify: exact decimal dot over the full vectors of each candidate
    # pair — candidate-bounded equi-joins, never an all-postings join.
    a = w.select(
        F.col("doc_id").alias("doc_a"), F.col("term"), F.col("w").alias("wa")
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"), F.col("term"), F.col("w").alias("wb")
    )
    dots = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.expr("cast(wa as decimal(19,0)) * cast(wb as decimal(19,0))")
            ).alias("dot")
        )
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ssa"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ssb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "cos_sim",
            F.expr(
                "CAST(dot AS DOUBLE)"
                " / (sqrt(CAST(ssa AS DOUBLE)) * sqrt(CAST(ssb AS DOUBLE)))"
            ),
        )
        .filter(F.col("cos_sim") >= F.lit(TFIDF_TAU))
        .select("doc_a", "doc_b", "cos_sim")
        .orderBy("doc_a", "doc_b")
    )


# ANN regression tripwire (see docs.LSH_MIN_HITS comment).
ORACLE["s_knn_ivf"] = """
  SELECT CAST(5 AS INT) AS n_queries, TRUE AS recall_ok
"""

ORACLE["s_tfidf_pairs"] = f"""
  WITH t AS (
    SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
  ),
  tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
  df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
  nd AS (SELECT COUNT(*) AS n_docs FROM documents),
  k AS (
    SELECT term, CAST(FLOOR(1000.0 * n_docs / df) AS BIGINT) AS icf
    FROM df, nd WHERE 10 * df <= {TFIDF_MAXDF_NUM} * n_docs
  ),
  w AS (
    SELECT doc_id, tf.term, tf * icf AS w
    FROM tf JOIN k ON tf.term = k.term
  ),
  norms AS (
    SELECT doc_id, SUM(CAST(w AS HUGEINT) * w) AS ss FROM w GROUP BY 1
  ),
  dots AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           SUM(CAST(a.w AS HUGEINT) * b.w) AS dot
    FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  )
  SELECT doc_a, doc_b,
         CAST(dot AS DOUBLE)
           / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))) AS cos_sim
  FROM dots
  JOIN norms na ON doc_a = na.doc_id
  JOIN norms nb ON doc_b = nb.doc_id
  WHERE CAST(dot AS DOUBLE)
          / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))) >= {TFIDF_TAU}
  ORDER BY doc_a, doc_b
"""


def s_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means, oracle-hardened: 10 clusters × 3 Lloyd
    iterations over the embeddings table (assign = broadcast-centroid
    argmax, update = exact fixed-point means — operators.kmeans).

    Iterative refinement is not single-SQL, so the oracle checks
    engine-independent invariants the deterministic fixed-point run
    must satisfy: every vector assigned exactly once (n_vectors =
    COUNT(*) of embeddings — a real oracle-computed value, not a
    constant), 1..k non-empty clusters, and per-cluster mean cosines
    inside [-1, 1]. The per-cluster profile itself stays unit-tested
    (monotonicity + determinism, tests/test_similarity.py)."""
    from locopy_spark.operators.kmeans import kmeans_spherical

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_spherical(emb, k=10, iters=3)
    prof = assigned.groupBy(F.col("centroid_id").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_points"),
        (
            F.sum(F.expr("cast(floor(cos * 1000000 + 0.5) as bigint)"))
            .cast("double")
            / F.lit(1_000_000.0)
            / F.count(F.lit(1))
        ).alias("avg_cos"),
    )
    return prof.agg(
        F.sum("n_points").alias("n_vectors"),
        ((F.count(F.lit(1)) >= 1) & (F.count(F.lit(1)) <= 10)).alias(
            "clusters_ok"
        ),
        (
            (F.min("avg_cos") >= -1.000001) & (F.max("avg_cos") <= 1.000001)
        ).alias("cos_ok"),
    )


# benchmark-contamination gate: eval set = md5-prefix sample of docs
EVAL_HI = "10"  # ≈ 6% of docs held out as the "benchmark" set


def d_source_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/source-level dedup: keep the longest doc per source (ties →
    lowest doc_id). Argmax-per-group via one ranked window — the
    canonical 'best page per URL' crawl-dedup shape."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W

    w = W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    grp = W.partitionBy("source")
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n_in_source", F.count(F.lit(1)).over(grp))
        .filter(F.col("rk") == 1)
        .select("doc_id", "source", "n_chars", "n_in_source")
        .orderBy("source")
    )


def d_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each training doc's
    distinct word shingles that also occur in a held-out eval set
    (md5-prefix split, so the partition is engine-stable). The eval
    shingle vocabulary is DISTINCT'd then broadcast — at 100 TB the
    train side streams map-side through a broadcast semi join, no
    shuffle of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    hk = F.expr("substring(md5(cast(doc_id as string)), 1, 2)")
    docs = docs.withColumn("hk", hk)
    from locopy_spark.functions.text import shingles_expr

    def shingle_set(df: DataFrame) -> DataFrame:
        toks = df.select(
            "doc_id", F.expr(tokens_expr("text")).alias("toks")
        )
        return toks.select(
            "doc_id",
            F.explode(F.expr(shingles_expr("toks", SHINGLE_K))).alias("sh"),
        ).distinct()

    train = shingle_set(docs.filter(F.col("hk") >= EVAL_HI))
    eval_sh = (
        shingle_set(docs.filter(F.col("hk") < EVAL_HI))
        .select("sh")
        .distinct()
    )
    hits = (
        train.join(F.broadcast(eval_sh), "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    totals = train.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    return (
        totals.join(hits, "doc_id", "left")
        .withColumn(
            "n_contaminated", F.coalesce("n_contaminated", F.lit(0))
        )
        .withColumn(
            "contamination",
            F.expr("CAST(n_contaminated AS DOUBLE) / n_shingles"),
        )
        .orderBy("doc_id")
    )


ORACLE.update(
    {
        "d_source_dedup": """
        SELECT doc_id, source, n_chars, n_in_source FROM (
          SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id ASC) AS rk,
                 COUNT(*) OVER (PARTITION BY source) AS n_in_source
          FROM documents
        )
        WHERE rk = 1
        ORDER BY source
        """,
        "d_contamination": f"""
        WITH d AS (
          SELECT doc_id, {sql_tokens('text')} AS toks,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hk
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id, hk, unnest({sql_shingles('toks', 3)}) AS sh
          FROM d WHERE len(toks) >= 3
        ),
        train AS (SELECT doc_id, sh FROM sh WHERE hk >= '{EVAL_HI}'),
        ev AS (SELECT DISTINCT sh FROM sh WHERE hk < '{EVAL_HI}'),
        hits AS (
          SELECT doc_id, COUNT(*) AS n_contaminated
          FROM train WHERE sh IN (SELECT sh FROM ev)
          GROUP BY doc_id
        ),
        totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY doc_id)
        SELECT totals.doc_id AS doc_id, n_shingles,
               COALESCE(n_contaminated, 0) AS n_contaminated,
               CAST(COALESCE(n_contaminated, 0) AS DOUBLE) / n_shingles AS contamination
        FROM totals LEFT JOIN hits ON totals.doc_id = hits.doc_id
        ORDER BY doc_id
        """,
    }
)


REPETITION_THRESHOLD = 0.2


def t_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: fraction of duplicate word
    trigrams per document.

    Pretraining corpora drop documents whose n-grams repeat heavily
    (boilerplate, keyword stuffing, template spam). Shape: shingle
    explode → (doc, gram) count → per-doc aggregate — two
    partial-aggregated shuffles keyed by doc_id(+gram), no windows, no
    Python. dup_frac = 1 - distinct/total over each doc's trigrams;
    division by two exact ints is IEEE-portable so the boolean flag
    hash-matches the oracle.
    """
    from locopy_spark.functions.text import shingles_expr

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(shingles_expr(tokens_expr("text"), 3))
        ).alias("gram"),
    )
    per_doc = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                (F.col("n_grams") - F.col("n_distinct")).cast("double")
                / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
        .withColumn(
            "is_repetitive", F.col("dup_frac") > F.lit(REPETITION_THRESHOLD)
        )
        .orderBy("doc_id")
    )


ORACLE["t_repetition"] = f"""
  WITH t AS (
    SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
  ), g AS (
    SELECT doc_id, unnest({sql_shingles('toks', 3)}) AS gram FROM t
  ), c AS (
    SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2
  ), p AS (
    SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
           COUNT(*) AS n_distinct
    FROM c GROUP BY 1
  )
  SELECT d.doc_id,
         COALESCE(p.n_grams, 0) AS n_grams,
         COALESCE(p.n_distinct, 0) AS n_distinct,
         CASE WHEN COALESCE(p.n_grams, 0) > 0
              THEN CAST(p.n_grams - p.n_distinct AS DOUBLE) / p.n_grams
              ELSE 0.0 END AS dup_frac,
         CASE WHEN COALESCE(p.n_grams, 0) > 0
              THEN CAST(p.n_grams - p.n_distinct AS DOUBLE) / p.n_grams
              ELSE 0.0 END > {REPETITION_THRESHOLD} AS is_repetitive
  FROM documents d LEFT JOIN p USING (doc_id)
  ORDER BY doc_id
"""


# s_kmeans invariant oracle (see docstring): n_vectors is genuinely
# computed by DuckDB; the booleans are Lloyd invariants.
ORACLE["s_kmeans"] = """
  SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
         TRUE AS clusters_ok, TRUE AS cos_ok
  FROM embeddings
"""


INT8_MIN_HITS = 20  # measured 25/25 at sf0.001 and sf0.01; ~80% floor


def s_knn_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized shortlist + exact-rerank ANN (FAISS SQ8-style),
    oracle-hardened like ``s_knn_lsh``: query count plus a
    deterministic regression boolean on total top-k hits vs brute
    force. The quantized scan reads 4x fewer bytes at rest; the exact
    rerank bounds what quantization can cost (recall only, never
    within-k ordering)."""
    # share one persisted normed table across the quantized scan, the
    # rerank and the brute-force recall check (with_fixed_norm is
    # idempotent, so both paths reuse the cached norms)
    emb = managed_persist(
        similarity.with_fixed_norm(load_table(spark, sf_dir, "embeddings")),
        "knn_int8",
    )
    qids = [0, 1, 2, 3, 4]
    approx = similarity.knn_int8(emb, query_ids=qids, k=5)
    exact = similarity.knn_bruteforce(emb, query_ids=qids, k=5)
    hits = approx.join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).agg(F.count(F.lit(1)).alias("n_hits"))
    return hits.select(
        F.lit(len(qids)).alias("n_queries"),
        (F.col("n_hits") >= F.lit(INT8_MIN_HITS)).alias("recall_ok"),
    )


# ANN regression tripwire (see docs.LSH_MIN_HITS comment).
ORACLE["s_knn_int8"] = """
  SELECT CAST(5 AS INT) AS n_queries, TRUE AS recall_ok
"""


def p_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture weighting: per-source token mass and the
    sampling multiplier that would rebalance the mixture to uniform.

    The standard pretraining mixing step (DoReMi/The Pile publish
    per-domain weights; this computes the uniform-target variant):
    weight_s = (1/n_sources) / token_share_s — sources over-represented
    in tokens get weight < 1, rare sources > 1. Shape: one row-local
    token count (no explode), one partial-aggregated shuffle on the
    handful of source keys, one broadcast of the two scalar totals.
    All inputs to the doubles are exact bigint counts, so the division
    is IEEE-portable and hash-matches the oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source", F.expr(f"size({tokens_expr('text')})").alias("n_toks")
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        per_src.join(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("tot_tokens")).alias(
                "token_share"
            ),
            (
                (F.lit(1.0) / F.col("n_sources"))
                / (F.col("n_tokens").cast("double") / F.col("tot_tokens"))
            ).alias("mix_weight"),
        )
        .orderBy("source")
    )


ORACLE["p_mix_weights"] = f"""
  WITH p AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({sql_tokens('text')})) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
  ), t AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_sources FROM p
  )
  SELECT p.source, p.n_docs, p.n_tokens,
         CAST(p.n_tokens AS DOUBLE) / t.tot_tokens AS token_share,
         (1.0 / t.n_sources) / (CAST(p.n_tokens AS DOUBLE) / t.tot_tokens)
           AS mix_weight
  FROM p, t ORDER BY p.source
"""


PACK_TARGET = 512  # tokens per training example


def p_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate non-overlapping document chunks
    into ~``PACK_TARGET``-token training examples, reported per bin.

    The pretraining step after chunking: examples are filled greedily
    in a deterministic global order (doc_id, chunk_start), so bin
    boundaries are the token-budget crossings of an exclusive running
    sum. The running sum is the distributed
    ``operators.ranking.global_running_sum`` (range-partitioned prefix
    sum — no one-partition window), making order-dependent packing
    scale-safe; the oracle reproduces it with a plain window SUM.
    """
    from locopy_spark.operators.ranking import global_running_sum

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    d = docs.select("doc_id", toks.alias("toks")).withColumn(
        "n_toks", F.size("toks")
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_toks") - 1, F.lit(0)),
        F.lit(CHUNK_TOKENS),
    )
    chunks = (
        d.select("doc_id", "n_toks", F.explode(starts).alias("chunk_start"))
        .filter(F.col("chunk_start") < F.col("n_toks"))
        .select(
            "doc_id",
            "chunk_start",
            F.least(
                F.lit(CHUNK_TOKENS), F.col("n_toks") - F.col("chunk_start")
            ).cast("long").alias("n_tokens"),
        )
    )
    packed = global_running_sum(
        chunks, ["doc_id", "chunk_start"], "n_tokens", out_col="cum"
    ).withColumn(
        "bin_id",
        F.expr(f"CAST(floor(cum / {PACK_TARGET}.0) AS BIGINT)"),
    )
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("bin_id")
    )


ORACLE["p_pack_sequences"] = f"""
  WITH t AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
    FROM documents
  ), c AS (
    SELECT doc_id, i AS chunk_start,
           CAST(LEAST({CHUNK_TOKENS}, len(toks) - i) AS BIGINT) AS n_tokens
    FROM t, unnest(range(0, GREATEST(len(toks), 1), {CHUNK_TOKENS})) AS u(i)
    WHERE i < len(toks)
  ), r AS (
    SELECT doc_id, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
             ORDER BY doc_id, chunk_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
    FROM c
  )
  SELECT CAST(FLOOR(cum / {PACK_TARGET}.0) AS BIGINT) AS bin_id,
         COUNT(*) AS n_chunks,
         CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
         COUNT(DISTINCT doc_id) AS n_docs
  FROM r GROUP BY 1 ORDER BY 1
"""


def t_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-rarity document score: the mean corpus frequency of a
    document's tokens — a cheap unigram-LM proxy (low mean = rare/noisy
    vocabulary, high mean = boilerplate of stopwords) used to bucket
    pretraining text by "typicalness" without a model.

    Scale shape (token-count inputs, vocab-sized intermediates): tokens
    pre-aggregate to (doc, term, tf) so the frequency join carries
    |distinct doc-term pairs|, not |tokens|; corpus counts aggregate to
    |vocab| with map-side combine; the join shuffles on term (vocab can
    exceed broadcast size at 100 TB, so a shuffle join is the honest
    default — AQE downgrades it to broadcast when the vocab is small).
    All outputs are exact integers — the mean is floor-scaled integer
    division (``DIV``), never a libm double — so the oracle hash is
    portable.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(F.expr(tokens_expr("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ctf = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    per_doc = (
        tf.join(ctf, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("ctf")).alias("sum_ctf"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("sum_ctf", F.lit(0)).cast("bigint").alias("sum_ctf"),
            F.coalesce(
                F.expr("CAST((1000 * sum_ctf) DIV n_tokens AS BIGINT)"),
                F.lit(0),
            ).alias("mean_ctf_milli"),
        )
        .orderBy("doc_id")
    )


ORACLE["t_unigram_rarity"] = f"""
  WITH t AS (
    SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
  ), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2
  ), ctf AS (
    SELECT term, SUM(tf) AS ctf FROM tf GROUP BY 1
  ), p AS (
    SELECT tf.doc_id, SUM(tf.tf) AS n_tokens, SUM(tf.tf * ctf.ctf) AS sum_ctf
    FROM tf JOIN ctf USING (term) GROUP BY 1
  )
  SELECT d.doc_id,
         CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
         CAST(COALESCE(p.sum_ctf, 0) AS BIGINT) AS sum_ctf,
         CAST(COALESCE((1000 * p.sum_ctf) // p.n_tokens, 0) AS BIGINT)
           AS mean_ctf_milli
  FROM documents d LEFT JOIN p USING (doc_id)
  ORDER BY doc_id
"""


def t_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-PMI document score: the mean pointwise-mutual-information
    RATIO ``P(w1 w2) / (P(w1)·P(w2))`` over a document's bigrams,
    estimated from corpus counts — the collocation-strength companion
    to ``t_unigram_rarity``: word-salad and shuffled text score ~1
    (independent words) while natural prose scores high, a signal
    unigram frequency cannot see. No trained model, no libm: the
    per-bigram ratio is a fixed sequence of exactly-rounded IEEE ops
    (identical in any engine), fixed-pointed to a bigint before the
    SUM so the aggregate is associative and the oracle hash portable
    (ln-based PMI is deliberately avoided — ``ln`` differs by ulps
    across libm implementations).

    Scale shape: bigrams pre-aggregate to (doc, bigram, n) so the count
    join carries |distinct doc-bigram pairs|, not |bigrams|; the corpus
    bigram table aggregates with map-side combine to |bigram vocab|;
    unigram counts join twice on the token key (head-token skew is
    AQE's skew-join case); the two scalar totals broadcast. This is the
    standard distributed LM-count build — at 100 TB every intermediate
    is vocabulary-sized, never corpus-sized.

    Overflow note: the double numerator ``cbg·Nt·Nt`` stays exact below
    2^53 up to ~10 B tokens; beyond that the score loses ulps but the
    plan is unchanged (the oracle gate runs at verify SF, far below).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.expr(tokens_expr("text")).alias("toks"))
    # (doc, bigram, n) — pre-aggregated, joins stay |distinct pairs|
    bgn = (
        toks.select(
            "doc_id", F.explode(F.expr(shingles_expr("toks", 2))).alias("bg")
        )
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cbg = bgn.groupBy("bg").agg(F.sum("n").alias("cbg"))
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    nt = uni.agg(F.sum("cw").alias("nt"))  # total tokens
    nb = cbg.agg(F.sum("cbg").alias("nb"))  # total bigrams
    scored = (
        bgn.join(cbg, "bg")
        .withColumn("w1", F.expr("split(bg, ' ')[0]"))
        .withColumn("w2", F.expr("split(bg, ' ')[1]"))
        .join(uni.select(F.col("w").alias("w1"), F.col("cw").alias("cw1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cw").alias("cw2")), "w2")
        .join(F.broadcast(nt))
        .join(F.broadcast(nb))
        # explicit parenthesization: both engines evaluate the same
        # rounded-double sequence, then fixed-point per bigram
        .withColumn(
            "fix",
            F.expr(
                "CAST(FLOOR(((CAST(cbg AS DOUBLE) * nt) * nt)"
                " / ((CAST(nb AS DOUBLE) * cw1) * cw2)"
                " * 1000.0 + 0.5) AS BIGINT) * n"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.sum("fix").alias("pmi_fix_sum"),
            F.expr(
                "(CAST(SUM(fix) AS DOUBLE) / 1000.0) / SUM(n)"
            ).alias("avg_pmi"),
        )
        .orderBy("doc_id")
    )


ORACLE["t_bigram_pmi"] = f"""
  WITH t AS (
    SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
  ), g AS (
    SELECT doc_id, unnest({sql_shingles('toks', 2)}) AS bg FROM t
  ), bgn AS (
    SELECT doc_id, bg, COUNT(*) AS n FROM g GROUP BY 1, 2
  ), cb AS (
    SELECT bg, SUM(n) AS cbg FROM bgn GROUP BY 1
  ), u AS (
    SELECT unnest(toks) AS w FROM t
  ), cu AS (
    SELECT w, COUNT(*) AS cw FROM u GROUP BY 1
  ), nt AS (SELECT COUNT(*) AS nt FROM u),
  nb AS (SELECT CAST(SUM(n) AS BIGINT) AS nb FROM bgn),
  s AS (
    SELECT bgn.doc_id, bgn.n,
           CAST(FLOOR(((CAST(cb.cbg AS DOUBLE) * nt.nt) * nt.nt)
                / ((CAST(nb.nb AS DOUBLE) * c1.cw) * c2.cw)
                * 1000.0 + 0.5) AS BIGINT) * bgn.n AS fix
    FROM bgn
    JOIN cb USING (bg)
    JOIN cu c1 ON c1.w = string_split(bgn.bg, ' ')[1]
    JOIN cu c2 ON c2.w = string_split(bgn.bg, ' ')[2]
    CROSS JOIN nt CROSS JOIN nb
  )
  SELECT doc_id,
         CAST(SUM(n) AS BIGINT) AS n_bigrams,
         CAST(SUM(fix) AS BIGINT) AS pmi_fix_sum,
         (CAST(SUM(fix) AS DOUBLE) / 1000.0) / SUM(n) AS avg_pmi
  FROM s GROUP BY doc_id ORDER BY doc_id
"""


def p_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup resolution: MinHash-LSH pairs → connected
    components → keep each cluster's minimum doc_id plus every
    unclustered doc, then the per-source survivor rollup (docs kept /
    dropped, tokens kept) — the step that turns pair evidence into the
    deduplicated training corpus and its mixture bookkeeping.

    Shape: the cluster resolution's own shapes (bucketed pair join +
    Hash-Min rounds) plus one broadcast-able left join of the small
    clustered-doc set onto the corpus and one groupBy(source). Nothing
    beyond the cluster step touches more than |clustered docs| rows
    twice. Oracle: the same recursive-CTE transitive closure as
    d_dup_clusters, joined back to documents in SQL.
    """
    from locopy_spark.operators import cluster, dedup
    from locopy_spark.queries.docs import MINHASH_EST_T, SHINGLE_K

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, k=SHINGLE_K, est_threshold=MINHASH_EST_T
    )
    resolution = cluster.dedup_resolution(pairs).select("doc_id", "is_kept")
    kept = F.coalesce(F.col("is_kept"), F.lit(True))
    toks = F.size(F.expr(tokens_expr("text"))).cast("long")
    return (
        docs.join(F.broadcast(resolution), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum((~kept).cast("long")).alias("n_dropped"),
            F.sum(F.when(kept, toks).otherwise(F.lit(0))).alias(
                "tokens_kept"
            ),
        )
        .orderBy("source")
    )


def _oracle_dedup_corpus() -> str:
    from locopy_spark.queries.docs import sql_minhash_pair_ctes

    return f"""
      WITH RECURSIVE {sql_minhash_pair_ctes()},
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
      ),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      ),
      cl AS (
        SELECT src AS doc_id, src = LEAST(src, MIN(dst)) AS is_kept
        FROM reach GROUP BY src
      )
      SELECT d.source,
             COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN COALESCE(cl.is_kept, TRUE) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN COALESCE(cl.is_kept, TRUE) THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
             CAST(SUM(CASE WHEN COALESCE(cl.is_kept, TRUE)
                  THEN len({sql_tokens('d.text')}) ELSE 0 END) AS BIGINT) AS tokens_kept
      FROM documents d LEFT JOIN cl USING (doc_id)
      GROUP BY 1 ORDER BY 1
    """


ORACLE["p_dedup_corpus"] = _oracle_dedup_corpus()


def p_quality_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware mixture plan: the filter → rebalance composition a
    real corpus build runs. Documents pass the Gopher-style quality
    gate (``quality_metrics``), then per-source token mass and the
    uniform-target sampling multiplier are computed over the KEPT
    subset only — so the published weights describe the corpus that
    will actually be sampled, not the raw crawl. A source whose
    documents are entirely filtered leaves the mixture (and the
    n_sources denominator) by construction.

    Shape: the quality gate is a stateless map; one broadcast-able join
    back to (doc, source); one partial-aggregated groupBy(source); two
    scalar totals broadcast. Exact bigint counts feed every double
    division, so the weights hash-match cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    kept = (
        quality_metrics(docs)
        .filter(F.col("keep"))
        .select("doc_id", "n_tokens")
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    per_src = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens_kept"),
    )
    totals = per_src.agg(
        F.sum("n_tokens_kept").alias("tot_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        per_src.join(F.broadcast(totals))
        .select(
            "source",
            "n_docs_kept",
            "n_tokens_kept",
            (
                F.col("n_tokens_kept").cast("double") / F.col("tot_tokens")
            ).alias("token_share"),
            (
                (F.lit(1.0) / F.col("n_sources"))
                / (F.col("n_tokens_kept").cast("double") / F.col("tot_tokens"))
            ).alias("mix_weight"),
        )
        .orderBy("source")
    )


ORACLE["p_quality_mix_plan"] = f"""
  WITH t AS (
    SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
  ), m AS (
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
           CAST(list_max(list_transform(list_distinct(toks),
                t2 -> len(list_filter(toks, x -> x = t2)))) AS INT) AS top_freq
    FROM t
  ), kept AS (
    SELECT d.source, m.n_tokens
    FROM m JOIN documents d USING (doc_id)
    WHERE m.n_tokens >= {QF_MIN_TOKENS} AND m.n_tokens <= {QF_MAX_TOKENS}
      AND CAST(m.n_distinct AS DOUBLE) / m.n_tokens >= {QF_MIN_DISTINCT_RATIO}
      AND CAST(m.top_freq AS DOUBLE) / m.n_tokens <= {QF_MAX_TOP_RATIO}
  ), p AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_kept
    FROM kept GROUP BY source
  ), tt AS (
    SELECT CAST(SUM(n_tokens_kept) AS BIGINT) AS tot_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_sources FROM p
  )
  SELECT p.source, p.n_docs_kept, p.n_tokens_kept,
         CAST(p.n_tokens_kept AS DOUBLE) / tt.tot_tokens AS token_share,
         (1.0 / tt.n_sources) / (CAST(p.n_tokens_kept AS DOUBLE) / tt.tot_tokens)
           AS mix_weight
  FROM p, tt ORDER BY p.source
"""


DRIFT_DOT_SCALE = 1_000_000_000_000  # 1e12 fixed-point for centroid dots


def d_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: split the corpus into two
    deterministic halves (md5(vec_id) first hex digit), compute each
    label's per-half centroid, and report the cosine between the two
    half-centroids — the "did my embedding space shift between
    builds/batches" check, here exercised as an A/A test (halves of one
    corpus, so cosines sit near 1 and a drop flags real drift).

    Deterministic end-to-end: centroids come from exact DECIMAL(38)
    fixed-point sums (the d_embedding_centroids kernel), and the
    cross-centroid dot/norms floor-scale each per-dim product to
    bigint before summing — no float accumulation order anywhere, so
    DuckDB reproduces every byte. One (label, half, dim) shuffle +
    one label-sized aggregate. Labels with an empty half (impossible
    at these sizes) would drop via the inner join.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    in_a = F.expr(
        "substring(md5(cast(vec_id as string)), 1, 1)"
        " in ('0','1','2','3','4','5','6','7')"
    )
    ex = emb.select(
        "label", in_a.alias("in_a"), F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label",
        "in_a",
        (F.col("pos") + 1).alias("dim_idx"),
        F.expr(V_FIX_EXPR).alias("v_fix"),
    )
    cent = ex.groupBy("label", "in_a", "dim_idx").agg(
        centroid_mean_col().alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    a = cent.filter("in_a").select(
        "label", "dim_idx", F.col("c").alias("ca"), F.col("n").alias("n_a")
    )
    b = cent.filter("NOT in_a").select(
        "label", "dim_idx", F.col("c").alias("cb"), F.col("n").alias("n_b")
    )
    j = a.join(b, ["label", "dim_idx"])
    fix = lambda e: f"cast(floor(({e}) * {DRIFT_DOT_SCALE} + 0.5) as bigint)"
    return (
        j.groupBy("label")
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.sum(F.expr(fix("ca * cb"))).alias("dot"),
            F.sum(F.expr(fix("ca * ca"))).alias("na2"),
            F.sum(F.expr(fix("cb * cb"))).alias("nb2"),
        )
        .select(
            "label",
            "n_a",
            "n_b",
            F.expr(
                # zero-norm half-centroid (possible mid-stream):
                # NULL drift, not an ANSI divide crash
                "CASE WHEN CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE) = 0.0"
                " THEN CAST(NULL AS DOUBLE) ELSE"
                " CAST(dot AS DOUBLE)"
                " / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE)) END"
            ).alias("drift_cos"),
        )
        .orderBy("label")
    )


ORACLE["d_centroid_drift"] = f"""
  WITH ex AS (
    SELECT label,
           substring(md5(CAST(vec_id AS VARCHAR)), 1, 1)
             IN ('0','1','2','3','4','5','6','7') AS in_a,
           i AS dim_idx,
           CAST(FLOOR(embedding[i]::DOUBLE * {EMB_SCALE} + 0.5) AS BIGINT) AS v_fix
    FROM embeddings, (SELECT unnest(generate_series(1, {EMB_DIM})) AS i)
  ),
  cent AS (
    SELECT label, in_a, dim_idx,
           CAST(SUM(v_fix) AS DOUBLE) / {EMB_SCALE}.0 / COUNT(*) AS c,
           COUNT(*) AS n
    FROM ex GROUP BY 1, 2, 3
  ),
  j AS (
    SELECT a.label, a.dim_idx, a.c AS ca, b.c AS cb, a.n AS n_a, b.n AS n_b
    FROM cent a JOIN cent b
      ON a.label = b.label AND a.dim_idx = b.dim_idx
     AND a.in_a AND NOT b.in_a
  )
  SELECT label,
         CAST(MAX(n_a) AS BIGINT) AS n_a,
         CAST(MAX(n_b) AS BIGINT) AS n_b,
         CASE WHEN CAST(SUM(CAST(FLOOR(ca * ca * {DRIFT_DOT_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)
                * CAST(SUM(CAST(FLOOR(cb * cb * {DRIFT_DOT_SCALE} + 0.5) AS BIGINT)) AS DOUBLE) = 0.0
           THEN CAST(NULL AS DOUBLE) ELSE
           CAST(SUM(CAST(FLOOR(ca * cb * {DRIFT_DOT_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)
           / sqrt(CAST(SUM(CAST(FLOOR(ca * ca * {DRIFT_DOT_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)
                * CAST(SUM(CAST(FLOOR(cb * cb * {DRIFT_DOT_SCALE} + 0.5) AS BIGINT)) AS DOUBLE))
           END AS drift_cos
  FROM j GROUP BY label ORDER BY label
"""


CALIB_J_SCALE = 1_000_000_000  # 1e9 fixed-point for exact-jaccard sums


def d_lsh_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration report for MinHash-LSH: bucket the
    candidate pairs by estimated-Jaccard decile and report, per
    bucket, the pair count and the mean EXACT shingle Jaccard — the
    table that tells an operator whether est_threshold=T actually
    corresponds to the intended true-similarity cut on THIS corpus
    (the s-curve in numbers, measured not assumed).

    RUN-RARELY calibration job, not a serving path: it deliberately
    pays for exact-Jaccard verification of every LSH candidate to
    measure the estimator. Schedule it per corpus snapshot / config
    change, never per query; don't read its bench cost as hot-path
    cost (SURVEY §6).

    Exact Jaccards run only on the LSH candidate set (bounded), each
    pair as a ROW-LOCAL intersection of the two docs' distinct-shingle
    arrays (bounded by doc length — a shingle-key equi-join here is a
    trap: Catalyst may reorder it into a shingle×shingle frequency²
    blowup, measured 146 s at sf0.1 vs ~1 s for the array form).
    Determinism: est = agree/16 and bucket = floor(est·10) are exact
    binary arithmetic; each pair's exact Jaccard is an int/int double
    floored to a 1e9 bigint before the per-bucket SUM, so no float
    accumulation order exists and the mean is one division of exact
    integers.
    """
    from locopy_spark.functions.text import shingles_expr, tokens_expr
    from locopy_spark.operators import dedup
    from locopy_spark.queries.docs import MINHASH_EST_T, SHINGLE_K

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, k=SHINGLE_K, est_threshold=MINHASH_EST_T
    )
    arrs = docs.select(
        "doc_id",
        F.expr(
            f"array_distinct({shingles_expr(f'({tokens_expr()})', SHINGLE_K)})"
        ).alias("arr"),
    )
    per_pair = (
        pairs.select("doc_a", "doc_b", "est_jaccard")
        .join(
            arrs.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("aa")),
            "doc_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("ab")),
            "doc_b",
        )
        .select(
            F.expr("cast(floor(est_jaccard * 10) as int)").alias("est_decile"),
            F.expr(
                "cast(floor(cast(size(array_intersect(aa, ab)) as double)"
                " / (size(aa) + size(ab) - size(array_intersect(aa, ab)))"
                f" * {CALIB_J_SCALE} + 0.5) as bigint)"
            ).alias("j_fix"),
        )
    )
    return (
        per_pair.groupBy("est_decile")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr(
                f"cast(sum(j_fix) as double) / {CALIB_J_SCALE} / count(1)"
            ).alias("mean_exact_jaccard"),
        )
        .orderBy("est_decile")
    )


def _oracle_lsh_calibration() -> str:
    from locopy_spark.queries.docs import sql_minhash_pair_ctes

    return f"""
      WITH {sql_minhash_pair_ctes()},
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      common AS (
        -- LEFT join + COUNT(matches) so a candidate pair with zero
        -- shared shingles survives with n_common = 0, mirroring the
        -- Spark array_intersect semantics (an inner join would drop it)
        SELECT p.doc_a, p.doc_b, p.est_jaccard, COUNT(b.sh) AS n_common
        FROM pairs p
        JOIN sh a ON a.doc_id = p.doc_a
        LEFT JOIN sh b ON b.doc_id = p.doc_b AND b.sh = a.sh
        GROUP BY 1, 2, 3
      ),
      per_pair AS (
        SELECT CAST(FLOOR(c.est_jaccard * 10) AS INT) AS est_decile,
               CAST(FLOOR(CAST(c.n_common AS DOUBLE)
                    / (na.n + nb.n - c.n_common) * {CALIB_J_SCALE} + 0.5)
                    AS BIGINT) AS j_fix
        FROM common c
        JOIN sizes na ON na.doc_id = c.doc_a
        JOIN sizes nb ON nb.doc_id = c.doc_b
      )
      SELECT est_decile,
             COUNT(*) AS n_pairs,
             CAST(SUM(j_fix) AS DOUBLE) / {CALIB_J_SCALE} / COUNT(*)
               AS mean_exact_jaccard
      FROM per_pair GROUP BY est_decile ORDER BY est_decile
    """


ORACLE["d_lsh_calibration"] = _oracle_lsh_calibration()


# -- dedup diagnostics ------------------------------------------------------

def d_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size histogram — the dedup diagnostic an
    operator reads before committing a keep-one policy: how much of
    the corpus sits in 2-doc mirror pairs vs mega-clusters (boilerplate
    explosions), plus the singleton mass the pair pipeline never sees.

    Shape: connected components over the MinHash-LSH candidate pairs
    (operators/cluster.py Hash-Min — metadata-only shuffles), then two
    tiny groupBys (cluster sizes → histogram); the singleton row is
    exact arithmetic over two 1-row counts. Every shuffle after CC is
    |clusters|-sized, not corpus-sized.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, k=SHINGLE_K, est_threshold=MINHASH_EST_T
    )
    cc = cluster.connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("nd"))
    n_in = cc.agg(F.count(F.lit(1)).alias("ni"))
    singles = n_docs.join(n_in).select(
        F.lit(1).cast("long").alias("cluster_size"),
        F.expr("nd - ni").alias("n_clusters"),
    )
    return (
        hist.unionByName(singles)
        .select(
            "cluster_size",
            "n_clusters",
            F.expr("cluster_size * n_clusters").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


def _oracle_cluster_stats() -> str:
    from locopy_spark.queries.docs import sql_minhash_pair_ctes

    return f"""
      WITH RECURSIVE {sql_minhash_pair_ctes()},
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
      ),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      ),
      comp AS (
        SELECT src AS node, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src
      ),
      sizes AS (
        SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1
      ),
      hist AS (
        SELECT cluster_size, COUNT(*) AS n_clusters FROM sizes GROUP BY 1
      ),
      singles AS (
        SELECT CAST(1 AS BIGINT) AS cluster_size,
               (SELECT COUNT(*) FROM documents)
                 - (SELECT COUNT(*) FROM comp) AS n_clusters
      )
      SELECT cluster_size, n_clusters,
             CAST(cluster_size * n_clusters AS BIGINT) AS n_docs
      FROM (SELECT * FROM hist UNION ALL SELECT * FROM singles)
      ORDER BY cluster_size
    """


ORACLE["d_cluster_stats"] = _oracle_cluster_stats()


# -- ANN tuning -------------------------------------------------------------

# measured hits vs brute force at (sf0.001, sf0.01, sf0.1):
#   n_probe 1 → (7, 5, 8); 2 → (9, 9, 10); 4 → (14, 14, 14);
#   8 → (16, 17, 17); 16 (exhaustive) → 25 = k·|queries| at every SF.
# Tripwires sit at ~half the measured minimum; the exhaustive row is an
# EXACT equality (probing all lists IS brute force), and hits are
# monotone in n_probe because the probed-list candidate set is nested.
IVF_TUNE_PROBES = (1, 2, 4, 8, 16)
IVF_TUNE_MIN_HITS = {1: 2, 2: 4, 4: 7, 8: 8}
IVF_TUNE_CENTROIDS = 16


def s_ivf_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF operating-curve tuning table: recall tripwires at every
    n_probe operating point — the ANN analog of ``d_lsh_calibration``
    (which measures the MinHash s-curve). An operator reads this to
    pick the scanned-fraction / recall trade-off; the driver gate
    holds the whole curve, not one point.

    RUN-RARELY calibration job, not a serving path: it contains a
    deliberate brute-force reference arm PLUS every probe setting, so
    its cost is the price of measuring recall, not of serving a
    query (the serving plans are s_knn_ivf / knn_ivf). Schedule per
    index build; don't benchmark it as a hot path (SURVEY §6).

    One persisted normed table, one persisted brute-force top-k, and
    ONE persisted probe-independent inverted-list assignment
    (``ivf_base_lists``) feed all {len(IVF_TUNE_PROBES)} probe
    settings — only the query-side probing and in-list scoring replay
    per setting (all three persists share one scope: managed_persist
    releases on scope CHANGE, so split scopes here would silently
    drop the earlier caches). Two EXACT cross-engine properties
    anchor the curve: the exhaustive setting (n_probe = n_centroids)
    must equal brute force bit-for-bit, and hits are monotone in
    n_probe (nested candidate sets). The intermediate points are
    regression booleans against measured floors.
    """
    from pyspark.sql.window import Window as W

    from locopy_spark.queries.docs import KNN_K, KNN_QUERY_IDS

    emb = managed_persist(
        similarity.with_fixed_norm(load_table(spark, sf_dir, "embeddings")),
        "ivf_tuning",
    )
    exact = managed_persist(
        similarity.knn_bruteforce(
            emb, query_ids=KNN_QUERY_IDS, k=KNN_K
        ).select("query_id", "neighbor_id"),
        "ivf_tuning",
    )
    lists = managed_persist(
        similarity.ivf_base_lists(emb, n_centroids=IVF_TUNE_CENTROIDS),
        "ivf_tuning",
    )
    # ONE scoring pass for every probe setting (r11): probe sets are
    # NESTED in the centroid-assignment rank, so assign the queries
    # once at the widest setting (keep_rank), score every (query,
    # candidate) pair once against the persisted lists, and slice each
    # arm as ``crk <= n_probe`` — bit-identical candidates and scores
    # to per-arm knn_ivf calls (same assignment window, same fixed-
    # point dots), at 1/Σ(nᵢ/N) ≈ ⅓ the scoring work and one plan
    # stack instead of five.  Each arm still ranks its own top-k; the
    # brute-force reference arm stays an INDEPENDENT scoring path, so
    # the exhaustive-equals-brute-force tripwire keeps its teeth.
    cent = similarity._ivf_centroids(
        emb, "vec_id", "embedding", IVF_TUNE_CENTROIDS
    )
    q = emb.filter(F.col("vec_id").isin(KNN_QUERY_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_fix").alias("q_norm"),
    )
    probes = similarity._ivf_assign(
        q, "q", max(IVF_TUNE_PROBES), cent, keep_rank=True
    )
    scored = managed_persist(
        lists.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "dot_fix",
            F.expr(similarity.fixed_dot_expr("q_emb", "n_emb")),
        )
        .withColumn(
            "cosine",
            F.expr(
                similarity.cosine_from_fixed("dot_fix", "q_norm", "n_norm")
            ),
        )
        .select("q_id", "n_id", "cosine", "crk"),
        "ivf_tuning",
    )
    wk = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    per = None
    for np_ in IVF_TUNE_PROBES:
        a = (
            scored.filter(F.col("crk") <= np_)
            .withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") <= KNN_K)
            .select(
                F.col("q_id").alias("query_id"),
                F.col("n_id").alias("neighbor_id"),
            )
        )
        h = (
            a.join(exact, ["query_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(F.lit(np_).cast("int").alias("n_probe"), "n_hits")
        )
        per = h if per is None else per.unionByName(h)
    full = len(KNN_QUERY_IDS) * KNN_K
    thresh = " ".join(
        f"WHEN n_probe = {p} THEN n_hits >= {t}"
        for p, t in IVF_TUNE_MIN_HITS.items()
    )
    w = W.orderBy("n_probe")
    return (
        per.withColumn("prev_hits", F.lag("n_hits").over(w))
        .select(
            "n_probe",
            F.lit(len(KNN_QUERY_IDS)).cast("int").alias("n_queries"),
            F.expr(
                f"CASE {thresh} ELSE n_hits = {full} END"
            ).alias("hits_ok"),
            F.expr("coalesce(n_hits >= prev_hits, TRUE)").alias(
                "ge_prev_ok"
            ),
        )
        .orderBy("n_probe")
    )


ORACLE["s_ivf_tuning"] = f"""
  SELECT * FROM (VALUES
    {", ".join(f"(CAST({p} AS INT), CAST(5 AS INT), TRUE, TRUE)"
               for p in IVF_TUNE_PROBES)}
  ) AS t(n_probe, n_queries, hits_ok, ge_prev_ok)
  ORDER BY n_probe
"""


# -- distribution drift -----------------------------------------------------

def t_freq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-frequency drift monitor per source: chi-square-style
    distance between the unigram distributions of a deterministic A/A
    split (doc_id parity) — the text-side twin of
    ``d_centroid_drift`` (which watches the embedding distribution).
    In production the two sides are consecutive corpus snapshots; the
    A/A form calibrates the metric's noise floor (scores here ARE the
    false-alarm level).

    All arithmetic is exact integers: per-side token frequencies in
    ppm (count·1e6 div total), per-token term (pA−pB)² div (pA+pB)
    (each term ≤ 1e6, so the per-source sum stays far below 2^63 at
    any vocabulary), summed per source. Shuffles: one token-level
    partial-aggregated groupBy (vocabulary-sized after the map-side
    combine), one (source, token) pivot aggregate, one per-source
    rollup — nothing corpus-sized past the first combine.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.expr("pmod(doc_id, 2)").alias("half"),
        F.explode(F.expr(tokens_expr("text"))).alias("token"),
    )
    cnt = tok.groupBy("source", "half", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cnt.groupBy("source", "half").agg(F.sum("c").alias("t"))
    ppm = cnt.join(tot, ["source", "half"]).select(
        "source",
        "token",
        "half",
        # DECIMAL(20) product (any bigint c fits; ×1e6 → 27 digits,
        # no precision overflow): c·1e6 in bigint would overflow once
        # a (source,half,token) count nears 9.2e12 — real at corpus
        # scale; `div` on decimals still yields exact bigint
        F.expr("cast(c as decimal(20,0)) * 1000000 div t").alias("p"),
    )
    wide = ppm.groupBy("source", "token").agg(
        F.coalesce(
            F.max(F.expr("case when half = 0 then p end")), F.lit(0)
        ).alias("pa"),
        F.coalesce(
            F.max(F.expr("case when half = 1 then p end")), F.lit(0)
        ).alias("pb"),
    )
    return (
        wide.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            # pa+pb can be 0 once a side's total tops 1e6 and a rare
            # token's ppm floors to 0 in BOTH halves: count it as a
            # zero term (its mass is below metric resolution), never
            # as a NULL that silently drops out of the sum
            F.sum(
                F.expr(
                    "case when pa + pb = 0 then 0 "
                    "else (pa - pb) * (pa - pb) div (pa + pb) end"
                )
            ).alias("chi2_ppm"),
        )
        .orderBy("source")
    )


ORACLE["t_freq_drift"] = f"""
  WITH tok AS (
    SELECT source, doc_id % 2 AS half,
           unnest({sql_tokens('text')}) AS token
    FROM documents
  ),
  cnt AS (
    SELECT source, half, token, COUNT(*) AS c
    FROM tok GROUP BY 1, 2, 3
  ),
  tot AS (
    SELECT source, half, CAST(SUM(c) AS BIGINT) AS t
    FROM cnt GROUP BY 1, 2
  ),
  ppm AS (
    SELECT cnt.source, cnt.token, cnt.half,
           -- HUGEINT intermediate (exact integer //; DECIMAL // would
           -- round-then-floor); output stays BIGINT via the cast
           CAST(CAST(cnt.c AS HUGEINT) * 1000000 // tot.t AS BIGINT) AS p
    FROM cnt JOIN tot ON cnt.source = tot.source AND cnt.half = tot.half
  ),
  wide AS (
    SELECT source, token,
           COALESCE(MAX(CASE WHEN half = 0 THEN p END), 0) AS pa,
           COALESCE(MAX(CASE WHEN half = 1 THEN p END), 0) AS pb
    FROM ppm GROUP BY 1, 2
  )
  SELECT source, COUNT(*) AS vocab,
         CAST(SUM(CASE WHEN pa + pb = 0 THEN 0
                       ELSE (pa - pb) * (pa - pb) // (pa + pb) END) AS BIGINT)
           AS chi2_ppm
  FROM wide GROUP BY source ORDER BY source
"""


# -- embedding sufficient statistics ----------------------------------------

def d_embedding_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sufficient statistics for embedding covariance/whitening:
    the upper-triangle second-moment matrix S_ij = Σ x_i·x_j
    (fixed-point, ``operators.similarity.second_moment_matrix`` — an
    Arrow-batched partial-aggregation kernel whose shuffle is one
    dim² partial per partition), joined with the first moments S_i and
    the row count. From these a consumer derives the covariance
    (n·S_ij − S_i·S_j)/n² without a second corpus pass — the PCA/
    whitening prep step. All columns are exact bigints, so the oracle
    (the same per-row floor-then-sum in SQL) matches bit-for-bit; an
    eigensolve is deliberately NOT done here (iterative float methods
    cannot be engine-exact — the sufficient statistic is the portable
    artifact).
    """
    from locopy_spark.functions.vectors import FIXED_SCALE

    emb = load_table(spark, sf_dir, "embeddings")
    m2 = similarity.second_moment_matrix(emb)
    s1 = (
        emb.select(
            F.posexplode(
                F.expr(
                    "transform(embedding, v -> cast(floor(cast(v as double)"
                    f" * {FIXED_SCALE} + 0.5) as bigint))"
                )
            ).alias("pos", "xf")
        )
        .groupBy("pos")
        .agg(F.sum("xf").alias("s"))
        .select((F.col("pos") + 1).cast("int").alias("d"), "s")
    )
    n = emb.agg(F.count(F.lit(1)).alias("n"))
    return (
        m2.join(
            F.broadcast(s1.select(F.col("d").alias("i"), F.col("s").alias("s_i"))),
            "i",
        )
        .join(
            F.broadcast(s1.select(F.col("d").alias("j"), F.col("s").alias("s_j"))),
            "j",
        )
        .join(F.broadcast(n))
        .select("i", "j", "s_ij", "s_i", "s_j", "n")
        .orderBy("i", "j")
    )


def _oracle_embedding_moments() -> str:
    from locopy_spark.functions.vectors import FIXED_SCALE

    return f"""
      WITH dims AS (SELECT UNNEST(generate_series(1, 64)) AS d),
      s2 AS (
        SELECT p.i, p.j,
               CAST(SUM(CAST(FLOOR(e.embedding[p.i]::DOUBLE
                                   * e.embedding[p.j]::DOUBLE
                                   * {FIXED_SCALE} + 0.5) AS BIGINT))
                    AS BIGINT) AS s_ij
        FROM embeddings e,
             (SELECT a.d AS i, b.d AS j FROM dims a, dims b
              WHERE a.d <= b.d) p
        GROUP BY 1, 2
      ),
      s1 AS (
        SELECT d.d,
               CAST(SUM(CAST(FLOOR(e.embedding[d.d]::DOUBLE
                                   * {FIXED_SCALE} + 0.5) AS BIGINT))
                    AS BIGINT) AS s
        FROM embeddings e, dims d GROUP BY 1
      ),
      n AS (SELECT COUNT(*) AS n FROM embeddings)
      SELECT s2.i, s2.j, s2.s_ij, a.s AS s_i, b.s AS s_j, n.n
      FROM s2 JOIN s1 a ON a.d = s2.i JOIN s1 b ON b.d = s2.j, n
      ORDER BY s2.i, s2.j
    """


ORACLE["d_embedding_moments"] = _oracle_embedding_moments()


# -- survivor selection & lang-id evaluation --------------------------------

def d_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup resolution: within each near-dup cluster
    keep the HIGHEST-quality document (t_quality_score's formula, ties
    by lowest doc_id) — how a production dedup actually picks
    survivors; ``d_dup_clusters``' keep-min-id is the baseline policy,
    this is the value-preserving one (the mirror with the cleaner
    text wins, not the one crawled first).

    Shape: the same CC-over-LSH-pairs pipeline, then the quality score
    joins on doc_id (co-partitioned equi-join, score is row-local
    column work) and the per-cluster winner is one ``max_by`` over a
    lexicographic (quality, -doc_id) struct — a partial-aggregated
    groupBy, no per-cluster sort window.
    """
    from locopy_spark.queries.docs import MINHASH_EST_T, SHINGLE_K

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, k=SHINGLE_K, est_threshold=MINHASH_EST_T
    )
    cc = cluster.connected_components(pairs)
    from locopy_spark.functions.text import quality_score_expr

    toks = docs.select(
        "doc_id", "text", F.expr(tokens_expr("text")).alias("toks")
    )
    q = toks.select(
        "doc_id",
        # the shared single-source quality kernel (functions/text.py)
        F.expr(quality_score_expr("toks", "text")).alias("q"),
    )
    scored = cc.select(F.col("node").alias("doc_id"), "cluster_id").join(
        q, "doc_id"
    )
    keeper = scored.groupBy("cluster_id").agg(
        F.expr("max_by(doc_id, struct(q, -doc_id))").alias("keep_id")
    )
    return (
        scored.join(keeper, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("keep_id")).alias("is_kept"),
        )
        .orderBy("doc_id")
    )


def _oracle_keep_best() -> str:
    from locopy_spark.functions.text import sql_quality_score
    from locopy_spark.queries.docs import sql_minhash_pair_ctes

    return f"""
      WITH RECURSIVE {sql_minhash_pair_ctes()},
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
      ),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      ),
      comp AS (
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src
      ),
      q AS (
        SELECT doc_id, {sql_quality_score('toks', 'text')} AS q
        FROM (SELECT doc_id, text, {sql_tokens('text')} AS toks
              FROM documents)
      ),
      scored AS (
        SELECT c.doc_id, c.cluster_id, q.q
        FROM comp c JOIN q ON q.doc_id = c.doc_id
      ),
      keeper AS (
        SELECT cluster_id, doc_id AS keep_id FROM (
          SELECT cluster_id, doc_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY cluster_id ORDER BY q DESC, doc_id ASC
                 ) AS rn
          FROM scored
        ) WHERE rn = 1
      )
      SELECT s.doc_id, s.cluster_id, s.doc_id = k.keep_id AS is_kept
      FROM scored s JOIN keeper k ON s.cluster_id = k.cluster_id
      ORDER BY s.doc_id
    """


ORACLE["d_dedup_keep_best"] = _oracle_keep_best()


def t_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation matrix: the labeled ``lang`` column
    against ``t_lang_id``'s prediction, as (lang, lang_pred, n) cells
    plus the per-lang hit ppm — the accuracy table that tells an
    operator whether the classifier is safe to gate a mixture on
    (classifier-EVAL is a pipeline step of its own, distinct from
    classification).

    Everything is one row-local scoring projection + one tiny
    (lang, pred) aggregate; hit ppm is exact integer arithmetic over
    the aggregate (bounded rows), so the matrix hashes bit-identically.
    """
    from locopy_spark.functions.text import (
        LANG_MARKERS,
        lang_pred_case,
        marker_count_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "doc_id", F.expr(tokens_expr("text")).alias("toks")
    )
    scored = toks.select(
        "lang",
        *[
            F.expr(marker_count_expr("toks", lg)).alias(f"s_{lg}")
            for lg in sorted(LANG_MARKERS)
        ],
    )
    pred = lang_pred_case({lg: f"s_{lg}" for lg in sorted(LANG_MARKERS)})
    cells = (
        scored.withColumn("lang_pred", F.expr(pred))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_lang = cells.groupBy("lang").agg(F.sum("n").alias("n_lang"))
    return (
        cells.join(per_lang, "lang")
        .select(
            "lang",
            "lang_pred",
            "n",
            F.expr(
                "case when lang = lang_pred then n * 1000000 div n_lang"
                " else 0 end"
            ).alias("hit_ppm"),
        )
        .orderBy("lang", "lang_pred")
    )


def _oracle_langid_confusion() -> str:
    from locopy_spark.functions.text import (
        LANG_MARKERS,
        lang_pred_case,
        sql_marker_count,
    )

    langs = sorted(LANG_MARKERS)
    scores = ", ".join(
        f"{sql_marker_count('toks', lg)} AS s_{lg}" for lg in langs
    )
    pred = lang_pred_case({lg: f"s_{lg}" for lg in langs})
    return f"""
      WITH t AS (
        SELECT lang, doc_id, {sql_tokens('text')} AS toks FROM documents
      ),
      s AS (SELECT lang, {scores} FROM t),
      cells AS (
        SELECT lang, {pred} AS lang_pred, COUNT(*) AS n
        FROM s GROUP BY 1, 2
      ),
      per_lang AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang
        FROM cells GROUP BY 1
      )
      SELECT c.lang, c.lang_pred, c.n,
             CASE WHEN c.lang = c.lang_pred
                  THEN CAST(c.n * 1000000 // p.n_lang AS BIGINT)
                  ELSE 0 END AS hit_ppm
      FROM cells c JOIN per_lang p ON c.lang = p.lang
      ORDER BY c.lang, c.lang_pred
    """


ORACLE["t_langid_confusion"] = _oracle_langid_confusion()


# -- cross-source syndication -----------------------------------------------

def d_source_syndication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-source near-dup matrix: for each unordered source
    pair, the count of MinHash-LSH candidate near-dup pairs with one
    doc in each — the content-syndication map (which feeds mirror
    which) that decides source-level dedup priority. The EXACT
    complement of ``d_kmv_overlap``'s sketch estimate: that one is a
    single-pass bounded-memory estimate over ALL shingles; this counts
    actual near-dup PAIRS, so the two disagree exactly where
    syndication is partial (shared boilerplate vs whole-doc mirrors).

    Shape: the pair table (band equi-join, id-only postings) joins
    source labels by doc id twice — co-partitioned equi-joins carrying
    two strings — then one bounded (source, source) aggregate. Nothing
    corpus-sized shuffles after the pair join.
    """
    from locopy_spark.queries.docs import MINHASH_EST_T, SHINGLE_K

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, k=SHINGLE_K, est_threshold=MINHASH_EST_T
    )
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.select("doc_a", "doc_b")
        .join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
    )
    return (
        labeled.select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
        .orderBy("src_a", "src_b")
    )


def _oracle_source_syndication() -> str:
    from locopy_spark.queries.docs import sql_minhash_pair_ctes

    return f"""
      WITH {sql_minhash_pair_ctes()},
      src AS (SELECT doc_id, source FROM documents)
      SELECT LEAST(a.source, b.source) AS src_a,
             GREATEST(a.source, b.source) AS src_b,
             COUNT(*) AS n_dup_pairs
      FROM pairs p
      JOIN src a ON a.doc_id = p.doc_a
      JOIN src b ON b.doc_id = p.doc_b
      GROUP BY 1, 2 ORDER BY 1, 2
    """


ORACLE["d_source_syndication"] = _oracle_source_syndication()


# -- product-quantization ANN ----------------------------------------------

PQ_DIM = 64
# M=16 subspaces of 4 dims × 32 codewords: measured 18/25 top-k hits
# vs brute force at sf0.01 (vs 11/25 at 8×16) — the finer grid wins
# on this weak-cosine corpus; codes are 16 B/vector vs 256 B float32.
PQ_M = 16
PQ_CODEWORDS = 32
PQ_OVERSAMPLE = 4


def s_pq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k cosine via product quantization + exact rerank
    (operators/similarity.py:knn_pq) — the codes-at-rest member of
    the ANN family (brute / LSH / IVF / int8 / PQ): 8 one-byte codes
    per vector (32× fewer scan bytes than float32), ADC scoring in
    M integer lookups per pair, exact fixed-point rerank over the
    oversampled shortlist. Unlike the LSH/int8 recall tripwires, PQ
    here is deterministic end-to-end (md5-sampled codebook, integer
    argmin, integer ADC), so the oracle rebuilds codes, ADC tables,
    shortlist, and rerank bit-for-bit and the driver checks every
    rank and score."""
    from locopy_spark.queries.docs import KNN_K, KNN_QUERY_IDS

    emb = managed_persist(
        similarity.with_fixed_norm(load_table(spark, sf_dir, "embeddings")),
        "pq",
    )
    return similarity.knn_pq(
        emb,
        query_ids=KNN_QUERY_IDS,
        k=KNN_K,
        dim=PQ_DIM,
        n_sub=PQ_M,
        n_codewords=PQ_CODEWORDS,
        oversample=PQ_OVERSAMPLE,
    ).orderBy("query_id", "rk")


def _oracle_pq_knn() -> str:
    from locopy_spark.functions.vectors import (
        cosine_from_fixed,
        sql_fixed_dot,
        sql_pq_adc,
        sql_pq_encode,
        sql_pq_qtab,
    )
    from locopy_spark.queries.docs import KNN_K, KNN_QUERY_IDS

    qids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    cos = cosine_from_fixed("dot_fix", "na", "nb")
    return f"""
      WITH e AS (
        SELECT vec_id, embedding,
               {sql_fixed_dot('embedding', 'embedding')} AS norm_fix
        FROM embeddings
      ),
      sample AS (
        SELECT embedding, md5(CAST(vec_id AS VARCHAR)) AS ck
        FROM embeddings ORDER BY ck LIMIT {PQ_CODEWORDS}
      ),
      cbt AS (SELECT list(embedding ORDER BY ck) AS cb FROM sample),
      codes AS (
        SELECT vec_id AS neighbor_id,
               {sql_pq_encode('embedding', 'cb', PQ_DIM, PQ_M, PQ_CODEWORDS)}
                 AS codes
        FROM embeddings, cbt
      ),
      qt AS (
        SELECT vec_id AS query_id,
               {sql_pq_qtab('embedding', 'cb', PQ_DIM, PQ_M, PQ_CODEWORDS)}
                 AS qtab
        FROM embeddings, cbt WHERE vec_id IN ({qids})
      ),
      approx AS (
        SELECT query_id, neighbor_id,
               {sql_pq_adc('q.qtab', 'c.codes', PQ_M)} AS adc
        FROM qt q, codes c WHERE q.query_id != c.neighbor_id
      ),
      short AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC
                 ) AS srk
          FROM approx
        ) WHERE srk <= {KNN_K * PQ_OVERSAMPLE}
      ),
      scored AS (
        SELECT s.query_id, s.neighbor_id,
               {sql_fixed_dot('q.embedding', 'n.embedding')} AS dot_fix,
               q.norm_fix AS na, n.norm_fix AS nb
        FROM short s
        JOIN e q ON s.query_id = q.vec_id
        JOIN e n ON s.neighbor_id = n.vec_id
      ),
      ranked AS (
        SELECT query_id, neighbor_id, {cos} AS cosine,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id ORDER BY {cos} DESC, neighbor_id ASC
               ) AS rk
        FROM scored
      )
      SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rk
      FROM ranked WHERE rk <= {KNN_K}
      ORDER BY query_id, rk
    """


ORACLE["s_pq_knn"] = _oracle_pq_knn()


# -- prefix-filtered exact similarity join ---------------------------------

# t=0.8: the exact-join near-dup bar. Prefix filtering's pruning power
# is (1-t)·n+1 prefix postings per doc — at 0.5 HALF of each doc enters
# the candidate join (310k candidates for 256 true pairs at sf0.1, and
# the filter does nothing); at 0.8 prefixes are ~17 shingles and the
# candidate set collapses. On this corpus the emitted pair set is the
# same at both thresholds (every true near-dup pair has J ≥ 0.8).
PREFIX_JOIN_T = 0.8


def d_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard pairs via prefix filtering
    (operators/dedup.py:prefix_filter_jaccard_pairs) — the
    production-scale EXACT similarity join: candidates come from
    equi-joining only each doc's ⌊(1-t)·n⌋+1 rarest shingles (global
    df-asc order), so boilerplate shingles' d² postings never enter
    the join; an integer length filter prunes before exact
    verification. The oracle is the straightforward all-pairs exact
    join — a green row PROVES the prefix filter emitted exactly the
    true pair set (completeness + precision), not an approximation."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_filter_jaccard_pairs(
        docs, k=SHINGLE_K, threshold=PREFIX_JOIN_T
    ).orderBy("doc_a", "doc_b")


def _oracle_prefix_join() -> str:
    from locopy_spark.queries.docs import _sql_shingle_sets

    t_milli = round(PREFIX_JOIN_T * 1000)
    return f"""
      WITH {_sql_shingle_sets()},
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT doc_a, doc_b, common, na.n AS na, nb.n AS nb,
             CAST(common AS DOUBLE) / (na.n + nb.n - common) AS jaccard
      FROM common
      JOIN sizes na ON common.doc_a = na.doc_id
      JOIN sizes nb ON common.doc_b = nb.doc_id
      WHERE {t_milli} * (na.n + nb.n - common) <= 1000 * common
      ORDER BY doc_a, doc_b
    """


ORACLE["d_prefix_join"] = _oracle_prefix_join()


# -- training sequence-length planning ----------------------------------------

SEQLEN_CANDIDATES = [128, 256, 512, 1024]


def p_seqlen_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pad-to-L utilization report for candidate training sequence
    lengths — the number read before fixing max_seq_len: for each
    L ∈ {SEQLEN_CANDIDATES}, a doc of n tokens costs ceil(n/L)
    sequences of L slots, and the padding waste is their empty tail.

    One whitespace-token count per document (the ``p_pack_sequences``
    length convention), then a broadcast candidate-length cross join
    (4 rows) and ONE partial-aggregated groupBy — all counts exact
    bigints, waste as integer ppm (exact floor division through
    DECIMAL(38)/HUGEINT at planet scale), utilization the one double.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "n_toks"
        )
    )
    ls = spark.createDataFrame(
        [(l,) for l in SEQLEN_CANDIDATES], "max_len long"
    )
    per = d.crossJoin(F.broadcast(ls)).select(
        "max_len",
        "n_toks",
        F.expr("(n_toks + max_len - 1) div max_len").alias("n_seqs"),
    )
    return (
        per.groupBy("max_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.sum("n_seqs").alias("n_seqs"),
            F.expr(
                "CAST(SUM(CAST(n_seqs AS DECIMAL(38,0)) * max_len)"
                " AS BIGINT)"
            ).alias("padded_tokens"),
        )
        .select(
            "max_len",
            "n_docs",
            "total_tokens",
            "n_seqs",
            "padded_tokens",
            F.expr(
                "CAST(CAST(padded_tokens - total_tokens AS DECIMAL(38,0))"
                " * 1000000 div padded_tokens AS BIGINT)"
            ).alias("waste_ppm"),
            F.expr(
                "CAST(total_tokens AS DOUBLE)"
                " / CAST(padded_tokens AS DOUBLE)"
            ).alias("utilization"),
        )
        .orderBy("max_len")
    )


ORACLE["p_seqlen_plan"] = f"""
  WITH d AS (
    SELECT CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
             AS n_toks
    FROM documents
  ),
  per AS (
    SELECT l.max_len, d.n_toks,
           (d.n_toks + l.max_len - 1) // l.max_len AS n_seqs
    FROM d
    CROSS JOIN (SELECT UNNEST({SEQLEN_CANDIDATES}) AS max_len) l
  ),
  agg AS (
    SELECT max_len, COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(SUM(n_seqs) AS BIGINT) AS n_seqs,
           CAST(SUM(CAST(n_seqs AS HUGEINT) * max_len) AS BIGINT)
             AS padded_tokens
    FROM per GROUP BY max_len
  )
  SELECT max_len, n_docs, total_tokens, n_seqs, padded_tokens,
         CAST(CAST(padded_tokens - total_tokens AS HUGEINT)
              * 1000000 // padded_tokens AS BIGINT) AS waste_ppm,
         CAST(total_tokens AS DOUBLE) / CAST(padded_tokens AS DOUBLE)
           AS utilization
  FROM agg ORDER BY max_len
"""


# -- code-vs-prose detection -------------------------------------------------

# marker-density threshold for "code-like": 8,000 ppm = 0.8% of
# characters are ; { } = ( — prose sits well under, source files well
# over (deterministic heuristic; the corpus-mixture gate for routing
# code-heavy sources to a code-aware tokenizer)
CODE_TAU_PPM = 8000


def _count_expr(sub: str) -> str:
    """Occurrences of ``sub`` via replace-length arithmetic — pure
    string ops, identical on both engines (no regex dialect risk)."""
    esc = sub.replace("'", "''")
    return (
        f"(length(text) - length(replace(text, '{esc}', '')))"
        f" div {len(sub)}"
    )


_CODE_MARKERS = [";", "{", "}", "=", "("]
_CODE_SCORE = (
    "CAST(("
    + " + ".join(_count_expr(m) for m in _CODE_MARKERS)
    + ") * 1000000 div greatest(length(text), 1) AS BIGINT)"
)


def t_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose classification per source — the corpus-mixture
    gate that decides which sources need a code-aware tokenizer /
    dedicated quality pipeline (code looks "low quality" to prose
    heuristics like t_quality_score and would be wrongly filtered).

    Row-local marker-density scoring (; {{ }} = ( counted via
    replace-length arithmetic — no regex, so no cross-engine dialect
    risk), one partial-aggregated |sources|-sized rollup. Exact ppm
    integers throughout (floor division on positives; the div-by-zero
    guard keeps empty docs at score 0).
    """
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "source",
        F.expr(_CODE_SCORE).alias("score_ppm"),
    ).withColumn(
        "is_code", F.expr(f"cast(score_ppm >= {CODE_TAU_PPM} as int)")
    )
    g = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_code").alias("n_code"),
        F.sum("score_ppm").alias("s_score"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_code",
        F.expr(
            "CAST(CAST(n_code AS DECIMAL(38,0)) * 1000000"
            " div n_docs AS BIGINT)"
        ).alias("code_share_ppm"),
        F.expr("CAST(s_score div n_docs AS BIGINT)").alias(
            "mean_score_ppm"
        ),
    ).orderBy("source")


_CODE_SCORE_DUCK = _CODE_SCORE.replace(" div ", " // ")

ORACLE["t_code_detect"] = f"""
  WITH scored AS (
    SELECT source, {_CODE_SCORE_DUCK} AS score_ppm
    FROM documents
  ),
  flagged AS (
    SELECT source, score_ppm,
           CAST(score_ppm >= {CODE_TAU_PPM} AS INT) AS is_code
    FROM scored
  ),
  g AS (
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(is_code) AS BIGINT) AS n_code,
           CAST(SUM(score_ppm) AS BIGINT) AS s_score
    FROM flagged GROUP BY 1
  )
  SELECT source, n_docs, n_code,
         CAST(CAST(n_code AS HUGEINT) * 1000000 // n_docs AS BIGINT)
           AS code_share_ppm,
         CAST(s_score // n_docs AS BIGINT) AS mean_score_ppm
  FROM g ORDER BY source
"""


# -- boilerplate detection ---------------------------------------------------
#
# C4/RefinedWeb-style boilerplate removal works on spans repeated
# across many documents of the SAME source (nav bars, footers, license
# headers).  df is DOCUMENT frequency (a span repeated 50x inside one
# page is repetition, not boilerplate — t_repetition covers that).
BOILER_K = 3  # span length in tokens
BOILER_MIN_DF = 3  # boilerplate = span seen in >= 3 docs of a source


def boiler_spans(docs: DataFrame) -> DataFrame:
    """(source, doc_id, span) with row-local within-doc span dedup —
    the set-union state shared by t_boilerplate and its streaming
    twin (docs arrive whole, so the table is a plain set of rows and
    union+distinct is idempotent under chunk re-delivery)."""
    return docs.select(
        "source",
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct("
                + shingles_expr(tokens_expr("text"), k=BOILER_K)
                + ")"
            )
        ).alias("span"),
    )


def boiler_doc_counts(docs: DataFrame) -> DataFrame:
    """Per-source document counts — the additive half of the
    boilerplate state (short docs emit no spans, so this cannot be
    derived from :func:`boiler_spans`)."""
    return docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


def boiler_report(g: DataFrame, n_docs: DataFrame) -> DataFrame:
    """Finisher over the boilerplate state: document frequency per
    (source, span), the >= ``BOILER_MIN_DF`` cut, and the per-source
    affected-document rollup with exact ppm shares."""
    df_ = g.groupBy("source", "span").agg(F.count(F.lit(1)).alias("df"))
    boiler = df_.filter(F.col("df") >= BOILER_MIN_DF)
    per_src = boiler.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_boiler_spans"),
        F.max("df").alias("max_df"),
    )
    affected = (
        g.join(boiler.select("source", "span"), ["source", "span"])
        .select("source", "doc_id")
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("docs_affected"))
    )
    return (
        n_docs.join(per_src, "source", "left")
        .join(affected, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_boiler_spans", F.lit(0)).alias("n_boiler_spans"),
            F.coalesce("max_df", F.lit(0)).alias("max_df"),
            F.coalesce("docs_affected", F.lit(0)).alias("docs_affected"),
            F.expr(
                "CAST(CAST(coalesce(docs_affected, 0) AS DECIMAL(38,0))"
                " * 1000000 div n_docs AS BIGINT)"
            ).alias("affected_ppm"),
        )
        .orderBy("source")
    )


def t_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate-span profile: ``BOILER_K``-gram spans
    that recur in >= ``BOILER_MIN_DF`` distinct documents of one
    source, with the share of that source's documents carrying at
    least one such span — the pre-cleaning read that decides which
    sources need span-level boilerplate stripping before they feed
    the dedup/quality pipeline (boilerplate inflates MinHash
    similarity and deflates t_quality_score for the whole source).

    Span de-duplication WITHIN a document is row-local
    (``array_distinct`` before the explode — no exploded-level
    DISTINCT shuffle), so the only shuffles are the (source, span)
    document-frequency aggregate (partial-aggregated, inverted-index
    shaped) and the two |sources|-sized rollups.  Document text never
    shuffles.  Exact ppm integers via DECIMAL(38)/HUGEINT floor
    division.  Split as state (boiler_spans + boiler_doc_counts) +
    finisher (boiler_report) shared with the streaming twin.
    """
    d = load_table(spark, sf_dir, "documents")
    return boiler_report(
        managed_persist(boiler_spans(d), "boilerplate"),
        boiler_doc_counts(d),
    )


ORACLE["t_boilerplate"] = f"""
  WITH t AS (
    SELECT doc_id, source, {sql_tokens('text')} AS toks FROM documents
  ),
  g AS (
    SELECT doc_id, source, unnest(
      list_distinct({sql_shingles('toks', BOILER_K)})
    ) AS span
    FROM t WHERE len(toks) >= {BOILER_K}
  ),
  dfs AS (
    SELECT source, span, COUNT(*) AS df FROM g GROUP BY 1, 2
  ),
  boiler AS (SELECT * FROM dfs WHERE df >= {BOILER_MIN_DF}),
  per_src AS (
    SELECT source, COUNT(*) AS n_boiler_spans,
           CAST(MAX(df) AS BIGINT) AS max_df
    FROM boiler GROUP BY 1
  ),
  affected AS (
    SELECT source, COUNT(DISTINCT doc_id) AS docs_affected
    FROM g JOIN boiler USING (source, span) GROUP BY 1
  ),
  nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
  SELECT nd.source, nd.n_docs,
         CAST(COALESCE(n_boiler_spans, 0) AS BIGINT) AS n_boiler_spans,
         CAST(COALESCE(max_df, 0) AS BIGINT) AS max_df,
         CAST(COALESCE(docs_affected, 0) AS BIGINT) AS docs_affected,
         CAST(CAST(COALESCE(docs_affected, 0) AS HUGEINT) * 1000000
              // nd.n_docs AS BIGINT) AS affected_ppm
  FROM nd LEFT JOIN per_src ON nd.source = per_src.source
          LEFT JOIN affected ON nd.source = affected.source
  ORDER BY nd.source
"""


# -- hybrid retrieval: reciprocal-rank fusion ---------------------------------
#
# The serving shape of a two-tower + lexical retrieval stack: each arm
# produces a top-RRF_POOL candidate list, fusion re-scores by
# reciprocal rank with the standard k0=60 damping.  Scores are EXACT
# integers (1e6 div (k0 + rank)), so the fused ranking is
# engine-portable with no float-sum order risk.
RRF_POOL = 20  # per-arm candidate-list depth
RRF_TOPK = 10  # fused results kept per query
RRF_K0 = 60


def doc_postings(docs: DataFrame) -> DataFrame:
    """Row-local-deduped (doc_id, term) postings — the inverted-index
    state shared by the batch retrieval queries and the streaming
    index twin (a SET of rows: union+distinct is idempotent)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.expr(f"array_distinct({tokens_expr('text')})")
        ).alias("term"),
    )


LEX_TABLES = ("postings", "dfs", "ntot")


def lexical_table_names(prefix: str = "lex_index") -> dict[str, str]:
    return {t: f"{prefix}_{t}" for t in LEX_TABLES}


def materialize_lexical_index(
    docs: DataFrame, prefix: str = "lex_index", n_buckets: int = 8
) -> dict[str, DataFrame]:
    """Materialized lexical (inverted) index — the retrieval family's
    instance of the graph/ANN amortization device: the corpus-sized
    work every lexical query pays per call (tokenize + explode the
    whole documents table, then the vocabulary-wide document-frequency
    aggregate) is paid ONCE into bucketed managed tables, and the
    consumers (s_rrf_fusion / s_prf_expand via ``lexical_arm``'s
    injection parameters) serve from storage with zero re-tokenize
    work.  ``stream_lexical_index`` is this index's incremental arm —
    its live state IS the postings set.

    Tables (prefix-qualified): ``<p>_postings`` (doc_id, term;
    row-local-deduped set semantics) bucketed+sorted by term,
    ``<p>_dfs`` (term, df; vocabulary-bounded) bucketed by term, and
    the 1-row ``<p>_ntot`` doc count.
    """
    from locopy_spark.sources.bucketed import write_bucketed

    spark = docs.sparkSession
    names = lexical_table_names(prefix)
    write_bucketed(
        doc_postings(docs),
        names["postings"],
        "term",
        n_buckets=n_buckets,
        sort_cols=["term"],
    )
    tok = spark.table(names["postings"])
    write_bucketed(
        tok.groupBy("term").agg(F.count(F.lit(1)).alias("df")),
        names["dfs"],
        "term",
        n_buckets=n_buckets,
        sort_cols=["term"],
    )
    write_bucketed(
        docs.agg(F.count(F.lit(1)).alias("n_docs")),
        names["ntot"],
        "n_docs",
        n_buckets=0,
    )
    return {t: spark.table(names[t]) for t in LEX_TABLES}


def lexical_arm(
    docs: DataFrame,
    query_ids: list[int],
    pool: int,
    scope: str,
    tok: DataFrame | None = None,
    dfs: DataFrame | None = None,
    ntot: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """The ONE copy of the lexical-retrieval scaffolding shared by
    s_rrf_fusion and s_prf_expand: row-local-deduped (doc, term)
    postings (persisted under ``scope``), vocab-bounded document
    frequencies, the broadcast query-term table, and the exact
    rational-idf overlap top-``pool`` per query.

    ``tok``/``dfs``/``ntot``: pre-built index tables (ideally the
    bucketed managed tables of :func:`materialize_lexical_index`) —
    the 100-TB serving shape, where the corpus tokenize and the vocab
    df aggregate are paid at index-build time and every query reads
    storage.  Injected tables are used as-is (no re-persist: reading
    pre-partitioned storage several times IS the serving plan)."""
    if tok is None:
        tok = managed_persist(doc_postings(docs), scope)
    if ntot is None:
        ntot = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return lexical_from_postings(tok, ntot, query_ids, pool, dfs=dfs)


def lexical_from_postings(
    tok: DataFrame,
    ntot: DataFrame,
    query_ids: list[int],
    pool: int,
    dfs: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Lexical-arm tables from an existing postings set + 1-row doc
    count — the entry point the streaming index twin shares with the
    batch queries (its state IS the postings table).  ``dfs``: a
    pre-aggregated (term, df) table, else derived here."""
    from pyspark.sql import Window as W

    # tok is distinct per (doc_id, term), so COUNT(*) is document freq
    if dfs is None:
        dfs = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qt = tok.filter(F.col("doc_id").isin(query_ids)).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    # restrict the df table to QUERY terms before broadcasting: the
    # full-vocabulary dfs is corpus-sized at 100 TB (df counts still
    # come from the full corpus — restriction happens after counting)
    dfs_q = dfs.join(F.broadcast(qt.select("term").distinct()), "term")
    scored = (
        tok.join(F.broadcast(qt), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(dfs_q), "term")
        .crossJoin(F.broadcast(ntot))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.expr(
                    "CAST(n_docs - df AS BIGINT) * 1000000 div df"
                )
            ).alias("score")
        )
    )
    wl = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        scored.withColumn("rank_lex", F.row_number().over(wl))
        .filter(F.col("rank_lex") <= pool)
        .select("query_id", F.col("doc_id").alias("cand"), "rank_lex")
    )
    return {"tok": tok, "dfs": dfs, "ntot": ntot, "qt": qt, "lex": lex}


def s_rrf_fusion(
    spark: SparkSession,
    sf_dir: str,
    lex_tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Hybrid retrieval over the aligned documents/embeddings pair
    (doc_id == vec_id): a lexical arm (sum of exact rational idf over
    DISTINCT shared terms with the query document — the t_bm25 idf
    device) and a vector arm (exact fixed-point cosine top-k,
    operators/similarity.knn_bruteforce) each emit a top-``RRF_POOL``
    list per query; reciprocal-rank fusion sums ``1e6 div (60 + rank)``
    across arms and keeps ``RRF_TOPK``.

    Scale shape: the query side (terms and vectors of
    ``KNN_QUERY_IDS``) broadcasts; the corpus token table is exploded
    once with row-local within-doc dedup (``array_distinct`` before
    the explode); the idf table is vocab-bounded; the vector arm
    streams the big side shuffle-free (the s_mips shape).  The fusion
    join touches only 2 × RRF_POOL rows per query.
    """
    from pyspark.sql import Window as W

    from locopy_spark.operators.similarity import knn_bruteforce
    from locopy_spark.queries.docs import KNN_QUERY_IDS

    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lt = lex_tables or {}
    t = lexical_arm(
        d, KNN_QUERY_IDS, RRF_POOL, scope="rrf_fusion",
        tok=lt.get("postings"), dfs=lt.get("dfs"), ntot=lt.get("ntot"),
    )
    lex = t["lex"]
    vec = knn_bruteforce(emb, query_ids=KNN_QUERY_IDS, k=RRF_POOL).select(
        "query_id", F.col("neighbor_id").alias("cand"),
        F.col("rk").alias("rank_vec"),
    )
    # fusion as union + groupBy (r12): the old full-outer equi-join
    # CANNOT broadcast-hash (Spark's BHJ does not support FULL OUTER),
    # so it sort-merge-joined two exchanges of the tiny per-query pool
    # lists.  Each (query, cand) appears at most once per arm and
    # ranks are >= 1, so 0-padding + MAX reproduces the outer join's
    # coalesce exactly; one hash aggregate replaces SMJ + sort + one
    # exchange.
    fused = (
        lex.select(
            "query_id", "cand",
            F.col("rank_lex").cast("int").alias("rank_lex"),
            F.lit(0).alias("rank_vec"),
        )
        .unionByName(
            vec.select(
                "query_id", "cand",
                F.lit(0).alias("rank_lex"),
                F.col("rank_vec").cast("int").alias("rank_vec"),
            )
        )
        .groupBy("query_id", "cand")
        .agg(
            F.max("rank_lex").alias("rank_lex"),
            F.max("rank_vec").alias("rank_vec"),
        )
        .select(
            "query_id",
            "cand",
            "rank_lex",
            "rank_vec",
            (
                F.expr(
                    f"CASE WHEN rank_lex > 0 THEN"
                    f" 1000000 div ({RRF_K0} + rank_lex) ELSE 0 END"
                )
                + F.expr(
                    f"CASE WHEN rank_vec > 0 THEN"
                    f" 1000000 div ({RRF_K0} + rank_vec) ELSE 0 END"
                )
            ).cast("long").alias("rrf_ppm"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("rrf_ppm"), F.asc("cand"))
    return (
        fused.withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") <= RRF_TOPK)
        .select(
            "query_id", F.col("cand").alias("doc_id"),
            "rank_lex", "rank_vec", "rrf_ppm",
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("query_id", "rk")
    )


def _rrf_oracle() -> str:
    from locopy_spark.functions.vectors import cosine_from_fixed, sql_fixed_dot
    from locopy_spark.queries.docs import KNN_QUERY_IDS

    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    cos = cosine_from_fixed("dot_fix", "na", "nb")
    return f"""
  WITH tok AS (
    SELECT DISTINCT doc_id, term FROM (
      SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    )
  ),
  dfs AS (SELECT term, COUNT(*) AS df FROM tok GROUP BY 1),
  nt AS (SELECT COUNT(*) AS n_docs FROM documents),
  qt AS (
    SELECT doc_id AS query_id, term FROM tok WHERE doc_id IN ({ids})
  ),
  m AS (
    SELECT qt.query_id, tok.doc_id,
           SUM(CAST(n_docs - df AS BIGINT) * 1000000 // df) AS score
    FROM tok JOIN qt USING (term) JOIN dfs USING (term) CROSS JOIN nt
    WHERE tok.doc_id != qt.query_id GROUP BY 1, 2
  ),
  lex AS (
    SELECT query_id, doc_id AS cand,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS rank_lex
    FROM m QUALIFY rank_lex <= {RRF_POOL}
  ),
  e AS (
    SELECT vec_id, embedding,
           {sql_fixed_dot('embedding', 'embedding')} AS norm_fix
    FROM embeddings
  ),
  vscored AS (
    SELECT q.vec_id AS query_id, n.vec_id AS cand,
           {sql_fixed_dot('q.embedding', 'n.embedding')} AS dot_fix,
           q.norm_fix AS na, n.norm_fix AS nb
    FROM e q JOIN e n ON q.vec_id != n.vec_id
    WHERE q.vec_id IN ({ids})
  ),
  vec AS (
    SELECT query_id, cand,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY {cos} DESC, cand ASC
           ) AS rank_vec
    FROM vscored QUALIFY rank_vec <= {RRF_POOL}
  ),
  fused AS (
    SELECT COALESCE(l.query_id, v.query_id) AS query_id,
           COALESCE(l.cand, v.cand) AS cand,
           l.rank_lex, v.rank_vec,
           COALESCE(1000000 // ({RRF_K0} + l.rank_lex), 0)
             + COALESCE(1000000 // ({RRF_K0} + v.rank_vec), 0) AS rrf_ppm
    FROM lex l FULL OUTER JOIN vec v
      ON l.query_id = v.query_id AND l.cand = v.cand
  ),
  ranked AS (
    SELECT query_id, cand, rank_lex, rank_vec, rrf_ppm,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY rrf_ppm DESC, cand ASC
           ) AS rk
    FROM fused QUALIFY rk <= {RRF_TOPK}
  )
  SELECT query_id, cand AS doc_id,
         CAST(COALESCE(rank_lex, 0) AS INT) AS rank_lex,
         CAST(COALESCE(rank_vec, 0) AS INT) AS rank_vec,
         CAST(rrf_ppm AS BIGINT) AS rrf_ppm,
         CAST(rk AS INT) AS rk
  FROM ranked ORDER BY query_id, rk
"""


ORACLE["s_rrf_fusion"] = _rrf_oracle()


# -- MMR diversity re-ranking -------------------------------------------------
#
# Maximal Marginal Relevance over the vector arm's candidate pool:
# pick_i = argmax( 7*rel - 3*max_{s in selected} sim(c, s) ) in tenths
# (lambda = 0.7).  Relevance is the reciprocal-rank integer (1e6 div
# (60+rank)) and similarity is floor(cosine * 1e6) — so every score,
# comparison, and tie-break is EXACT integer arithmetic and the greedy
# trajectory is engine-portable.
MMR_POOL = 20  # candidate pool per query (vector top-k)
MMR_TOPK = 5  # greedy picks per query
MMR_REL_NUM = 7  # lambda = MMR_REL_NUM / 10
MMR_SIM_NUM = 3


def s_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-ranking of each query's top-``MMR_POOL``
    cosine candidates: ``MMR_TOPK`` greedy rounds, each keeping the
    candidate maximizing ``7*rel_ppm - 3*max_sim_ppm`` (ties by
    doc_id) — the redundancy-suppressing re-rank that keeps a RAG
    context window from filling with five copies of the same
    document.

    The candidate pool comes from the exact brute-force arm
    (broadcast queries, shuffle-free scan); pairwise candidate
    similarities are |Q| x POOL^2 rows — constant-sized. The greedy
    selection itself is a bounded sequential recurrence over that
    constant per-query table ({MMR_TOPK} rounds of integer argmax),
    so it runs as ONE cogrouped Arrow task per query (the
    q_exp_smooth bounded-series rule) instead of {MMR_TOPK} rounds
    of tiny join/window jobs — every score is an exact integer, so
    the greedy argmax trajectory is deterministic on both engines
    (r11: 6.8 -> 1.3 s at sf0.1, bit-identical rows).
    """
    from locopy_spark.functions.vectors import (
        cosine_from_fixed,
        fixed_dot_expr,
    )
    from locopy_spark.operators.similarity import knn_bruteforce, with_fixed_norm
    from locopy_spark.queries.docs import KNN_QUERY_IDS

    emb = load_table(spark, sf_dir, "embeddings")
    cands = knn_bruteforce(emb, query_ids=KNN_QUERY_IDS, k=MMR_POOL).select(
        "query_id",
        F.col("neighbor_id").alias("cand"),
        F.col("rk").alias("rank_vec"),
        F.expr(f"1000000 div ({RRF_K0} + rk)").alias("rel_ppm"),
    )
    ne = with_fixed_norm(emb).select(
        F.col("vec_id").alias("cand"),
        F.col("embedding").alias("c_emb"),
        F.col("norm_fix").alias("c_norm"),
    )
    # qid (not query_id) on the sims side: sims derives from cands, so
    # the cogroup below would otherwise see one attribute id on both
    # sides and fail the ambiguous-self-join check.
    # NOTE (ADVICE r11): cands is deliberately NOT checkpointed or
    # persisted, so the knn_bruteforce candidate subtree is evaluated
    # independently on BOTH cogroup sides (cands and sims) — the
    # measured net win at this POOL size (the r11 A/B kept it); if
    # pool sizes grow enough that the double scan dominates, persist
    # cands here.
    ce = cands.select(
        F.col("query_id").alias("qid"), "cand"
    ).join(ne, "cand")
    x = ce.select(
        "qid",
        F.col("cand").alias("a"),
        F.col("c_emb").alias("a_emb"),
        F.col("c_norm").alias("a_norm"),
    )
    y = ce.select(
        "qid",
        F.col("cand").alias("b"),
        F.col("c_emb").alias("b_emb"),
        F.col("c_norm").alias("b_norm"),
    )
    cos = cosine_from_fixed("dot_fix", "a_norm", "b_norm")
    sims = (
        x.join(y, "qid")
        .filter(F.col("a") != F.col("b"))
        .withColumn("dot_fix", F.expr(fixed_dot_expr("a_emb", "b_emb")))
        .select(
            "qid",
            "a",
            "b",
            F.expr(f"CAST(FLOOR(({cos}) * 1000000) AS BIGINT)").alias(
                "sim_ppm"
            ),
        )
    )

    def greedy(key, cand_pdf, sim_pdf):
        # the exact integer greedy the join/window loop ran: seed with
        # rank_vec == 1, then MMR_TOPK - 1 argmax rounds of
        # 7*rel - 3*max_sim over the selected set, ties by cand asc
        import pandas as pd

        qid = key[0]
        rel = dict(zip(cand_pdf["cand"], cand_pdf["rel_ppm"]))
        sim = {}
        for a, b, s in zip(sim_pdf["a"], sim_pdf["b"], sim_pdf["sim_ppm"]):
            # NULL sim_ppm (zero-norm embedding -> NULL cosine) arrives
            # as NaN through Arrow; SQL MAX ignores NULLs, so the row
            # behaves exactly as if absent -- same path as the inner
            # sims join's missing keys below
            if pd.isna(s):
                continue
            sim.setdefault(int(a), {})[int(b)] = int(s)
        seed_rows = cand_pdf[cand_pdf["rank_vec"] == 1]
        if seed_rows.empty:
            return pd.DataFrame(
                {"query_id": [], "cand": [], "step": [], "mmr_score": []}
            ).astype(
                {"query_id": "int64", "cand": "int64",
                 "step": "int32", "mmr_score": "int64"}
            )
        seed = int(seed_rows["cand"].iloc[0])
        out = [(qid, seed, 1, MMR_REL_NUM * int(rel[seed]))]
        selected = [seed]
        remaining = sorted(int(c) for c in cand_pdf["cand"] if int(c) != seed)
        for step in range(2, MMR_TOPK + 1):
            best = None
            for a in remaining:
                sims_a = sim.get(a, {})
                msim = max(
                    (sims_a[s] for s in selected if s in sims_a),
                    default=None,
                )
                if msim is None:
                    continue  # mirrors the loop's inner sims join
                score = MMR_REL_NUM * int(rel[a]) - MMR_SIM_NUM * msim
                if best is None or score > best[0]:
                    best = (score, a)
            if best is None:
                break
            score, a = best
            out.append((qid, a, step, score))
            selected.append(a)
            remaining.remove(a)
        return pd.DataFrame(
            out, columns=["query_id", "cand", "step", "mmr_score"]
        )

    sel = (
        cands.groupBy("query_id")
        .cogroup(sims.groupBy("qid"))
        .applyInPandas(
            greedy,
            "query_id long, cand long, step int, mmr_score long",
        )
    )
    return sel.select(
        "query_id",
        F.col("cand").alias("doc_id"),
        "step",
        "mmr_score",
    ).orderBy("query_id", "step")


def _mmr_oracle() -> str:
    from locopy_spark.functions.vectors import cosine_from_fixed, sql_fixed_dot
    from locopy_spark.queries.docs import KNN_QUERY_IDS

    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    qcos = cosine_from_fixed("dot_fix", "na", "nb")
    head = f"""
  WITH e AS MATERIALIZED (
    SELECT vec_id, embedding,
           {sql_fixed_dot('embedding', 'embedding')} AS norm_fix
    FROM embeddings
  ),
  vscored AS (
    SELECT q.vec_id AS query_id, n.vec_id AS cand,
           {sql_fixed_dot('q.embedding', 'n.embedding')} AS dot_fix,
           q.norm_fix AS na, n.norm_fix AS nb
    FROM e q JOIN e n ON q.vec_id != n.vec_id
    WHERE q.vec_id IN ({ids})
  ),
  cands AS MATERIALIZED (
    SELECT query_id, cand, rk AS rank_vec,
           1000000 // ({RRF_K0} + rk) AS rel_ppm
    FROM (
      SELECT query_id, cand,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY {qcos} DESC, cand ASC
             ) AS rk
      FROM vscored
    ) WHERE rk <= {MMR_POOL}
  ),
  ce AS MATERIALIZED (
    SELECT c.query_id, c.cand, e.embedding, e.norm_fix
    FROM cands c JOIN e ON e.vec_id = c.cand
  ),
  sims AS MATERIALIZED (
    SELECT x.query_id, x.cand AS a, y.cand AS b,
           CAST(FLOOR(({cosine_from_fixed(sql_fixed_dot('x.embedding', 'y.embedding'), 'x.norm_fix', 'y.norm_fix')}) * 1000000) AS BIGINT) AS sim_ppm
    FROM ce x JOIN ce y
      ON x.query_id = y.query_id AND x.cand != y.cand
  ),
  sel1 AS MATERIALIZED (
    SELECT query_id, cand, 1 AS step,
           CAST({MMR_REL_NUM} * rel_ppm AS BIGINT) AS mmr_score
    FROM cands WHERE rank_vec = 1
  )"""
    mid = []
    for i in range(2, MMR_TOPK + 1):
        p = i - 1
        mid.append(f"""
  scores{i} AS (
    SELECT s.query_id, s.a AS cand,
           CAST({MMR_REL_NUM} * MAX(c.rel_ppm)
                - {MMR_SIM_NUM} * MAX(s.sim_ppm) AS BIGINT) AS mmr_score
    FROM sims s
    JOIN sel{p} x ON x.query_id = s.query_id AND x.cand = s.b
    JOIN cands c ON c.query_id = s.query_id AND c.cand = s.a
    WHERE NOT EXISTS (
      SELECT 1 FROM sel{p} z
      WHERE z.query_id = s.query_id AND z.cand = s.a
    )
    GROUP BY s.query_id, s.a
  ),
  pick{i} AS (
    SELECT query_id, cand, {i} AS step, mmr_score FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY mmr_score DESC, cand ASC
      ) AS rn FROM scores{i}
    ) WHERE rn = 1
  ),
  sel{i} AS MATERIALIZED (
    SELECT * FROM sel{p} UNION ALL SELECT * FROM pick{i}
  )""")
    return (
        head
        + ","
        + ",".join(mid)
        + f"""
  SELECT query_id, cand AS doc_id, CAST(step AS INT) AS step, mmr_score
  FROM sel{MMR_TOPK} ORDER BY query_id, step
"""
    )


ORACLE["s_mmr_diversify"] = _mmr_oracle()


# -- pseudo-relevance-feedback query expansion --------------------------------
PRF_FB = 5  # feedback depth: top lexical docs per query
PRF_TERMS = 5  # expansion terms kept per query


def s_prf_expand(
    spark: SparkSession,
    sf_dir: str,
    lex_tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Pseudo-relevance-feedback expansion (RM1/Rocchio-lite): take
    each query document's top-``PRF_FB`` lexical matches, collect
    terms those feedback docs contain but the query doc does NOT, and
    score each candidate term ``fb_df * idf_scaled`` (feedback
    document frequency x the exact rational idf) — the retrieval-
    toolkit third leg next to s_rrf_fusion (fusion) and
    s_mmr_diversify (diversity).

    Shares the ``lexical_arm`` scaffolding (one persisted postings
    explode); the feedback join touches ``|Q| x PRF_FB`` doc ids; the
    term rollup is bounded by the feedback docs' vocabularies; idf is
    vocab-bounded and broadcast.  Every score is an exact integer.
    """
    from locopy_spark.queries.docs import KNN_QUERY_IDS

    d = load_table(spark, sf_dir, "documents")
    lt = lex_tables or {}
    return prf_report(
        lexical_arm(
            d, KNN_QUERY_IDS, PRF_FB, scope="prf_expand",
            tok=lt.get("postings"), dfs=lt.get("dfs"), ntot=lt.get("ntot"),
        )
    )


def prf_report(t: dict[str, DataFrame]) -> DataFrame:
    """PRF finisher over lexical-arm tables — shared by the batch
    query and the streaming index twin's on-demand scoring."""
    from pyspark.sql import Window as W

    fb_terms = (
        t["lex"]
        .join(
            t["tok"].select(F.col("doc_id").alias("cand"), "term"), "cand"
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("fb_df"))
        .join(t["qt"], ["query_id", "term"], "anti")
        # candidate terms span the feedback docs' vocabularies, so the
        # idf lookup joins the full df table on the term key (shuffle,
        # partial-aggregated) instead of broadcasting corpus vocabulary
        .join(t["dfs"], "term")
        .crossJoin(F.broadcast(t["ntot"]))
        .select(
            "query_id",
            "term",
            "fb_df",
            F.expr(
                "fb_df * (CAST(n_docs - df AS BIGINT) * 1000000 div df)"
            ).alias("score_scaled"),
        )
    )
    wp = W.partitionBy("query_id").orderBy(
        F.desc("score_scaled"), F.asc("term")
    )
    return (
        fb_terms.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= PRF_TERMS)
        .select(
            "query_id", "term", "fb_df", "score_scaled",
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("query_id", "rk")
    )


def _prf_oracle() -> str:
    from locopy_spark.queries.docs import KNN_QUERY_IDS

    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    return f"""
  WITH tok AS MATERIALIZED (
    SELECT DISTINCT doc_id, term FROM (
      SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    )
  ),
  dfs AS (SELECT term, COUNT(*) AS df FROM tok GROUP BY 1),
  nt AS (SELECT COUNT(*) AS n_docs FROM documents),
  qt AS MATERIALIZED (
    SELECT doc_id AS query_id, term FROM tok WHERE doc_id IN ({ids})
  ),
  m AS (
    SELECT qt.query_id, tok.doc_id,
           SUM(CAST(n_docs - df AS BIGINT) * 1000000 // df) AS score
    FROM tok JOIN qt USING (term) JOIN dfs USING (term) CROSS JOIN nt
    WHERE tok.doc_id != qt.query_id GROUP BY 1, 2
  ),
  lex AS (
    SELECT query_id, doc_id AS cand,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS rank_lex
    FROM m QUALIFY rank_lex <= {PRF_FB}
  ),
  fb AS (
    SELECT l.query_id, t.term, COUNT(*) AS fb_df
    FROM lex l JOIN tok t ON t.doc_id = l.cand
    GROUP BY 1, 2
  ),
  cand_terms AS (
    SELECT f.query_id, f.term, f.fb_df,
           CAST(f.fb_df * (CAST(n_docs - df AS BIGINT) * 1000000 // df)
                AS BIGINT) AS score_scaled
    FROM fb f JOIN dfs USING (term) CROSS JOIN nt
    WHERE NOT EXISTS (
      SELECT 1 FROM qt
      WHERE qt.query_id = f.query_id AND qt.term = f.term
    )
  )
  SELECT query_id, term, fb_df, score_scaled, CAST(rk AS INT) AS rk
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score_scaled DESC, term ASC
    ) AS rk
    FROM cand_terms
  ) WHERE rk <= {PRF_TERMS}
  ORDER BY query_id, rk
"""


ORACLE["s_prf_expand"] = _prf_oracle()


# -- nearest-centroid label purity (embedding-space eval) --------------------

PURITY_V_SCALE = 1_000_000  # vector components, 1e6 fixed-point
PURITY_C_SCALE = 100_000  # centroid components, 1e5 fixed-point

# Exact sign-aware cosine comparison between the own-label centroid
# (dot_o, n2_o) and another centroid (dot_b, n2_b) for the SAME
# vector (the vector norm cancels): cos_o > cos_b via cross-
# multiplied squares — strict integer arithmetic, never a sqrt.
# Scales chosen so dot² · n2 tops out near 2.6e37 < 10^38 (the
# DECIMAL(38)/HUGEINT ceiling); 1e6 · 1e5 would already be exact in
# engine terms, but one more digit on either side would overflow the
# comparator product — the bound is the design, not an accident.


def _purity_win(wide: str) -> str:
    big_o = f"CAST(dot_o AS {wide}) * dot_o * n2_b"
    big_b = f"CAST(dot_b AS {wide}) * dot_b * n2_o"
    return (
        "CASE WHEN dot_o >= 0 AND dot_b < 0 THEN true"
        " WHEN dot_o < 0 AND dot_b >= 0 THEN false"
        f" WHEN dot_o >= 0 THEN {big_o} > {big_b}"
        f" ELSE {big_o} < {big_b} END"
    )


def s_centroid_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid label purity — the embedding-space
    separability report (does each label's region actually belong to
    it?): per label, how many member vectors are closer (by cosine)
    to their OWN label centroid than to EVERY other label's centroid.
    The centroid counterpart of d_knn_classify's instance-level vote,
    and the eval a two-tower/classifier embedding ships with.

    Exact end-to-end: vectors quantize to 1e6 fixed-point row-locally
    (transform — the payload never explodes), centroids to 1e5 via
    the signed-ratio floor device over exact DECIMAL sums, per-
    (vector, centroid) dots close as bigint zip_with/aggregate folds
    (≤ 6.4e12, inside 2^53), and own-vs-other comparisons cross-
    multiply through DECIMAL(38)/HUGEINT — no sqrt, no doubles, so
    the oracle reproduces every verdict bit-for-bit.

    Scale shape: the |labels × dims| centroid table builds from one
    (label, dim) aggregate and BROADCASTS as |labels| array rows; the
    scoring pass is a broadcast nested loop (|vecs| × |labels| rows,
    the s_knn_bruteforce convention — legitimate because the
    broadcast side is 10 rows), then two bounded aggregates. One
    input-sized shuffle total (the centroid aggregate); the
    mapInPandas matmul kernel (operators/similarity.py) remains the
    production path for |labels| in the thousands.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return purity_report(emb, purity_state(emb))


def purity_state(emb: DataFrame) -> DataFrame:
    """The additive purity-centroid state ``(label, dim_idx, s, n)``:
    exact DECIMAL(38) sums of the 1e6 fixed-point components + counts
    — a commutative monoid (both columns sum), so a streaming
    maintainer merges per-batch outputs by key and the on-demand
    purity report equals the batch pass on any arrival order
    (stream_centroid_purity). Same shape as ``centroid_state`` but at
    PURITY_V_SCALE (the exactness budget of the cross-multiplied
    comparator needs the coarser quantization)."""
    ex = emb.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim_idx"),
        F.expr(
            f"cast(floor(cast(val as double) * {PURITY_V_SCALE} + 0.5)"
            " as bigint)"
        ).alias("v_q"),
    )
    return ex.groupBy("label", "dim_idx").agg(
        F.expr("sum(cast(v_q as decimal(38,0)))").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )


def purity_centroids(state: DataFrame) -> DataFrame:
    """Quantized |labels|-row centroid arrays (+ squared norms) from
    the purity state — the signed-ratio floor device per (label, dim),
    assembled into broadcastable arrays. Shared by purity_report and
    s_centroid_assign."""
    from locopy_spark.queries.trends import _signed_ratio

    cq = _signed_ratio("s", "(n * 10)", 1, "div")
    cent = state.select(
        F.col("label").alias("clabel"),
        "dim_idx",
        F.expr(f"cast({cq} as bigint)").alias("c_q"),
    )
    return cent.groupBy("clabel").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim_idx, c_q))),"
            " p -> p.c_q)"
        ).alias("carr"),
        F.expr("sum(c_q * c_q)").alias("n2"),
    )


def _purity_dots(emb: DataFrame, cent_arr: DataFrame) -> DataFrame:
    """Exact (vec, centroid) bigint dot products: quantize the vector
    row-locally, broadcast the |labels| centroid arrays, fold."""
    vq = (
        f"transform(embedding, x -> cast(floor(cast(x as double)"
        f" * {PURITY_V_SCALE} + 0.5) as bigint))"
    )
    return (
        emb.select("vec_id", "label", F.expr(vq).alias("vqa"))
        .join(F.broadcast(cent_arr))
        .select(
            "vec_id",
            "label",
            "clabel",
            F.expr(
                "aggregate(zip_with(vqa, carr, (x, c) -> x * c),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("dot"),
            "n2",
        )
    )


def purity_report(emb: DataFrame, state: DataFrame) -> DataFrame:
    """Close the separability report over the purity-centroid state:
    quantize centroids via the signed-ratio floor device, broadcast
    the |labels| centroid arrays, score the corpus with exact bigint
    folds, cross-multiplied own-vs-other verdicts, bounded rollup."""
    dots = _purity_dots(emb, purity_centroids(state))
    own = dots.filter(F.col("label") == F.col("clabel")).select(
        "vec_id",
        F.col("dot").alias("dot_o"),
        F.col("n2").alias("n2_o"),
    )
    per_vec = (
        dots.filter(F.col("label") != F.col("clabel"))
        .select(
            "vec_id",
            "label",
            F.col("dot").alias("dot_b"),
            F.col("n2").alias("n2_b"),
        )
        .join(own, "vec_id")
        .groupBy("vec_id", "label")
        .agg(
            F.expr(
                f"bool_and({_purity_win('DECIMAL(38,0)')})"
            ).alias("win_all")
        )
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.expr("case when win_all then 1 else 0 end")).alias(
                "n_separated"
            ),
        )
        .selectExpr(
            "label",
            "n_vecs",
            "n_separated",
            "n_separated * 1000000 div n_vecs as sep_ppm",
        )
        .orderBy("label")
    )


def _purity_oracle() -> str:
    from locopy_spark.queries.trends import _signed_ratio

    cq = _signed_ratio("s", "(n * 10)", 1, "//")
    return f"""
  WITH ex AS MATERIALIZED (
    SELECT vec_id, label, i AS dim_idx,
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {PURITY_V_SCALE}
                      + 0.5) AS BIGINT) AS v_q
    FROM embeddings, (SELECT unnest(generate_series(1, {EMB_DIM})) AS i)
  ),
  craw AS (
    SELECT label AS clabel, dim_idx,
           SUM(CAST(v_q AS HUGEINT)) AS s, COUNT(*) AS n
    FROM ex GROUP BY 1, 2
  ),
  cent AS MATERIALIZED (
    SELECT clabel, dim_idx, CAST({cq} AS BIGINT) AS c_q FROM craw
  ),
  n2t AS (SELECT clabel, SUM(c_q * c_q) AS n2 FROM cent GROUP BY 1),
  dots AS MATERIALIZED (
    SELECT ex.vec_id, ex.label, cent.clabel,
           CAST(SUM(ex.v_q * cent.c_q) AS BIGINT) AS dot
    FROM ex JOIN cent USING (dim_idx) GROUP BY 1, 2, 3
  ),
  own AS (
    SELECT dots.vec_id, dot AS dot_o, n2 AS n2_o
    FROM dots JOIN n2t USING (clabel) WHERE label = clabel
  ),
  cmp AS (
    SELECT d.vec_id, d.label, d.dot AS dot_b, n2t.n2 AS n2_b,
           own.dot_o, own.n2_o
    FROM dots d JOIN n2t USING (clabel) JOIN own ON d.vec_id = own.vec_id
    WHERE d.label <> d.clabel
  ),
  per_vec AS (
    SELECT vec_id, label,
           BOOL_AND({_purity_win("HUGEINT")}) AS win_all
    FROM cmp GROUP BY 1, 2
  )
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         CAST(SUM(CASE WHEN win_all THEN 1 ELSE 0 END) AS BIGINT)
           AS n_separated,
         CAST(SUM(CASE WHEN win_all THEN 1 ELSE 0 END) * 1000000
              // COUNT(*) AS BIGINT) AS sep_ppm
  FROM per_vec GROUP BY 1 ORDER BY label
"""


ORACLE["s_centroid_purity"] = _purity_oracle()


# -- embedding-norm quality histogram -----------------------------------------

NORM_BAND_FIX = 100_000_000_000  # 0.1 in squared-norm units at 1e12 scale
NORM_BANDS = 30


def d_norm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm² histogram — the vector-quality screen run
    BEFORE any ANN build (zero-norm or runaway-norm vectors are
    encoder failures; a drifting norm distribution invalidates a
    dot-product index that assumed unit-ish norms).  30 bands of 0.1
    in squared-norm units, clamped at the top.

    Exactness: per element the SQUARE is fixed-pointed once —
    ``floor(v·v·1e12 + 0.5)`` (cast-to-double, multiply, scale by an
    exactly-representable power of ten, floor: every step is a
    correctly-rounded IEEE op, identical on both engines — the
    functions/vectors.py device); the per-vector sum over ≤ dim
    bounded bigints is exact and associative.  Everything is
    row-local until the ≤ 30-row histogram aggregate — vectors never
    shuffle, so the operator scales with the scan, not the data."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm2 = (
        "aggregate(transform(embedding,"
        " v -> cast(floor(cast(v as double) * cast(v as double)"
        " * 1000000000000 + 0.5) as bigint)),"
        " 0L, (a, x) -> a + x)"
    )
    return (
        emb.select(
            F.expr(
                f"CAST(LEAST({NORM_BANDS - 1},"
                f" ({norm2}) div {NORM_BAND_FIX}) AS BIGINT)"
            ).alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("band")
    )


ORACLE["d_norm_histogram"] = f"""
  WITH n AS (
    SELECT CAST(LEAST({NORM_BANDS - 1},
           CAST(list_sum(list_transform(embedding,
                v -> CAST(FLOOR(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                     * 1000000000000 + 0.5) AS BIGINT)))
                AS BIGINT) // {NORM_BAND_FIX}) AS BIGINT) AS band
    FROM embeddings
  )
  SELECT band, COUNT(*) AS n_vecs FROM n GROUP BY band ORDER BY band
"""


# -- ANN hubness diagnostic ----------------------------------------------------

HUB_SAMPLE_PREFIX = "08"  # md5 < '08' → deterministic ~1/32 query sample
# 1/32 keeps the estimator while bounding the scored surface: at the
# bench SF the 1/8 sample cost 8.7 s (|sample|·n·dim interpreted dot
# work is the whole bill — measured, see SURVEY §6); 1/32 prices the
# same diagnostic at ~1/4 of that. At 100 TB the sample would be
# capped by a tighter prefix, not scaled with n.
HUB_K = 5


def s_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence hubness histogram — the intrinsic-dimensionality
    diagnostic run before trusting ANY ANN index: over a deterministic
    query sample, count how often each vector appears in a query's
    exact top-k, then histogram those occurrence counts (occ = 0 rows
    are the antihubs — vectors no query ever retrieves).  A heavy hub
    tail means distance concentration: k-NN graphs and IVF lists
    degrade, and recall targets need re-calibration.

    Scale shape: hubness is ESTIMATED from a fixed-size sample
    (``md5(vec_id) < '{prefix}'`` — deterministic on both engines, no
    seed to disagree on), so the scored surface is |sample| × n with
    the sampled queries broadcast and the big side streaming
    shuffle-free — the knn_bruteforce regime, NOT all-pairs.  Scores
    are exact fixed-point dots; the per-query top-k window partitions
    on query_id; occ = 0 restoration is a LEFT JOIN from the id table
    (column-pruned scan), and the output is a ≤ |sample|·k-bounded
    histogram.

    Reference: the reference client has no vector ops at all
    (locopy/database.py) — this is warehouse-side ANN QA its users
    would otherwise hand-roll.
    """
    from pyspark.sql.window import Window as W

    from locopy_spark.functions.vectors import (
        cosine_from_fixed,
        fixed_dot_expr,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = similarity.with_fixed_norm(emb).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        F.col("norm_fix").alias("n_norm"),
    )
    q = (
        similarity.with_fixed_norm(emb)
        .filter(
            F.expr(f"md5(cast(vec_id as string)) < '{HUB_SAMPLE_PREFIX}'")
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("norm_fix").alias("q_norm"),
        )
    )
    # |sample|×n pair volume: score through the Arrow kernel (bit-
    # identical to fixed_dot_expr — int64 sums are order-independent)
    from locopy_spark.functions.vectors import fixed_dot_pandas

    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot_fix", fixed_dot_pandas()("q_emb", "n_emb"))
        .withColumn(
            "cosine",
            F.expr(cosine_from_fixed("dot_fix", "q_norm", "n_norm")),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    occ = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HUB_K)
        .groupBy("neighbor_id")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    per_vec = (
        emb.select(F.col("vec_id").alias("neighbor_id"))
        .join(occ, "neighbor_id", "left")
        .select(F.coalesce("occ", F.lit(0)).cast("long").alias("occ"))
    )
    return (
        per_vec.groupBy("occ")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("occ")
    )


def _oracle_hubness() -> str:
    from locopy_spark.functions.vectors import (
        cosine_from_fixed,
        sql_fixed_dot,
    )

    cos = cosine_from_fixed("dot_fix", "na", "nb")
    return f"""
  WITH e AS (
    SELECT vec_id, embedding,
           {sql_fixed_dot('embedding', 'embedding')} AS norm_fix
    FROM embeddings
  ),
  scored AS (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           {sql_fixed_dot('q.embedding', 'n.embedding')} AS dot_fix,
           q.norm_fix AS na, n.norm_fix AS nb
    FROM e q JOIN e n ON q.vec_id != n.vec_id
    WHERE md5(CAST(q.vec_id AS VARCHAR)) < '{HUB_SAMPLE_PREFIX}'
  ),
  ranked AS (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id
             ORDER BY {cos} DESC, neighbor_id ASC
           ) AS rk
    FROM scored
  ),
  occ AS (
    SELECT neighbor_id, COUNT(*) AS occ FROM ranked
    WHERE rk <= {HUB_K} GROUP BY neighbor_id
  ),
  per_vec AS (
    SELECT CAST(COALESCE(occ.occ, 0) AS BIGINT) AS occ
    FROM e LEFT JOIN occ ON e.vec_id = occ.neighbor_id
  )
  SELECT occ, COUNT(*) AS n_vectors FROM per_vec
  GROUP BY occ ORDER BY occ
"""


ORACLE["s_hubness"] = _oracle_hubness()


# -- retrieval-quality eval: MRR of the int8 shortlist ranking ---------------


def s_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank eval of the int8-quantized retrieval
    ranking against the EXACT nearest neighbor — the standard "how
    much recall does the cheap scan order cost" audit run before
    deploying a quantized index (s_knn_int8 asserts a recall floor;
    this measures the whole rank position, per query).

    For each fixed query vector: the exact top-1 cosine neighbor
    (fixed-point dots, the s_knn_bruteforce device) is looked up in
    the PURE quantized-cosine order (stage-1 of knn_int8, no exact
    rerank — that stage IS what is being evaluated), and its rank
    closes as 1 + count(candidates strictly better under the proxy,
    ties broken by id). Reciprocal rank is an exact ppm floor
    division. Scale shape: two broadcast-query scans of the persisted
    coded table (|Q|·|N| scored rows, the brute-force cost class —
    this is an EVAL over a sample of queries, not a serving path);
    the rank is a per-query count aggregate, never a global sort.
    """
    from locopy_spark.functions.vectors import cosine_from_fixed
    from locopy_spark.operators.similarity import _int_dot

    emb = managed_persist(
        similarity.with_int8_codes(
            similarity.with_fixed_norm(load_table(spark, sf_dir, "embeddings"))
        ),
        "mrr_eval",
    )
    truth = similarity.knn_bruteforce(emb, query_ids=KNN_QUERY_IDS, k=1).select(
        "query_id", F.col("neighbor_id").alias("true_nn")
    )
    qside = emb.filter(F.col("vec_id").isin(KNN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("codes").alias("q_codes"),
        F.col("code_norm").alias("q_cnorm"),
    )
    pc = cosine_from_fixed(_int_dot("n_codes", "q_codes"), "q_cnorm", "n_cnorm")
    scored = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("codes").alias("n_codes"),
            F.col("code_norm").alias("n_cnorm"),
        )
        .crossJoin(F.broadcast(qside))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.expr(pc).alias("pc"))
    )
    t_pc = scored.join(
        F.broadcast(truth),
        (scored.query_id == truth.query_id)
        & (scored.neighbor_id == truth.true_nn),
    ).select(truth.query_id, "true_nn", F.col("pc").alias("t_pc"))
    ranked = (
        scored.join(F.broadcast(t_pc), "query_id")
        .groupBy("query_id", "true_nn")
        .agg(
            F.expr(
                "cast(1 + sum(case when pc > t_pc or"
                " (pc = t_pc and neighbor_id < true_nn)"
                " then 1 else 0 end) as bigint)"
            ).alias("nn_rank")
        )
    )
    return ranked.select(
        "query_id",
        "true_nn",
        "nn_rank",
        F.expr("1000000 div nn_rank").alias("rr_ppm"),
        F.expr("cast(nn_rank <= 5 as int)").alias("hit_at_5"),
    ).orderBy("query_id")


def _sql_mrr_eval() -> str:
    from locopy_spark.functions.vectors import cosine_from_fixed, sql_fixed_dot

    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    intdot = (
        "CAST(list_sum(list_transform(generate_series(1, len(n.codes)), "
        "i -> CAST(n.codes[i] AS BIGINT) * q.codes[i])) AS BIGINT)"
    )
    selfdot = (
        "CAST(list_sum(list_transform(generate_series(1, len(codes)), "
        "i -> CAST(codes[i] AS BIGINT) * codes[i])) AS BIGINT)"
    )
    exact_cos = cosine_from_fixed(
        sql_fixed_dot("q.embedding", "n.embedding"), "q.norm_fix", "n.norm_fix"
    )
    pc = cosine_from_fixed(intdot, "q.code_norm", "n.code_norm")
    return f"""
  WITH e AS (
    SELECT vec_id, embedding,
           {sql_fixed_dot("embedding", "embedding")} AS norm_fix
    FROM embeddings
  ),
  c0 AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax
    FROM embeddings
  ),
  c1 AS (
    SELECT vec_id,
           CASE WHEN amax = 0 THEN list_transform(embedding, x -> 0) ELSE
             list_transform(embedding,
               x -> CAST(FLOOR(x::DOUBLE / amax * 127 + 0.5) AS INT))
           END AS codes
    FROM c0
  ),
  cn AS (SELECT vec_id, codes, {selfdot} AS code_norm FROM c1),
  exact AS (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           {exact_cos} AS cosine
    FROM e q JOIN e n ON q.vec_id != n.vec_id
    WHERE q.vec_id IN ({ids})
  ),
  truth AS (
    SELECT query_id, neighbor_id AS true_nn FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
             ) AS rk
      FROM exact
    ) WHERE rk = 1
  ),
  prox AS (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {pc} AS pc
    FROM cn q JOIN cn n ON q.vec_id != n.vec_id
    WHERE q.vec_id IN ({ids})
  ),
  tp AS (
    SELECT p.query_id, t.true_nn, p.pc AS t_pc
    FROM prox p JOIN truth t
      ON p.query_id = t.query_id AND p.neighbor_id = t.true_nn
  ),
  r AS (
    SELECT p.query_id, tp.true_nn,
           CAST(1 + SUM(CASE WHEN p.pc > tp.t_pc OR
                    (p.pc = tp.t_pc AND p.neighbor_id < tp.true_nn)
                  THEN 1 ELSE 0 END) AS BIGINT) AS nn_rank
    FROM prox p JOIN tp ON p.query_id = tp.query_id
    GROUP BY 1, 2
  )
  SELECT query_id, true_nn, nn_rank,
         CAST(1000000 // nn_rank AS BIGINT) AS rr_ppm,
         CAST(nn_rank <= 5 AS INT) AS hit_at_5
  FROM r ORDER BY query_id
"""


ORACLE["s_mrr_eval"] = _sql_mrr_eval()


# -- NDCG@K eval of the int8 proxy order ---------------------------------------

NDCG_K = 10


def _ndcg_disc_ppb() -> list[int]:
    """Integer ppb discount constants 1e9/log2(p+1), p = 1..K —
    computed ONCE in Python and inlined as literals in both engines'
    expressions, so no engine ever evaluates a logarithm (cross-engine
    libm log2 is not guaranteed bit-identical; integer constants
    are)."""
    import math

    return [round(1e9 / math.log2(p + 1)) for p in range(1, NDCG_K + 1)]


def _ndcg_disc_case(rank_col: str) -> str:
    disc = _ndcg_disc_ppb()
    whens = " ".join(
        f"WHEN {rank_col} = {p} THEN {d}"
        for p, d in enumerate(disc, start=1)
    )
    return f"(CASE {whens} ELSE 0 END)"


def _ndcg_idcg_ppb() -> int:
    disc = _ndcg_disc_ppb()
    return sum((NDCG_K + 1 - r) * disc[r - 1] for r in range(1, NDCG_K + 1))


def s_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{K} of the int8-quantized retrieval order against the
    exact cosine ranking — the graded companion to s_mrr_eval (MRR
    scores only the single true top-1; NDCG scores how well the proxy
    preserves the whole exact top-{K}, with linear gains K+1−r and
    log2 position discounts).

    Exactness: gains are exact integers off the exact-rank (the
    s_knn_bruteforce fixed-point device); discounts are PRECOMPUTED
    integer ppb constants inlined identically in both engines (no
    runtime logarithm anywhere); each truth item's proxy rank closes
    as 1 + count(strictly better under the proxy, id tie-break) — the
    s_mrr_eval device per item; DCG is a pure bigint sum and NDCG one
    exact ppm floor division against the constant IDCG. Scale shape:
    the same two broadcast-query scans as s_mrr_eval over the shared
    persisted coded table (an EVAL over |Q| sample queries, not a
    serving path); per-item ranks are count aggregates, never global
    sorts.
    """
    from locopy_spark.functions.vectors import cosine_from_fixed
    from locopy_spark.operators.similarity import _int_dot

    emb = managed_persist(
        similarity.with_int8_codes(
            similarity.with_fixed_norm(load_table(spark, sf_dir, "embeddings"))
        ),
        "mrr_eval",
    )
    truth = similarity.knn_bruteforce(
        emb, query_ids=KNN_QUERY_IDS, k=NDCG_K
    ).select(
        "query_id",
        F.col("neighbor_id").alias("true_nn"),
        F.expr(f"cast({NDCG_K} + 1 - rk as bigint)").alias("rel"),
    )
    qside = emb.filter(F.col("vec_id").isin(KNN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("codes").alias("q_codes"),
        F.col("code_norm").alias("q_cnorm"),
    )
    pc = cosine_from_fixed(_int_dot("n_codes", "q_codes"), "q_cnorm", "n_cnorm")
    scored = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("codes").alias("n_codes"),
            F.col("code_norm").alias("n_cnorm"),
        )
        .crossJoin(F.broadcast(qside))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.expr(pc).alias("pc"))
    )
    t_pc = scored.join(
        F.broadcast(truth),
        (scored.query_id == truth.query_id)
        & (scored.neighbor_id == truth.true_nn),
    ).select(truth.query_id, "true_nn", "rel", F.col("pc").alias("t_pc"))
    ranked = (
        scored.join(F.broadcast(t_pc), "query_id")
        .groupBy("query_id", "true_nn", "rel")
        .agg(
            F.expr(
                "cast(1 + sum(case when pc > t_pc or"
                " (pc = t_pc and neighbor_id < true_nn)"
                " then 1 else 0 end) as bigint)"
            ).alias("proxy_rank")
        )
    )
    disc_case = _ndcg_disc_case("proxy_rank")
    return (
        ranked.groupBy("query_id")
        .agg(
            F.expr(
                f"cast(sum(case when proxy_rank <= {NDCG_K} then 1"
                " else 0 end) as bigint)"
            ).alias("n_in_topk"),
            F.expr(f"sum(rel * {disc_case})").alias("dcg_ppb"),
        )
        .selectExpr(
            "query_id",
            "n_in_topk",
            "dcg_ppb",
            f"dcg_ppb * 1000000 div {_ndcg_idcg_ppb()} AS ndcg_ppm",
        )
        .orderBy("query_id")
    )


def _sql_ndcg_eval() -> str:
    from locopy_spark.functions.vectors import cosine_from_fixed, sql_fixed_dot

    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    intdot = (
        "CAST(list_sum(list_transform(generate_series(1, len(n.codes)), "
        "i -> CAST(n.codes[i] AS BIGINT) * q.codes[i])) AS BIGINT)"
    )
    selfdot = (
        "CAST(list_sum(list_transform(generate_series(1, len(codes)), "
        "i -> CAST(codes[i] AS BIGINT) * codes[i])) AS BIGINT)"
    )
    exact_cos = cosine_from_fixed(
        sql_fixed_dot("q.embedding", "n.embedding"), "q.norm_fix", "n.norm_fix"
    )
    pc = cosine_from_fixed(intdot, "q.code_norm", "n.code_norm")
    disc_case = _ndcg_disc_case("proxy_rank")
    return f"""
  WITH e AS (
    SELECT vec_id, embedding,
           {sql_fixed_dot("embedding", "embedding")} AS norm_fix
    FROM embeddings
  ),
  c0 AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax
    FROM embeddings
  ),
  c1 AS (
    SELECT vec_id,
           CASE WHEN amax = 0 THEN list_transform(embedding, x -> 0) ELSE
             list_transform(embedding,
               x -> CAST(FLOOR(x::DOUBLE / amax * 127 + 0.5) AS INT))
           END AS codes
    FROM c0
  ),
  cn AS (SELECT vec_id, codes, {selfdot} AS code_norm FROM c1),
  exact AS (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           {exact_cos} AS cosine
    FROM e q JOIN e n ON q.vec_id != n.vec_id
    WHERE q.vec_id IN ({ids})
  ),
  truth AS (
    SELECT query_id, neighbor_id AS true_nn,
           CAST({NDCG_K} + 1 - rk AS BIGINT) AS rel
    FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
             ) AS rk
      FROM exact
    ) WHERE rk <= {NDCG_K}
  ),
  prox AS (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {pc} AS pc
    FROM cn q JOIN cn n ON q.vec_id != n.vec_id
    WHERE q.vec_id IN ({ids})
  ),
  tp AS (
    SELECT p.query_id, t.true_nn, t.rel, p.pc AS t_pc
    FROM prox p JOIN truth t
      ON p.query_id = t.query_id AND p.neighbor_id = t.true_nn
  ),
  r AS (
    SELECT p.query_id, tp.true_nn, tp.rel,
           CAST(1 + SUM(CASE WHEN p.pc > tp.t_pc OR
                    (p.pc = tp.t_pc AND p.neighbor_id < tp.true_nn)
                  THEN 1 ELSE 0 END) AS BIGINT) AS proxy_rank
    FROM prox p JOIN tp ON p.query_id = tp.query_id
    GROUP BY 1, 2, 3
  )
  SELECT query_id,
         CAST(SUM(CASE WHEN proxy_rank <= {NDCG_K} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_in_topk,
         CAST(SUM(rel * {disc_case}) AS BIGINT) AS dcg_ppb,
         CAST(SUM(rel * {disc_case}) * 1000000 // {_ndcg_idcg_ppb()}
              AS BIGINT) AS ndcg_ppm
  FROM r GROUP BY 1 ORDER BY query_id
"""


ORACLE["s_ndcg_eval"] = _sql_ndcg_eval()


# -- nearest-centroid assignment confusion matrix -----------------------------


def _assign_cells(emb: DataFrame) -> DataFrame:
    """≤|labels|² nearest-centroid confusion cells ``(label, assigned,
    n_vecs)`` — the shared core of s_centroid_assign (row shares) and
    s_kappa (chance-corrected agreement)."""
    dots = _purity_dots(emb, purity_centroids(purity_state(emb)))
    scored = dots.select(
        "vec_id",
        "label",
        "clabel",
        F.expr(
            # a zero-norm centroid (all members zero vectors, possible
            # mid-stream) scores NULL, not an ANSI divide crash
            "CASE WHEN n2 = 0 THEN CAST(NULL AS DOUBLE) ELSE"
            " CAST(dot AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)) END"
        ).alias("score"),
    )
    assigned = scored.groupBy("vec_id", "label").agg(
        F.expr(
            "max_by(clabel, struct(score, -clabel))"
        ).alias("assigned")
    )
    return assigned.groupBy("label", "assigned").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )


def s_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment confusion matrix — WHERE do the
    non-separated vectors go? s_centroid_purity answers "how many
    vectors win against every foreign centroid"; this assigns each
    vector to its single best centroid and cross-tabulates true label
    × assigned label with exact row shares (the confusion matrix an
    embedding-quality review reads next to the purity scalar).

    Exactness: the scoring reuses the purity scaffolding (quantized
    vectors × broadcast quantized centroids, exact bigint dots); the
    argmax key dot/sqrt(n2) is a double, but both operands are exact
    integers below 2^53 (dot ≤ 6.4e12, n2 ≤ 6.4e11), so the division
    and sqrt are correctly rounded and the comparator is engine-
    identical (the s_knn_bruteforce ranking device); ties break by
    smallest centroid label. Scale shape: one broadcast nested loop
    (|vecs| × |labels| rows), one per-vector argmax via max_by on the
    (score, clabel) total order — NO window, no global sort — then
    the ≤|labels|² rollup with ppm shares.
    """
    cells = _assign_cells(load_table(spark, sf_dir, "embeddings"))
    row_tot = cells.groupBy("label").agg(F.sum("n_vecs").alias("n_label"))
    return (
        cells.join(F.broadcast(row_tot), "label")
        .selectExpr(
            "label",
            "assigned",
            "n_vecs",
            "n_vecs * 1000000 div n_label as share_ppm",
        )
        .orderBy("label", "assigned")
    )


def _sql_assign_cells() -> str:
    """Shared WITH…cells prefix of the assignment-family oracles
    (confusion shares AND kappa close over the same cells)."""
    from locopy_spark.queries.trends import _signed_ratio

    cq = _signed_ratio("s", "(n * 10)", 1, "//")
    return f"""
  WITH ex AS MATERIALIZED (
    SELECT vec_id, label, i AS dim_idx,
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {PURITY_V_SCALE}
                      + 0.5) AS BIGINT) AS v_q
    FROM embeddings, (SELECT unnest(generate_series(1, {EMB_DIM})) AS i)
  ),
  craw AS (
    SELECT label AS clabel, dim_idx,
           SUM(CAST(v_q AS HUGEINT)) AS s, COUNT(*) AS n
    FROM ex GROUP BY 1, 2
  ),
  cent AS MATERIALIZED (
    SELECT clabel, dim_idx, CAST({cq} AS BIGINT) AS c_q FROM craw
  ),
  n2t AS (SELECT clabel, SUM(c_q * c_q) AS n2 FROM cent GROUP BY 1),
  dots AS (
    SELECT ex.vec_id, ex.label, cent.clabel,
           CAST(SUM(ex.v_q * cent.c_q) AS BIGINT) AS dot
    FROM ex JOIN cent USING (dim_idx) GROUP BY 1, 2, 3
  ),
  scored AS (
    SELECT d.vec_id, d.label, d.clabel,
           CASE WHEN n2 = 0 THEN CAST(NULL AS DOUBLE) ELSE
             CAST(dot AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)) END AS score
    FROM dots d JOIN n2t USING (clabel)
  ),
  assigned AS (
    SELECT vec_id, label, clabel AS assigned FROM (
      SELECT vec_id, label, clabel,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY score DESC, clabel ASC
             ) AS rk
      FROM scored
    ) WHERE rk = 1
  ),
  cells AS (
    SELECT label, assigned, CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM assigned GROUP BY 1, 2
  )"""


ORACLE["s_centroid_assign"] = (
    _sql_assign_cells()
    + """
  SELECT label, assigned, n_vecs,
         CAST(n_vecs * 1000000 //
              SUM(n_vecs) OVER (PARTITION BY label) AS BIGINT) AS share_ppm
  FROM cells ORDER BY label, assigned
"""
)


def s_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ of the nearest-centroid assignment against the true
    labels — the chance-corrected agreement scalar read next to
    s_centroid_assign's confusion matrix (raw accuracy flatters an
    imbalanced label mix; κ subtracts the agreement the margins alone
    would produce).

    SECOND finisher on the shared ``_assign_cells`` confusion state:
    one cube pass over the ≤|labels|² cells yields the total, the
    diagonal, and both margin vectors simultaneously (the
    q_goodman_lambda device); pe's Σ row_k·col_k widens through
    DECIMAL(38)/HUGEINT; po/pe close as exact ppm floor divisions and
    κ — which goes NEGATIVE for worse-than-chance assignments — routes
    through the signed-ratio device (Spark div truncates, DuckDB //
    floors; ABS keeps both in the agreeing regime).
    """
    from locopy_spark.queries.trends import _signed_ratio

    cells = _assign_cells(load_table(spark, sf_dir, "embeddings"))
    cube = cells.cube("label", "assigned").agg(
        F.sum("n_vecs").alias("s"),
        F.grouping("label").alias("gl"),
        F.grouping("assigned").alias("ga"),
        F.sum(
            F.expr("case when label = assigned then n_vecs end")
        ).alias("ds"),
    )
    scal = cube.filter("gl = 1 AND ga = 1").select(
        F.col("s").alias("n"), F.expr("coalesce(ds, 0)").alias("diag")
    )
    rows = cube.filter("gl = 0 AND ga = 1").select(
        F.col("label").alias("k"), F.col("s").alias("r")
    )
    cols = cube.filter("gl = 1 AND ga = 0").select(
        F.col("assigned").alias("k"), F.col("s").alias("c")
    )
    # broadcast hint (r12, §3.1): both margin vectors are <=|labels|
    # rows; the cube-derived estimates kept this join sort-merge
    sp = rows.join(F.broadcast(cols), "k").agg(
        F.expr(
            "coalesce(SUM(CAST(r AS DECIMAL(38,0)) * c),"
            " CAST(0 AS DECIMAL(38,0)))"
        ).alias("sp")
    )
    kappa = _signed_ratio(
        "(CAST(n AS DECIMAL(38,0)) * diag - sp)",
        "(CAST(n AS DECIMAL(38,0)) * n - sp)",
        1_000_000,
        "div",
    )
    return scal.crossJoin(F.broadcast(sp)).selectExpr(
        "n",
        "diag",
        "diag * 1000000 div n AS po_ppm",
        "CAST(sp * 1000000 div (CAST(n AS DECIMAL(38,0)) * n)"
        " AS BIGINT) AS pe_ppm",
        f"CAST({kappa} AS BIGINT) AS kappa_ppm",
    )


def _kappa_oracle() -> str:
    from locopy_spark.queries.trends import _signed_ratio

    kappa = _signed_ratio(
        "(CAST(n AS HUGEINT) * diag - sp)",
        "(CAST(n AS HUGEINT) * n - sp)",
        1_000_000,
        "//",
    )
    return (
        _sql_assign_cells()
        + f""",
  m AS (
    SELECT CAST(SUM(n_vecs) AS BIGINT) AS n,
           CAST(COALESCE(SUM(CASE WHEN label = assigned THEN n_vecs END),
                         0) AS BIGINT) AS diag
    FROM cells
  ),
  rr AS (SELECT label AS k, SUM(n_vecs) AS r FROM cells GROUP BY 1),
  cc AS (SELECT assigned AS k, SUM(n_vecs) AS c FROM cells GROUP BY 1),
  spt AS (
    SELECT COALESCE(SUM(CAST(r AS HUGEINT) * c), 0) AS sp
    FROM rr JOIN cc USING (k)
  )
  SELECT n, diag,
         CAST(diag * 1000000 // n AS BIGINT) AS po_ppm,
         CAST(sp * 1000000 // (CAST(n AS HUGEINT) * n) AS BIGINT)
           AS pe_ppm,
         CAST({kappa} AS BIGINT) AS kappa_ppm
  FROM m, spt
"""
    )


ORACLE["s_kappa"] = _kappa_oracle()


# -- simplified silhouette (squared distances, exact) --------------------------


def s_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per label on SQUARED euclidean distances
    — the cluster-quality read that complements s_centroid_purity
    (purity counts win/lose verdicts; silhouette measures HOW
    separated, in [-1e6, 1e6] ppm): per vector a² = dist² to the own-
    label centroid, b² = min dist² to any other centroid, sil =
    (b² − a²)/max(a², b²). The squared-distance variant keeps every
    operand an exact integer (no sqrt anywhere), so the oracle
    reproduces each per-vector score bit-for-bit.

    Shares ``purity_state`` with s_centroid_purity/stream_centroid_
    purity; centroids quantize here at the FULL vector scale (s div n
    — silhouette differences need the extra digit the purity
    comparator trades away). dist² = Σ(v−c)² ≤ 64·(2e6)² ≈ 2.6e14
    (bigint-exact); the ppm closes through DECIMAL(38)/HUGEINT.
    Scale shape: broadcast |labels| centroid arrays → row-local dist²
    fold → per-vector min/argmin via conditional aggregates — no
    window, no shuffle beyond the state build and the ≤|labels| rollup.
    """
    from locopy_spark.queries.trends import _signed_ratio

    emb = load_table(spark, sf_dir, "embeddings")
    state = purity_state(emb)
    cq = _signed_ratio("s", "n", 1, "div")
    cent = state.select(
        F.col("label").alias("clabel"),
        "dim_idx",
        F.expr(f"cast({cq} as bigint)").alias("c_q"),
    )
    cent_arr = cent.groupBy("clabel").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim_idx, c_q))),"
            " p -> p.c_q)"
        ).alias("carr")
    )
    vq = (
        f"transform(embedding, x -> cast(floor(cast(x as double)"
        f" * {PURITY_V_SCALE} + 0.5) as bigint))"
    )
    d2 = (
        "aggregate(zip_with(vqa, carr, (x, c) -> (x - c) * (x - c)),"
        " 0L, (acc, v) -> acc + v)"
    )
    dists = (
        emb.select("vec_id", "label", F.expr(vq).alias("vqa"))
        .join(F.broadcast(cent_arr))
        .select("vec_id", "label", "clabel", F.expr(d2).alias("d2"))
    )
    per_vec = dists.groupBy("vec_id", "label").agg(
        F.expr("min(case when clabel = label then d2 end)").alias("a2"),
        F.expr("min(case when clabel != label then d2 end)").alias("b2"),
    )
    # both ratios can be NEGATIVE (a poorly separated label), so they
    # route through the _signed_ratio round-toward-zero device — raw
    # div/// diverge on negative operands (Spark truncates, DuckDB
    # floors)
    ppm = _signed_ratio(
        "cast(b2 - a2 as decimal(38,0))",
        "greatest(greatest(a2, b2), 1)",
        1_000_000,
        "div",
    )
    mean = _signed_ratio(
        "sum(cast(sil_ppm as decimal(38,0)))", "count(1)", 1, "div"
    )
    sil = per_vec.select(
        "label", F.expr(f"cast({ppm} as bigint)").alias("sil_ppm")
    )
    return (
        sil.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.expr(f"cast({mean} as bigint)").alias("mean_sil_ppm"),
        )
        .orderBy("label")
    )


def _silhouette_oracle() -> str:
    from locopy_spark.queries.trends import _signed_ratio

    cq = _signed_ratio("s", "n", 1, "//")
    ppm = _signed_ratio(
        "CAST(b2 - a2 AS HUGEINT)",
        "GREATEST(GREATEST(a2, b2), 1)",
        1_000_000,
        "//",
    )
    mean = _signed_ratio(
        "SUM(CAST(sil_ppm AS HUGEINT))", "COUNT(*)", 1, "//"
    )
    return f"""
  WITH ex AS MATERIALIZED (
    SELECT vec_id, label, i AS dim_idx,
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {PURITY_V_SCALE}
                      + 0.5) AS BIGINT) AS v_q
    FROM embeddings, (SELECT unnest(generate_series(1, {EMB_DIM})) AS i)
  ),
  craw AS (
    SELECT label AS clabel, dim_idx,
           SUM(CAST(v_q AS HUGEINT)) AS s, COUNT(*) AS n
    FROM ex GROUP BY 1, 2
  ),
  cent AS MATERIALIZED (
    SELECT clabel, dim_idx, CAST({cq} AS BIGINT) AS c_q FROM craw
  ),
  dists AS (
    SELECT ex.vec_id, ex.label, cent.clabel,
           CAST(SUM((ex.v_q - cent.c_q) * (ex.v_q - cent.c_q))
                AS BIGINT) AS d2
    FROM ex JOIN cent USING (dim_idx) GROUP BY 1, 2, 3
  ),
  per_vec AS (
    SELECT vec_id, label,
           MIN(CASE WHEN clabel = label THEN d2 END) AS a2,
           MIN(CASE WHEN clabel != label THEN d2 END) AS b2
    FROM dists GROUP BY 1, 2
  ),
  sil AS (
    SELECT label,
           CAST({ppm} AS BIGINT) AS sil_ppm
    FROM per_vec
  )
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         CAST({mean} AS BIGINT) AS mean_sil_ppm
  FROM sil GROUP BY 1 ORDER BY label
"""


ORACLE["s_silhouette"] = _silhouette_oracle()


# -- multimodal payload dedup ---------------------------------------------------


def m_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest-level dedup of multimodal payloads — the first pass every
    image/audio corpus runs (byte-identical assets re-crawled under
    different ids), through the REAL multimodal plumbing: binary
    payload column + typed metadata struct (operators/multimodal.py
    ``attach_payload``), grouped by the payload md5 that lands with
    the metadata. Emits each duplicate group with its keeper (min
    doc_id) and reclaimable bytes. d_exact_dedup is the text twin;
    this one exercises the binary path a 100 TB media lake dedupes by
    (the digest is computed ONCE at landing and travels in metadata —
    no second pass over payload bytes).

    Scale shape: payloads never shuffle — only (doc_id, digest,
    byte_len) rows move; one partial-aggregated groupBy on the digest.
    """
    from locopy_spark.operators.multimodal import attach_payload

    docs = load_table(spark, sf_dir, "documents")
    p = attach_payload(docs).select(
        "doc_id",
        F.expr("media_meta.payload_md5").alias("digest"),
        F.expr("cast(media_meta.byte_len as bigint)").alias("byte_len"),
    )
    return (
        p.groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper"),
            F.max("byte_len").alias("byte_len"),
        )
        .filter("n_copies > 1")
        .selectExpr(
            "digest",
            "n_copies",
            "keeper",
            "(n_copies - 1) * byte_len AS dup_bytes",
        )
        .orderBy("keeper")
    )


ORACLE["m_payload_dedup"] = """
  WITH p AS (
    SELECT doc_id, md5(text) AS digest,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
    FROM documents
  )
  SELECT digest,
         CAST(COUNT(*) AS BIGINT) AS n_copies,
         MIN(doc_id) AS keeper,
         CAST((COUNT(*) - 1) * MAX(byte_len) AS BIGINT) AS dup_bytes
  FROM p GROUP BY digest HAVING COUNT(*) > 1
  ORDER BY keeper
"""


# -- perceptual-hash near-duplicate detection (multimodal) ---------------------------

PHASH_CELLS = 64          # 8×8 thumbnail cells → one bit each
PHASH_BANDS = 4           # 4 × 16-bit bands for the LSH candidate join
PHASH_MAX_HD = 10         # near-dup verification threshold (of 64 bits)
# Mega-bucket exclusion (the q_jaccard_links hub-cap device): a band
# value shared by more documents than this carries no discriminative
# signal — pairs meeting ONLY in such a bucket are not near-dup
# evidence, and the bucket's quadratic candidate blow-up is the one
# scale hazard of any LSH family.  Measured at sf0.1: uncapped, the
# low-entropy synthetic corpus put thousands of docs in a handful of
# buckets (230 s); capped, the same query runs in ~2 s with the same
# semantics everywhere a bucket is informative.
PHASH_BUCKET_CAP = 50


def m_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over binary payloads —
    the image-dedup pipeline shape (thumbnail → aHash bits → banded
    LSH join → Hamming verify), with the decode stage the usual
    deterministic stand-in (no codec libs in this container: the
    "thumbnail" samples {PHASH_CELLS} evenly-spaced ``text``
    characters — both engines sample the same column identically; a
    real deployment replaces ONLY that projection with pixel
    averaging over a decoded payload).

    Scale shape: the hash is row-local whole-stage codegen (sampled
    bytes → mean-threshold bits → {PHASH_BANDS}×16-bit band ints — no
    Python, no shuffle); candidate pairs come ONLY through equal
    (band_idx, band_val) buckets (the d_minhash_lsh/SimHash banding
    device — never all-pairs), and verification is a row-local
    bit_count(xor) sum over the band arrays both sides carry into the
    join.  Exactness: the mean threshold is the integer cross-multiply
    cell·{PHASH_CELLS} > Σcells (no division), so bits, bands and
    Hamming distances are bit-identical cross-engine; empty payloads
    have no thumbnail and are filtered, not crashed.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's multimodal family
    (m_payload_dedup finds EXACT payload copies; this finds
    perceptually NEAR ones).
    """
    from locopy_spark.functions.cache import managed_persist

    docs = load_table(spark, sf_dir, "documents")
    # persist the hash table before the pair fan-out: every join side
    # and the bucket census reads the ONE materialized projection
    bands = managed_persist(phash_bands(docs), "phash")
    return phash_pairs(bands)


def phash_bands(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Row-local aHash band projection: (doc_id, bands array<int>) —
    an idempotent per-key map (``stream_phash`` maintains it live).

    Arrow-batched since r11: the staged-selectExpr SQL form (kept
    below as ``_phash_bands_sql`` — the formulation notes about
    CollapseProject inlining live there) still re-evaluated the
    64-cell construction several times per row after projection
    collapse, and measured ~4 s of the query's ~5 s at sf0.1.  This
    twin computes the identical integers per CHARACTER position —
    ``ord(text[(i·(L−1)) div (n−1)])``, the integer cross-multiply
    mean threshold, the bit fold — in one Python pass (integer
    arithmetic only, so bit-identity with the SQL form and the DuckDB
    oracle is exact; asserted by the oracle gate and the stream==batch
    lockstep tests, which route both sides through this function)."""
    import pandas as pd

    n, nb = PHASH_CELLS, PHASH_BANDS
    per_band = n // nb

    def gen(pdfs):
        for pdf in pdfs:
            ids, bands = [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                L = len(text)
                cells = [
                    ord(text[(i * (L - 1)) // (n - 1)]) for i in range(n)
                ]
                csum = sum(cells)
                vals = []
                for b in range(nb):
                    acc = 0
                    for c in cells[b * per_band : (b + 1) * per_band]:
                        acc = acc * 2 + (1 if c * n > csum else 0)
                    vals.append(acc)
                ids.append(did)
                bands.append(vals)
            yield pd.DataFrame({id_col: ids, "bands": bands})

    return (
        media.filter("length(text) > 0")
        .select(id_col, "text")
        .mapInPandas(gen, f"{id_col} long, bands array<int>")
    )


def _phash_bands_sql(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pure-SQL twin of :func:`phash_bands` (pre-r11 production form,
    kept as the cross-implementation reference the tests compare
    against).

    Expression-blowup note (the SURVEY §7 3^depth lesson, measured
    here the hard way): referencing the 64-substring ``cells`` array
    through 64 separate element_at sites let CollapseProject inline
    the whole construction per site (~4096 substrings/row, 120 s at
    sf0.1).  The bits array + ``slice`` formulation references each
    intermediate ONCE per stage, collapsing to a handful of inlined
    copies — same output, ~linear cost."""
    n, nb = PHASH_CELLS, PHASH_BANDS
    per_band = n // nb
    cell = (
        f"ascii(substring(text, 1 + cast(i * (length(text) - 1) AS INT)"
        f" div {n - 1}, 1))"
    )
    band_val = (
        f"aggregate(slice(bits, b * {per_band} + 1, {per_band}), 0,"
        " (acc, x) -> acc * 2 + x)"
    )
    return (
        media.filter("length(text) > 0")
        .selectExpr(
            id_col, f"transform(sequence(0, {n - 1}), i -> {cell}) AS cells"
        )
        .selectExpr(
            id_col,
            "cells",
            "aggregate(cells, 0, (acc, x) -> acc + x) AS csum",
        )
        .selectExpr(
            id_col,
            f"transform(cells, c -> case when c * {n} > csum"
            " then 1 else 0 end) AS bits",
        )
        .selectExpr(
            id_col,
            f"transform(sequence(0, {nb - 1}), b -> {band_val}) AS bands",
        )
    )


def phash_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Banded candidate join + Hamming verification over any (doc_id,
    bands) hash table.  Buckets above PHASH_BUCKET_CAP are excluded
    from candidate generation (see the constant's comment)."""
    from locopy_spark.functions.cache import managed_persist

    nb = PHASH_BANDS
    exploded = managed_persist(
        bands.selectExpr(
            id_col, "bands", "posexplode(bands) AS (band_idx, band_val)"
        ),
        "phash",
    )
    keep = exploded.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("bucket_n")
    ).filter(f"bucket_n <= {PHASH_BUCKET_CAP}")
    pruned = exploded.join(keep, ["band_idx", "band_val"])
    a = pruned.selectExpr(
        f"{id_col} AS doc_a", "bands AS bands_a", "band_idx", "band_val"
    )
    b = pruned.selectExpr(
        f"{id_col} AS doc_b", "bands AS bands_b", "band_idx", "band_val"
    )
    hamming = " + ".join(
        f"bit_count(cast(element_at(bands_a, {i + 1}) as bigint)"
        f" ^ element_at(bands_b, {i + 1}))"
        for i in range(nb)
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter("doc_a < doc_b")
        .select("doc_a", "doc_b", "bands_a", "bands_b")
        .distinct()
        .selectExpr("doc_a", "doc_b", f"cast({hamming} as int) AS hamming")
        .filter(f"hamming <= {PHASH_MAX_HD}")
        .orderBy("doc_a", "doc_b")
    )


def _sql_phash_final() -> str:
    n, nb = PHASH_CELLS, PHASH_BANDS
    per_band = n // nb
    cell = (
        f"ord(substr(text, 1 + (i * (length(text) - 1)) // {n - 1}, 1))"
    )
    band_val = (
        f"list_reduce(list_prepend(0,"
        f" bits[b * {per_band} + 1 : b * {per_band} + {per_band}]),"
        " (acc, x) -> acc * 2 + x)"
    )
    hamming = " + ".join(
        f"bit_count(xor(CAST(bands_a[{i + 1}] AS BIGINT),"
        f" CAST(bands_b[{i + 1}] AS BIGINT)))"
        for i in range(nb)
    )
    return f"""
  WITH t AS (
    SELECT doc_id,
           list_transform(range({n}), i -> {cell}) AS cells
    FROM documents WHERE length(text) > 0
  ),
  s AS (SELECT doc_id, cells, list_sum(cells) AS csum FROM t),
  bt AS (
    SELECT doc_id,
           list_transform(cells, c -> CASE WHEN c * {n} > csum
             THEN 1 ELSE 0 END) AS bits
    FROM s
  ),
  h AS (
    SELECT doc_id,
           list_transform(range({nb}), b -> {band_val}) AS bands
    FROM bt
  ),
  e AS (
    SELECT doc_id, bands, UNNEST(range({nb})) AS band_idx FROM h
  ),
  e2 AS (
    SELECT doc_id, bands, band_idx, bands[band_idx + 1] AS band_val
    FROM e
  ),
  keep AS (
    SELECT band_idx, band_val FROM e2
    GROUP BY 1, 2 HAVING COUNT(*) <= {PHASH_BUCKET_CAP}
  ),
  e3 AS (
    SELECT e2.* FROM e2 JOIN keep USING (band_idx, band_val)
  ),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.bands AS bands_a, b.bands AS bands_b
    FROM e3 a JOIN e3 b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
  )
  SELECT doc_a, doc_b, CAST({hamming} AS INT) AS hamming
  FROM cand
  WHERE {hamming} <= {PHASH_MAX_HD}
  ORDER BY doc_a, doc_b
"""


ORACLE["m_phash_near_dup"] = _sql_phash_final()


# --------------------------------------------------------------------------
# d_dedup_eval: planted-truth precision/recall for the dedup pipeline
# --------------------------------------------------------------------------

# Planted mutants get ids offset far above any real doc_id so the
# keep-min representative convention always prefers the source side.
DEDUP_EVAL_OFFSET = 1_000_000_000

# Mutation band per doc via md5(doc_id) first hex digit: drop every
# k-th token (1-indexed positions divisible by k).  With 3-token
# shingles a dropped token destroys ~3 shingles, so the bands sit at
# decreasing true Jaccard: k=24 ≈ 0.7-1.0 (short docs mutate to exact
# dups), k=12 ≈ 0.7, k=6 ≈ 0.45 (straddles MINHASH_EST_T=0.5), k=3
# destroys every shingle window (J ≈ 0 — the designed-miss band that
# anchors the curve's floor).
_DEDUP_EVAL_DIGIT = "substring(md5(cast(doc_id as string)), 1, 1)"
_DEDUP_EVAL_KDROP = (
    f"CASE WHEN {_DEDUP_EVAL_DIGIT} IN ('0','1','2','3') THEN 24 "
    f"WHEN {_DEDUP_EVAL_DIGIT} IN ('4','5','6','7') THEN 12 "
    f"WHEN {_DEDUP_EVAL_DIGIT} IN ('8','9','a','b') THEN 6 "
    "ELSE 3 END"
)


def d_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded end-to-end eval of the near-dedup pipeline against
    PLANTED ground truth — the score a 100-TB dedup run is judged by
    (VERDICT r10 task 4; the yield-side complement of
    d_lsh_calibration's estimator curve).

    Plant one deterministic mutant per document (md5-banded
    drop-every-k-th-token mutations at four known-Jaccard levels, ids
    offset by DEDUP_EVAL_OFFSET), push source+mutant through the REAL
    pipeline — minhash_lsh_pairs → connected_components → keep-min —
    and report per band, in exact integer ppm:

    - ``recall_ppm``    = detected / planted (mutant shares its
      source's cluster),
    - ``precision_ppm`` = detected / claimed (mutant landed in ANY
      cluster; a mutant clustered away from its source is the false
      pairing a dedup run pays for),
    - ``f1_ppm``        = 2·detected / (claimed + planted) — the
      harmonic mean computed directly from counts, no float P/R
      intermediates,
    - ``leaked_ppm``    = mutants SURVIVING keep-best (unclustered, or
      their cluster's own min-id) / planted — the duplicate mass that
      would reach training.

    Scale shape: planting is a stateless map (zero shuffle — the
    corpus doubles but only through the already-priced minhash
    pipeline); scoring is two |clustered-docs|-sized broadcast joins
    plus a 4-row aggregate.  All arithmetic is bigint (counts and
    ``div``-floored ppm), so DuckDB reproduces every byte.  Organic
    base-corpus pairs never pollute the score: only mutant rows are
    graded, and a mutant organically matching a non-source doc counts
    against precision by design (the pipeline DID claim a pairing the
    truth set denies).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_expr("text")
    mut_text = (
        f"array_join(filter({toks}, "
        f"(t, i) -> (i + 1) % ({_DEDUP_EVAL_KDROP}) != 0), ' ')"
    )
    mutants = docs.select(
        (F.col("doc_id") + F.lit(DEDUP_EVAL_OFFSET)).alias("doc_id"),
        F.expr(mut_text).alias("text"),
    )
    aug = docs.select("doc_id", "text").unionByName(mutants)
    pairs = dedup.minhash_lsh_pairs(
        aug, k=SHINGLE_K, est_threshold=MINHASH_EST_T
    )
    comp = cluster.connected_components(pairs)  # (node, cluster_id)
    mut_cl = comp.filter(F.col("node") >= DEDUP_EVAL_OFFSET).select(
        (F.col("node") - DEDUP_EVAL_OFFSET).alias("doc_id"),
        F.col("cluster_id").alias("mut_cl"),
    )
    src_cl = comp.filter(F.col("node") < DEDUP_EVAL_OFFSET).select(
        F.col("node").alias("doc_id"),
        F.col("cluster_id").alias("src_cl"),
    )
    scored = (
        docs.select("doc_id", F.expr(_DEDUP_EVAL_KDROP).alias("band_drop"))
        .join(F.broadcast(mut_cl), "doc_id", "left")
        .join(F.broadcast(src_cl), "doc_id", "left")
    )
    detected = F.expr(
        "mut_cl IS NOT NULL AND src_cl IS NOT NULL AND mut_cl = src_cl"
    )
    leaked = F.expr(
        f"mut_cl IS NULL OR mut_cl = doc_id + {DEDUP_EVAL_OFFSET}"
    )
    agg = scored.groupBy("band_drop").agg(
        F.count(F.lit(1)).cast("long").alias("n_planted"),
        F.sum(F.col("mut_cl").isNotNull().cast("long")).alias("n_claimed"),
        F.sum(detected.cast("long")).alias("n_detected"),
        F.sum(leaked.cast("long")).alias("n_leaked"),
    )
    return agg.select(
        F.col("band_drop").cast("int").alias("band_drop"),
        "n_planted",
        "n_claimed",
        "n_detected",
        F.expr(
            "CASE WHEN n_claimed = 0 THEN CAST(NULL AS BIGINT) "
            "ELSE (1000000 * n_detected) div n_claimed END"
        ).alias("precision_ppm"),
        F.expr("(1000000 * n_detected) div n_planted").alias("recall_ppm"),
        F.expr(
            "(2000000 * n_detected) div (n_claimed + n_planted)"
        ).alias("f1_ppm"),
        F.expr("(1000000 * n_leaked) div n_planted").alias("leaked_ppm"),
    ).orderBy("band_drop")


def _oracle_dedup_eval() -> str:
    return f"""
      WITH RECURSIVE
      bandk AS (
        SELECT doc_id, text, CAST({_DEDUP_EVAL_KDROP} AS INT) AS kdrop
        FROM documents
      ),
      mut AS (
        SELECT doc_id + {DEDUP_EVAL_OFFSET} AS doc_id,
               array_to_string(list_filter({sql_tokens('text')},
                 (x, i) -> i % kdrop <> 0), ' ') AS text
        FROM bandk
      ),
      aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM mut
      ),
      {sql_minhash_pair_ctes('aug')},
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
      ),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      ),
      comp AS (
        SELECT src AS node, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src
      ),
      scored AS (
        SELECT b.kdrop AS band_drop, b.doc_id,
               mc.cluster_id AS mut_cl, sc.cluster_id AS src_cl
        FROM bandk b
        LEFT JOIN comp mc ON mc.node = b.doc_id + {DEDUP_EVAL_OFFSET}
        LEFT JOIN comp sc ON sc.node = b.doc_id
      ),
      agg AS (
        SELECT band_drop,
               CAST(COUNT(*) AS BIGINT) AS n_planted,
               CAST(SUM(CASE WHEN mut_cl IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_claimed,
               CAST(SUM(CASE WHEN mut_cl IS NOT NULL AND src_cl IS NOT NULL
                             AND mut_cl = src_cl THEN 1 ELSE 0 END) AS BIGINT) AS n_detected,
               CAST(SUM(CASE WHEN mut_cl IS NULL
                             OR mut_cl = doc_id + {DEDUP_EVAL_OFFSET}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
        FROM scored GROUP BY 1
      )
      SELECT band_drop, n_planted, n_claimed, n_detected,
             CASE WHEN n_claimed = 0 THEN CAST(NULL AS BIGINT)
                  ELSE CAST((1000000 * n_detected) // n_claimed AS BIGINT) END AS precision_ppm,
             CAST((1000000 * n_detected) // n_planted AS BIGINT) AS recall_ppm,
             CAST((2000000 * n_detected) // (n_claimed + n_planted) AS BIGINT) AS f1_ppm,
             CAST((1000000 * n_leaked) // n_planted AS BIGINT) AS leaked_ppm
      FROM agg ORDER BY band_drop
    """


ORACLE["d_dedup_eval"] = _oracle_dedup_eval()


def refresh_lexical_index(
    spark: SparkSession,
    prefix: str = "lex_index",
    docs: DataFrame | None = None,
    n_buckets: int = 8,
) -> bool:
    """Rebuild arm of the lexical index — the same
    build-under-staging + rename-swap lifecycle as
    ``operators.ann_index.refresh_ann_index`` (shared device:
    ``sources.bucketed.swap_staging_tables``): re-tokenize the given
    corpus (or re-derive from the stored postings' doc ids when the
    caller has no fresh corpus handle — a pure re-bucket/re-count),
    write postings/dfs/ntot under ``<prefix>__staging_*``, and
    rename-swap into service.  Serving reads see the complete old
    index until the swap."""
    if docs is None:
        raise ValueError(
            "refresh_lexical_index needs the current corpus: postings"
            " store tokens, not text, so a rebuild cannot re-derive"
            " documents from the index alone"
        )
    staging_prefix = f"{prefix}__staging"
    for t in lexical_table_names(staging_prefix).values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")  # crashed prior run
    materialize_lexical_index(docs, prefix=staging_prefix, n_buckets=n_buckets)
    from locopy_spark.sources.bucketed import swap_staging_tables

    swap_staging_tables(
        spark,
        lexical_table_names(staging_prefix),
        lexical_table_names(prefix),
        lexical_table_names(f"{prefix}__old"),
    )
    return True
