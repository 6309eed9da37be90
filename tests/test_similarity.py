from locopy_spark.operators.similarity import (
    embedding_dedup_pairs,
    hyperplane_signs,
    knn_bruteforce,
    knn_lsh,
)
from locopy_spark.sources.tables import load_table


def test_bruteforce_topk_shape(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_bruteforce(emb, query_ids=[0, 1], k=3).collect()
    assert len(out) == 6
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append((r.rk, r.cosine, r.neighbor_id))
    for q, rows in per_q.items():
        rows.sort()
        cosines = [c for _, c, _ in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(n != q for _, _, n in rows)


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(emb, query_ids=[0, 1, 2], k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in knn_lsh(emb, query_ids=[0, 1, 2], k=5, n_planes=4).collect()
    }
    # approximate: some overlap expected, buckets bound candidates
    assert approx, "LSH returned nothing"
    assert len(exact & approx) > 0


def test_hyperplanes_deterministic():
    a = hyperplane_signs(4, 16)
    b = hyperplane_signs(4, 16)
    assert a == b
    assert all(s in (-1, 1) for row in a for s in row)


def test_embedding_dedup_threshold(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_dedup_pairs(emb, threshold=0.35).collect()
    assert all(p.vec_a < p.vec_b and p.cosine >= 0.35 for p in pairs)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from locopy_spark.operators.similarity import knn_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(emb, query_ids=qids, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in knn_ivf(
            emb, query_ids=qids, k=5, n_centroids=8, n_probe=4
        ).collect()
    }
    assert approx, "IVF returned nothing"
    # probing half the lists should recover a good share of true top-k
    assert len(exact & approx) >= len(exact) // 3


def test_kmeans_converges_deterministic_full_coverage(spark, sf_dir):
    from locopy_spark.operators.kmeans import kmeans_spherical

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    a1, _ = kmeans_spherical(emb, k=8, iters=1)
    a3, c3 = kmeans_spherical(emb, k=8, iters=3)
    rows1, rows3 = a1.collect(), a3.collect()
    # every vector assigned exactly once
    assert len(rows3) == n
    assert len({r.vec_id for r in rows3}) == n
    assert {r.centroid_id for r in rows3} <= set(range(8))
    # Lloyd objective (sum of cosines) is non-decreasing across iters
    obj1 = sum(r.cos for r in rows1)
    obj3 = sum(r.cos for r in rows3)
    assert obj3 >= obj1 - 1e-9
    # deterministic: re-run gives identical assignments and centroids
    a3b, c3b = kmeans_spherical(emb, k=8, iters=3)
    key = lambda rows: sorted((r.vec_id, r.centroid_id) for r in rows)
    assert key(rows3) == key(a3b.collect())
    assert c3 == c3b


def test_knn_int8_recall_and_quantization(spark, sf_dir):
    from locopy_spark.operators.similarity import (
        knn_bruteforce,
        knn_int8,
        with_int8_codes,
    )
    from locopy_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    codes = with_int8_codes(emb).select("codes").limit(50).collect()
    for r in codes:
        assert all(-127 <= c <= 127 for c in r.codes)
        assert max(abs(c) for c in r.codes) == 127  # amax maps to ±127
    qids = [0, 1, 2, 3, 4]
    a = knn_int8(emb, query_ids=qids, k=5)
    e = knn_bruteforce(emb, query_ids=qids, k=5)
    hits = a.join(
        e.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).count()
    assert hits >= 20  # exact-rerank over a 4x oversampled shortlist


def test_semantic_dedup_pairs_recall_and_subset(spark, sf_dir):
    """The LSH-bucketed pair finder returns a subset of the exact
    all-pairs result (it can only miss, never invent) at usable
    recall, and every returned cosine matches the exact twin's."""
    from locopy_spark.operators.similarity import (
        embedding_dedup_pairs,
        semantic_dedup_pairs,
    )
    from locopy_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_dedup_pairs(emb, threshold=0.4).collect()
    }
    found = {
        (r.vec_a, r.vec_b): r.cosine
        for r in semantic_dedup_pairs(emb, threshold=0.4).collect()
    }
    assert set(found) <= set(exact)
    # scores inside buckets are the same exact fixed-point rescore
    assert all(found[k] == exact[k] for k in found)
    assert len(found) >= 0.45 * len(exact)  # measured 0.909 @ sf0.001


def test_kmeans_assign_modes_identical(spark, sf_dir):
    """The Arrow assign kernel is bit-identical to the SQL fold:
    same fixed-point dots, same tie-break, so assignments, cosines,
    and final centroids match exactly."""
    from locopy_spark.operators.kmeans import kmeans_spherical

    emb = load_table(spark, sf_dir, "embeddings")
    aa, ca = kmeans_spherical(emb, k=8, iters=2, assign_mode="arrow")
    asq, cs = kmeans_spherical(emb, k=8, iters=2, assign_mode="sql")
    key = lambda rows: sorted((r.vec_id, r.centroid_id, r.cos) for r in rows)
    assert key(aa.collect()) == key(asq.collect())
    assert ca == cs


def test_hard_negatives_excludes_same_label(spark, sf_dir):
    """Every mined negative has a different label than its anchor, and
    each is the true rank-k nearest among different-label vectors
    (checked against a driver-side exact rescore)."""
    from locopy_spark.operators.similarity import hard_negatives, knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    got = hard_negatives(emb, query_ids=[0, 1, 2], k=5).collect()
    assert len(got) == 15
    assert all(r.query_label != r.neighbor_label for r in got)
    # the all-label knn at the same rank is always >= the constrained one
    knn = {
        (r.query_id, r.rk): r.cosine
        for r in knn_bruteforce(emb, query_ids=[0, 1, 2], k=5).collect()
    }
    for r in got:
        assert knn[(r.query_id, r.rk)] >= r.cosine - 1e-12


def test_centroid_drift_shape_and_determinism(spark, sf_dir):
    """Every label appears with both halves populated, cosines are
    valid, and the whole report is bit-identical across runs (no float
    accumulation order anywhere). NOTE: these synthetic embeddings are
    weakly clustered (per the ANN tripwire docs), so the A/A cosine is
    small by construction — the operator's job is the exact,
    reproducible number, not a near-1 value on noise centroids."""
    from locopy_spark.queries.docs_ext import d_centroid_drift

    rows = d_centroid_drift(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.n_a > 0 and r.n_b > 0
        assert -1.0 - 1e-9 <= r.drift_cos <= 1.0 + 1e-9
    again = d_centroid_drift(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_knn_pq_codes_and_recall(spark, sf_dir):
    from locopy_spark.operators.similarity import (
        knn_bruteforce,
        knn_pq,
        pq_codebook,
    )
    from locopy_spark.functions.vectors import pq_encode_expr
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb, n_codewords=32)
    codes = (
        emb.crossJoin(F.broadcast(cb))
        .select(
            F.expr(pq_encode_expr("embedding", "cb", 64, 16, 32)).alias("c")
        )
        .limit(50)
        .collect()
    )
    for r in codes:
        assert len(r.c) == 16
        assert all(0 <= c < 32 for c in r.c)
    qids = [0, 1, 2, 3, 4]
    a = knn_pq(emb, query_ids=qids, k=5, n_sub=16, n_codewords=32)
    e = knn_bruteforce(emb, query_ids=qids, k=5)
    hits = a.join(
        e.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).count()
    # measured 19/25 @ sf0.001, 18/25 @ sf0.01; tripwire at ~half
    assert hits >= 10


def test_knn_pq_arrow_equals_sql_spec(spark, sf_dir):
    """The Arrow encode kernel must be BIT-identical to the SQL spec
    expression — same codes, same shortlist, same reranked rows."""
    from locopy_spark.operators.similarity import knn_pq

    emb = load_table(spark, sf_dir, "embeddings")
    kw = dict(query_ids=[0, 1, 2, 3, 4], k=5, n_sub=16, n_codewords=32)
    a = sorted(
        map(tuple, knn_pq(emb, arrow_encode=True, **kw).collect())
    )
    b = sorted(
        map(tuple, knn_pq(emb, arrow_encode=False, **kw).collect())
    )
    assert a == b


def test_ann_index_served_results_identical(spark, sf_dir):
    """The materialized-index serving path (the bench's *_shared shape,
    operators/ann_index.py) must be result-identical to the standalone
    operators: same plane bank, same deterministic centroid pick, same
    quantization — stored vs recomputed can differ only by a bug."""
    from locopy_spark.operators import ann_index, similarity
    from locopy_spark.queries.docs import KNN_K, KNN_QUERY_IDS

    emb = load_table(spark, sf_dir, "embeddings")
    ann_index.materialize_ann_index(emb, prefix="test_ann_index")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    # LSH identity is asserted against the fold signature path on BOTH
    # sides: materialize_ann_index defaults to 'fold' precisely so the
    # stored postings are bit-deterministic w.r.t. partitioning (the
    # arrow matmul can flip a near-zero projection's sign across batch
    # splits — recall-neutral, but enough to flake an exact-equality
    # assertion; VERDICT r10 advice item).
    assert rows(
        ann_index.knn_lsh_indexed(
            spark, KNN_QUERY_IDS, KNN_K, prefix="test_ann_index"
        )
    ) == rows(
        similarity.knn_lsh(
            emb, query_ids=KNN_QUERY_IDS, k=KNN_K, signatures="fold"
        )
    )
    assert rows(
        ann_index.knn_ivf_indexed(
            spark, [0, 1, 2, 3, 4], 5, n_probe=4, prefix="test_ann_index"
        )
    ) == rows(
        similarity.knn_ivf(
            emb, query_ids=[0, 1, 2, 3, 4], k=5, n_centroids=16, n_probe=4
        )
    )
    assert rows(
        ann_index.knn_int8_indexed(
            spark, [0, 1, 2, 3, 4], 5, prefix="test_ann_index"
        )
    ) == rows(similarity.knn_int8(emb, query_ids=[0, 1, 2, 3, 4], k=5))
    assert rows(
        ann_index.knn_pq_indexed(
            spark, KNN_QUERY_IDS, KNN_K, prefix="test_ann_index"
        )
    ) == rows(
        similarity.knn_pq(
            emb,
            query_ids=KNN_QUERY_IDS,
            k=KNN_K,
            n_sub=16,
            n_codewords=32,
            oversample=4,
        )
    )


def test_ann_index_refresh_serves_old_until_swap(spark, sf_dir):
    """The refresh lifecycle (VERDICT r10 task 3): rebuild under
    staging names, rename-swap into service.  Mid-refresh (staging
    built, swap not yet run) serving must read the complete OLD index;
    after the swap it must equal a fresh live build over the new
    corpus.  Plus the drift trigger: a healthy frozen quantizer skips
    the rebuild."""
    from locopy_spark.operators import ann_index, similarity

    emb = load_table(spark, sf_dir, "embeddings")
    old_corpus = emb.filter("vec_id % 2 = 0")
    prefix = "test_ann_refresh"
    ann_index.materialize_ann_index(old_corpus, prefix=prefix)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    qids = [r.vec_id for r in old_corpus.select("vec_id").limit(3).collect()]
    v1 = rows(ann_index.knn_lsh_indexed(spark, qids, 5, prefix=prefix))
    assert v1 == rows(
        similarity.knn_lsh(old_corpus, query_ids=qids, k=5, signatures="fold")
    )

    # phase 1: build staging over the GROWN corpus — serving unchanged
    ann_index.build_staging_index(emb, prefix=prefix)
    assert rows(ann_index.knn_lsh_indexed(spark, qids, 5, prefix=prefix)) == v1

    # phase 2: swap — serving now equals a live build over the new corpus
    ann_index.swap_staging_index(spark, prefix=prefix)
    v2 = rows(ann_index.knn_lsh_indexed(spark, qids, 5, prefix=prefix))
    assert v2 == rows(
        similarity.knn_lsh(emb, query_ids=qids, k=5, signatures="fold")
    )
    assert v2 != v1  # the grown corpus actually changed the answers
    # IVF serving reads the refreshed (re-centroided) lists too
    assert rows(
        ann_index.knn_ivf_indexed(spark, qids, 5, n_probe=4, prefix=prefix)
    ) == rows(
        similarity.knn_ivf(emb, query_ids=qids, k=5, n_centroids=16, n_probe=4)
    )
    # no staging/old leftovers after a clean swap
    leftovers = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith((f"{prefix}__staging", f"{prefix}__old"))
    ]
    assert leftovers == []

    # drift trigger: index just rebuilt over this exact corpus — the
    # monitor reads ~1.0 and the threshold gate skips the rebuild
    drift = ann_index.ann_index_drift(spark, emb, prefix=prefix)
    assert drift > 0.99
    assert (
        ann_index.refresh_ann_index(spark, prefix=prefix, drift_threshold=0.5)
        is False
    )
    # and the unconditional form rebuilds from the stored base
    assert ann_index.refresh_ann_index(spark, prefix=prefix) is True
    assert rows(ann_index.knn_lsh_indexed(spark, qids, 5, prefix=prefix)) == v2
