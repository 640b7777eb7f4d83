"""Driver-facing oracle-checked queries: dedup / similarity / text ops.

Same cross-engine exactness discipline as driver_queries.py: integer or
set-cardinality math wherever possible; float folds in frozen index
order; deterministic tie-breaks on unique ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecov003_l2t_stars_spark.functions.text import _spread

    # one-file corpus → one scan partition → every JVM expression and
    # kernel downstream runs single-core without this (operators that
    # spread internally see enough partitions and no-op)
    return _spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------------------
# Near-dup pairs: exact n-gram Jaccard (verification) and MinHash+LSH
# (scale path; recall ≈ 0.9998 at threshold 0.8 with 64 hashes/16 bands,
# so it is checked against the SAME exact-Jaccard oracle)
# --------------------------------------------------------------------------
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecov003_l2t_stars_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(_docs(spark, sf_dir), k=5, threshold=0.8)


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecov003_l2t_stars_spark.operators.dedup import minhash_lsh_dedup

    return minhash_lsh_dedup(
        _docs(spark, sf_dir), n_hashes=64, bands=16, k=5, threshold=0.8
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked: the 62-bit signature uses the cross-engine
    token_hash62 fold, and 16-bit block banding has exact recall at
    max_hamming=3 (pigeonhole: any pair within distance 3 shares at
    least one of 4 blocks), so the banded Spark plan must equal the
    oracle's brute-force all-pairs Hamming scan."""
    from ecov003_l2t_stars_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3)


# Set-similarity by TOKEN JOIN, not per-pair list_intersect: explode
# distinct shingles, hash-join on the shingle, count shared per pair —
# |A∩B| as a grouped join, |A∪B| = |A|+|B|-|A∩B|. Identical values
# (same integers, one double division) but O(shared-shingle pairs)
# instead of O(n^2 · shingles): the per-pair list_intersect oracle took
# HOURS at 5000 docs where this takes ~80 s. (Pairs sharing zero
# shingles vanish from the join; they cannot reach jaccard >= 0.8.)
_JACCARD_ORACLE = """
    WITH sh AS (
        SELECT doc_id,
            list_distinct(list_transform(
                range(1, greatest(len(text) - 4, 1) + 1),
                i -> substr(text, CAST(i AS INT), 5))) AS s
        FROM documents
    ), sz AS (
        SELECT doc_id, len(s) AS n FROM sh
    ), tok AS (
        SELECT doc_id, unnest(s) AS g FROM sh
    ), inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT da AS doc_a, db AS doc_b,
        CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN sz na ON na.doc_id = da
    JOIN sz nb ON nb.doc_id = db
    WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.8
"""


# --------------------------------------------------------------------------
# Cosine top-k (brute-force baseline; folds in index order)
# --------------------------------------------------------------------------
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecov003_l2t_stars_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    return cosine_topk_bruteforce(_emb(spark, sf_dir), k=5)


_COSINE_ORACLE = """
    WITH n AS (
        SELECT vec_id, embedding,
            sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                (a, b) -> a + b)) AS nrm
        FROM embeddings
    ), p AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(list_zip(a.embedding, b.embedding),
                    e -> CAST(e[1] AS DOUBLE) * CAST(e[2] AS DOUBLE))),
                (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
        FROM n a JOIN n b ON a.vec_id <> b.vec_id
    ), r AS (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank FROM p
    )
    SELECT vec_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# Per-doc text quality metrics (pure row-wise expressions)
# --------------------------------------------------------------------------
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecov003_l2t_stars_spark.functions.text import (
        bpe_ish_count,
        punct_ratio,
        quality_score,
        stopword_ratio,
        token_count,
    )

    t = F.col("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_ish_count(t).alias("n_bpe_pieces"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
    )


_TEXT_QUALITY_ORACLE = """
    WITH base AS (
        SELECT doc_id, text,
            string_split_regex(trim(text), ' +') AS toks,
            regexp_extract_all(text,
                '([A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s])', 1) AS pieces,
            regexp_replace(text, '[^\\w\\s]', '', 'g') AS no_punct
        FROM documents
    ), m AS (
        SELECT doc_id,
            CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(toks) END
                AS n_tokens,
            len(pieces) AS n_bpe_pieces,
            CASE WHEN len(text) > 0 THEN
                CAST(len(text) - len(no_punct) AS DOUBLE)
                    / CAST(len(text) AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS punct_ratio,
            CASE WHEN len(toks) > 0 THEN
                CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                    t -> t IN ('the','a','and','of','to','in','is','on',
                               'for','with'))) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS stopword_ratio
        FROM base
    )
    SELECT doc_id, n_tokens, n_bpe_pieces, punct_ratio, stopword_ratio,
        CAST(0.4 AS DOUBLE) * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
        + CAST(0.3 AS DOUBLE) * (1.0 - punct_ratio)
        + CAST(0.3 AS DOUBLE) * stopword_ratio AS quality
    FROM m
"""


# --------------------------------------------------------------------------
# Document fingerprint: polynomial rolling hash (pure int folds)
# --------------------------------------------------------------------------
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecov003_l2t_stars_spark.functions.text import fingerprint

    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


_FP_ORACLE = """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), ' +') AS t
        FROM documents
    ), codes AS (
        SELECT doc_id,
            list_transform(t, tok ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(1, len(tok) + 1),
                        i -> CAST(ascii(substr(tok, CAST(i AS INT), 1))
                                  AS BIGINT))),
                    (acc, c) -> (acc * 131 + c) % 2147483647)) AS cs
        FROM toks
    )
    SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
            (acc, c) -> (acc * 1000003 + c) % 2147483647) AS fp
    FROM codes
"""


# --------------------------------------------------------------------------
# Language ID: trigram profiles (learned on the labeled corpus) +
# broadcast-join classification — fully integer-scored, SQL-expressible
# --------------------------------------------------------------------------
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecov003_l2t_stars_spark.functions.text import lang_id_self

    return lang_id_self(_docs(spark, sf_dir), top_n=200)


_LANG_ORACLE = """
    WITH norm AS (
        SELECT doc_id, lang,
            lower(regexp_replace(text, '\\s+', '_', 'g')) AS t
        FROM documents
    ), tg AS (
        SELECT lang, unnest(list_transform(
            range(1, greatest(len(t) - 2, 1) + 1),
            i -> substr(t, CAST(i AS INT), 3))) AS tg
        FROM norm
    ), counts AS (
        SELECT lang, tg, count(*) AS c FROM tg GROUP BY 1, 2
    ), prof AS (
        SELECT lang, tg, row_number() OVER (
            PARTITION BY lang ORDER BY c DESC, tg ASC) AS rank
        FROM counts
        QUALIFY rank <= 200
    ), doc_tg AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, greatest(len(t) - 2, 1) + 1),
            i -> substr(t, CAST(i AS INT), 3)))) AS tg
        FROM norm
    ), scored AS (
        SELECT d.doc_id, p.lang, CAST(SUM(200 - p.rank) AS BIGINT) AS score
        FROM doc_tg d JOIN prof p USING (tg)
        GROUP BY 1, 2
    )
    SELECT doc_id, lang AS pred_lang, score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
        FROM scored
    ) WHERE rn = 1
"""


def _simhash_oracle() -> str:
    """Brute-force SimHash oracle: same 62-bit signature (two 31-bit
    polynomial byte-folds per token, per-bit majority vote), all-pairs
    Hamming <= 3. The Spark plan banding is exact-recall at d<=3, so the
    outputs must match bit-for-bit."""

    def fold(base: int) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(range(1, len(tok) + 1), "
            "i -> CAST(ascii(substr(tok, CAST(i AS INT), 1)) AS BIGINT))), "
            f"(acc, c) -> (acc * {base} + c) % 2147483647)"
        )

    tok_hash = f"{fold(1000003)} * CAST(2147483648 AS BIGINT) + {fold(131)}"
    bit_terms = " + ".join(
        "(CASE WHEN list_reduce(list_prepend(0, "
        f"list_transform(hs, x -> CAST(((x >> {b}) & 1) * 2 - 1 AS INT))), "
        "(a, v) -> a + v) > 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(62)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), ' +') AS t
        FROM documents
    ), h AS (
        SELECT doc_id, list_transform(t, tok -> {tok_hash}) AS hs
        FROM toks
    ), sig AS (
        SELECT doc_id, {bit_terms} AS simhash
        FROM h
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


def q_ann_ivf_topk_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k — the ANN SCALE path (k-means cells +
    n_probe fan-out + exact re-rank within probed cells). This is the
    bench twin (approximate result only, no quadratic verification);
    the driver-adjudicated form is :func:`q_ann_ivf_topk`.
    Deterministic end to end: hash-partition k-means init, no RNG over
    rows, broadcast-NumPy centroid assignment."""
    from ecov003_l2t_stars_spark.operators.similarity import ivf_topk

    return ivf_topk(
        _emb(spark, sf_dir), k=5, n_centroids=16, n_probe=4, n_iters=2,
        dim=64,
    )


# Recall floors for the approximate-path verification queries, frozen
# just below the measured recall of the fully deterministic pipelines at
# driver scale (sf0.01, 500 vectors): IVF (16 cells, 4 probes) measures
# 0.596, embedding-LSH (16 tables x 6 bits, k=20) measures 0.735. The
# floors are the driver-checkable guarantee; the planted-duplicate
# regime (recall == 1.0) is pytest-measured in test_similarity.py.
ANN_IVF_RECALL_FLOOR_PCT = 55
EMBED_LSH_RECALL_FLOOR_PCT = 65


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k, in driver-adjudicable verification form:
    run the approximate scale path AND its exact brute-force twin, then
    emit one row of machine-checkable invariants —

    - ``n_exact``: row count of the exact top-k (data-dependent; the
      DuckDB oracle recomputes it independently from the parquet),
    - ``n_bad_cosine``: approximate rows whose reported cosine deviates
      from the exact twin's frozen-fold cosine by > 1e-9 (must be 0:
      IVF re-ranks with TRUE cosines inside probed cells),
    - ``recall_floor_met``: |approx ∩ exact| * 100 >= floor * n_exact,
      an integer comparison (no float crosses the engine boundary).

    The oracle asserts the invariants (0 / true) and recomputes
    ``n_exact`` from scratch — approximate != exact is acknowledged,
    but the claim "subset-consistent with recall >= floor" is now
    hash-checked rather than rows-only."""
    from ecov003_l2t_stars_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    approx = q_ann_ivf_topk_raw(spark, sf_dir).select(
        "vec_id", "neighbor_id", "cosine"
    )
    exact = cosine_topk_bruteforce(_emb(spark, sf_dir), k=5).select(
        "vec_id", "neighbor_id", F.col("cosine").alias("_ecos")
    )
    j = approx.join(exact, ["vec_id", "neighbor_id"], "left")
    stats = j.agg(
        F.count(F.lit(1)).alias("_n_approx"),
        F.coalesce(
            F.sum(F.when(F.col("_ecos").isNull(), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("_n_miss"),
        F.coalesce(
            F.sum(
                F.when(
                    F.abs(F.col("cosine") - F.col("_ecos")) > 1e-9, 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("n_bad_cosine"),
    )
    n_exact = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    return stats.crossJoin(n_exact).select(
        "n_exact",
        "n_bad_cosine",
        (
            (F.col("_n_approx") - F.col("_n_miss")) * 100
            >= F.col("n_exact") * ANN_IVF_RECALL_FLOOR_PCT
        ).alias("recall_floor_met"),
    )


def q_ann_ivf_pq_topk_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-k — the ANN MEMORY tier (m-byte codes +
    ADC preselect inside probed cells + exact re-rank). Bench twin;
    the driver-adjudicated form is :func:`q_ann_ivf_pq_topk`."""
    from ecov003_l2t_stars_spark.operators.similarity import ivf_pq_topk

    return ivf_pq_topk(
        _emb(spark, sf_dir), k=5, n_centroids=16, n_probe=4, n_iters=2,
        dim=64, m=8, nbits=8, rerank=64,
    )


def q_ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ in the same containment + recall-floor verification form
    as :func:`q_ann_ivf_topk` (with rerank covering full cells at this
    scale, the PQ preselect is lossless and recall equals plain IVF's
    probe-coverage bound — same floor)."""
    from ecov003_l2t_stars_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    approx = q_ann_ivf_pq_topk_raw(spark, sf_dir).select(
        "vec_id", "neighbor_id", "cosine"
    )
    exact = cosine_topk_bruteforce(_emb(spark, sf_dir), k=5).select(
        "vec_id", "neighbor_id", F.col("cosine").alias("_ecos")
    )
    j = approx.join(exact, ["vec_id", "neighbor_id"], "left")
    stats = j.agg(
        F.count(F.lit(1)).alias("_n_approx"),
        F.coalesce(
            F.sum(F.when(F.col("_ecos").isNull(), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("_n_miss"),
        F.coalesce(
            F.sum(
                F.when(
                    F.abs(F.col("cosine") - F.col("_ecos")) > 1e-9, 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("n_bad_cosine"),
    )
    n_exact = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    return stats.crossJoin(n_exact).select(
        "n_exact",
        "n_bad_cosine",
        (
            (F.col("_n_approx") - F.col("_n_miss")) * 100
            >= F.col("n_exact") * ANN_IVF_RECALL_FLOOR_PCT
        ).alias("recall_floor_met"),
    )


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: connected components over the MinHash+LSH
    near-dup pair graph → (doc_id, cluster_id = min doc id in the
    component). The canonical-representative step of a dedup pipeline,
    run as iterative min-label propagation (distributed joins, no
    driver-side graph); the oracle computes the same components with a
    recursive CTE over the exact-Jaccard pair graph."""
    from ecov003_l2t_stars_spark.operators.dedup import (
        dup_clusters,
        minhash_lsh_dedup,
    )

    pairs = minhash_lsh_dedup(_docs(spark, sf_dir))
    return dup_clusters(pairs)


# same pair graph as _JACCARD_ORACLE (LSH recall == exact at this
# banding, hash-verified by minhash_lsh_pairs), then min-label closure
# via a recursive CTE — transitive closure is fine at oracle scale
# because near-dup components are tiny
_DUP_CLUSTERS_ORACLE = """
    WITH RECURSIVE sh AS (
        SELECT doc_id,
            list_distinct(list_transform(
                range(1, greatest(len(text) - 4, 1) + 1),
                i -> substr(text, CAST(i AS INT), 5))) AS s
        FROM documents
    ), sz AS (
        SELECT doc_id, len(s) AS n FROM sh
    ), tok AS (
        SELECT doc_id, unnest(s) AS g FROM sh
    ), inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), p AS (
        SELECT da AS a, db AS b
        FROM inter
        JOIN sz na ON na.doc_id = da
        JOIN sz nb ON nb.doc_id = db
        WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.8
    ), e AS (
        SELECT a AS src, b AS dst FROM p
        UNION
        SELECT b AS src, a AS dst FROM p
    ), r AS (
        SELECT src AS node, src AS label FROM e
        UNION
        SELECT e.dst AS node, r.label
        FROM r JOIN e ON e.src = r.node
    )
    SELECT node AS doc_id, min(label) AS cluster_id FROM r GROUP BY node
"""


def q_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline end to end: near-dup pairs (MinHash+LSH) →
    connected components → surviving corpus (each cluster keeps only its
    canonical min-id doc). Output is the kept (doc_id, n_chars)."""
    from ecov003_l2t_stars_spark.operators.dedup import (
        dedup_corpus,
        minhash_lsh_dedup,
    )

    docs = _docs(spark, sf_dir)
    return dedup_corpus(docs, minhash_lsh_dedup(docs)).select(
        "doc_id", "n_chars"
    )


# recursive min-label closure over the exact-Jaccard pair graph (same
# CTE as _DUP_CLUSTERS_ORACLE); survivors = docs that are not a
# non-representative member of any component
_DEDUP_CORPUS_ORACLE = """
    WITH RECURSIVE sh AS (
        SELECT doc_id,
            list_distinct(list_transform(
                range(1, greatest(len(text) - 4, 1) + 1),
                i -> substr(text, CAST(i AS INT), 5))) AS s
        FROM documents
    ), sz AS (
        SELECT doc_id, len(s) AS n FROM sh
    ), tok AS (
        SELECT doc_id, unnest(s) AS g FROM sh
    ), inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), p AS (
        SELECT da AS a, db AS b
        FROM inter
        JOIN sz na ON na.doc_id = da
        JOIN sz nb ON nb.doc_id = db
        WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.8
    ), e AS (
        SELECT a AS src, b AS dst FROM p
        UNION
        SELECT b AS src, a AS dst FROM p
    ), r AS (
        SELECT src AS node, src AS label FROM e
        UNION
        SELECT e.dst AS node, r.label
        FROM r JOIN e ON e.src = r.node
    ), drop_set AS (
        SELECT node FROM r GROUP BY node HAVING min(label) <> node
    )
    SELECT doc_id, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT node FROM drop_set)
"""


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus CURATION as one adjudicated query —
    the composition a 100-TB data pipeline actually runs:

    1. quality gate: frozen quality_score >= 0.5 (bit-stable doubles on
       both engines, so the float filter cannot flake the row set),
    2. exact dedup: canonical min doc_id per identical text (also the
       precondition that keeps LSH band buckets un-degenerate),
    3. near-dup removal: MinHash+LSH pairs → connected components →
       each cluster keeps its canonical doc.

    Output: surviving (doc_id, n_chars, quality). Every stage is also
    individually adjudicated (text_quality / dedup_exact /
    minhash_lsh_pairs / dup_clusters / dedup_corpus); this row checks
    the composition."""
    from pyspark.sql import Window

    from ecov003_l2t_stars_spark.functions.text import quality_score
    from ecov003_l2t_stars_spark.operators.dedup import (
        dedup_corpus,
        minhash_lsh_dedup,
    )

    docs = _docs(spark, sf_dir).withColumn(
        "quality", quality_score(F.col("text"))
    )
    kept = docs.where(F.col("quality") >= 0.5)
    w = Window.partitionBy("text").orderBy("doc_id")
    uniq = (
        kept.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        # materialized once: the gate + text-window dedup feeds THREE
        # consumers (minhash signatures, the verify stage's docs lookup,
        # dedup_corpus's anti-join) and recomputed per consumer (rule
        # 10 — no ReusedExchange across differently-pruned branches).
        # localCheckpoint (not persist) per rule 19.
        .localCheckpoint(eager=False)
    )
    out = dedup_corpus(uniq, minhash_lsh_dedup(uniq))
    return out.select("doc_id", "n_chars", "quality")


_CURATE_ORACLE = """
    WITH RECURSIVE qbase AS (
        SELECT doc_id, text, n_chars,
            string_split_regex(trim(text), ' +') AS toks,
            regexp_replace(text, '[^\\w\\s]', '', 'g') AS no_punct
        FROM documents
    ), qm AS (
        SELECT doc_id, text, n_chars,
            CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(toks) END
                AS n_tokens,
            CASE WHEN len(text) > 0 THEN
                CAST(len(text) - len(no_punct) AS DOUBLE)
                    / CAST(len(text) AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS punct_ratio,
            CASE WHEN len(toks) > 0 THEN
                CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                    t -> t IN ('the','a','and','of','to','in','is','on',
                               'for','with'))) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS stopword_ratio
        FROM qbase
    ), scored AS (
        SELECT doc_id, text, n_chars,
            CAST(0.4 AS DOUBLE)
                * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
            + CAST(0.3 AS DOUBLE) * (1.0 - punct_ratio)
            + CAST(0.3 AS DOUBLE) * stopword_ratio AS quality
        FROM qm
    ), kept AS (
        SELECT * FROM scored WHERE quality >= 0.5
    ), uniq AS (
        SELECT k.* FROM kept k
        JOIN (SELECT text, min(doc_id) AS mid FROM kept GROUP BY text) u
          ON k.doc_id = u.mid
    ), sh AS (
        SELECT doc_id,
            list_distinct(list_transform(
                range(1, greatest(len(text) - 4, 1) + 1),
                i -> substr(text, CAST(i AS INT), 5))) AS s
        FROM uniq
    ), sz AS (
        SELECT doc_id, len(s) AS n FROM sh
    ), tok AS (
        SELECT doc_id, unnest(s) AS g FROM sh
    ), inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), p AS (
        SELECT da AS a, db AS b
        FROM inter
        JOIN sz na ON na.doc_id = da
        JOIN sz nb ON nb.doc_id = db
        WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.8
    ), e AS (
        SELECT a AS src, b AS dst FROM p
        UNION
        SELECT b AS src, a AS dst FROM p
    ), r AS (
        SELECT src AS node, src AS label FROM e
        UNION
        SELECT e.dst AS node, r.label
        FROM r JOIN e ON e.src = r.node
    ), drop_set AS (
        SELECT node FROM r GROUP BY node HAVING min(label) <> node
    )
    SELECT doc_id, n_chars, quality FROM uniq
    WHERE doc_id NOT IN (SELECT node FROM drop_set)
"""


def q_embed_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact, oracle-checked): every
    (vec_a < vec_b) with cosine >= 0.42 — the threshold sits just under
    the synthetic corpus's top pair similarities so the result is
    non-empty at all scales. Quadratic verification path (bench-skipped
    like ``cosine_topk``); ``embed_dup_lsh`` is the bucketed scale
    twin."""
    from ecov003_l2t_stars_spark.operators.similarity import (
        embedding_near_pairs,
    )

    return embedding_near_pairs(_emb(spark, sf_dir), threshold=0.42)


def q_embed_dup_lsh_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed LSH near-dup scale path (bench twin: approximate pairs
    only, no quadratic verification); the driver-adjudicated form is
    :func:`q_embed_dup_lsh`."""
    from ecov003_l2t_stars_spark.operators.similarity import (
        embedding_near_dup_lsh,
    )

    return embedding_near_dup_lsh(
        _emb(spark, sf_dir), threshold=0.42, k=20, n_tables=16, n_bits=6,
    )


def q_embed_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup LSH, in driver-adjudicable verification form:
    run the bucketed scale path AND the exact quadratic twin, emit one
    row of machine-checkable invariants —

    - ``n_exact``: exact near-pair count (DuckDB recomputes it),
    - ``n_outside``: CONTAINMENT violations — approximate pairs absent
      from the exact result (must be 0: every emitted pair carries a
      true cosine >= threshold),
    - ``n_bad_cosine``: contained pairs whose cosine deviates from the
      exact frozen-fold cosine by > 1e-9 (must be 0),
    - ``recall_floor_met``: hits * 100 >= floor * n_exact as an integer
      comparison.

    See :func:`q_ann_ivf_topk` for the rationale."""
    approx = q_embed_dup_lsh_raw(spark, sf_dir).select(
        "vec_a", "vec_b", "cosine"
    )
    from ecov003_l2t_stars_spark.operators.similarity import (
        embedding_near_pairs,
    )

    exact = embedding_near_pairs(_emb(spark, sf_dir), threshold=0.42).select(
        "vec_a", "vec_b", F.col("cosine").alias("_ecos")
    )
    j = approx.join(exact, ["vec_a", "vec_b"], "left")
    stats = j.agg(
        F.count(F.lit(1)).alias("_n_approx"),
        F.coalesce(
            F.sum(F.when(F.col("_ecos").isNull(), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_outside"),
        F.coalesce(
            F.sum(
                F.when(
                    F.abs(F.col("cosine") - F.col("_ecos")) > 1e-9, 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("n_bad_cosine"),
    )
    n_exact = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    return stats.crossJoin(n_exact).select(
        "n_exact",
        "n_outside",
        "n_bad_cosine",
        (
            (F.col("_n_approx") - F.col("n_outside")) * 100
            >= F.col("n_exact") * EMBED_LSH_RECALL_FLOOR_PCT
        ).alias("recall_floor_met"),
    )


def _embed_pairs_oracle() -> str:
    from ecov003_l2t_stars_spark.plans.driver_queries import duck_double

    return f"""
    WITH n AS (
        SELECT vec_id, embedding,
            sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                (a, b) -> a + b)) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(list_zip(a.embedding, b.embedding),
                e -> CAST(e[1] AS DOUBLE) * CAST(e[2] AS DOUBLE))),
            (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(list_zip(a.embedding, b.embedding),
                e -> CAST(e[1] AS DOUBLE) * CAST(e[2] AS DOUBLE))),
            (x, y) -> x + y) / (a.nrm * b.nrm) >= {duck_double(0.42)}
    """


QUERIES_TEXT = {
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "dup_clusters": q_dup_clusters,
    "dedup_corpus": q_dedup_corpus,
    "curate_corpus": q_curate_corpus,
    "simhash_pairs": q_simhash_pairs,
    "cosine_topk": q_cosine_topk,
    "embed_near_pairs": q_embed_near_pairs,
    "embed_dup_lsh": q_embed_dup_lsh,
    "text_quality": q_text_quality,
    "doc_fingerprint": q_doc_fingerprint,
    "lang_id": q_lang_id,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_pq_topk": q_ann_ivf_pq_topk,
}

def _ann_ivf_oracle() -> str:
    """Containment + recall-floor oracle: DuckDB independently recomputes
    the exact top-k count; the invariant columns assert 0 violations and
    recall >= floor. Hash-matches iff the Spark-side verification holds."""
    return f"""
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
        CAST(0 AS BIGINT) AS n_bad_cosine,
        true AS recall_floor_met
    FROM ({_COSINE_ORACLE})
    """


def _embed_dup_lsh_oracle() -> str:
    return f"""
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
        CAST(0 AS BIGINT) AS n_outside,
        CAST(0 AS BIGINT) AS n_bad_cosine,
        true AS recall_floor_met
    FROM ({_embed_pairs_oracle()})
    """


ORACLE_SQL_TEXT = {
    "ngram_jaccard_pairs": _JACCARD_ORACLE,
    "minhash_lsh_pairs": _JACCARD_ORACLE,
    "dup_clusters": _DUP_CLUSTERS_ORACLE,
    "dedup_corpus": _DEDUP_CORPUS_ORACLE,
    "curate_corpus": _CURATE_ORACLE,
    "cosine_topk": _COSINE_ORACLE,
    "embed_near_pairs": _embed_pairs_oracle(),
    "text_quality": _TEXT_QUALITY_ORACLE,
    "doc_fingerprint": _FP_ORACLE,
    "lang_id": _LANG_ORACLE,
    "simhash_pairs": _simhash_oracle(),
    "ann_ivf_topk": _ann_ivf_oracle(),
    "ann_ivf_pq_topk": _ann_ivf_oracle(),
    "embed_dup_lsh": _embed_dup_lsh_oracle(),
}
