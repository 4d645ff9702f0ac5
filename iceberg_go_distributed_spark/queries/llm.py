"""LLM-data-pipeline queries over `documents` / `embeddings`, each with
a DuckDB oracle that reproduces the result exactly (the Spark side is
the scale path — banded LSH / bucketed ANN — the oracle is the naive
all-pairs/brute-force definition of the same answer).

Cross-engine determinism contract (see operators/hashing.py):
  - hashes: first 15 hex chars of md5 → 60-bit BIGINT, both engines;
  - float math: element-wise double, left-to-right folds, ROUND(x, 6);
  - ties: broken by id columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ..datasets import load_table
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import text as T
from ..operators.hashing import hex15_sql

# ---------------------------------------------------------------- dedup

_NORM_SQL = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"


@query(
    "llm_dedup_exact",
    oracle=f"""
    SELECT COUNT(*) AS n_groups,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           MAX(c) AS max_dup
    FROM (SELECT {_NORM_SQL} AS k, COUNT(*) AS c FROM documents GROUP BY 1)
    """,
    doc="exact dedup on normalized text: group stats (hash-groupBy, one shuffle)",
)
def llm_dedup_exact(spark, sf_dir):
    groups = D.exact_dedup(load_table(spark, sf_dir, "documents"))
    return groups.agg(
        F.count("*").alias("n_groups"),
        F.sum("dup_count").alias("n_docs"),
        F.max("dup_count").alias("max_dup"),
    )


_FP_SQL = "md5(array_to_string(string_split(text, ' ')[1:8], ' '))"


@query(
    "llm_dedup_fingerprint",
    oracle=f"""
    SELECT MIN(doc_id) AS kept_doc_id, COUNT(*) AS dup_count
    FROM documents
    GROUP BY {_FP_SQL}
    HAVING COUNT(*) > 1
    """,
    doc="prefix-fingerprint dedup: duplicate families by 8-token head",
)
def llm_dedup_fingerprint(spark, sf_dir):
    groups = D.fingerprint_dedup(load_table(spark, sf_dir, "documents"))
    return groups.where(F.col("dup_count") > 1).select("kept_doc_id", "dup_count")


_SHINGLES_CTE = """
    w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(range(len(w) - 2),
                        i -> concat(w[i + 1], ' ', w[i + 2], ' ', w[i + 3])))
                  ELSE [array_to_string(w, ' ')] END AS s
      FROM w)
"""


@query(
    "llm_dedup_minhash",
    oracle=f"""
    WITH {_SHINGLES_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
    """,
    doc="MinHash-LSH near-dup pairs (banded, verified) vs all-pairs oracle",
)
def llm_dedup_minhash(spark, sf_dir):
    return D.minhash_near_dups(load_table(spark, sf_dir, "documents"), threshold=0.5)


def _simhash_oracle(max_hamming: int) -> str:
    sums = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN cnt ELSE -cnt END) AS s{b}"
        for b in range(D.SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(D.SIMHASH_BITS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, t, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY doc_id, t),
    h AS (SELECT doc_id, {hex15_sql('t')} AS h, cnt FROM tok),
    s AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM s)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


@query(
    "llm_dedup_simhash",
    oracle=_simhash_oracle(5),
    doc="SimHash near-dup pairs, pigeonhole-banded (exact recall) vs all-pairs oracle",
)
def llm_dedup_simhash(spark, sf_dir):
    return D.simhash_near_dups(load_table(spark, sf_dir, "documents"), max_hamming=5)


@query(
    "llm_ngram_topk",
    oracle=f"""
    WITH {_SHINGLES_CTE}
    SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
           ROUND(CAST(len(list_intersect(q.s, c.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(q.s, c.s))), 6) AS jaccard
    FROM sh q JOIN sh c ON c.doc_id <> q.doc_id
    WHERE q.doc_id < 5
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY q.doc_id
        ORDER BY CAST(len(list_intersect(q.s, c.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(q.s, c.s))) DESC,
                 c.doc_id) <= 1
    """,
    doc="exact n-gram-Jaccard nearest neighbor for 5 query docs (broadcast)",
)
def llm_ngram_topk(spark, sf_dir):
    return D.ngram_topk_similar(load_table(spark, sf_dir, "documents"), max_query_id=5, k=1)


@query(
    "llm_decontaminate",
    oracle=f"""
    WITH {_SHINGLES_CTE}
    SELECT c.doc_id AS doc_id, q.doc_id AS benchmark_id,
           ROUND(CAST(len(list_intersect(q.s, c.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(q.s, c.s))), 6) AS jaccard
    FROM sh c JOIN sh q ON q.doc_id < 50 AND c.doc_id >= 50
    WHERE CAST(len(list_intersect(q.s, c.s)) AS DOUBLE)
          / len(list_distinct(list_concat(q.s, c.s))) >= 0.3
    """,
    doc="benchmark decontamination: corpus docs overlapping the benchmark set",
)
def llm_decontaminate(spark, sf_dir):
    """Eval-set hygiene: exact n-gram Jaccard of every corpus doc
    against the (broadcast) benchmark set — the corpus never shuffles."""
    return D.decontaminate(
        load_table(spark, sf_dir, "documents"), benchmark_max_id=50, threshold=0.3
    )


@query(
    "llm_sample_stratified",
    oracle="""
    SELECT doc_id, lang, rank_in_group FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
                 PARTITION BY lang
                 ORDER BY md5(concat('sample-v1:', CAST(doc_id AS VARCHAR))),
                          doc_id) AS rank_in_group
      FROM documents) t
    WHERE rank_in_group <= 20
    """,
    doc="deterministic per-language sample (salted-md5 rank, reproducible)",
)
def llm_sample_stratified(spark, sf_dir):
    """Reproducible stratified sampling: the per-group rank is a pure
    function of (salt, doc_id) via md5, so the SQL oracle draws the
    IDENTICAL sample — randomness without RNG state."""
    from ..operators.text import stratified_sample

    return stratified_sample(load_table(spark, sf_dir, "documents"), per_group=20)


@query(
    "llm_pack_sequences",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(FLOOR((SUM(len(string_split(text, ' ')))
                       OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                       - len(string_split(text, ' '))) / 2048.0) AS BIGINT)
               AS start_seq,
           CAST((SUM(len(string_split(text, ' ')))
                 OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                 - len(string_split(text, ' '))) % 2048 AS BIGINT)
               AS start_offset
    FROM documents
    """,
    doc="concat-and-chunk sequence packing via distributed two-phase prefix sum",
)
def llm_pack_sequences(spark, sf_dir):
    """The oracle uses the textbook global window; the Spark side
    computes the same exclusive prefix sum with the two-phase
    partition-local + broadcast-offsets construction, because the
    global window is a single-task bottleneck at corpus scale."""
    from ..operators.text import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"), seq_len=2048)


# ------------------------------------------------------------- similarity

_EMB_CTE = """
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
    n AS (SELECT vec_id, v, label, sqrt(list_dot_product(v, v)) AS nrm FROM e)
"""


@query(
    "llm_ann_bruteforce",
    oracle=f"""
    WITH {_EMB_CTE}
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos
    FROM n q JOIN n c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 10
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC, c.vec_id) <= 5
    """,
    doc="brute-force cosine top-5 for 10 query vectors (broadcast, map-only)",
)
def llm_ann_bruteforce(spark, sf_dir):
    return S.cosine_topk(load_table(spark, sf_dir, "embeddings"), max_query_id=10, k=5)


@query(
    "llm_ann_ivf",
    oracle=f"""
    WITH {_EMB_CTE}
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos
    FROM n q JOIN n c ON c.label = q.label AND c.vec_id <> q.vec_id
    WHERE q.vec_id < 20
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC, c.vec_id) <= 3
    """,
    doc="IVF-cell-pruned cosine top-3 (search only the query's cell)",
)
def llm_ann_ivf(spark, sf_dir):
    return S.ann_ivf_topk(load_table(spark, sf_dir, "embeddings"), max_query_id=20, k=3)


@query(
    "llm_ann_ivf_trained",
    oracle=f"""
    WITH {_EMB_CTE},
    seeds AS (SELECT vec_id AS cell, v AS c FROM e WHERE vec_id < 8),
    a0 AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, s.cell,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.v, s.c) DESC, s.cell) AS rn
        FROM e CROSS JOIN seeds s) WHERE rn = 1),
    mx AS (
      SELECT a0.cell, r.idx,
             ROUND(CAST(SUM(CAST(e.v[r.idx] AS DECIMAL(27,10))) AS DOUBLE)
                   / COUNT(*), 6) AS m
      FROM a0 JOIN e USING (vec_id)
      CROSS JOIN (SELECT CAST(range AS INT) AS idx FROM range(1, 65)) r
      GROUP BY a0.cell, r.idx),
    cents AS (SELECT cell, LIST(m ORDER BY idx) AS c FROM mx GROUP BY cell),
    a1 AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, t.cell,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.v, t.c) DESC, t.cell) AS rn
        FROM e CROSS JOIN cents t) WHERE rn = 1),
    na AS (SELECT n.vec_id, n.v, n.nrm, a1.cell FROM n JOIN a1 USING (vec_id))
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos
    FROM na q JOIN na c ON c.cell = q.cell AND c.vec_id <> q.vec_id
    WHERE q.vec_id < 20
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC, c.vec_id) <= 3
    """,
    doc="IVF with a TRAINED quantizer: one Lloyd step from fixed seeds, then cell-pruned top-3",
)
def llm_ann_ivf_trained(spark, sf_dir):
    """Distributed k-means refinement (seed → assign → exact-decimal
    elementwise means → reassign) followed by cell-pruned search; the
    oracle replays the identical training arithmetic in SQL, so the
    hash match proves the trained assignment, not just the search."""
    return S.ivf_trained_topk(
        load_table(spark, sf_dir, "embeddings"), n_cells=8, max_query_id=20, k=3
    )


def _lsh_oracle() -> str:
    planes = S.lsh_planes()
    def plane_sql(p):
        return "[" + ", ".join(repr(x) for x in p) + "]"
    bucket = " + ".join(
        f"CASE WHEN list_dot_product(v, {plane_sql(p)}) > 0 THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH {_EMB_CTE},
    bkt AS (SELECT vec_id, v, nrm, CAST({bucket} AS BIGINT) AS bucket FROM n)
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos
    FROM bkt q JOIN bkt c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
    WHERE q.vec_id < 10
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC, c.vec_id) <= 3
    """


@query(
    "llm_ann_lsh",
    oracle=_lsh_oracle(),
    doc="random-hyperplane LSH-bucketed ANN top-3 (bucket join, exact rerank)",
)
def llm_ann_lsh(spark, sf_dir):
    return S.ann_lsh_topk(load_table(spark, sf_dir, "embeddings"), max_query_id=10, k=3)


# ---------------------------------------------------------- text analysis

@query(
    "llm_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)) AS n_bpe_tokens,
           length(replace(text, ' ', '')) AS n_chars_nospace,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS mean_token_len
    FROM documents
    """,
    doc="per-doc token accounting: whitespace + BPE-ish regex tokenization",
)
def llm_token_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    stats = T.token_stats(docs)
    return stats.withColumn(
        "mean_token_len",
        F.round(F.col("n_chars_nospace").cast("double") / F.col("n_tokens"), 6),
    )


_STOP_LIST = ", ".join(f"'{s}'" for s in T.STOPWORDS)


@query(
    "llm_quality_filter",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                                      t -> t IN ({_STOP_LIST}))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           ROUND(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS alpha_ratio,
           CAST(len(string_split(text, ' ')) BETWEEN 10 AND 120
                AND CAST(len(list_filter(string_split(text, ' '),
                                         t -> t IN ({_STOP_LIST}))) AS DOUBLE)
                    / len(string_split(text, ' ')) BETWEEN 0.02 AND 0.5
                AND CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
                    / length(text) >= 0.6 AS INT) AS keep
    FROM documents
    """,
    doc="pretraining quality filter: length window + stopword/alpha ratios",
)
def llm_quality_filter(spark, sf_dir):
    feats = T.quality_features(load_table(spark, sf_dir, "documents"))
    return feats.withColumn("keep", F.col("keep").cast("int"))


@query(
    "llm_langid_accuracy",
    oracle=f"""
    SELECT lang AS lang_true,
           CASE WHEN len(list_filter(string_split(text, ' '),
                                     t -> t IN ({_STOP_LIST}))) > 0
                THEN 'en' ELSE 'unknown' END AS lang_pred,
           COUNT(*) AS n
    FROM documents
    GROUP BY 1, 2
    """,
    doc="function-word language-ID heuristic vs ground-truth lang column",
)
def llm_langid_accuracy(spark, sf_dir):
    pred = T.langid(load_table(spark, sf_dir, "documents"))
    return pred.groupBy("lang_true", "lang_pred").agg(F.count("*").alias("n"))


@query(
    "llm_doc_fingerprints",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    ex AS (SELECT doc_id, unnest(s) AS sgl FROM sh WHERE doc_id < 50)
    SELECT doc_id, MIN({hex15_sql('sgl')}) AS fingerprint,
           COUNT(DISTINCT sgl) AS n_shingles
    FROM ex GROUP BY doc_id
    """,
    doc="bottom-sketch doc fingerprint: min 60-bit shingle hash per doc",
)
def llm_doc_fingerprints(spark, sf_dir):
    return T.doc_fingerprints(load_table(spark, sf_dir, "documents"), max_doc_id=50)


# ------------------------------------------------------------- multimodal

@query(
    "llm_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           upper(hex(CAST(substr(text, 1, 8) AS BLOB))) AS head_hex,
           CAST(list_sum(list_transform(range(least(64, length(text))),
                                        i -> ascii(substr(text, i + 1, 1)))) % 997
                AS BIGINT) AS checksum
    FROM documents
    """,
    doc="binary-payload feature extraction via Arrow-batched mapInPandas",
)
def llm_multimodal_features(spark, sf_dir):
    mm = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.decode_features(mm)


@query(
    "llm_frame_sample",
    oracle="""
    WITH p AS (SELECT doc_id, hex(encode(text)) AS hx
               FROM documents WHERE doc_id < 50),
    f AS (SELECT doc_id, hx,
                 unnest(range(0, length(hx) // 64, 4)) AS i
          FROM p)
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           32 AS frame_len,
           substring(hx, CAST(i * 64 + 1 AS BIGINT), 16) AS frame_head_hex
    FROM f
    """,
    doc="video-style frame sampling: every 4th 32-byte frame per payload (mapInPandas 1-to-N)",
)
def llm_frame_sample(spark, sf_dir):
    """Frame sampling over opaque payloads (raw fixed-size frames, the
    post-codec video representation); the oracle mirrors the byte
    slicing in hex space (hex offsets = 2 x byte offsets)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return M.sample_frames(
        M.attach_binary_payload(docs), frame_size=32, stride=4
    )


@query(
    "llm_dedup_embedding",
    oracle=f"""
    WITH {_EMB_CTE}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
    """,
    doc="embedding-cosine near-dup pairs, IVF-cell-blocked (never cross-cell all-pairs)",
)
def llm_dedup_embedding(spark, sf_dir):
    return S.embedding_near_dups(load_table(spark, sf_dir, "embeddings"), threshold=0.4)


@query(
    "llm_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs),
    reach(d, n) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT r.d, e.b FROM reach r JOIN edges e ON e.a = r.n)
    SELECT d AS doc_id, MIN(n) AS cluster_id
    FROM reach GROUP BY d
    """,
    doc="near-dup clusters: connected components over the verified pair graph (min-label propagation vs recursive-CTE closure)",
)
def llm_dedup_clusters(spark, sf_dir):
    return D.near_dup_clusters(load_table(spark, sf_dir, "documents"), threshold=0.5)


@query(
    "llm_repetition_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), c AS (
      SELECT doc_id, t, COUNT(*) AS n FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS total_words,
           CAST(COUNT(*) AS BIGINT) AS distinct_words,
           CAST(MAX(n) AS BIGINT) AS top_count,
           CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top_word_frac,
           CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) > 0.2 AS repetitive
    FROM c GROUP BY doc_id
    """,
    doc="Gopher-style repetition signals (top-unigram share), map-side-combined",
)
def llm_repetition_stats(spark, sf_dir):
    return T.repetition_stats(load_table(spark, sf_dir, "documents"))


@query(
    "llm_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), ranked AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.term ASC)
               AS rank
      FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, tf, df, rank FROM ranked WHERE rank <= 3
    """,
    doc="top-k distinctive terms per doc (TF-IDF shape, integer-exact ranking)",
)
def llm_top_terms(spark, sf_dir):
    return T.top_terms(load_table(spark, sf_dir, "documents"), k=3)


@query(
    "llm_corpus_ngrams",
    oracle="""
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT unnest([array_to_string(ws[i:i+2], ' ')
                     for i in range(1, len(ws) - 2 + 1)]) AS ngram
      FROM w WHERE len(ws) >= 3
    )
    SELECT ngram, COUNT(*) AS occurrences
    FROM g GROUP BY ngram
    ORDER BY occurrences DESC, ngram ASC
    LIMIT 50
    """,
    doc="corpus-wide top-50 trigrams (boilerplate/contamination audit); "
    "integer-exact ranking, distributed TakeOrdered — driver sees k rows",
)
def llm_corpus_ngrams(spark, sf_dir):
    return T.corpus_ngrams(load_table(spark, sf_dir, "documents"), n=3, k=50)


@query(
    "llm_pii_scan",
    oracle="""
    SELECT source,
           COUNT(*) AS docs,
           CAST(SUM(CASE WHEN regexp_matches(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')
                THEN 1 ELSE 0 END) AS BIGINT) AS with_email,
           CAST(SUM(CASE WHEN regexp_matches(text,
                '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')
                THEN 1 ELSE 0 END) AS BIGINT) AS with_phone,
           CAST(SUM(CASE WHEN regexp_matches(text,
                '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}')
                THEN 1 ELSE 0 END) AS BIGINT) AS with_ipv4,
           CAST(SUM(CASE WHEN regexp_matches(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')
              OR regexp_matches(text, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')
              OR regexp_matches(text,
                '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}')
                THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS pii_rate
    FROM documents
    GROUP BY source
    """,
    doc="per-source PII exposure audit (email/phone/IPv4 shapes); "
    "engine-portable regex subset, map-only scan + |sources|-row agg",
)
def llm_pii_scan(spark, sf_dir):
    return T.pii_scan(load_table(spark, sf_dir, "documents"))


@query(
    "llm_term_cooccurrence",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, t AS term FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE len(t) >= 4
    ), vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS df FROM tok GROUP BY 1)
      ORDER BY df DESC, term ASC LIMIT 50
    ), tv AS (
      SELECT doc_id, term FROM tok JOIN vocab USING (term)
    )
    SELECT a.term AS t1, b.term AS t2, CAST(COUNT(*) AS BIGINT) AS n
    FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.term < b.term
    GROUP BY 1, 2
    ORDER BY n DESC, t1 ASC, t2 ASC
    LIMIT 20
    """,
    doc="top-20 co-occurring pairs among the top-50 vocabulary; "
    "presence-distinct + broadcast vocab filter bound the pair blow-up",
)
def llm_term_cooccurrence(spark, sf_dir):
    return T.term_cooccurrence(load_table(spark, sf_dir, "documents"))
