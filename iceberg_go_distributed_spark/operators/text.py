"""Text-analysis operators: token counting, quality scoring, language
ID, document fingerprinting. All built-in Spark SQL functions (JVM-side,
codegen'd); every function is a per-row map, so these scale embarrassingly
— no shuffle until the caller aggregates.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Function words used by both the quality score and the language-ID
# heuristic. Chosen from the corpus vocabulary's closed-class words.
STOPWORDS = ("the", "a", "of", "and", "to", "in")

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def _words(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token accounting: whitespace tokens, BPE-ish tokens,
    characters net of spaces, mean token length."""
    w = _words(text_col)
    n_tokens = F.size(w)
    n_chars = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    bpe = F.expr(f"size(regexp_extract_all({text_col}, '{BPE_RE}', 0))")
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        bpe.alias("n_bpe_tokens"),
        n_chars.alias("n_chars_nospace"),
        F.round(n_chars.cast("double") / n_tokens, 6).alias("mean_token_len"),
    )


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality features + a boolean keep-flag, the standard
    pretraining-filter shape (length window, stopword ratio, alpha ratio)."""
    w = _words(text_col)
    n_tokens = F.size(w)
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(f"size(filter(split({text_col}, ' '), t -> t IN ({stop_list})))")
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-z]", ""))
    total = F.length(F.col(text_col))
    stop_ratio = F.round(n_stop.cast("double") / n_tokens, 6)
    alpha_ratio = F.round(alpha.cast("double") / total, 6)
    # C4/Gopher-style gate: a length window, a MINIMUM function-word
    # presence (gibberish has none), an upper stopword bound (boilerplate
    # is mostly function words), and a minimum alphabetic share
    keep = (
        (n_tokens >= 10)
        & (n_tokens <= 120)
        & (stop_ratio >= F.lit(0.02))
        & (stop_ratio <= F.lit(0.5))
        & (alpha_ratio >= F.lit(0.6))
    )
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        keep.alias("keep"),
    )


def langid(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """n-gram-free language-ID heuristic: a doc is 'en' when it contains
    any English function word; 'unknown' otherwise. (A real system would
    score char-n-gram profiles per language; the contract — a predicted
    lang column to compare against ground truth — is the same.)"""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(f"size(filter(split({text_col}, ' '), t -> t IN ({stop_list})))")
    pred = F.when(n_stop > 0, F.lit("en")).otherwise(F.lit("unknown"))
    return docs.select(F.col(id_col), F.col(lang_col).alias("lang_true"), pred.alias("lang_pred"))


def doc_fingerprints(
    docs: DataFrame,
    max_doc_id: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Bottom-sketch fingerprint per doc: the minimum 60-bit hash over
    word n-gram shingles plus the distinct-shingle count. Two docs with
    equal fingerprints are near-certain shingle-set overlaps — the
    cheapest containment prefilter (1 value/doc vs 64 for MinHash)."""
    from .dedup import shingle_sets

    # hex15: the fingerprint VALUE is the hash itself and the oracle
    # recomputes it cross-engine (md5-based), so this consumer cannot
    # take the fast word-combine hash
    sh = shingle_sets(
        docs.where(F.col(id_col) < max_doc_id), text_col, id_col, n, hash_fn="hex15"
    )
    # shingle_sets already carries the 60-bit hex15 hash per shingle
    ex = sh.select(F.col(id_col), F.explode("shingles").alias("_h"))
    return (
        ex.groupBy(id_col)
        .agg(
            F.min("_h").alias("fingerprint"),
            # shingle_sets already deduplicates, so a plain count equals
            # the distinct count without the distinct-aggregate path
            F.count("*").alias("n_shingles"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    per_group: int = 20,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-group sampling, the corpus-curation primitive
    ("N docs per language/source for the eval set"): rank docs inside
    each group by the md5 of (salt, id) and keep the first `per_group`.

    No RNG state — the sample is a pure function of (salt, ids), so it
    is reproducible across runs, engines (md5 hex is identical in Spark
    and the SQL oracle), and cluster sizes, and a different salt yields
    an independent resample. At 100 TB the per-group row_number is the
    only shuffle (keyed by group); group skew is the classic hot-key
    case — AQE handles moderate skew, and because ranks beyond
    `per_group` are discarded, a local per-partition top-k prefilter
    (rank within partition, keep <= per_group) bounds the exchange to
    partitions x per_group rows per group when groups get pathological.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= per_group)
        .select(F.col(id_col), F.col(group_col), F.col("_rk").alias("rank_in_group"))
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    shape): documents are concatenated in id order into one token
    stream, which is cut into fixed `seq_len` sequences; each doc
    reports the sequence and offset where it starts. Output:
    (doc_id, n_tokens, start_seq, start_offset).

    The exclusive prefix sum over doc token counts is computed with the
    two-phase construction, NOT a global window (a partition-less
    `ROWS UNBOUNDED PRECEDING` window collapses to a single task — the
    classic scale-killer): range-partition by id, local cumulative sums
    per partition, then an O(partitions) driver collect of partition
    totals broadcast back as offsets.

    The locally-cumsummed frame is eagerly localCheckpoint-ed BEFORE the
    totals collect: the final join then reuses the exact partitions the
    totals were computed from. Without it, the collect and the returned
    frame would be two executions of the same repartitionByRange plan,
    and Spark's range-boundary sampling is not deterministic across
    executions — rows could land in a different _pid than the one their
    offset was computed for (deterministic-by-construction, not by
    sampler implementation detail).
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.col(id_col), F.size(_words(text_col)).alias("n_tokens")
    ).repartitionByRange(32, F.col(id_col))
    tok = tok.withColumn("_pid", F.spark_partition_id())
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tok.withColumn("_cum", F.sum("n_tokens").over(w)).localCheckpoint(
        eager=True
    )
    totals = {
        r._pid: r.total
        for r in local.groupBy("_pid").agg(F.max("_cum").alias("total")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off_df = local.sparkSession.createDataFrame(
        sorted(offsets.items()), "_pid int, _off bigint"
    )
    prefix = F.col("_cum") + F.col("_off") - F.col("n_tokens")  # exclusive
    return (
        local.join(F.broadcast(off_df), "_pid")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (prefix / seq_len).cast("bigint").alias("start_seq"),
            (prefix % seq_len).cast("bigint").alias("start_offset"),
        )
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals: total/distinct unigram counts,
    the most-frequent unigram's share of the doc, and a repetitive flag.

    Shape: one explode + two hash aggregates keyed by doc — map-side
    partial aggregation collapses each doc's tokens before the single
    exchange, so the shuffle carries O(distinct tokens per doc) rows,
    never the token stream. The ratio divides two exact BIGINTs cast to
    double (IEEE division — bit-identical across engines).
    """
    tok = docs.select(F.col(id_col), F.explode(_words(text_col)).alias("_t"))
    counts = tok.groupBy(id_col, "_t").agg(F.count("*").alias("_n"))
    top_frac = F.max("_n").cast("double") / F.sum("_n").cast("double")
    return counts.groupBy(id_col).agg(
        F.sum("_n").cast("long").alias("total_words"),
        F.count("*").cast("long").alias("distinct_words"),
        F.max("_n").cast("long").alias("top_count"),
        top_frac.alias("top_word_frac"),
        (top_frac > F.lit(0.2)).alias("repetitive"),
    )


def top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k distinctive terms per document — the TF-IDF shape with an
    integer-exact ranking (term frequency desc, document frequency asc,
    term asc) so results are reproducible bit-for-bit across engines
    (no float log scores to tie-break).

    Two aggregations (per-doc TF, per-term DF) + one broadcast-able join
    on term + a per-doc top-k window. At 100 TB the DF table is
    vocabulary-sized (shuffle on term, then broadcast if it fits); the
    final row_number partitions by doc — the same one-key-window shape
    as stratified sampling.
    """
    from pyspark.sql import Window

    tok = docs.select(F.col(id_col), F.explode(_words(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df_, "term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col(id_col), "term", "tf", "df", "rank")
    )


def corpus_ngrams(
    docs: DataFrame,
    n: int = 3,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k word n-grams with document and occurrence
    counts — the LM-data staple behind boilerplate detection and
    contamination audits. Ranking is integer-exact (occurrences desc,
    n-gram asc) so results reproduce bit-for-bit across engines.

    Shape: one explode over per-doc n-gram lists (kept as strings here —
    the output IS the n-gram), one hash aggregate keyed by n-gram with
    map-side combine, then a global top-k via TakeOrdered (no single-
    partition window; Spark's orderBy+limit plans as a distributed
    TakeOrderedAndProject, driver receives k rows)."""
    # tokenize ONCE into _w, then generate over it (the shingle_sets
    # shape) — inlining split() into the generator would re-evaluate it
    # per reference inside the Generate node
    grams = F.when(
        F.size(F.col("_w")) >= n,
        F.expr(
            f"transform(sequence(0, size(_w) - {n}), "
            f"i -> concat_ws(' ', slice(_w, i + 1, {n})))"
        ),
    ).otherwise(F.array())
    ex = docs.select(F.split(F.col(text_col), " ").alias("_w")).select(
        F.explode(grams).alias("ngram")
    )
    return (
        ex.groupBy("ngram")
        .agg(F.count("*").cast("long").alias("occurrences"))
        .orderBy(F.col("occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )


# PII detection patterns. Deliberately restricted to character classes
# and bounded quantifiers so the same pattern text means the same thing
# under Java regex (Spark rlike) and RE2 (DuckDB regexp_matches):
# no \d / \b shorthands, no backslash escapes ([.] instead of \.).
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_PHONE_RE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
PII_IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def pii_scan(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source PII exposure audit: how many documents contain
    email- / phone- / IPv4-shaped substrings, and the overall hit rate.

    This is the triage pass a redaction pipeline runs first — rlike is a
    JVM-side codegen'd scan, so the whole operator is a per-row map plus
    one |sources|-row aggregate; at 100 TB it is scan-bound.  (Actual
    redaction is ``regexp_replace`` with the same patterns — per-row
    map, same cost shape.)

    Output: ``source, docs, with_email, with_phone, with_ipv4,
    pii_rate`` (fraction of docs with any hit; integer-derived division,
    engine-exact).
    """
    t = F.col(text_col)
    email = t.rlike(PII_EMAIL_RE).cast("int")
    phone = t.rlike(PII_PHONE_RE).cast("int")
    ipv4 = t.rlike(PII_IPV4_RE).cast("int")
    return (
        docs.select(
            F.col(group_col),
            email.alias("_e"),
            phone.alias("_p"),
            ipv4.alias("_i"),
            F.greatest(email, phone, ipv4).alias("_any"),
        )
        .groupBy(group_col)
        .agg(
            F.count("*").alias("docs"),
            F.sum("_e").cast("long").alias("with_email"),
            F.sum("_p").cast("long").alias("with_phone"),
            F.sum("_i").cast("long").alias("with_ipv4"),
            (F.sum("_any").cast("double") / F.count("*").cast("double")).alias(
                "pii_rate"
            ),
        )
    )


def term_cooccurrence(
    docs: DataFrame,
    vocab_k: int = 50,
    k: int = 20,
    min_len: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocabulary: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Top-k co-occurring term pairs among the corpus's top-``vocab_k``
    vocabulary — the co-occurrence-matrix shape behind topic audits and
    embedding pretraining stats.

    The naive formulation (self-join the full token table on doc_id) is
    quadratic in document length and unbounded in vocabulary; this one
    bounds the blow-up twice before any pair is formed:

    1. tokens are distinct-ed per doc (presence, not frequency) and
       length-filtered (``min_len`` drops closed-class noise);
    2. only the top-``vocab_k`` terms by document frequency survive —
       the vocabulary is a driver-free TakeOrdered of |vocab| rows and
       is broadcast back, so the corpus-side token table never shuffles
       for the filter.

    The remaining self-join is on doc_id with both sides co-partitioned
    (one shuffle each), each doc contributing at most C(vocab_k, 2)
    pairs; the pair aggregate is map-side combined.  Ranking is
    integer-exact (n desc, t1 asc, t2 asc).

    At 100 TB the exact vocabulary pass (a full-corpus distinct + count
    per term) is itself a full token-table shuffle.  Pass
    ``vocabulary`` — a pre-computed or sampled term list (e.g. exact
    top-k from last week's corpus, or ``top_terms`` over
    ``docs.sample(0.01)``) — to skip that pass entirely: the list is
    broadcast and ``vocab_k`` is ignored.  With ``vocabulary`` equal to
    the exact top-``vocab_k`` list the output is identical to the
    default path (pinned by tests); with an approximate list, pair
    counts within the given vocabulary are still EXACT — only the
    vocabulary selection is approximate.

    Output: ``t1, t2, n`` (t1 < t2 lexicographically).
    """
    from pyspark.sql.functions import broadcast

    tok = (
        docs.select(F.col(id_col), F.explode(_words(text_col)).alias("term"))
        .where(F.length("term") >= min_len)
        .distinct()
    )
    if vocabulary is not None:
        spark = docs.sparkSession
        vocab = spark.createDataFrame(
            [(t,) for t in sorted(set(vocabulary))], "term string"
        )
    else:
        vocab = (
            tok.groupBy("term")
            .agg(F.count("*").alias("df"))
            .orderBy(F.col("df").desc(), F.col("term").asc())
            .limit(vocab_k)
            .select("term")
        )
    tv = tok.join(broadcast(vocab), "term").select(id_col, "term")
    a = tv.select(F.col(id_col).alias("_d"), F.col("term").alias("t1"))
    b = tv.select(F.col(id_col).alias("_d"), F.col("term").alias("t2"))
    return (
        a.join(b, "_d")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("t1").asc(), F.col("t2").asc())
        .limit(k)
    )
