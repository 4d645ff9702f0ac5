"""Beyond-reference LLM-data-pipeline operators (SURVEY.md §7 P6).

These are the operations a large-scale training-data pipeline needs on
top of the table layer: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard), similarity search over embedding columns, text
analysis (language ID, quality scoring, token counting, fingerprints),
and multimodal (binary) column plumbing.

Design rules (100 TB lens):
  - never all-pairs: candidate generation is always banded/bucketed
    (LSH bands, SimHash pigeonhole chunks, IVF cells) so the self-join
    key carries the blocking, and verification runs only on candidates;
  - everything stays JVM-side in built-in ``pyspark.sql.functions``
    except the multimodal decode stub, which is an Arrow-batched
    ``mapInPandas`` (the genuinely imperative step);
  - deterministic hashing via md5-hex → 60-bit int so DuckDB oracles
    can reproduce results bit-for-bit.
"""

from .dedup import (  # noqa: F401
    exact_dedup,
    fingerprint_dedup,
    minhash_near_dups,
    near_dup_clusters,
    ngram_topk_similar,
    shingle_sets,
    simhash_near_dups,
    simhash_signatures,
)
from .similarity import (  # noqa: F401
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
    embedding_near_dups,
)
from .text import (  # noqa: F401
    doc_fingerprints,
    langid,
    quality_features,
    token_stats,
)
from .multimodal import attach_binary_payload, decode_features  # noqa: F401
