"""Large-scale training-data pipeline operators (beyond the reference's
own surface — BASELINE.json north star): deduplication, similarity
search, text analysis, multimodal column plumbing.

All hot paths are built-in column expressions / higher-order functions
(JVM-side, whole-stage codegen); Python appears only in the explicitly
stubbed multimodal decode (Arrow-batched mapInPandas).
"""

from pedsnetdcc_spark.datapipe.text import (  # noqa: F401
    text_stats,
    lang_id,
    shingle_ngrams,
    doc_fingerprint,
    token_counts,
)
from pedsnetdcc_spark.datapipe.corpus import prepare_corpus  # noqa: F401
from pedsnetdcc_spark.datapipe.dedup import (  # noqa: F401
    exact_dedup_groups,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_dedup_pairs,
    lsh_candidate_pairs,
    simhash,
    simhash64,
    simhash_band_pairs,
    simhash_near_dup_pairs,
    hamming64,
    portable_hash64,
)
from pedsnetdcc_spark.datapipe.agreement import (  # noqa: F401
    pair_set_agreement,
    pair_sets_equal,
    signature_locality,
    topk_recall_per_query,
    topk_recall_total,
)
from pedsnetdcc_spark.datapipe.similarity import (  # noqa: F401
    cosine_topk,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    ivf_topk,
    lsh_bucketed_topk,
    train_kmeans_centroids,
)
