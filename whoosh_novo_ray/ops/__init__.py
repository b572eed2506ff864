from whoosh_novo_ray.ops.textstats import (
    doc_length_table,
    fingerprint_table,
    langid_table,
    quality_table,
)
from whoosh_novo_ray.ops.dedup import (
    exact_dedup_keep,
    minhash_lsh_candidates,
    minhash_lsh_candidates_ds,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_ds,
    simhash_near_dup_pairs,
    simhash_near_dup_pairs_ds,
    simhash_table,
)
from whoosh_novo_ray.ops.knn import (
    brute_force_knn,
    cosine_near_dup_pairs,
    lsh_blocked_near_dup,
    lsh_knn,
)
from whoosh_novo_ray.ops.curation import (
    boilerplate_table,
    decontaminate_table,
    dsir_table,
    repetition_table,
    unigram_lm_table,
)
from whoosh_novo_ray.ops.sampling import (
    mixture_sample_table,
    perplexity_buckets_table,
)
from whoosh_novo_ray.ops.groupstats import (
    cap_per_group,
    exact_quantiles,
    top_terms_per_group,
)

__all__ = [
    "doc_length_table",
    "quality_table",
    "langid_table",
    "fingerprint_table",
    "exact_dedup_keep",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_ds",
    "minhash_lsh_candidates",
    "minhash_lsh_candidates_ds",
    "simhash_near_dup_pairs",
    "simhash_near_dup_pairs_ds",
    "simhash_table",
    "brute_force_knn",
    "lsh_knn",
    "cosine_near_dup_pairs",
    "lsh_blocked_near_dup",
    "repetition_table",
    "decontaminate_table",
    "unigram_lm_table",
    "boilerplate_table",
    "dsir_table",
    "perplexity_buckets_table",
    "mixture_sample_table",
    "cap_per_group",
    "exact_quantiles",
    "top_terms_per_group",
]
