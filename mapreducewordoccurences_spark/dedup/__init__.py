from mapreducewordoccurences_spark.dedup.exact import exact_dup_groups, drop_exact_dups
from mapreducewordoccurences_spark.dedup.ngram import shingles_df, ngram_jaccard_pairs
from mapreducewordoccurences_spark.dedup.minhash import minhash_signatures, minhash_lsh_pairs
from mapreducewordoccurences_spark.dedup.simhash import simhash_fingerprints, simhash_near_dup_pairs
from mapreducewordoccurences_spark.dedup.embedding import embedding_near_dup_pairs
from mapreducewordoccurences_spark.dedup.editdist import edit_distance_pairs

__all__ = [
    "exact_dup_groups",
    "drop_exact_dups",
    "shingles_df",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_near_dup_pairs",
    "embedding_near_dup_pairs",
    "edit_distance_pairs",
]
