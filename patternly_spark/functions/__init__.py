from patternly_spark.functions.quantize import (
    quantize_simple_long,
    quantize_simple_array,
    fit_complex_cutpoints,
    apply_complex_cutpoints_long,
    alphabet_size_col,
    Quantizer,
)
from patternly_spark.functions.windowing import add_dense_offset, split_stream, windows_to_sequences
from patternly_spark.functions.text import (
    tokens,
    token_count,
    bpe_ish_token_count,
    quality_score,
    langid,
    fingerprint,
    shingles,
    with_shingles,
    winnow_fingerprints,
    fingerprint_candidate_pairs,
)
from patternly_spark.functions.vectors import dot, norm, cosine, l2_distance

__all__ = [
    "quantize_simple_long",
    "quantize_simple_array",
    "fit_complex_cutpoints",
    "apply_complex_cutpoints_long",
    "alphabet_size_col",
    "Quantizer",
    "split_stream",
    "windows_to_sequences",
    "add_dense_offset",
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "quality_score",
    "langid",
    "fingerprint",
    "shingles",
    "with_shingles",
    "winnow_fingerprints",
    "fingerprint_candidate_pairs",
    "dot",
    "norm",
    "cosine",
    "l2_distance",
]
