from patternly_spark.functions.quantize import (
    quantize_simple_long,
    quantize_simple_array,
    fit_complex_cutpoints,
    apply_complex_cutpoints_long,
    alphabet_size_col,
    Quantizer,
)
from patternly_spark.functions.windowing import split_stream, windows_to_sequences

__all__ = [
    "quantize_simple_long",
    "quantize_simple_array",
    "fit_complex_cutpoints",
    "apply_complex_cutpoints_long",
    "alphabet_size_col",
    "Quantizer",
    "split_stream",
    "windows_to_sequences",
]
