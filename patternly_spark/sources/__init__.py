from patternly_spark.sources.bucketed import read_bucketed, save_bucketed
from patternly_spark.sources.reference_model import load_reference_model, read_reference_blob
from patternly_spark.sources.loaders import (
    read_edf,
    read_sequence_csv,
    read_symbol_stream,
    clean_sentinels,
    save_pfsa_library,
    load_pfsa_library,
    export_pfsa_text,
    import_pfsa_text,
)

__all__ = [
    "load_reference_model",
    "read_reference_blob",
    "read_bucketed",
    "save_bucketed",
    "read_edf",
    "read_sequence_csv",
    "read_symbol_stream",
    "clean_sentinels",
    "save_pfsa_library",
    "load_pfsa_library",
    "export_pfsa_text",
    "import_pfsa_text",
]
