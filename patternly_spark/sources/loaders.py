"""Sources & sinks (SURVEY §2.1).

- S1: space-separated headerless sequence CSV (the reference's native
  input, ``examples/example0.ipynb`` cell 0) -> (seq_id, symbols/values).
- S7: sentinel cleaning for external loaders (Satellite CSV uses -1e+31
  as missing; ``examples/Satellite Analysis.ipynb`` cell 2).
- S3: PFSA text automaton codec import/export (format written at
  ``patternly/detection.py:502-547``).
- S4: model-library persistence as Parquet (the engine-native format —
  replaces the reference's dill blob).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from patternly_spark.pfsa.model import PFSA, PFSA_SCHEMA, library_from_df, library_to_df


def read_sequence_csv(
    spark: SparkSession,
    path: str,
    *,
    sep: str = " ",
    as_double: bool = False,
) -> DataFrame:
    """Space-separated headerless symbol/value matrix -> (seq_id, symbols
    array<tinyint> | values array<double>).

    Mirrors the reference load incl. the all-null trailing-column drop
    (``dropna(how='all', axis=1)`` — a trailing separator produces one):
    we split the raw line and drop empty trailing fields, which is the
    same observable behavior without a schema-wide pass.
    """
    raw = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), rf"{sep}+")
    arr = F.filter(toks, lambda t: t != "")
    cast_t = "double" if as_double else "tinyint"
    out_col = "values" if as_double else "symbols"
    return (
        raw.withColumn("seq_id", F.monotonically_increasing_id())
        .select("seq_id", F.transform(arr, lambda t: t.cast(cast_t)).alias(out_col))
        .filter(F.size(out_col) > 0)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: str | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines corpus ingestion with explicit bad-line capture — the
    wire format most text corpora actually arrive in (one JSON doc per
    line, a few of them broken).

    PERMISSIVE mode keeps malformed lines instead of failing the job or
    silently dropping them: a parse failure lands its raw line in
    ``corrupt_col`` (null everywhere else), so the pipeline can count /
    quarantine / re-parse them — at 100 TB "a few bad lines" is
    millions of rows, and dropping them unobserved is a data bug.

    ``schema``: DDL string.  Explicitly providing one skips Spark's
    whole-corpus inference pass (2 scans -> 1) and is REQUIRED for the
    corrupt column to populate (Spark only materializes it when it is
    part of the declared schema) — so at scale always pass a schema;
    ``None`` infers and adds ``corrupt_col`` to the inferred fields via
    a sampled first pass.

    Scale shape: line-splittable text scan — no shuffle; filters on
    parsed columns push into the scan like any json source.

    Caveat (SPARK-21610): a query that references ONLY ``corrupt_col``
    is disallowed by Spark — always select a data column alongside it
    when counting/quarantining bad lines."""
    if schema is None:
        inferred = spark.read.json(path).schema
        fields = [f for f in inferred.fields if f.name != corrupt_col]
        from pyspark.sql.types import StructField, StructType, StringType

        schema_t = StructType(list(fields) + [StructField(corrupt_col, StringType())])
    else:
        from pyspark.sql.types import StructField, StringType, StructType

        base = StructType.fromDDL(schema)
        schema_t = base.add(StructField(corrupt_col, StringType()))

    return (
        spark.read.schema(schema_t)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_symbol_stream(spark: SparkSession, path: str) -> DataFrame:
    """One symbol per line (examples/data/data1 shape) -> (offset, symbol).

    Offsets are assigned with the scalable dense-offset scheme (no
    single-task global sort)."""
    from patternly_spark.functions.windowing import add_dense_offset

    raw = (
        spark.read.text(path)
        .withColumn("__file_order", F.monotonically_increasing_id())
        .select(F.col("__file_order"), F.trim(F.col("value")).cast("tinyint").alias("symbol"))
        .filter(F.col("symbol").isNotNull())
    )
    return add_dense_offset(raw, ["__file_order"], out_col="offset").select("offset", "symbol")


def clean_sentinels(
    df: DataFrame,
    columns: list[str],
    *,
    sentinel: float = -1e31,
    drop: bool = True,
) -> DataFrame:
    """S7: sentinel -> null (exact and near match for float storage), then
    optionally drop rows with any null in the cleaned columns."""
    out = df
    for c in columns:
        out = out.withColumn(
            c,
            F.when(F.col(c) <= F.lit(sentinel) * 0.999999, F.lit(None)).otherwise(F.col(c)),
        )
    if drop:
        out = out.na.drop(subset=columns)
    return out


def save_pfsa_library(spark: SparkSession, models: list[PFSA], path: str) -> None:
    """S4: library -> Parquet model dir (MLlib save convention)."""
    library_to_df(spark, models).coalesce(1).write.mode("overwrite").parquet(path)


def load_pfsa_library(spark: SparkSession, path: str) -> list[PFSA]:
    return library_from_df(spark.read.schema(PFSA_SCHEMA).parquet(path))


def export_pfsa_text(models: list[PFSA], directory: str) -> list[str]:
    """S3: write each model in the reference's %-sectioned automaton text
    format; returns file paths."""
    os.makedirs(directory, exist_ok=True)
    paths = []
    for m in models:
        p = os.path.join(directory, f"pfsa_{m.pfsa_id}.txt")
        with open(p, "w") as f:
            f.write(m.to_text())
        paths.append(p)
    return paths


def import_pfsa_text(directory_or_file: str) -> list[PFSA]:
    """S3: parse %-sectioned automaton files (also M2.cfg-style ground
    truth configs)."""
    if os.path.isdir(directory_or_file):
        files = sorted(glob.glob(os.path.join(directory_or_file, "*")))
    else:
        files = [directory_or_file]
    models = []
    for i, p in enumerate(files):
        with open(p) as f:
            models.append(PFSA.from_text(f.read(), pfsa_id=i))
    return models


def read_edf(spark: SparkSession, path: str, *, channels: list[str] | None = None) -> DataFrame:
    """S7: EDF (European Data Format) biosignal loader -> long layout
    (channel string, offset long, value double).

    The reference loads EDF via ``mne`` (examples/SleepAnalysis.ipynb
    cell 0).  ``mne`` is not available in this environment, so the decode
    step is gated behind an import-try; the Spark-side layout contract is
    what the detection pipelines consume (MultiChannelDetection)."""
    try:
        import mne  # noqa: F401
    except ImportError as exc:  # pragma: no cover - mne absent here
        raise NotImplementedError(
            "EDF decoding requires the 'mne' package, which is not "
            "installed in this environment. The engine-side contract is: "
            "a DataFrame (channel string, offset long, value double), "
            "fed to MultiChannelDetection / StreamingDetection."
        ) from exc
    raw = mne.io.read_raw_edf(path, preload=True)  # pragma: no cover
    picks = channels or raw.ch_names  # pragma: no cover
    rows = []  # pragma: no cover
    for ch in picks:  # pragma: no cover
        data = raw.get_data(picks=[ch])[0]
        rows.extend((ch, i, float(v)) for i, v in enumerate(data))
    return spark.createDataFrame(rows, "channel string, offset long, value double")  # pragma: no cover
