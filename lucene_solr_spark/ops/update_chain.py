"""Update-request processor chain (SURVEY.md §2.G) — the ingest-side field
pipeline Solr runs before a document reaches the index writer (reference:
``S/update/processor/UpdateRequestProcessorChain`` and the stock factories:
TrimField, RegexReplace, CloneField, DefaultValue, CountFieldValues,
Signature, FieldLength).

Spark-first shape: every processor is a pure column-expression rewrite, so a
whole chain composes into ONE projection over the source scan — no UDFs, no
extra passes, fully pushdown/codegen friendly (the chain costs a map stage,
exactly like Solr's in-JVM processor chain costs zero extra I/O). Processors
are (name, fn) pairs; ``apply_chain`` folds them left-to-right, matching the
chain-order semantics of ``processorChain`` in solrconfig.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .registry import register

Processor = Callable[[DataFrame], DataFrame]


def trim_field(col: str) -> Processor:
    """TrimFieldUpdateProcessorFactory."""
    return lambda df: df.withColumn(col, F.trim(F.col(col)))


def regex_replace(col: str, pattern: str, replacement: str) -> Processor:
    """RegexReplaceProcessorFactory."""
    return lambda df: df.withColumn(col, F.regexp_replace(F.col(col), pattern, replacement))


def clone_field(src: str, dst: str) -> Processor:
    """CloneFieldUpdateProcessorFactory."""
    return lambda df: df.withColumn(dst, F.col(src))


def default_value(col: str, value) -> Processor:
    """DefaultValueUpdateProcessorFactory (fill nulls/empties)."""
    return lambda df: df.withColumn(
        col, F.when(F.col(col).isNull() | (F.col(col) == ""), F.lit(value)).otherwise(F.col(col))
    )


def field_length(src: str, dst: str) -> Processor:
    """FieldLengthUpdateProcessorFactory."""
    return lambda df: df.withColumn(dst, F.length(F.col(src)).cast("long"))


def count_field_values(src: str, dst: str, sep: str = " ") -> Processor:
    """CountFieldValuesUpdateProcessorFactory (token count on a split)."""
    return lambda df: df.withColumn(
        dst, F.size(F.split(F.trim(F.col(src)), sep + "+")).cast("long")
    )


def signature(cols: list[str], dst: str = "signature") -> Processor:
    """SignatureUpdateProcessorFactory (exact-dup signature): md5 over the
    '|'-joined field values — the same hash DuckDB computes, so the chain
    stays SQL-cross-checkable and dedup joins on it are engine-portable."""
    return lambda df: df.withColumn(dst, F.md5(F.concat_ws("|", *cols)))


def uuid_field(key_col: str, dst: str = "id") -> Processor:
    """UUIDUpdateProcessorFactory analog. Upstream generates a RANDOM
    UUID v4; random ids break resume idempotence and engine parity (the
    stream_random / sample_split rationale), so this emits a NAME-BASED
    v3-layout UUID instead — md5 of the doc key with the RFC 4122 version
    nibble (3) and variant bits (10xx) patched in. Deterministic: the same
    doc always gets the same id on every engine and every rerun — which is
    also why Solr users who need idempotent ingest use the Signature
    processor over the random UUID; this processor fuses the two."""

    def proc(df: DataFrame) -> DataFrame:
        h = F.md5(F.col(key_col).cast("string"))
        variant = F.lower(
            F.hex(
                F.conv(F.substring(h, 17, 2), 16, 10).cast("int")
                .bitwiseAND(F.lit(0x3F)).bitwiseOR(F.lit(0x80))
            )
        )
        return df.withColumn(
            dst,
            F.concat_ws(
                "-",
                F.substring(h, 1, 8),
                F.substring(h, 9, 4),
                F.concat(F.lit("3"), F.substring(h, 14, 3)),
                F.concat(variant, F.substring(h, 19, 2)),
                F.substring(h, 21, 12),
            ),
        )

    return proc


def apply_chain(df: DataFrame, chain: list[Processor]) -> DataFrame:
    for p in chain:
        df = p(df)
    return df


# --- fixture chain over `documents` (the driver-checked entry) --------------

DOCS_CHAIN = [
    trim_field("text"),
    regex_replace("text", " {2,}", " "),     # collapse runs of spaces
    clone_field("text", "text_indexed"),
    default_value("lang", "und"),
    field_length("text", "n_len"),
    count_field_values("text", "n_tokens"),
    signature(["text", "lang"], "signature"),
]


def update_chain_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = apply_chain(docs, DOCS_CHAIN)
    return out.select(
        "doc_id", "text_indexed", "lang", "n_len", "n_tokens", "signature"
    ).orderBy("doc_id")


UPDATE_CHAIN_SQL = """
WITH step AS (
    SELECT doc_id,
           regexp_replace(trim(text), ' {2,}', ' ', 'g') AS text,
           CASE WHEN lang IS NULL OR lang = '' THEN 'und' ELSE lang END AS lang
    FROM documents
)
SELECT doc_id,
       text AS text_indexed,
       lang,
       length(text)::BIGINT AS n_len,
       len(string_split_regex(trim(text), ' +'))::BIGINT AS n_tokens,
       md5(text || '|' || lang) AS signature
FROM step ORDER BY doc_id"""


register("update_chain_docs", update_chain_docs, UPDATE_CHAIN_SQL)


def update_chain_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UUID processor as its own chain entry (kept separate so the
    long-scored ``update_chain_docs`` fixture stays byte-stable): every doc
    gets a deterministic v3-layout UUID from its key; the entry returns the
    id column plus the RFC 4122 shape witnesses (version nibble, variant
    class) so a format regression cannot hash-cancel."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = apply_chain(docs, [uuid_field("doc_id", "id")])
    return out.select(
        "doc_id", "id",
        F.substring("id", 15, 1).alias("version"),
        F.substring("id", 20, 1).alias("variant_nibble"),
    ).orderBy("doc_id")


UPDATE_CHAIN_UUID_SQL = """
WITH h AS (SELECT doc_id, md5(doc_id::VARCHAR) AS x FROM documents),
u AS (
    SELECT doc_id,
           substr(x, 1, 8) || '-' || substr(x, 9, 4) || '-' ||
           '3' || substr(x, 14, 3) || '-' ||
           lower(to_hex((('0x' || substr(x, 17, 2))::INTEGER & 63) | 128)) ||
           substr(x, 19, 2) || '-' || substr(x, 21, 12) AS id
    FROM h
)
SELECT doc_id, id,
       substr(id, 15, 1) AS version,
       substr(id, 20, 1) AS variant_nibble
FROM u ORDER BY doc_id"""


register("update_chain_uuid", update_chain_uuid, UPDATE_CHAIN_UUID_SQL)
