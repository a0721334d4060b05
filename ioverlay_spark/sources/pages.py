"""Common-Crawl-style `pages` table (url, warc_ts, html, text, lang) — the engine's
north-rule input (BASELINE.json input_hint) — synthesized deterministically from the
driver's `documents` table (no external data), plus the byte-invertible html->text
extraction kernel.

The html is rendered from `text` by a fixed template, so extraction is byte-exact:
invariant `extract_text(html) == text` per url (BASELINE.json per-row invariant).
All expressions are pure Column ops (JVM-side, codegen-friendly); html is a binary
column as the input_hint requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HTML_PREFIX = '<html><head><meta charset="utf-8"><title>'
HTML_MID = "</title></head><body><article>"
HTML_SUFFIX = "</article></body></html>"

# shared URL derivation (also rendered in DuckDB oracles — keep in sync with url_sql)
URL_SQL = (
    "('https://site' || CAST(doc_id % 97 AS {str_t}) || '.example/' || "
    "substr(md5(CAST(doc_id AS {str_t})), 1, 16))"
)


def url_sql(dialect: str) -> str:
    return URL_SQL.format(str_t="STRING" if dialect == "spark" else "VARCHAR")


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, ...) -> pages(url, warc_ts, html, text, lang)."""
    title = F.concat(F.lit("doc"), F.col("doc_id").cast("string"))
    html_str = F.concat(
        F.lit(HTML_PREFIX), title, F.lit(HTML_MID), F.col("text"), F.lit(HTML_SUFFIX)
    )
    return docs.select(
        F.expr(url_sql("spark")).alias("url"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("doc_id") * 100003) % 31536000
        ).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def extract_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Deterministic html->text extraction; byte-identical to the original text.

    Pure built-in string ops (substring_index) — stays inside WholeStageCodegen."""
    s = F.decode(F.col(html_col), "UTF-8")
    extracted = F.substring_index(
        F.substring_index(s, HTML_MID, -1), HTML_SUFFIX, 1
    )
    return pages.withColumn("extracted_text", extracted)
