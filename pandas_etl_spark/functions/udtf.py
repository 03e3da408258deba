"""Python UDTF surface (SURVEY §2.8).

The reference's extension point is "a UDF may return anything" —
scalar, Series, or a whole table (preFlight functions called as steps,
/root/reference/pandas_etl/etl.py:552-557 with
tests/etl_definition_folder/pipelines/pandas_pipeline_recovery_1.yaml:6-18).
The table-returning shape maps to Spark's Python UDTF (one input row →
many output rows, declared schema, usable in SQL LATERAL joins).

UDTFs are row-at-a-time Python — the SLOW path, kept for API parity and
for genuinely per-row-imperative expansion logic. Every hot-path
equivalent in this repo is Catalyst-native (``functions/text.py`` builds
n-grams with ``transform``/``sequence`` expressions); tests assert the
two paths agree.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string", useArrow=True)
class WordNgrams:
    """(text, n) → one row per word n-gram: (1-based position, n-gram).

    Tokenization is a plain single-space split (empty tokens kept) so an
    ANSI-SQL oracle (``string_split(text, ' ')`` + list slicing)
    reproduces it byte-for-byte."""

    def eval(self, text: str, n: int):  # noqa: D102 - UDTF contract
        if text is None or n is None or n < 1:
            return
        words = text.split(" ")
        for i in range(max(len(words) - n + 1, 0)):
            yield i + 1, " ".join(words[i : i + n])


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the UDTF surface for SQL LATERAL use."""
    spark.udtf.register("word_ngrams", WordNgrams)
