"""User-defined extension surface (SURVEY §2.11): the reference has no
user-extensible functions at all (its five parsers are hardcoded Go,
utils.go:193-297), and this engine's F1-F5 equivalents are deliberately
pure Column expressions. These two entries exercise the surfaces Spark
offers WHEN a user genuinely needs imperative logic:

- a Python UDTF (table function) lateral-joined per input row — the
  row-expanding extension point (Spark 4 `@udtf`);
- a grouped-aggregate pandas UDF — the custom-aggregation (UDAF)
  extension point, Arrow-batched per group.

Both carry full DuckDB value oracles, which constrains them to
deterministic kernels: the UDTF's split/trim matches the SQL twin
character-for-character, and the UDAF computes a MEDIAN — a selection
statistic (sort + pick), immune to the accumulation-order
nondeterminism that rules out sum/mean UDAFs for value-checked floats.

Scale notes: both run Python in the executor — the documented slow path
(10-100x vs codegen'd Column exprs; see the README scale contract).
They exist to pin the extension APIs' semantics, not as the recommended
formulation: the UDTF's declarative twin is posexplode(split(...)), the
UDAF's is percentile/median built-ins. A real pipeline reaches for
these surfaces only when no Column-expression formulation exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from dsacord_spark.plans.registry import register, table

_WS = " \t\n\r"


@register(
    "udtf_sentence_split",
    sql="""
    WITH s AS (
      SELECT doc_id,
             list_filter(
               list_transform(string_split(text, '.'),
                              x -> trim(x, ' ' || chr(9) || chr(10) || chr(13))),
               x -> x <> '') AS sents
      FROM documents
    )
    SELECT doc_id, CAST(idx - 1 AS INT) AS sent_idx, sents[idx] AS sentence
    FROM s, LATERAL (SELECT unnest(generate_series(1, len(sents))) AS idx)
    """,
    doc="Python UDTF lateral join: one output row per non-empty "
    "'.'-separated sentence, with its index. Declarative twin: "
    "posexplode(filter(split(...))).",
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, sentence: string")
    class SplitSentences:
        def eval(self, text: str):  # noqa: ANN001 - UDTF protocol
            if text is None:
                return
            parts = [p.strip(_WS) for p in text.split(".")]
            for i, s in enumerate(p for p in parts if p != ""):
                yield i, s

    spark.udtf.register("split_sentences", SplitSentences)
    table(spark, sf_dir, "documents").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.sent_idx, s.sentence "
        "FROM __udtf_docs, LATERAL split_sentences(text) s"
    )


@register(
    "udaf_grouped_median",
    sql="""
    SELECT l_returnflag,
           median(l_quantity) AS median_qty,
           median(l_extendedprice) AS median_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Grouped-agg pandas UDF (UDAF surface): exact median via sort + "
    "midpoint — selection, not accumulation, so it is order-insensitive "
    "and bit-matches DuckDB's quantile_cont(0.5) median.",
)
def udaf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    # pd/np are module-level imports: postponed annotation evaluation
    # (`from __future__ import annotations`) stringifies the hints and
    # pyspark resolves them against THIS module's globals
    @pandas_udf("double")
    def pmedian(v: pd.Series) -> float:
        a = np.sort(v.to_numpy(dtype="float64"))
        n = len(a)
        if n == 0:
            return float("nan")
        mid = n // 2
        # even n: same (a[k] + a[k+1]) / 2 interpolation as quantile_cont
        return float(a[mid]) if n % 2 else float((a[mid - 1] + a[mid]) / 2.0)

    # grouped-agg pandas UDFs cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a pandas UDF too
    @pandas_udf("long")
    def pcount(v: pd.Series) -> int:
        return len(v)

    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        pmedian("l_quantity").alias("median_qty"),
        pmedian("l_extendedprice").alias("median_price"),
        pcount("l_quantity").alias("n"),
    )
