"""User-defined extension surface (SURVEY §2.11): the reference has no
user-extensible functions at all (its five parsers are hardcoded Go,
utils.go:193-297), and this engine's F1-F5 equivalents are deliberately
pure Column expressions. These entries exercise the surfaces Spark
offers WHEN a user genuinely needs imperative logic:

- a Python UDTF (table function) lateral-joined per input row — the
  row-expanding extension point (Spark 4 `@udtf`);
- a grouped-aggregate pandas UDF — the custom-aggregation (UDAF)
  extension point, Arrow-batched per group;
- a grouped-map applyInPandas transform — the whole-frame-per-group
  extension point.

All carry full DuckDB value oracles, which constrains them to
deterministic kernels: the UDTF's split/trim matches the SQL twin
character-for-character, and the UDAF/grouped-map compute SELECTION
statistics (median, rank percentile — sort + pick), immune to the
accumulation-order nondeterminism that rules out sum/mean kernels for
value-checked floats.

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


@register(
    "grouped_map_percentile",
    sql="""
    WITH r AS (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type, event_id, value,
           round(CASE WHEN n = 1 THEN 0.5
                      ELSE CAST(rn - 1 AS DOUBLE) / (n - 1) END, 6) AS pct
    FROM r
    """,
    doc="Grouped-map applyInPandas (per-group pandas transform surface): "
    "rank-percentile of event value within event_type. Rank is selection "
    "on a strict (value, event_id) order — no float accumulation — so "
    "the pandas path is exactly value-checkable; the declarative twin "
    "is a row_number window. Grouped by the COARSE key on purpose: "
    "grouped-map pays per-group Python/Arrow overhead, so few large "
    "groups beat many small ones ~6x here (the per-user variant spent "
    "its time invoking pandas 1500x).",
)
def grouped_map_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining pandas API family member (mapInPandas, pandas_udf
    agg, applyInPandasWithState, UDTF are exercised elsewhere): a
    grouped-MAP transform — one pandas frame in, one out, per group.
    Scale: one shuffle on event_type; each group materializes as ONE
    pandas frame, so the hottest key bounds executor memory — salt or
    pre-aggregate when a key can outgrow it."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(["value", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        n = len(out)
        rn = np.arange(n, dtype=np.float64)
        # round half AWAY from zero to match DuckDB's round() and Spark's
        # round() — np.round is half-to-even and diverges whenever
        # rn/(n-1)*1e6 lands exactly on .5 (values are non-negative here)
        pct = np.float64(0.5) if n == 1 else rn / (n - 1)
        out["pct"] = np.floor(pct * 1e6 + 0.5) / 1e6
        return out[["event_type", "event_id", "value", "pct"]]

    e = table(spark, sf_dir, "events")
    return (
        e.select("event_type", "event_id", "value")
        .groupBy("event_type")
        .applyInPandas(
            per_group,
            schema="event_type string, event_id long, value double, pct double",
        )
    )
