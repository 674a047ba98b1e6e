"""Relational cross-check formulation of the fast path.

SURVEY §2.3: the fused in-UDF first-match loop is the production path; this
module expresses the same semantics as pure relational algebra —

    docs x broadcast(rules)  (nested-loop join)
    -> apply/validate each rule        (pandas UDF per pair: CPython re)
    -> row_number() over (partition by doc_id, field
                          order by weight desc, rule_seq)  among validated
    -> keep rank 1

— and exists to *prove* the operator's semantics relationally (tested equal
to the fused path on reference corpora). It shuffles (the window) and
evaluates every rule on every doc (no short-circuit), so it is deliberately
NOT the scale path; it is the oracle formulation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.normalize import normalize_series
from ..functions.rules import RuleBook, execute_rule, validate_value
from ..sources.spark_io import RULES_DDL


def rules_to_df(spark, book: RuleBook) -> DataFrame:
    rows = []
    for label, fields in book.by_label_field.items():
        for fname, rl in fields.items():
            for r in rl:
                rows.append(
                    {
                        "label": label,
                        "field": fname,
                        "rule": r.rule,
                        "validation_regex": r.validation_regex,
                        "weight": r.weight,
                        "rule_seq": r.rule_seq,
                        "round_added": 0,
                        "rule_id": r.rule_id,
                    }
                )
    return spark.createDataFrame(rows, schema=RULES_DDL)


APPLIED_DDL = (
    "doc_id string, field string, rule_id bigint, weight bigint, "
    "rule_seq bigint, value string, valid boolean"
)


def first_match_relational(
    docs: DataFrame, rules: DataFrame
) -> DataFrame:
    """(doc_id, field, value, rule_id) via join + window — semantics equal
    to the fused operator's (tested), including tri-state null handling."""
    flat = docs.select(
        "doc_id",
        "label",
        F.expr(
            "concat_ws('', transform(array_sort(spans, (l, r) -> l.offset - r.offset),"
            " s -> CASE WHEN s.kind = 'text' THEN coalesce(s.text, '') ELSE '' END))"
        ).alias("raw_text"),
    )

    def normalize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["text"] = normalize_series(pdf["raw_text"])
            yield pdf[["doc_id", "label", "text"]]

    normed = flat.mapInPandas(
        normalize_batch, schema="doc_id string, label string, text string"
    )

    pairs = normed.join(F.broadcast(rules), "label")

    def apply_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            valid = []
            for text, rule, vregex in zip(
                pdf["text"], pdf["rule"], pdf["validation_regex"]
            ):
                v = execute_rule(rule, text)
                vals.append(v)
                valid.append(validate_value(vregex, v))
            out = pdf[["doc_id", "field", "rule_id", "weight", "rule_seq"]].copy()
            out["value"] = pd.Series(vals, index=pdf.index, dtype="object")
            out["valid"] = valid
            yield out

    applied = pairs.mapInPandas(apply_batch, schema=APPLIED_DDL)

    w = Window.partitionBy("doc_id", "field").orderBy(
        F.desc("weight"), F.asc("rule_seq")
    )
    return (
        applied.filter("valid")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "field",
            # "" -> null (src/pipeline.py:52-57)
            F.nullif(F.col("value"), F.lit("")).alias("value"),
            "rule_id",
        )
    )
