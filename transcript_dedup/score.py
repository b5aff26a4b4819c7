"""Configurable additive-weight representative scorer (F8/F9 analogue).

Reference parity: the weighted path-heuristic scorer
(/root/reference/src/resolve-conflicts.ts:47-94) ranks the files of a
duplicate group by summing configured path-prefix weights plus quality
bonuses and keeps the best scorer, and ``extractArtist``'s regex+denylist
(/root/reference/src/metadata.ts, F8 in SURVEY.md section 2.7) expresses a
per-field preference/penalty. This module is the configurable analogue the
rule cascade (decide.py) intentionally does not provide: callers declare an
additive scoring expression over record attributes —

    score =   sum(w  for (attr, prefix, w) in prefix_rules
                  if  attr startswith prefix)           # path-prefix weights
            + sum(w  for (attr, value,  w) in value_rules
                  if  attr == value)                    # denylist: negative w
            + sum(col(attr) * w for (attr, w) in numeric_weights)  # quality

— and the group winner is the strict score argmax with a deterministic
min-id tie-break (the reference keeps the first-seen file on ties,
resolve-conflicts.ts:86-90; Spark partition order is nondeterministic, so
the graft replaces "first seen" with "min id", SURVEY.md 4.3).

Everything is pure column arithmetic: no Python, no extra shuffle beyond
one window over the already-grouped members — and therefore trivially
SQL-expressible, which gives the scorer a DuckDB oracle row
(``doc_weighted_keep`` in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: (attr, prefix, weight): add weight when col(attr) starts with prefix
PrefixRule = tuple[str, str, float]
#: (attr, value, weight): add weight when col(attr) == value (negative
#: weight = the denylist analogue)
ValueRule = tuple[str, str, float]
#: (attr, weight): add col(attr) * weight (numeric quality bonus)
NumericRule = tuple[str, float]


def additive_score(
    prefix_rules: list[PrefixRule] = (),
    value_rules: list[ValueRule] = (),
    numeric_weights: list[NumericRule] = (),
) -> Column:
    """The configurable scoring expression (resolve-conflicts.ts:47-72
    analogue). Returns a double Column built only from the rule tables."""
    expr = F.lit(0.0)
    for attr, prefix, w in prefix_rules:
        expr = expr + F.when(
            F.col(attr).startswith(F.lit(prefix)), F.lit(float(w))
        ).otherwise(F.lit(0.0))
    for attr, value, w in value_rules:
        expr = expr + F.when(F.col(attr) == F.lit(value), F.lit(float(w))).otherwise(
            F.lit(0.0)
        )
    for attr, w in numeric_weights:
        expr = expr + F.coalesce(F.col(attr).cast("double"), F.lit(0.0)) * F.lit(
            float(w)
        )
    return expr


def weighted_representatives(
    members: DataFrame,
    score: Column,
    group_col: str = "component_id",
    id_col: str = "conv_id",
) -> DataFrame:
    """members(group_col, id_col, ...attrs) -> + (score, is_keep).

    is_keep marks the group's score argmax; ties break to the min id
    (strict-best semantics of resolve-conflicts.ts:86-90 made deterministic).
    One window over the group key — duplicate groups are small by
    construction, so the per-partition sort is bounded by group size."""
    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        members.withColumn("score", score)
        .withColumn("is_keep", F.row_number().over(w) == 1)
    )
