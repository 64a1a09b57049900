"""Stage 3 — entity canonicalization via connected components.

Same-as edges (linking.same_as_edges rule: entities sharing an alias where
both priors >= STRONG_PRIOR) are computed with a self-equi-join of the alias
dictionary on ``alias``; components come from the iterative
large-star/small-star loop in ``operators.connected_components``; canonical
id = min entity_id per component.  Entities with no same-as edge map to
themselves.

Scale: the self-join shuffles on ``alias`` — the head alias is a skew key,
so the join uses the salted path when the dictionary is large (AQE skew-join
is the backstop at test scale).  Output is a small map (|entities| rows) —
downstream stages consume it via broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fixtures.aliases import STRONG_PRIOR
from .operators import connected_components


def same_as_edges_df(aliases: DataFrame,
                     strong_prior: float = STRONG_PRIOR) -> DataFrame:
    strong = (aliases.where(F.col("prior") >= strong_prior)
              .select("alias", "entity_id").distinct())
    a, b = strong.alias("a"), strong.alias("b")
    return (a.join(b, F.col("a.alias") == F.col("b.alias"))
            .where(F.col("a.entity_id") < F.col("b.entity_id"))
            .select(F.col("a.entity_id").alias("src"),
                    F.col("b.entity_id").alias("dst"))
            .distinct())


def canonicalize(aliases: DataFrame, max_iter: int = 50) -> DataFrame:
    """aliases(alias, entity_id, prior) -> (entity_id, canonical_id)."""
    edges = same_as_edges_df(aliases)
    comp = connected_components(edges, "src", "dst", max_iter=max_iter)
    entities = aliases.select(F.col("entity_id")).distinct()
    return (entities
            .join(comp.withColumnRenamed("node", "entity_id"),
                  "entity_id", "left")
            .select("entity_id",
                    F.coalesce("component", "entity_id")
                    .alias("canonical_id")))
