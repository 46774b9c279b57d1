"""Connected components over near-duplicate pair graphs, and canonical-
document selection — the step between pair generation (dedup.py /
similarity.py) and an actually-deduplicated corpus.

Near-dup relations are not transitive (A~B, B~C but A!~C), yet training
dedup must drop whole *clusters*: components of the pair graph are the
standard closure.  This is an iterative algorithm (no single SQL/
DataFrame expression), implemented as min-label propagation:

    label(v)  <-  min(label(v), min over neighbors u of label(u))

repeated until a fixpoint.  Each round is two hash joins + a groupBy-min
(Catalyst-planned shuffles); rounds needed = graph diameter, which for
near-dup clusters is small (boilerplate families are dense, so 3-6
rounds in practice; ``max_iter`` caps pathological chains).

Scale notes
-----------
* State per round is (node, label) pairs — shuffled on node id; the
  text payload never enters the loop.
* Each round's labels are persisted and the previous round freed;
  ``localCheckpoint`` every ``checkpoint_every`` rounds truncates the
  lineage so the plan doesn't grow exponentially across iterations
  (the classic iterative-Spark failure mode).
* Convergence is detected with a count of changed labels (an aggregate
  on the already-persisted frame — no extra scan of the input).
* For graphs with giant components / huge diameter, the alternating
  large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond") halves rounds; min-label
  propagation is chosen here for its simplicity and because near-dup
  graphs are diameter-bounded by construction (LSH bucket caps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "keep_canonical"]


def connected_components(
    pairs: DataFrame,
    src: str = "key_a",
    dst: str = "key_b",
    max_iter: int = 20,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(key, component) for every node appearing in ``pairs``; the
    component id is the minimum node id in the component (deterministic,
    engine-independent)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    # empty graph short-circuit: the loop below costs several scheduler
    # round-trips per iteration even over empty frames — a corpus with no
    # near-dup pairs (the common case after exact dedup) skips it all
    if edges.isEmpty():
        edges.unpersist()
        # preserve the key type whatever it is
        return pairs.select(
            F.col(src).alias("key"), F.col(src).alias("component")
        ).limit(0)

    # undirected: keep both orientations so one join propagates both ways
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()

    labels = (
        sym.select(F.col("a").alias("key"))
        .distinct()
        .withColumn("component", F.col("key"))
        .persist()
    )

    converged = False
    for it in range(max_iter):
        # candidate labels: own label + the label of every neighbor
        neighbor_labels = (
            sym.join(labels, sym["b"] == labels["key"], "inner")
            .select(F.col("a").alias("key"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("key")
            .agg(F.min("component").alias("component"))
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "key")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break

    if not converged:
        # non-converged labels are a CORRECT but coarser-keyed partition
        # (every label is some member of the component, just not yet the
        # global min) — canonical selection then keeps one doc per
        # partial cluster instead of per full cluster: conservative, no
        # data loss, but surface it
        import warnings

        warnings.warn(
            f"connected_components: not converged after {max_iter} rounds "
            "(graph diameter exceeds max_iter); labels form a finer "
            "partition than true components",
            stacklevel=2,
        )
    edges.unpersist()
    sym.unpersist()
    return labels


def keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str,
    src: str = "key_a",
    dst: str = "key_b",
    max_iter: int = 20,
) -> DataFrame:
    """Deduplicated corpus: for every near-dup cluster keep the single
    document whose key equals the component id (the min key —
    deterministic winner); documents in no cluster pass through.

    Plan shape: components loop + ONE left join of the corpus against
    the (small) clustered-node label set — the full table is scanned
    once and never shuffled on text."""
    comp = connected_components(pairs, src, dst, max_iter)
    # losers = clustered nodes that are not their component's minimum
    losers = comp.filter(F.col("key") != F.col("component")).select(
        F.col("key").alias(key_col)
    )
    return df.join(losers, on=key_col, how="left_anti")
