"""Shared connected-components kernel: min-label propagation with pointer
jumping.

Both iterative-canonicalization consumers in this engine — the near-dup
cluster decision layer (operators/dedup.py) and corpus-level surface
canonicalization (operators/linking.py) — need the same convergence loop:
each round a node adopts the smallest of (its label, its neighbors'
labels, the current label OF the node its own label points at). The
neighbor step alone moves the minimum one hop per round (O(diameter));
the label-of-label jump doubles the reach each round, giving true
O(log diameter) convergence — a 10^6-node chain converges in ~20 rounds
instead of never. Each round costs two shuffles on the node key (neighbor
aggregation + pointer join), and each round's result is materialized by an
eager localCheckpoint so lineage stays constant-depth (no exponential plan
growth across iterations).

One implementation, parameterized by label type: a scalar label that IS a
node key (dedup's min-doc_id), or any orderable struct whose pointer field
is extracted by `label_node` (linking's (pri, val, rep) priority label).
Duplicate convergence loops are where subtle divergence breeds — this
module is the single copy.
"""

from __future__ import annotations

import warnings
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cc_min_label(
    edges: DataFrame,
    labels: DataFrame,
    *,
    key: str,
    seeds: DataFrame | None = None,
    label_node: Callable[[Column], Column] | None = None,
    max_iterations: int = 20,
    warn_name: str = "cc_min_label",
) -> DataFrame:
    """Connected components by min-label propagation with pointer jumping.

    edges: two-column frame of node-key pairs (any column names; first =
        one endpoint, second = the other). Symmetrized, deduplicated and
        checkpointed here — callers pass raw directed pairs.
    labels: (key, 'label') rows to relabel. 'label' may be any orderable
        Spark type (scalar or struct; F.min / F.least order structs
        field-by-field).
    seeds: optional (key, 'label') rows with FIXED labels — they propagate
        into the graph every round but are never themselves relabeled and
        are NOT part of the returned frame (the caller re-attaches them).
    label_node: maps a label value to the node key carrying it — the
        pointer the jump step chases. Default: the label itself is a node
        key (scalar min-id labels).
    warn_name: name used in the RuntimeWarning raised when the iteration
        cap is exhausted before convergence (never silently split).

    Returns the relabeled `labels` frame (key, 'label'), checkpointed.
    """
    a0, b0 = edges.columns[0], edges.columns[1]
    # Both orientations from ONE pass over the edge frame (explode, not
    # union-of-two-selects): `edges` is typically an UNPERSISTED pair-
    # mining pipeline (minhash/LSH), and a union's two branches would
    # execute that whole pipeline twice inside this checkpoint (measured
    # 6.2s vs 3.1s for the near-dup pair graph at bench sf1.0).
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(a0).alias("a"), F.col(b0).alias("b")),
                    F.struct(F.col(b0).alias("a"), F.col(a0).alias("b")),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    node_of = label_node or (lambda c: c)
    changed = 1
    for _ in range(max_iterations):
        frontier = labels if seeds is None else seeds.unionByName(labels)
        neighbor_min = (
            sym.join(frontier, sym.a == frontier[key], "inner")
            .groupBy(F.col("b").alias(key))
            .agg(F.min("label").alias("nlabel"))
        )
        # pointer jump: my label names a node — adopt THAT node's current
        # label too (doubles propagation reach per round)
        jump = frontier.select(
            F.col(key).alias("_jk"), F.col("label").alias("jlabel")
        )
        # The convergence flag rides INSIDE the checkpointed frame: the
        # count below then reads materialized rows instead of recomputing
        # the round's joins a second time (halves per-iteration work).
        new_labels = (
            labels.join(neighbor_min, key, "left")
            .join(jump, node_of(F.col("label")) == F.col("_jk"), "left")
            .select(
                key,
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nlabel"), F.col("label")),
                    F.coalesce(F.col("jlabel"), F.col("label")),
                ).alias("label"),
                (
                    F.least(
                        F.coalesce(F.col("nlabel"), F.col("label")),
                        F.coalesce(F.col("jlabel"), F.col("label")),
                    )
                    < F.col("label")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    if changed != 0:
        warnings.warn(
            f"{warn_name} did not converge in {max_iterations} iterations; "
            "components may be split — raise max_iterations",
            RuntimeWarning,
        )
    return labels
