"""Cluster-assignment comparison metrics (dup-pair recall / precision).

The north-star criterion is dup-pair recall >= 0.99 against the reference's
cluster assignments at identical shingle/signature/band configs
(BASELINE.json). A clustering is compared as its set of within-cluster pairs.
"""

from __future__ import annotations

from collections.abc import Iterable


def cluster_pairs(clusters: Iterable[Iterable]) -> set[tuple]:
    pairs = set()
    for members in clusters:
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def labels_to_clusters(labels: dict) -> list[set]:
    out: dict = {}
    for v, g in labels.items():
        out.setdefault(g, set()).add(v)
    return list(out.values())


def pair_recall_precision(expected_clusters, got_clusters) -> tuple[float, float]:
    """(recall, precision) of duplicate pairs vs the expected clustering."""
    exp = cluster_pairs(expected_clusters)
    got = cluster_pairs(got_clusters)
    if not exp:
        return 1.0, 1.0 if not got else 0.0
    tp = len(exp & got)
    recall = tp / len(exp)
    precision = tp / len(got) if got else 1.0
    return recall, precision
