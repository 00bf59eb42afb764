"""Synthetic clustered-embedding generator — mixture of Gaussians on
the unit sphere, fully in-engine and deterministic.

Why it exists: the driver's ``embeddings.parquet`` vectors are
near-isotropic random draws — the known WORST case for every
space-partitioning ANN structure (no cluster structure to exploit;
measured recall@5 0.24-0.36 across tiers, BASELINE.md).  Real embedding
corpora (the reference's 1536-d text-embedding-3-small regime,
stark_neo4j_loading.py:74-78) are strongly clustered, so tuning
nprobe/bits/m against isotropic noise would mis-set every default.
This generator provides corpora with CONTROLLED cluster hardness so
recall curves mean something (tools/ann_tune.py runs them;
BASELINE.md records the curves).

Shape: the k×dim center matrix is a tiny driver-side artifact
(hash-seeded, unit-normalized) closed over by an Arrow kernel; every
vector is ``normalize(center[id % k] + sigma · noise(seed, id))`` with
counter-based per-row RNG (Philox keyed by (seed, id)), so the output
is bit-identical across partitionings, executors, and runs — one scan,
no shuffle, no driver data transfer beyond the centers.

``sigma`` is the hardness dial: relative to unit-norm centers,
sigma≈0.2 gives well-separated clusters (easy), ≈0.5 moderate overlap,
≈0.9 heavy overlap (approaching isotropic — the hard end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def mixture_centers(n_clusters: int, dim: int, seed: int = 7):
    """Unit-norm cluster centers, deterministic in (n_clusters, dim,
    seed).  Tiny (k×dim) — lives on the driver, closed over by kernels."""
    import numpy as np

    rng = np.random.Generator(np.random.Philox(key=seed))
    c = rng.standard_normal((n_clusters, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def clustered_embeddings(spark: SparkSession, n: int, dim: int = 64,
                         n_clusters: int = 32, sigma: float = 0.5,
                         seed: int = 7, id_col: str = "vec_id",
                         emb_col: str = "embedding",
                         id_offset: int = 0,
                         partitions: int | None = None) -> DataFrame:
    """(vec_id, cluster, embedding): ``n`` unit-norm vectors drawn from
    a ``n_clusters``-component Gaussian mixture at hardness ``sigma``.

    ``id_offset`` shifts the id range (query sets draw DISJOINT ids
    from the same mixture, so queries are in-distribution but never
    corpus members).  ``cluster`` is the true component — handy as a
    recall diagnostic and for tests."""
    import numpy as np
    import pandas as pd

    centers = mixture_centers(n_clusters, dim, seed)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            comp = (ids % n_clusters).astype("int64")
            out = centers[comp].copy()
            for i, vid in enumerate(ids):
                rng = np.random.Generator(
                    np.random.Philox(key=[seed, int(vid)]))
                out[i] += sigma * rng.standard_normal(dim)
            out /= np.linalg.norm(out, axis=1, keepdims=True)
            yield pd.DataFrame({
                id_col: ids,
                "cluster": comp,
                emb_col: [v.tolist() for v in out],
            })

    base = spark.range(id_offset, id_offset + n,
                       numPartitions=partitions) if partitions \
        else spark.range(id_offset, id_offset + n)
    return base.mapInPandas(
        gen, schema=f"{id_col} bigint, cluster bigint, "
                    f"{emb_col} array<double>")


def clustered_queries(spark: SparkSession, n_queries: int, dim: int = 64,
                      n_clusters: int = 32, sigma: float = 0.5,
                      seed: int = 7, qid_col: str = "qid",
                      qemb_col: str = "q_emb") -> DataFrame:
    """In-distribution query set: disjoint ids from the same mixture
    (id space offset by 10^9 so per-row RNG streams never collide with
    corpus rows)."""
    q = clustered_embeddings(spark, n_queries, dim, n_clusters, sigma,
                             seed, id_col=qid_col, emb_col=qemb_col,
                             id_offset=1_000_000_000)
    return q.select((F.col(qid_col) - 1_000_000_000).alias(qid_col),
                    "cluster", qemb_col)
