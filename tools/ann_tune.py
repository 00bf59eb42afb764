"""ANN recall-tuning harness over CLUSTERED corpora (r6 verdict item 3).

The driver's embeddings.parquet is near-isotropic noise — the worst
case for space-partitioning ANN and useless for setting defaults.  This
harness generates mixture-of-Gaussians corpora at three cluster
hardnesses (data/synth.py), measures recall@10 against exact
brute-force for every tier × parameter sweep, and prints the curves
that BASELINE.md records:

- IVF (k-means centroids, k=32): nprobe ∈ {1, 2, 4, 8}
- SRP-LSH (multiprobe): bits ∈ {6, 8, 10}
- PQ (m=8, 16 codewords): raw ADC and coarse-50 → exact re-rank

Usage: python tools/ann_tune.py [n_corpus] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIGMAS = {"easy_0.2": 0.2, "medium_0.5": 0.5, "hard_0.9": 0.9}
K = 10
DIM = 64
N_CLUSTERS = 32


def recall(got, gold, n_q: int) -> float:
    hits = got.join(gold, ["qid", "vec_id"]).count()
    return round(hits / float(K * n_q), 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from graphraft_spark.data.synth import (
        clustered_embeddings,
        clustered_queries,
    )
    from graphraft_spark.ops.pq import (
        pq_encode,
        pq_search,
        pq_train,
        rerank_exact,
    )
    from graphraft_spark.ops.similarity import (
        brute_force_topk_matmul,
        ivf_assign,
        ivf_centroids_kmeans,
        ivf_search,
        srp_lsh_topk,
    )
    from graphraft_spark.session import get_spark

    spark = get_spark("ann-tune")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"corpus n={n} dim={DIM} clusters={N_CLUSTERS} queries={n_q} "
          f"recall@{K}")
    rows = []
    for label, sigma in SIGMAS.items():
        t0 = time.time()
        emb = clustered_embeddings(spark, n, DIM, N_CLUSTERS, sigma) \
            .drop("cluster").persist()
        qs = clustered_queries(spark, n_q, DIM, N_CLUSTERS, sigma) \
            .drop("cluster").persist()
        gold = brute_force_topk_matmul(emb, qs, k=K) \
            .select("qid", "vec_id").persist()
        gold.count()

        cents = ivf_centroids_kmeans(emb, k=N_CLUSTERS, iters=5)
        assigned = ivf_assign(emb, cents).persist()
        for nprobe in (1, 2, 4, 8):
            r = recall(ivf_search(assigned, cents, qs, k=K, nprobe=nprobe)
                       .select("qid", "vec_id"), gold, n_q)
            rows.append((label, f"ivf_nprobe{nprobe}", r))
        for bits in (6, 8, 10):
            r = recall(srp_lsh_topk(emb, qs, k=K, dim=DIM, bits=bits)
                       .select("qid", "vec_id"), gold, n_q)
            rows.append((label, f"srp_bits{bits}", r))
        for m in (8, 16):
            books = pq_train(emb, m=m, k=16, iters=3)
            codes = pq_encode(emb, books).persist()
            r = recall(pq_search(codes, books, qs, k=K)
                       .select("qid", "vec_id"), gold, n_q)
            rows.append((label, f"pq_m{m}_adc", r))
            coarse = pq_search(codes, books, qs, k=50) \
                .select("qid", "vec_id")
            r = recall(rerank_exact(coarse, emb, qs, k=K)
                       .select("qid", "vec_id"), gold, n_q)
            rows.append((label, f"pq_m{m}_rerank50", r))
            codes.unpersist()
        for df in (emb, qs, gold, assigned):
            df.unpersist()
        print(f"-- {label} done in {time.time() - t0:.1f}s")

    print(f"\n| corpus | tier | recall@{K} |")
    print("|---|---|---|")
    for label, tier, r in rows:
        print(f"| {label} | {tier} | {r} |")


if __name__ == "__main__":
    main()
