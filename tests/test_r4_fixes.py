"""Round-4 additions: fixed-point k-means, large-star/small-star
connected components, single-pass SimHash kernel, shapefile Z/M +
multipart, checkpoint partial-manifest crash."""
from __future__ import annotations

import numpy as np
import pytest


def test_ivf_train_kmeans_exact_matches_numpy_bitwise(spark):
    """The fixed-point trainer is EXACT: Spark output must equal the
    int64 NumPy replay with zero tolerance (sums are integer, hence
    order-independent), including n_vecs and the dyadic centroids."""
    from geocoordinateconverter_spark.operators import similarity as sim
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.orderBy("vec_id").toPandas()
    V = np.stack(pdf["embedding"].to_numpy())
    assign, Cq = sim.kmeans_replay_exact(V, n_iter=3)
    sizes = {c: int((assign == c).sum()) for c in range(sim.N_CLUSTERS)
             if (assign == c).any()}
    got = sim.ivf_train_kmeans_exact(emb, n_iter=3).collect()
    got_sizes = {}
    for r in got:
        got_sizes[r.cluster] = r.n_vecs
        assert r.centroid == Cq[r.cluster, r.d] / sim.KM_SCALE, \
            (r.cluster, r.d)
    assert got_sizes == sizes


def test_ivf_train_kmeans_exact_partition_invariant(spark):
    """Shuffle-order invariance is the whole point of the fixed-point
    formulation: training on a 13-partition scramble of the input must
    produce the bit-identical model (the N vs 4N executor
    reproducibility the north rule demands, provoked locally)."""
    from geocoordinateconverter_spark.operators import similarity as sim
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = {(r.cluster, r.d): (r.n_vecs, r.centroid)
            for r in sim.ivf_train_kmeans_exact(emb, n_iter=3).collect()}
    scrambled = emb.repartition(13, "label")
    alt = {(r.cluster, r.d): (r.n_vecs, r.centroid)
           for r in sim.ivf_train_kmeans_exact(scrambled,
                                               n_iter=3).collect()}
    assert base == alt
