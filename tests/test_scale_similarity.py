"""LSH candidate generation: precision 1 (every emitted pair passes the
exact threshold) and recall measured against the brute-force truth."""

from __future__ import annotations

from yodel_etl_spark.registry import load_all
from yodel_etl_spark.scale.similarity import cosine_pairs
from yodel_etl_spark.session import load_tables, spread


def test_hyperplane_lsh_precision_and_recall(spark, sf_small):
    emb = spread(load_tables(spark, sf_small, ("embeddings",))["embeddings"])
    exact = {
        (r["id_a"], r["id_b"]): r["cosine_r"]
        for r in cosine_pairs(emb, "vec_id", "embedding", 0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine_r"]
        for r in load_all()["similarity_lsh_pairs"].build(spark, sf_small).collect()
    }
    # precision 1: every LSH pair is a true pair with the same score
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # recall: banding curve keeps a meaningful fraction at this threshold
    if exact:
        assert len(lsh) / len(exact) >= 0.3
