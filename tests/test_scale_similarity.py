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


def test_embedding_near_dup_lsh_exact_equivalence(spark, sf_small):
    """The registered near-dup query's LSH path must return EXACTLY the
    brute-force pair set at theta=0.9 on the planted-twin corpus: the
    banding parameters (12 bands x 16 bits) put per-pair miss below
    1e-9 at the twins' cos ~0.9998, and precision is exact by verify.
    This is the recall-1 guarantee the driver's oracle row rests on."""
    from yodel_etl_spark.queries.scale_dedup import _with_planted_twins
    from yodel_etl_spark.scale.similarity import hyperplane_lsh_pairs

    emb = spread(load_tables(spark, sf_small, ("embeddings",))["embeddings"])
    corpus = _with_planted_twins(emb)
    brute = {
        (r["id_a"], r["id_b"]): r["cosine_r"]
        for r in cosine_pairs(corpus, "vec_id", "embedding", 0.9).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine_r"]
        for r in hyperplane_lsh_pairs(
            corpus, "vec_id", "embedding", threshold=0.9,
            n_planes=192, blocks=12, vectorized_sketch=True,
        ).collect()
    }
    assert lsh == brute
    # the harness planted one twin per 10th vector — result is non-vacuous
    n_twins = corpus.where("vec_id >= 1000000").count()
    assert len(lsh) == n_twins > 0
