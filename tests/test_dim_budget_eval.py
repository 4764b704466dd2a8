"""dim_budget_eval (operators/similarity.py): Matryoshka-style prefix-dim
retrieval recall vs the full-dimension ranking."""

from web_crawler_spark.operators.similarity import dim_budget_eval


def _emb(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),   # the query itself: cos 1 at every d
        (3, [0.0, 0.0, 1.0, 0.0]),   # zero-norm 2-prefix -> coalesced -2
        (4, [0.8, -0.6, 0.0, 0.0]),  # cos 0.8 at d=2 and d=4
        (5, [0.5, 0.0, 5.0, 0.0]),   # full cos ~0.0995; 2-prefix cos 1.0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_prefix_inflation_halves_recall(spark):
    # full top-2 = {1, 4}; at d=2 vector 5's truncated norm inflates its
    # cosine to 1.0, displacing 4 -> top-2 = {1, 5} -> recall 500
    out = {r["dim"]: r for r in dim_budget_eval(
        _emb(spark), [1.0, 0.0, 0.0, 0.0], dims=[2, 4], k=2
    ).collect()}
    assert out[4]["recall_milli"] == 1000 and out[4]["n_overlap"] == 2
    assert out[2]["recall_milli"] == 500 and out[2]["n_overlap"] == 1


def test_zero_norm_prefix_sorts_last_not_null(spark):
    # with k=3 the zero-2-prefix vector (cos coalesced to -2) must rank
    # BELOW every real cosine, not float to the top as a NULL
    out = {r["dim"]: r for r in dim_budget_eval(
        _emb(spark), [1.0, 0.0, 0.0, 0.0], dims=[2], k=3
    ).collect()}
    # d=2 top-3 = {1, 5, 4}; ref(full) top-3 = {1, 4, 5} -> same set
    assert out[2]["n_overlap"] == 3


def test_full_dim_is_identity(spark):
    out = dim_budget_eval(
        _emb(spark), [1.0, 0.0, 0.0, 0.0], dims=[4], k=4
    ).collect()[0]
    assert out["recall_milli"] == 1000
