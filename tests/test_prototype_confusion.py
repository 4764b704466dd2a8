"""label_prototype_confusion (operators/similarity.py): integer-exact
nearest-prototype eval — separable clusters, mass-weighted prototypes,
deterministic ties."""

from web_crawler_spark.operators.similarity import label_prototype_confusion


def test_separable_clusters_classify_perfectly(spark):
    # axis-aligned clusters: label i lives on basis vector e_i (+ noise-free)
    rows = []
    for lab in range(3):
        for j in range(5):
            v = [0.0] * 6
            v[lab] = 0.9
            v[3 + lab] = 0.1 * (j + 1) / 5  # within-class variation
            rows.append((lab * 10 + j, v, lab))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = label_prototype_confusion(df).collect()
    assert {(r["label"], r["pred_label"]) for r in out} == {
        (0, 0), (1, 1), (2, 2)
    }
    assert all(r["n_vecs"] == 5 for r in out)


def test_confusion_counts_conserve_vectors(spark):
    rows = []
    for lab in range(2):
        for j in range(4):
            v = [0.5 if (lab + j) % 2 == 0 else -0.5, 0.3, -0.2]
            rows.append((lab * 100 + j, v, lab))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = label_prototype_confusion(df).collect()
    assert sum(r["n_vecs"] for r in out) == 8  # every vector classified once


def test_mass_weighted_prototype_bias_is_declared_semantics(spark):
    # one big class and one tiny identical-direction class: the SUM
    # prototype (Rocchio form) gives the big class a larger dot, so the
    # tiny class's member classifies into the big one — the documented
    # mass bias, asserted so a future "mean prototype" change is loud.
    rows = [(i, [1.0, 0.0], 0) for i in range(9)]
    rows.append((99, [1.0, 0.0], 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {(r["label"], r["pred_label"]): r["n_vecs"]
           for r in label_prototype_confusion(df).collect()}
    assert out[(1, 0)] == 1  # tiny class absorbed by the heavy prototype
    assert out[(0, 0)] == 9


def test_short_vectors_zero_pad_instead_of_nulling(spark):
    # A vector shorter than the prototype dimension contributes 0 (not
    # NULL) on its missing dims — it still classifies by its present
    # dims rather than dropping out of the argmax with a NULL dot.
    rows = [
        (1, [1.0, 0.0], 0), (2, [0.9, 0.0], 0),
        (3, [0.0, 1.0], 1), (4, [0.0, 0.9], 1),
        (5, [0.8], 0),  # short: only dim 0 present -> label 0 side
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {(r["label"], r["pred_label"]): r["n_vecs"]
           for r in label_prototype_confusion(df).collect()}
    assert sum(out.values()) == 5          # nothing nulled out
    assert out[(0, 0)] == 3                # the short vector lands on 0
