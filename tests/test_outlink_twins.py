"""outlink_twins (operators/graph.py): identical-outlink-set link-farm
stamp — planted farm, organic exclusion, degree cap, set semantics."""

from web_crawler_spark.operators.graph import outlink_twins


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src_host string, dst_host string")


def test_planted_farm_detected_organics_excluded(spark):
    rows = []
    for farm in ("f1", "f2", "f3"):
        for hub in ("h1", "h2", "h3"):
            rows.append((farm, hub))
    rows += [("org1", "a"), ("org1", "b"), ("org2", "a"), ("org2", "c")]
    out = outlink_twins(_edges(spark, rows)).collect()
    hosts = {r["host"] for r in out}
    assert hosts == {"f1", "f2", "f3"}
    assert all(r["group_size"] == 3 and r["out_degree"] == 3 for r in out)
    assert len({r["group_id"] for r in out}) == 1


def test_set_semantics_ignore_duplicates(spark):
    # duplicate edges must not split the group: sets, not bags
    rows = [("f1", "h1"), ("f1", "h1"), ("f1", "h2"),
            ("f2", "h2"), ("f2", "h1")]
    out = outlink_twins(_edges(spark, rows)).collect()
    assert {r["host"] for r in out} == {"f1", "f2"}
    assert all(r["out_degree"] == 2 for r in out)


def test_degree_cap_drops_hubs(spark):
    rows = [(f"big{i}", f"t{j}") for i in range(2) for j in range(30)]
    out = outlink_twins(_edges(spark, rows), max_degree=10).collect()
    assert out == []  # identical sets, but over the cap -> not farm members


def test_subset_is_not_twin(spark):
    rows = [("a", "x"), ("a", "y"), ("b", "x")]  # b ⊂ a, not equal
    assert outlink_twins(_edges(spark, rows)).count() == 0


def test_excluded_report_names_planted_mega_host(spark):
    from web_crawler_spark.operators.graph import outlink_twins_excluded

    # mega host links 12 targets; the cap at 10 must EXCLUDE it from twin
    # detection AND report it by name with its out-degree
    rows = [("mega", f"t{i}") for i in range(12)]
    rows += [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    edges = spark.createDataFrame(rows, "src_host string, dst_host string")
    twins = outlink_twins(edges, max_degree=10)
    assert {r["host"] for r in twins.collect()} == {"a", "b"}
    excl = outlink_twins_excluded(edges, max_degree=10).collect()
    assert [(r["host"], r["out_degree"]) for r in excl] == [("mega", 12)]
