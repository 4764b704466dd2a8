"""fetcher_rebalance_audit (operators/politeness.py): HRW resize-churn
audit — theory match, grow/shrink symmetry, minimality witness."""



def test_rebalance_audit_matches_theory(spark):
    from pyspark.sql import functions as F
    from web_crawler_spark.operators.politeness import (
        fetcher_rebalance_audit,
        host_fetcher_assign,
    )

    hosts = spark.range(2000).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".net"))
        .alias("host")
    )
    r = fetcher_rebalance_audit(hosts, n_from=8, n_to=10).collect()[0]
    assert r["n_hosts"] == 2000
    assert r["expected_moved_milli"] == 200  # (10-8)/10
    # hash-skew band: within ±40% of theory on 2000 hosts
    assert 120 <= r["moved_milli"] <= 280
    # shrink symmetry: moving back 10->8 moves the SAME hosts
    s = fetcher_rebalance_audit(hosts, n_from=10, n_to=8).collect()[0]
    assert s["n_moved"] == r["n_moved"]
    assert s["expected_moved_milli"] == 200
    # unchanged resize: zero churn
    z = fetcher_rebalance_audit(hosts, n_from=8, n_to=8).collect()[0]
    assert z["n_moved"] == 0 and z["moved_milli"] == 0
    # survivors keep lanes on grow: any host NOT moved has identical lane
    a = {x["host"]: x["lane"] for x in host_fetcher_assign(hosts, 8).collect()}
    b = {x["host"]: x["lane"] for x in host_fetcher_assign(hosts, 10).collect()}
    moved = sum(1 for h in a if a[h] != b[h])
    assert moved == r["n_moved"]
    # every move on a grow lands on a NEW lane (HRW minimality witness)
    assert all(b[h] >= 8 for h in a if a[h] != b[h])
