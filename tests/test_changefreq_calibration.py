"""changefreq_calibration (operators/snapshots.py): declared-vs-observed
change-rate audit — fixed-point arithmetic, invalid tokens, unobserved
URLs, never/zero-expected buckets, policy-map override."""

from web_crawler_spark.operators import snapshots as SN


def _run(spark, declared, observed, **kw):
    d = spark.createDataFrame(declared, "url string, changefreq string")
    o = spark.createDataFrame(
        observed, "url string, n_epochs long, n_changes long"
    )
    return {
        r.changefreq: (
            r.n_urls, r.n_observed, r.expected_milli,
            r.observed_rate_milli, r.calibration_milli,
        )
        for r in SN.changefreq_calibration(d, o, **kw).collect()
    }


def test_calibration_buckets(spark):
    declared = [
        ("/a", "daily"), ("/b", "daily"), ("/c", "Daily"),   # case-folds
        ("/d", "never"), ("/e", "fortnightly"),              # invalid token
        ("/f", "weekly"),                                    # never observed
    ]
    observed = [
        ("/a", 10, 20),   # 2 changes/epoch
        ("/b", 10, 0),
        ("/c", 20, 10),   # 0.5/epoch
        ("/d", 10, 5),
        ("/e", 10, 10),
    ]
    got = _run(spark, declared, observed)
    # daily: 30 changes / 40 epochs = 750 milli; cal = 750*1000/1000 = 750
    assert got["daily"] == (3, 3, 1000, 750, 750)
    # never: expected 0 -> rate reported, calibration NULL
    assert got["never"] == (1, 1, 0, 500, None)
    # invalid token: bucketed, no expected, no calibration
    assert got["invalid"] == (1, 1, None, 1000, None)
    # declared but never observed: counted, rates NULL
    assert got["weekly"] == (1, 0, 142, None, None)


def test_policy_map_override(spark):
    declared = [("/x", "daily")]
    observed = [("/x", 4, 8)]   # 2000 milli observed
    got = _run(
        spark, declared, observed, expected_milli={"daily": 500}
    )
    assert got == {"daily": (1, 1, 500, 2000, 4000)}
