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


def test_content_flapping_regimes(spark):
    rows = (
        [("stable", e, "A") for e in range(4)]
        + [("evolve", e, f"v{e}") for e in range(4)]
        + [("flap", 0, "A"), ("flap", 1, "B"), ("flap", 2, "A"),
           ("flap", 3, "B")]
        # returns to an OLD state after two new ones: still flapping
        + [("drift_back", 0, "A"), ("drift_back", 1, "B"),
           ("drift_back", 2, "C"), ("drift_back", 3, "A")]
        # two fetches, two states: a single transition is not flapping
        + [("pair", 0, "A"), ("pair", 1, "B")]
    )
    df = spark.createDataFrame(rows, "url string, epoch long, payload_digest string")
    got = {
        r.url: (r.n_fetches, r.n_distinct_payloads, r.n_transitions,
                r.wasted_fetches)
        for r in SN.content_flapping(df).collect()
    }
    assert got == {
        "flap": (4, 2, 3, 2),
        "drift_back": (4, 3, 3, 1),
    }
