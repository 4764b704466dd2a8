"""cdx_shard_plan (sources/cdx.py): equal-count contiguous SURT cuts —
balance to +/-1, boundary contiguity, tiny-input edges."""

from web_crawler_spark.sources.cdx import cdx_shard_plan


def _idx(spark, keys):
    rows = [(k, f"2024010100{i:04d}") for i, k in enumerate(keys)]
    return spark.createDataFrame(rows, "urlkey string, ts string")


def test_balanced_contiguous_cuts(spark):
    keys = [f"com,site{i:03d})/" for i in range(100)]
    out = cdx_shard_plan(_idx(spark, keys), n_shards=8).collect()
    assert [r["shard_id"] for r in out] == list(range(8))
    sizes = [r["n_rows"] for r in out]
    assert sum(sizes) == 100 and max(sizes) - min(sizes) <= 1
    # boundaries are contiguous and ordered: end[i] < start[i+1]
    for a, b in zip(out, out[1:]):
        assert a["end_urlkey"] < b["start_urlkey"]
    assert out[0]["start_urlkey"] == keys[0]
    assert out[-1]["end_urlkey"] == keys[-1]


def test_fewer_rows_than_shards(spark):
    out = cdx_shard_plan(_idx(spark, ["a)/", "b)/", "c)/"]), n_shards=8).collect()
    assert sum(r["n_rows"] for r in out) == 3
    assert all(r["n_rows"] == 1 for r in out)
    assert len(out) == 3  # empty shards simply absent


def test_empty_index(spark):
    assert cdx_shard_plan(_idx(spark, []), n_shards=4).count() == 0


def test_single_shard(spark):
    keys = [f"k{i})/" for i in range(5)]
    out = cdx_shard_plan(_idx(spark, keys), n_shards=1).collect()
    assert len(out) == 1 and out[0]["n_rows"] == 5
    assert out[0]["start_urlkey"] == "k0)/" and out[0]["end_urlkey"] == "k4)/"
