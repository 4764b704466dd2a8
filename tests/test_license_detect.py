"""license_detect (functions/text.py): family hits, priority order, SPDX
id extraction, clean text."""

from pyspark.sql import functions as F

from web_crawler_spark.functions import text as T


def _row(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(*T.license_detect(F.col("t"))).collect()[0]


def test_spdx_beats_prose_and_extracts_id(spark):
    r = _row(spark, "SPDX-License-Identifier: Apache-2.0\n"
                    "Apache License, Version 2.0")
    assert r["license_class"] == "spdx"
    assert r["spdx_id"] == "Apache-2.0"
    assert r["n_spdx"] == 1 and r["n_apache_2_0"] == 1


def test_prose_families(spark):
    assert _row(spark, "Permission is hereby granted, free of charge"
                )["license_class"] == "mit"
    assert _row(spark, "…GNU General Public License…"
                )["license_class"] == "gpl"
    assert _row(spark, "Redistribution and use in source and binary forms"
                )["license_class"] == "bsd"
    assert _row(spark, "Licensed under CC BY 4.0")["license_class"] == "cc-by"
    assert _row(spark, "released into the public domain"
                )["license_class"] == "public-domain"


def test_clean_text_null(spark):
    r = _row(spark, "a perfectly ordinary paragraph about ducks")
    assert r["license_class"] is None and r["spdx_id"] is None
    assert r["n_mit"] == 0 and r["n_gpl"] == 0


def test_apache_version_proximity(spark):
    # 'Apache License' far from any 'Version 2.0' must not match
    far = "Apache License " + "x" * 100 + " Version 2.0"
    assert _row(spark, far)["n_apache_2_0"] == 0


def test_apache_canonical_license_header_multiline(spark):
    # The canonical LICENSE file puts the two phrases on separate lines —
    # the pattern must span the newline ([\s\S], not DOTALL-less '.').
    hdr = ("                 Apache License\n"
           "           Version 2.0, January 2004\n"
           "        http://www.apache.org/licenses/\n")
    r = _row(spark, hdr)
    assert r["n_apache_2_0"] == 1
    assert r["license_class"] == "apache-2.0"
