"""Epoch-snapshotted table catalog.

The production design is Iceberg (hidden partitioning on
``bucket(N, url_hash)`` + ``days(fetch_ts)``, snapshot-per-epoch commits,
O(1) resume from the last committed snapshot). This sandbox has no Iceberg
runtime JAR, so the same contract is implemented over parquet directories:

    <root>/<table>/epoch=K/part-*.parquet     (hive-partitioned data)
    <root>/<table>/_manifest.json             (committed epochs + lineage)

Commit protocol: write epoch dir → fsync manifest with the epoch appended.
A killed run leaves either no dir or an uncommitted dir that the next run
overwrites — reads go through the manifest, so uncommitted data is
invisible (same reader-isolation guarantee an Iceberg snapshot gives).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class EpochCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_manifest.json")

    def manifest(self, table: str) -> dict:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return {"table": table, "epochs": [], "lineage": {}}
        with open(path) as f:
            return json.load(f)

    def committed_epochs(self, table: str) -> list[int]:
        return sorted(self.manifest(table)["epochs"])

    def last_epoch(self, table: str) -> int | None:
        epochs = self.committed_epochs(table)
        return epochs[-1] if epochs else None

    # -- write path ---------------------------------------------------------
    def commit_epoch(
        self, table: str, epoch: int, df: DataFrame, lineage: dict | None = None
    ) -> None:
        """Write epoch data, then commit it into the manifest (atomic rename)."""
        tdir = os.path.join(self.root, table)
        edir = os.path.join(tdir, f"epoch={epoch}")
        if os.path.exists(edir):  # uncommitted leftovers from a killed run
            if epoch in self.manifest(table)["epochs"]:
                return  # already committed — idempotent resume
            shutil.rmtree(edir)
        df.write.mode("overwrite").parquet(edir)
        m = self.manifest(table)
        m["epochs"] = sorted(set(m["epochs"]) | {epoch})
        if lineage:
            m["lineage"][str(epoch)] = lineage
        tmp = self._manifest_path(table) + ".tmp"
        os.makedirs(tdir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path(table))

    # -- read path ----------------------------------------------------------
    def read(
        self, spark: SparkSession, table: str, upto_epoch: int | None = None
    ) -> DataFrame | None:
        """Union of committed epochs (≤ upto_epoch), epoch column attached."""
        epochs = self.committed_epochs(table)
        if upto_epoch is not None:
            epochs = [e for e in epochs if e <= upto_epoch]
        if not epochs:
            return None
        paths = [os.path.join(self.root, table, f"epoch={e}") for e in epochs]
        df = spark.read.option("basePath", os.path.join(self.root, table)).parquet(*paths)
        return df.withColumn("epoch", F.col("epoch").cast("int"))
