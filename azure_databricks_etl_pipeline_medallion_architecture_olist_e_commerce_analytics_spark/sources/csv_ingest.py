"""Incremental CSV ingestion — the engine's Auto Loader replacement (S1–S3).

The reference lands nine CSV datasets with Databricks Auto Loader
(/root/reference/scripts/bronze/bronze_ingestion.py:20-32): incremental file
discovery, header + delimiter + whitespace-trim options, schema inference
with a persisted schema location (``cloudFiles.schemaLocation``,
``cloudFiles.inferColumnTypes``), and malformed rows rescued into a
``_rescued_data`` column that every silver script later drops
(/root/reference/scripts/silver/Silver_orders.py:26).

Open-source mapping (SURVEY.md §1.4, §3.3):

- **Schema inference, persisted**: first run infers from the files present
  (``inferSchema=True``) and pins the result as a DDL string in
  ``<state_dir>/schema.ddl`` — infer-once-then-pin, matching
  ``cloudFiles.schemaLocation`` v1 behavior.
- **Rescued data**: the pinned schema gets a trailing ``_rescued_data
  STRING`` field and files are read ``mode=PERMISSIVE`` with
  ``columnNameOfCorruptRecord=_rescued_data`` — rows that do not fit the
  pinned schema arrive whole in that column, rest NULL.
- **Incremental discovery**: processed file paths are recorded in
  ``<state_dir>/ledger.json``; each ``ingest`` call reads only unseen files
  (Auto Loader's checkpoint-backed file tracking).

Scale notes: the *listing* is driver-side (exactly as Auto Loader's directory
listing mode is), but the listing is file names only — O(files), not O(rows).
The *read* is a distributed ``spark.read.csv`` over the new files; Spark
splits large CSVs by ``spark.sql.files.maxPartitionBytes`` so a 100 GB drop
of new files fans out across the cluster. No data ever passes through the
driver.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESCUED_COL = "_rescued_data"

#: Reader options mirroring the reference's Auto Loader options
#: (bronze_ingestion.py:22-31): header, ',' delimiter, whitespace trim.
CSV_OPTIONS = {
    "header": "true",
    "delimiter": ",",
    "ignoreLeadingWhiteSpace": "true",
    "ignoreTrailingWhiteSpace": "true",
}


@dataclass
class IngestResult:
    df: DataFrame | None  # new rows this run (None when no new files)
    new_files: list[str]
    total_seen: int


class CsvIngestor:
    """Incremental CSV reader for one dataset directory.

    ``state_dir`` plays the role of Auto Loader's ``schemaLocation`` +
    checkpoint: it holds the pinned schema and the processed-file ledger.
    """

    def __init__(self, source_dir: str, state_dir: str):
        self.source_dir = source_dir
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    # --- state files ---------------------------------------------------
    @property
    def _schema_path(self) -> str:
        return os.path.join(self.state_dir, "schema.ddl")

    @property
    def _ledger_path(self) -> str:
        return os.path.join(self.state_dir, "ledger.json")

    def _load_ledger(self) -> set[str]:
        if os.path.exists(self._ledger_path):
            with open(self._ledger_path) as f:
                return set(json.load(f))
        return set()

    def _save_ledger(self, seen: set[str]) -> None:
        tmp = self._ledger_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(seen), f)
        os.replace(tmp, self._ledger_path)

    # --- schema --------------------------------------------------------
    def _pinned_schema(self, spark: SparkSession, files: list[str]) -> T.StructType:
        """Pinned dataset schema; inferred from ``files`` on first contact.

        Matches ``cloudFiles.inferColumnTypes=true`` +
        ``cloudFiles.schemaLocation`` (bronze_ingestion.py:25,29-30): infer
        once, persist, reuse — later files with extra/renamed columns do not
        silently change the schema; their rows surface in ``_rescued_data``.
        """
        if os.path.exists(self._schema_path):
            with open(self._schema_path) as f:
                return T._parse_datatype_string(f.read())
        inferred = (
            spark.read.options(**CSV_OPTIONS)
            .option("inferSchema", "true")
            .csv(files)
            .schema
        )
        with open(self._schema_path, "w") as f:
            f.write(inferred.simpleString())
        return inferred

    # --- discovery + read ----------------------------------------------
    def _list_files(self) -> list[str]:
        return sorted(
            os.path.join(self.source_dir, n)
            for n in os.listdir(self.source_dir)
            if n.endswith(".csv") and not n.startswith(".")
        )

    def ingest(self, spark: SparkSession) -> IngestResult:
        """Read rows from files not yet in the ledger; advance the ledger."""
        seen = self._load_ledger()
        new = [p for p in self._list_files() if p not in seen]
        if not new:
            return IngestResult(df=None, new_files=[], total_seen=len(seen))
        schema = self._pinned_schema(spark, new)
        read_schema = T.StructType(
            [f for f in schema.fields if f.name != RESCUED_COL]
            + [T.StructField(RESCUED_COL, T.StringType())]
        )
        df = (
            spark.read.options(**CSV_OPTIONS)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", RESCUED_COL)
            .schema(read_schema)
            .csv(new)
        )
        seen.update(new)
        self._save_ledger(seen)
        return IngestResult(df=df, new_files=new, total_seen=len(seen))


def ingest_csv_append(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    target_path: str,
) -> int:
    """One bronze-ingestion run: new CSV rows appended to a parquet table.

    The batch-incremental analogue of one ``availableNow`` microbatch of the
    reference's bronze streaming tables (bronze_ingestion.py:35-49). Returns
    the number of files ingested this run.
    """
    result = CsvIngestor(source_dir, state_dir).ingest(spark)
    if result.df is None:
        return 0
    (
        result.df.withColumn("_ingested_at", F.current_timestamp())
        .write.mode("append")
        .parquet(target_path)
    )
    return len(result.new_files)
