package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-format sources beyond Parquet — the ingest edge of the engine.
  *
  * The reference's sources are REST JSON bodies (`job_discovery.py:9-19`)
  * and managed tables (`customer_assets.py:11`); a real corpus also
  * arrives as JSONL dumps and CSV exports. Rules, both enforced here:
  *
  *  - **Schemas are explicit.** `inferSchema`/sampled JSON inference is
  *    an extra full pass over the data before the real read — at 100 TB
  *    that doubles ingest cost. Callers must pass a `StructType`.
  *  - **Bad rows quarantine, not abort.** PERMISSIVE mode routes
  *    malformed rows to a corrupt-record column instead of failing the
  *    batch hours in (the reference's per-element try/except, T5, as a
  *    row-level contract). [[quarantine]] splits them off so the clean
  *    side keeps its schema and the dirty side keeps raw bytes for
  *    replay.
  */
object Formats {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, "string")

  /** JSON-lines read with explicit schema + corrupt capture. */
  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV read with explicit schema, header, + corrupt capture. */
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Split a PERMISSIVE read into (clean rows, quarantined raw rows).
    * Spark leaves parsed columns null and fills [[CorruptCol]] for bad
    * rows, so the predicate is a null check — no second parse.
    *
    * The parsed batch is cached first: Spark refuses a file scan whose
    * only referenced column is the corrupt-record column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and one
    * read feeding two consumers is the right ingest shape anyway. At
    * 100 TB the same split is `persist(DISK_ONLY)` or a write of the
    * parsed batch followed by two reads; callers own `unpersist()`. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val c = df.cache()
    val clean = c.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val dirty = c.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw"))
    (clean, dirty)
  }
}
