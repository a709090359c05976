package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Catalog discovery — SURVEY.md §2.1 S1-S5.
  *
  * The reference walks `SHOW CATALOGS/SCHEMAS/TABLES` and
  * `information_schema.{tables,columns}` (`table_discovery.py:16-43`,
  * `dlt_assets.py:87-91,159-166`) issuing one query per level / per table
  * (N+1). Here discovery is metadata-only — table names from the directory
  * layout and column schemas from Parquet footers — and the result is a
  * pair of DataFrames (`tables`, `columns`) the rest of the engine joins
  * against, so any "per-table" lookup is a broadcast join, never N+1.
  *
  * 100 TB design: footer reads are driver-side and O(#tables), not O(data).
  * On a real lakehouse this becomes `spark.catalog.listTables` + catalog
  * RPCs; the downstream shape (joinable metadata DataFrames) is unchanged.
  */
object Discovery {

  /** P2 skip-list config — the engine analog of the reference's
    * `EXCLUDED_CATALOGS` / `EXCLUDED_SCHEMAS` (`dlt_assets.py:28-31`):
    * system and scratch namespaces a metastore walk returns but the
    * observation plane must never monitor. Matched case-insensitively
    * (lower() + isin), like the reference's `.lower() in EXCLUDED`. */
  val excludedCatalogs: Seq[String] = Seq("system", "samples")
  val excludedSchemas: Seq[String] = Seq("information_schema", "tmp", "scratch")

  /** The RAW discovery walk (S1-S3): the real directory listing for
    * schema `main`, plus the system/scratch entries any real metastore
    * walk also returns (deterministic fixture shadows, mixed-case to
    * exercise the case-insensitive match). [[tablesMeta]] is this
    * relation AFTER the P2 exclusion filter. */
  def tableCandidates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cat = dir.replaceAll(".*/", "")
    val main = Tables.discover(dir)
      .map(n => (cat, "main", n, "managed", "parquet"))
    val system = Seq(
      (cat, "INFORMATION_SCHEMA", "tables", "system", "parquet"),
      (cat, "Tmp", "scratch_join_result", "managed", "parquet"),
      ("System", "main", "audit_log", "system", "parquet"))
    (main ++ system)
      .toDF("table_catalog", "table_schema", "table_name", "table_type",
        "data_source_format")
  }

  /** `tables` metadata relation (S1-S4 collapsed) — table names come
    * from a real directory listing ([[Tables.discover]]), so a new
    * parquet file in the warehouse dir is discovered, not declared;
    * system/scratch namespaces are dropped by the P2 skip-list. */
  def tablesMeta(s: SparkSession, dir: String): DataFrame =
    tableCandidates(s, dir)
      .filter(!lower(col("table_schema")).isin(excludedSchemas: _*) &&
        !lower(col("table_catalog")).isin(excludedCatalogs: _*))

  /** `columns` metadata relation (S5 collapsed): one row per column,
    * schema read from the Parquet footer — no data scan. */
  def columnsMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.discover(dir).flatMap { n =>
      Tables.load(s, dir, n).schema.fields.zipWithIndex.map {
        // Normalize NTZ: fixture timestamps are naive (isAdjustedToUTC=false,
        // Spark reads TIMESTAMP_NTZ); the engine treats both as 'timestamp'.
        case (f, i) =>
          val dt = f.dataType.simpleString match {
            case "timestamp_ntz" => "timestamp"
            case other => other
          }
          (n, f.name, dt, i + 1)
      }
    }.toDF("table_name", "column_name", "data_type", "ordinal")
  }

  /** Engine-discovered schema snapshot, ordered for the oracle. The
    * DuckDB oracle is the *documented* fixture schema (FIXTURES.md) as a
    * literal VALUES list — i.e. this query verifies that what the engine
    * discovers from footers equals the published schema contract. */
  def schemaCatalog(s: SparkSession, dir: String): DataFrame =
    columnsMeta(s, dir).orderBy(col("table_name"), col("ordinal"))

  /** S4 six-col information_schema.tables projection (catalog column is
    * sf-dir-dependent, so the oracle-checked projection exposes the
    * stable columns; J1: the comments side is a 3-key left-outer
    * broadcast join, the reference's table_info_map probe
    * (`dlt_assets.py:92-110`) with its `{}` default (P9 coalesce). */
  def tablesWithComments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val comments = Seq(
      ("main", "lineitem", "managed", "order line items"),
      ("main", "orders", "managed", "customer orders"),
      ("main", "events", "managed", "update event feed"))
      .toDF("table_schema", "table_name", "table_type", "comment")
    tablesMeta(s, dir)
      .join(broadcast(comments),
        Seq("table_schema", "table_name", "table_type"), "left_outer")
      .select(
        col("table_schema"), col("table_name"), col("table_type"),
        col("data_source_format"),
        coalesce(col("comment"), lit("(none)")).as("comment"))
      .orderBy(col("table_name"))
  }

  /** q87: the post-exclusion discovery plane. The CANDIDATE input
    * includes system/scratch entries (`INFORMATION_SCHEMA`, `Tmp`, a
    * `System`-catalog table); the oracle is the literal main-schema
    * list, so a skip-list regression (or a case-sensitivity bug)
    * surfaces as extra rows. */
  def discoveryExclusions(s: SparkSession, dir: String): DataFrame =
    tablesMeta(s, dir)
      .select(col("table_schema"), col("table_name"), col("table_type"))
      .orderBy(col("table_name"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_schema_catalog" -> schemaCatalog,
    "q47_tables_meta" -> tablesWithComments,
    "q87_discovery_exclusions" -> discoveryExclusions,
  )

  val oracles: Map[String, String] = Map(
    "q87_discovery_exclusions" ->
      """SELECT table_schema, table_name, table_type FROM (VALUES
        |  ('main','customer','managed'),('main','documents','managed'),
        |  ('main','embeddings','managed'),('main','events','managed'),
        |  ('main','lineitem','managed'),('main','nation','managed'),
        |  ('main','orders','managed'),('main','part','managed'),
        |  ('main','region','managed'),('main','supplier','managed')
        |) AS t(table_schema, table_name, table_type)
        |ORDER BY table_name""".stripMargin,
    "q47_tables_meta" ->
      """SELECT table_schema, table_name, table_type, data_source_format,
        |  coalesce(comment, '(none)') AS comment
        |FROM (VALUES
        |  ('main','customer','managed','parquet'),('main','documents','managed','parquet'),
        |  ('main','embeddings','managed','parquet'),('main','events','managed','parquet'),
        |  ('main','lineitem','managed','parquet'),('main','nation','managed','parquet'),
        |  ('main','orders','managed','parquet'),('main','part','managed','parquet'),
        |  ('main','region','managed','parquet'),('main','supplier','managed','parquet')
        |) AS t(table_schema, table_name, table_type, data_source_format)
        |LEFT JOIN (VALUES
        |  ('lineitem', 'order line items'), ('orders', 'customer orders'),
        |  ('events', 'update event feed')) AS c(cn, comment)
        |ON table_name = cn
        |ORDER BY table_name""".stripMargin,
    "q24_schema_catalog" ->
      """SELECT table_name, column_name, data_type, ordinal FROM (VALUES
        | ('region','r_regionkey','int',1),('region','r_name','string',2),
        | ('nation','n_nationkey','int',1),('nation','n_name','string',2),
        | ('nation','n_regionkey','int',3),
        | ('customer','c_custkey','bigint',1),('customer','c_name','string',2),
        | ('customer','c_nationkey','int',3),('customer','c_acctbal','double',4),
        | ('customer','c_mktsegment','string',5),
        | ('supplier','s_suppkey','bigint',1),('supplier','s_name','string',2),
        | ('supplier','s_nationkey','int',3),('supplier','s_acctbal','double',4),
        | ('part','p_partkey','bigint',1),('part','p_name','string',2),
        | ('part','p_brand','string',3),('part','p_type','string',4),
        | ('part','p_size','int',5),('part','p_retailprice','double',6),
        | ('orders','o_orderkey','bigint',1),('orders','o_custkey','bigint',2),
        | ('orders','o_orderstatus','string',3),('orders','o_totalprice','double',4),
        | ('orders','o_orderdate','timestamp',5),('orders','o_orderpriority','string',6),
        | ('lineitem','l_orderkey','bigint',1),('lineitem','l_partkey','bigint',2),
        | ('lineitem','l_suppkey','bigint',3),('lineitem','l_linenumber','int',4),
        | ('lineitem','l_quantity','double',5),('lineitem','l_extendedprice','double',6),
        | ('lineitem','l_discount','double',7),('lineitem','l_tax','double',8),
        | ('lineitem','l_returnflag','string',9),('lineitem','l_linestatus','string',10),
        | ('lineitem','l_shipdate','timestamp',11),
        | ('events','event_id','bigint',1),('events','ts','timestamp',2),
        | ('events','user_id','bigint',3),('events','event_type','string',4),
        | ('events','value','double',5),('events','props','string',6),
        | ('documents','doc_id','bigint',1),('documents','text','string',2),
        | ('documents','lang','string',3),('documents','source','string',4),
        | ('documents','n_chars','bigint',5),
        | ('embeddings','vec_id','bigint',1),('embeddings','embedding','array<float>',2),
        | ('embeddings','label','int',3)
        |) AS t(table_name, column_name, data_type, ordinal)
        |ORDER BY table_name, ordinal""".stripMargin,
  )
}
