package graft

import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.sources.Formats

/** File-format ingest edge: explicit-schema JSONL/CSV reads with
  * quarantine routing (T5 as a row-level contract) — no schema
  * inference pass, bad rows never abort the batch. */
class SourcesSpec extends SparkSuite {

  private val schema = StructType.fromDDL("job_id BIGINT, name STRING")

  private def tmpWrite(ext: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory(s"graft-src-$ext").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, s"data.$ext")
    Files.write(f.toPath, String.join("\n", lines: _*).getBytes)
    f.getAbsolutePath
  }

  test("jsonl: clean rows parse, corrupt rows quarantine with raw bytes") {
    val path = tmpWrite("jsonl", Seq(
      """{"job_id": 1, "name": "a"}""",
      """{"job_id": 2, "name": "b"}""",
      """{broken""",
      """{"job_id": 4, "name": "d"}"""))
    val (clean, dirty) = Formats.quarantine(
      Formats.readJsonl(spark, path, schema))
    assert(clean.columns.toSeq === Seq("job_id", "name"))
    assert(clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (2L, "b"), (4L, "d")))
    assert(dirty.collect().map(_.getString(0)).toSeq === Seq("{broken"))
  }

  test("csv: type-mismatched row quarantines, schema is not inferred") {
    val path = tmpWrite("csv", Seq(
      "job_id,name",
      "1,a",
      "oops,b",
      "3,c"))
    val df = Formats.readCsv(spark, path, schema)
    assert(df.schema("job_id").dataType.typeName === "long") // explicit, not inferred
    val (clean, dirty) = Formats.quarantine(df)
    assert(clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (3L, "c")))
    assert(dirty.collect().map(_.getString(0)).toSeq === Seq("oops,b"))
  }

  test("readers tolerate a fully-clean file (empty quarantine side)") {
    val path = tmpWrite("jsonl", Seq("""{"job_id": 7, "name": "x"}"""))
    val (clean, dirty) = Formats.quarantine(
      Formats.readJsonl(spark, path, schema))
    assert(clean.count() === 1L)
    assert(dirty.isEmpty)
  }
}
