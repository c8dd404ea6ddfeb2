package graft

import java.io.File

import graft.iceberg.{IcebergTable, IcebergWriter}
import graft.iceberg.connector.GraftCatalog

/** Schema evolution (column RENAME) via parquet field-id resolution:
  * Iceberg renames keep the field id, so old data files must be read by
  * id, not name. The table schema carries `parquet.field.id` metadata
  * (from the Iceberg field ids) and the writer stamps ids into data
  * files; Spark's parquet reader then resolves id-bearing schemas by id
  * — name-matching would silently read nulls for renamed columns.
  */
class SchemaEvolutionSpec extends SparkSpec {

  private val warehouse = "/root/repo/target/test-evolve-warehouse"
  private val dir = s"$warehouse/ns/evt"

  /** v1: schema (id BIGINT, v BIGINT); one append. v2: `v` RENAMED to
    * `score` (same field id 2). */
  private lazy val evolved: Unit = {
    import org.apache.commons.io.FileUtils
    import spark.implicits._
    FileUtils.deleteQuietly(new File(warehouse))
    val df = Seq((1L, 100L), (2L, 200L)).toDF("id", "v")
    val metaJson = graft.iceberg.connector.IcebergJson.tableMetadata(
      new com.fasterxml.jackson.databind.ObjectMapper(), dir,
      df.schema, Nil, Map.empty)
    new File(s"$dir/metadata").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"), metaJson)
    IcebergWriter.append(spark, dir, df)
    // commit the rename: same field id, new name
    val v2 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/metadata/v2.metadata.json"))
      .replace("\"name\" : \"v\"", "\"name\" : \"score\"")
    assert(v2.contains("score"), "rename must have applied to the metadata text")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/metadata/v3.metadata.json"), v2)
  }

  test("renamed column reads old files by field id (direct toDF + conf)") {
    evolved
    // the raw toDF path reads through spark.read, whose field-id
    // resolution is session-conf driven (the catalog scan path below
    // needs no conf — it scopes the setting to its own hadoopConf)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    try {
      val t = IcebergTable(spark, dir)
      assert(t.metadata.schema.fieldNames.toSeq == Seq("id", "score"))
      val rows = t.toDF(spark).select("id", "score")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows == Map(1L -> 100L, 2L -> 200L),
        "values written under the old name must surface under the new one")
    } finally spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
  }

  test("renamed column resolves through the catalog scan path too") {
    evolved
    spark.conf.set("spark.sql.catalog.evo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evo.warehouse", warehouse)
    val rows = spark.sql("SELECT id, score FROM evo.ns.evt ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 100L, 2L -> 200L))
    // and a filter on the renamed column still answers correctly
    assert(spark.sql("SELECT COUNT(*) FROM evo.ns.evt WHERE score > 150")
      .collect()(0).getLong(0) == 1L)
  }

  test("id-less files read through schema.name-mapping.default after a rename") {
    import org.apache.commons.io.FileUtils
    import spark.implicits._
    val dir = s"$warehouse/ns/nomap"
    FileUtils.deleteQuietly(new File(dir))
    // an EXTERNALLY-written parquet file: plain Spark write, no
    // parquet.field.id metadata, columns named (id, v)
    val plain = Seq((1L, 100L), (2L, 200L)).toDF("id", "v")
    plain.coalesce(1).write.parquet(s"$dir/data/import")
    val dataFile = new File(s"$dir/data/import").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    // table metadata: current schema has `v` RENAMED to `score` (field
    // id 2), and the name mapping records that id-less files call it
    // `v` — the spec's migration shape (files imported from Hive/plain
    // parquet, then evolved)
    val mapping =
      """[{"field-id": 1, "names": ["id"]}, {"field-id": 2, "names": ["v"]}]"""
    val metaJson = graft.iceberg.connector.IcebergJson.tableMetadata(
      new com.fasterxml.jackson.databind.ObjectMapper(), dir,
      plain.schema, Nil, Map("schema.name-mapping.default" -> mapping))
      .replace("\"name\" : \"v\"", "\"name\" : \"score\"")
    new File(s"$dir/metadata").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"), metaJson)
    // register the imported file as a snapshot (metadata-only add)
    graft.iceberg.IcebergWriter.addFiles(spark, dir,
      Seq(dataFile.getAbsolutePath))
    // without the mapping this read would null `score` (no field ids to
    // resolve by) — the mapping aliases v -> score projection-only
    spark.conf.set("spark.sql.catalog.evo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evo.warehouse", warehouse)
    val rows = spark.sql("SELECT id, score FROM evo.ns.nomap ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 100L, 2L -> 200L),
      "mapped columns must carry the imported file's values, not nulls")
    // direct toDF path honors the mapping too
    val t = IcebergTable(spark, dir)
    assert(t.toDF(spark).select("score").collect().map(_.getLong(0)).toSet
      == Set(100L, 200L))
  }
}
