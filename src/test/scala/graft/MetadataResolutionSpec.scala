package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path

import graft.iceberg.{FsCommitter, TableMetadata}

/** Metadata-version resolution: the read path is hint-first (O(1) point
  * lookups), but COMMIT bases must resolve authoritatively — a newer
  * uuid-form metadata file committed by an external engine is invisible
  * to the hint probe, and building a commit on the hint-resolved version
  * silently drops the external commit (ADVICE r20, medium). */
class MetadataResolutionSpec extends SparkSpec {

  private def setProps(c: FsCommitter, kv: (String, String)*): Unit = {
    val m = new ObjectMapper()
    val upd = m.createObjectNode()
    upd.put("action", "set-properties")
    val u = upd.putObject("updates")
    kv.foreach { case (k, v) => u.put(k, v) }
    c.commit(Nil, Seq(upd))
  }

  test("a commit builds on a newer uuid-form version the hint cannot see") {
    val wh = Scratch.dir("meta-res-spec")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(wh).getFileSystem(conf)
    fs.delete(new Path(wh), true)
    spark.conf.set("spark.sql.catalog.mrs_cat",
      classOf[graft.iceberg.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mrs_cat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mrs_cat.ns")
    spark.sql("CREATE TABLE mrs_cat.ns.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO mrs_cat.ns.t VALUES (1, 'a')")
    val dir = s"$wh/ns/t"

    // simulate an EXTERNAL engine's commit: land it normally, then give
    // the file the foreign uuid-form name and roll the hint back — the
    // hint now lags and cannot name the true latest
    val beforeVersion = "v(\\d+)".r
      .findFirstMatchIn(TableMetadata.latestMetadataPath(dir, conf).getName)
      .get.group(1).toLong
    setProps(new FsCommitter(dir, conf), "ext.marker" -> "external")
    val extV = beforeVersion + 1
    val vPath = new Path(dir, s"metadata/v$extV.metadata.json")
    val uuidPath = new Path(dir,
      s"metadata/$extV-00000000-dead-beef-0000-000000000000.metadata.json")
    assert(fs.rename(vPath, uuidPath))
    val hint = new Path(dir, s"metadata/${TableMetadata.VersionHintFile}")
    val out = fs.create(hint, true)
    out.write(beforeVersion.toString.getBytes("UTF-8")); out.close()

    // read path: hint-lagged but CONSISTENT (the pre-external snapshot)
    assert(!TableMetadata.load(dir, conf).properties.contains("ext.marker"))

    // commit path: must base on the uuid-form latest — both the external
    // marker and the new one survive, and the new version is extV + 1
    setProps(new FsCommitter(dir, conf), "mine.marker" -> "local")
    val after = TableMetadata.load(dir, conf) // commit re-heals the hint
    assert(after.properties.get("ext.marker").contains("external"),
      "the external uuid-form commit was dropped")
    assert(after.properties.get("mine.marker").contains("local"))
    val latest = TableMetadata.latestMetadataPath(dir, conf).getName
    assert(latest == s"v${extV + 1}.metadata.json", latest)
    spark.sql("DROP TABLE mrs_cat.ns.t")
  }

  test("hintedTableExists refuses a bare hint with no metadata.json") {
    val wh = Scratch.dir("meta-res-spec2")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(wh).getFileSystem(conf)
    fs.delete(new Path(wh), true)
    val dir = s"$wh/ns/ghost"
    fs.mkdirs(new Path(dir, "metadata"))
    val out = fs.create(
      new Path(dir, s"metadata/${TableMetadata.VersionHintFile}"), true)
    out.write("3".getBytes("UTF-8")); out.close()
    assert(!TableMetadata.hintedTableExists(dir, conf))
    // with the hinted file present it answers true in two point lookups
    val md = fs.create(new Path(dir, "metadata/v3.metadata.json"), true)
    md.write("{}".getBytes("UTF-8")); md.close()
    assert(TableMetadata.hintedTableExists(dir, conf))
  }
}
