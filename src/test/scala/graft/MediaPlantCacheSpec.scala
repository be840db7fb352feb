package graft

import org.apache.spark.sql.functions._

import graft.queries.MediaPlantCache

/** Pins for the media-plant parquet cache (r12 judge directive #4):
  * build-once semantics, payload fidelity (incl. NULL binaries — the
  * census's "missing" row rides this), stale-fingerprint cleanup, and
  * the fingerprint's shape. The correctness of the CONTENT served from
  * the cache is separately gated by q108–q112's DuckDB oracles. */
class MediaPlantCacheSpec extends SparkSuite
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private def freshName(): String =
    s"spec_plant_${System.nanoTime()}"

  // drop every spec_plant_* dir this suite created (cache dirs are
  // per-name, so repeated test runs would otherwise accrete)
  override def afterAll(): Unit = {
    try {
      val wh = java.nio.file.Paths.get(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
        .resolve("media_plant")
      if (java.nio.file.Files.isDirectory(wh)) {
        import scala.jdk.CollectionConverters._
        val ls = java.nio.file.Files.list(wh)
        try ls.iterator().asScala
          .filter(_.getFileName.toString.startsWith("spec_plant_"))
          .toSeq.foreach(deleteRec)
        finally ls.close()
      }
    } finally super.afterAll()
  }

  private def deleteRec(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(p)) {
      val ls = java.nio.file.Files.list(p)
      try ls.iterator().asScala.toSeq.foreach(deleteRec)
      finally ls.close()
    }
    java.nio.file.Files.deleteIfExists(p)
    ()
  }

  test("builds once, then serves reads without re-evaluating the plant") {
    val name = freshName()
    var builds = 0
    def build = {
      builds += 1
      (1L to 40L).map(i => (i, s"p$i".getBytes("UTF-8")))
        .toDF("media_id", "payload")
    }
    val a = MediaPlantCache.cached(spark, "/tmp/sfA", name)(build)
    assert(a.count() === 40)
    assert(builds === 1)
    val b = MediaPlantCache.cached(spark, "/tmp/sfA", name)(build)
    assert(b.count() === 40)
    assert(builds === 1, "second call must serve the parquet, not rebuild")
    // same gate, different sf: separate cache, fresh build
    val c = MediaPlantCache.cached(spark, "/tmp/sfB", name)(build)
    assert(c.count() === 40)
    assert(builds === 2)
  }

  test("payloads roundtrip bit-exactly through the cache, including " +
      "NULL binaries (the census 'missing' row)") {
    val name = freshName()
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, Array[Byte](0, 1, -1, 127, -128)),
      (2L, Array.emptyByteArray),
      (3L, null))
    val got = MediaPlantCache.cached(spark, "/tmp/sfA", name) {
      rows.toDF("media_id", "payload")
    }.orderBy("media_id").as[(Long, Array[Byte])].collect()
    assert(got.length === 3)
    assert(java.util.Arrays.equals(got(0)._2, rows(0)._2))
    assert(got(1)._2.length === 0)
    assert(got(2)._2 === null)
  }

  test("stale fingerprints of the same (gate, sf) are deleted on " +
      "rebuild; other gates' caches are untouched") {
    val name = freshName()
    val wh = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
      .resolve("media_plant")
    java.nio.file.Files.createDirectories(wh)
    val sfTag = "tmp_sfA" // matches the sanitizer on "/tmp/sfA"
    val stale = wh.resolve(s"${name}_${sfTag}_deadbeefdeadbeef")
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.writeString(stale.resolve("junk"), "old plant")
    val other = wh.resolve(s"${name}X_${sfTag}_deadbeefdeadbeef")
    java.nio.file.Files.createDirectories(other)
    MediaPlantCache.cached(spark, "/tmp/sfA", name) {
      Seq((1L, "x")).toDF("media_id", "s")
    }.count()
    assert(!java.nio.file.Files.exists(stale),
      "older-code plant of the same gate+sf must be cleaned up")
    assert(java.nio.file.Files.exists(other),
      "a DIFFERENT gate's cache must survive")
    val live = wh.resolve(
      s"${name}_${sfTag}_${MediaPlantCache.codeFingerprint}")
    assert(java.nio.file.Files.exists(live.resolve("_SUCCESS")))
  }

  test("the code fingerprint is 16 hex chars and stable within a JVM") {
    val fp = MediaPlantCache.codeFingerprint
    assert(fp.matches("[0-9a-f]{16}"), fp)
    assert(MediaPlantCache.codeFingerprint === fp)
  }

  test("reads re-spread to session parallelism (the unsplittable-file " +
      "rule from Tables.parallel)") {
    val name = freshName()
    val df = MediaPlantCache.cached(spark, "/tmp/sfA", name) {
      spark.range(1000).toDF("media_id").coalesce(1)
    }
    assert(df.rdd.getNumPartitions >=
      math.min(spark.sparkContext.defaultParallelism, 8))
  }
}
