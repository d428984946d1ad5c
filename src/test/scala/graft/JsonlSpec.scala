package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** JSONL corpus interchange: byte-exact round trips on hostile strings,
  * contiguous range-sharded export layout, schema-first corrupt-line
  * capture, and the streaming landing-dir twin.
  */
class JsonlSpec extends AnyFunSuite {
  import TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("jsonl_spec").toString

  private def rmrf(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
      .toSeq.reverse.foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("round trip is lossless on hostile strings (escapes, unicode, empty, long)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "plain ascii"),
      (2L, "quotes \" and \\ backslash"),
      (3L, "newline\nand\ttab and \r carriage"),
      (4L, "unicode café ☃ 😀"), // incl. surrogate pair
      (5L, ""),
      (6L, "x" * 20000),
      (7L, "{\"looks\":\"like json\"}"))
    val dir = tmpDir()
    try {
      Jsonl.writeShards(rows.toDF("doc_id", "text"), s"$dir/out", "doc_id", shards = 2)
      val back = Jsonl.read(s, s"$dir/out", schema)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(back == rows.toMap, "round trip must be identity")
      // gzip actually applied
      val files = new java.io.File(s"$dir/out").listFiles.map(_.getName)
      assert(files.exists(_.endsWith(".json.gz")), s"expected .json.gz shards, got ${files.toList}")
    } finally rmrf(dir)
  }

  test("writeShards: shards are contiguous disjoint id ranges (range partitioning)") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    try {
      val df = (0L until 300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      Jsonl.writeShards(df, s"$dir/out", "doc_id", shards = 3)
      val shardFiles = new java.io.File(s"$dir/out").listFiles
        .filter(_.getName.endsWith(".json.gz")).sortBy(_.getName)
      assert(shardFiles.length == 3, s"expected 3 shards, got ${shardFiles.length}")
      val ranges = shardFiles.map { f =>
        val ids = Jsonl.read(s, f.getAbsolutePath, schema)
          .collect().map(_.getLong(0)).sorted
        (ids.head, ids.last, ids.length)
      }
      // each shard contiguous; shards pairwise disjoint and ordered
      ranges.foreach { case (lo, hi, n) =>
        assert(hi - lo + 1 == n, s"shard [$lo,$hi] not contiguous (n=$n)") }
      ranges.sliding(2).foreach { case Array((_, hi1, _), (lo2, _, _)) =>
        assert(lo2 > hi1, "shards must be disjoint ordered ranges")
      case _ => () }
      assert(ranges.map(_._3).sum == 300)
    } finally rmrf(dir)
  }

  test("schema-first read captures corrupt lines instead of failing the job") {
    val s = spark
    val dir = tmpDir()
    try {
      val f = new java.io.File(dir, "part-0.jsonl")
      val w = new java.io.PrintWriter(f, "UTF-8")
      w.println("""{"doc_id": 1, "text": "good"}""")
      w.println("""{"doc_id": oops not json""")
      w.println("""{"doc_id": 2, "text": "also good"}""")
      w.close()
      val withCorrupt = StructType(schema.fields :+
        StructField("_corrupt_record", StringType))
      val rows = Jsonl.read(s, f.getAbsolutePath, withCorrupt)
        .select(col("doc_id"), col("text"), col("_corrupt_record")).collect()
      assert(rows.length == 3)
      assert(rows.count(_.isNullAt(2)) == 2, "two clean rows")
      val bad = rows.filter(!_.isNullAt(2))
      assert(bad.length == 1 && bad.head.getString(2).contains("oops"),
        "corrupt line captured verbatim")
    } finally rmrf(dir)
  }

  test("streaming landing-dir twin sees exactly the batch rows") {
    val s = spark
    val dir = tmpDir()
    try {
      import s.implicits._
      val df = (0L until 50L).map(i => (i, s"line $i")).toDF("doc_id", "text")
      Jsonl.writeShards(df, s"$dir/land", "doc_id", shards = 2)
      val q = Jsonl.readStream(s, s"$dir/land", schema)
        .writeStream.format("memory").queryName("jsonl_stream_tbl")
        .option("checkpointLocation", s"$dir/ck").start()
      try {
        q.processAllAvailable()
        val got = s.table("jsonl_stream_tbl")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        val want = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got == want, "streamed rows must equal the batch export")
      } finally q.stop()
    } finally rmrf(dir)
  }
}
