package graft

import graft.sources.Csv
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** CSV/TSV corpus interchange: byte-exact RFC 4180 round trips on
  * hostile strings (embedded delimiters, quotes, newlines), TSV and
  * header modes, schema-first malformed-row capture, range-sharded
  * layout, and the streaming landing-dir twin.
  */
class CsvSpec extends AnyFunSuite {
  import TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("csv_spec").toString

  private def rmrf(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
      .toSeq.reverse.foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("round trip is lossless on hostile strings; embedded newlines need multiLine") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "plain ascii"),
      (2L, "comma, inside, fields"),
      (3L, "quote \" and doubled \"\" quotes"),
      (4L, "newline\ninside a quoted field\r\nboth kinds"),
      (5L, "unicode café ☃ 😀"),
      (6L, "tab\tand trailing space "),
      (7L, "x" * 20000))
    val dir = tmpDir()
    try {
      Csv.writeShards(rows.toDF("doc_id", "text"), s"$dir/out", "doc_id", shards = 2)
      val back = Csv.read(s, s"$dir/out", schema, multiLine = true)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(back == rows.toMap, "round trip must be identity")
      val files = new java.io.File(s"$dir/out").listFiles.map(_.getName)
      assert(files.exists(_.endsWith(".csv.gz")), s"expected .csv.gz shards, got ${files.toList}")
    } finally rmrf(dir)
  }

  test("TSV delimiter and header modes round-trip") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, "has,commas"), (2L, "has\ttabs"))
    val dir = tmpDir()
    try {
      Csv.writeShards(rows.toDF("doc_id", "text"), s"$dir/tsv", "doc_id",
        shards = 1, delimiter = "\t", header = true)
      val back = Csv.read(s, s"$dir/tsv", schema, delimiter = "\t",
        header = true, multiLine = true)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(back == rows.toMap)
    } finally rmrf(dir)
  }

  test("schema-first read captures malformed rows instead of failing the job") {
    val s = spark
    val dir = tmpDir()
    try {
      val f = new java.io.File(dir, "part-0.csv")
      val w = new java.io.PrintWriter(f, "UTF-8")
      w.println("1,good")
      w.println("not_a_long,broken row")
      w.println("2,also good")
      w.close()
      val withCorrupt = StructType(schema.fields :+
        StructField("_corrupt_record", StringType))
      val rows = Csv.read(s, f.getAbsolutePath, withCorrupt).collect()
      assert(rows.length == 3)
      assert(rows.count(_.isNullAt(2)) == 2, "two clean rows")
      val bad = rows.filter(!_.isNullAt(2))
      assert(bad.length == 1 && bad.head.getString(2).contains("not_a_long"),
        "malformed row captured verbatim")
    } finally rmrf(dir)
  }

  test("streaming landing-dir twin sees exactly the batch rows") {
    val s = spark
    val dir = tmpDir()
    try {
      import s.implicits._
      // no embedded newlines in the streaming case: landing-dir shards
      // are line-oriented (multiLine is a batch-read option)
      val df = (0L until 40L).map(i => (i, s"line $i, with commas")).toDF("doc_id", "text")
      Csv.writeShards(df, s"$dir/land", "doc_id", shards = 2)
      val q = Csv.readStream(s, s"$dir/land", schema)
        .writeStream.format("memory").queryName("csv_stream_tbl")
        .option("checkpointLocation", s"$dir/ck").start()
      try {
        q.processAllAvailable()
        val got = s.table("csv_stream_tbl")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        val want = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got == want, "streamed rows must equal the batch export")
      } finally q.stop()
    } finally rmrf(dir)
  }
}
