package graft

import graft.sources.TfRecord
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TFRecord framing pinned against the PUBLIC format: the CRC32C
  * check value from the Castagnoli spec, masked per TensorFlow's rule;
  * round trips through bytes, shards (raw + gzip) and the streaming
  * landing-dir twin; totality on corruption and truncation.
  */
class TfRecordSpec extends AnyFunSuite {
  import TestSpark.spark

  private def rmrf(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
      .toSeq.reverse.foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("masked CRC32C matches the published Castagnoli check value") {
    // RFC 3720 / Castagnoli check: CRC32C("123456789") = 0xE3069283
    val crc = 0xE3069283
    val wantMasked = ((crc >>> 15) | (crc << 17)) + 0xa282ead8
    val got = TfRecord.maskedCrc("123456789".getBytes("US-ASCII"), 0, 9)
    assert(got == wantMasked,
      f"maskedCrc=0x$got%08x want 0x$wantMasked%08x (from check value 0xE3069283)")
  }

  test("byte-level round trip incl. empty payload; frame layout is the spec's") {
    val payloads = Seq("hello".getBytes, Array.emptyByteArray, Array[Byte](0, -1, 127))
    val blob = payloads.map(TfRecord.recordBytes).reduce(_ ++ _)
    val back = TfRecord.parseRecords(blob)
    assert(back.map(_.toSeq) == payloads.map(_.toSeq))
    // layout: little-endian length at offset 0
    val first = TfRecord.recordBytes("hello".getBytes)
    assert(first.length == 8 + 4 + 5 + 4)
    assert(first(0) == 5 && (1 until 8).forall(first(_) == 0), "LE uint64 length")
  }

  test("corruption and truncation are total: clean prefix survives, walk stops") {
    val payloads = Seq("aaaa", "bbbb", "cccc").map(_.getBytes)
    val blob = payloads.map(TfRecord.recordBytes).reduce(_ ++ _)
    // flip one byte inside record 2's payload
    val corrupt = blob.clone()
    corrupt(21 + 12) = (corrupt(21 + 12) ^ 0x7f).toByte // record1 is 20 bytes; 21+12 is in record2 data
    val got = TfRecord.parseRecords(corrupt)
    assert(got.length == 1 && got.head.sameElements(payloads.head),
      s"data-CRC mismatch must keep only the clean prefix, got ${got.length}")
    // truncation mid-record
    val trunc = TfRecord.parseRecords(blob.take(blob.length - 3))
    assert(trunc.length == 2)
    // garbage
    assert(TfRecord.parseRecords("not a tfrecord at all".getBytes).isEmpty)
    assert(TfRecord.parseRecords(null).isEmpty)
  }

  test("shard export + readFiles round trip, raw and gzip") {
    val s = spark
    import s.implicits._
    val docs = (0 until 40).map(i => (i.toLong, s"document body $i é"))
    val framed = docs.toDF("doc_id", "text")
      .select(TfRecord.frame(encode(col("text"), "UTF-8")).as("rec"))
    for (gz <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory("tfrec").toString
      try {
        val paths = TfRecord.writeShards(framed.repartition(3), "rec", s"$dir/out", gzip = gz)
        assert(paths.length == 3 && paths.forall(_.endsWith(
          if (gz) ".tfrecord.gz" else ".tfrecord")))
        val back = TfRecord.readFiles(s, s"$dir/out")
          .select(decode(col("payload"), "UTF-8").as("t"))
          .collect().map(_.getString(0)).sorted
        assert(back.toSeq == docs.map(_._2).sorted, s"gzip=$gz round trip")
      } finally rmrf(dir)
    }
  }

  test("streaming landing-dir twin sees exactly the batch payloads") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec_stream").toString
    try {
      val docs = (0 until 30).map(i => (i.toLong, s"line $i"))
      val framed = docs.toDF("doc_id", "text")
        .select(TfRecord.frame(encode(col("text"), "UTF-8")).as("rec"))
      TfRecord.writeShards(framed.repartition(2), "rec", s"$dir/land")
      val q = TfRecord.readStreamFiles(s, s"$dir/land")
        .select(decode(col("payload"), "UTF-8").as("t"))
        .writeStream.format("memory").queryName("tfrec_stream_tbl")
        .option("checkpointLocation", s"$dir/ck").start()
      try {
        q.processAllAvailable()
        val got = s.table("tfrec_stream_tbl").collect().map(_.getString(0)).sorted
        assert(got.toSeq == docs.map(_._2).sorted)
      } finally q.stop()
    } finally rmrf(dir)
  }
}
