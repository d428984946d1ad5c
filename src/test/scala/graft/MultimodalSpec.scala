package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: stub-kernel laws and the fixture property the
  * DuckDB oracles depend on.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark

  test("resizeStub: bounded output, in-range stride positions, small inputs pass through") {
    val small = Array[Byte](1, 2, 3)
    assert(Multimodal.resizeStub(small, 16, 16).toSeq == small.toSeq) // n < w*h → identity
    val big = Array.tabulate(1000)(_.toByte)
    val out = Multimodal.resizeStub(big, 16, 16)
    assert(out.length == 256)
    assert(out.toSeq == (0 until 256).map(i => big(i * (1000 / 256))).toSeq)
    assert(Multimodal.resizeStub(Array.emptyByteArray, 16, 16).isEmpty)
    assert(Multimodal.resizeStub(null, 16, 16).isEmpty)
  }

  test("featureStub: fixed dim, unsigned bytes, empty input → zeros") {
    val b = Array[Byte](-1, 10) // -1 = 0xff = 255 unsigned
    val f = Multimodal.featureStub(b, 4)
    assert(f.length == 4)
    assert(f(0) == 255.0f) // (0*31) % 2 = 0 → byte 0 unsigned
    assert(f(1) == 10.0f)  // (1*31) % 2 = 1 → byte 1
    assert(Multimodal.featureStub(Array.emptyByteArray, 3).toSeq == Seq(0.0f, 0.0f, 0.0f))
  }

  test("documents fixture is pure ASCII (byte positions == char positions, oracle precondition)") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val bad = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .filter(octet_length(col("text")) =!= length(col("text"))).count()
      assert(bad == 0, s"$sf has non-ASCII documents; media oracles would diverge")
    }
  }

  test("media ops are declarable as an IR pipeline (decode-free media stage chain)") {
    import graft.ir.{Engine, EngineCtx, Node}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.synthesize(docs, "doc_id", "text", "source")
    val node = Node.fromJson(
      """{"action":"media-resize","params":[{"width":8,"height":8}],"children":[
        |  {"action":"media-features","params":[{"dim":4}],"children":[
        |    {"action":"tap","params":["feats"]}]}]}""".stripMargin)
    val out = Engine.run(node, media, EngineCtx(testMode = true)).taps("feats")
    assert(out.columns.toSeq == Seq("media_id", "features"))
    assert(out.count() == docs.count())
    // features come from the RESIZED payload: dim 4, byte at (j*31) mod n_out
    val row = out.orderBy("media_id").head
    assert(row.getSeq[Float](1).length == 4)
  }

  test("featureExtract output feeds the similarity operators (Array[Float] contract)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.synthesize(docs, "doc_id", "text", "source")
    val feats = Multimodal.featureExtract(media, 8)
      .withColumnRenamed("media_id", "vec_id").withColumnRenamed("features", "embedding")
    // brute-force ANN accepts the extracted features directly
    val knn = graft.operators.Similarity.bruteForceTopK(
      feats, feats.limit(3), "vec_id", "embedding", 2)
    assert(knn.count() == 6) // 3 queries × top-2
  }
}
