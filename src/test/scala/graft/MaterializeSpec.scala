package graft

import graft.operators.Materialize
import org.scalatest.funsuite.AnyFunSuite

/** The materialization policy knob: `local` (default) must behave like the
  * old hard-coded localCheckpoint; `reliable` must fail fast without a
  * checkpoint dir and produce an equivalent frame with one.
  */
class MaterializeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def frame() = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")

  test("default local mode materializes eagerly and preserves data") {
    spark.conf.unset(Materialize.ConfKey)
    val m = Materialize(frame())
    assert(m.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("reliable mode without a checkpoint dir fails fast with an actionable message") {
    spark.conf.set(Materialize.ConfKey, "reliable")
    try {
      val e = intercept[IllegalArgumentException](Materialize(frame()))
      assert(e.getMessage.contains("setCheckpointDir"))
    } finally spark.conf.unset(Materialize.ConfKey)
  }

  test("reliable mode with a checkpoint dir writes a recoverable checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Materialize.ConfKey, "reliable")
    try {
      val m = Materialize(frame())
      assert(m.collect().length == 3)
      // the checkpoint actually landed on storage (cluster-grade variant)
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "no checkpoint files written")
    } finally spark.conf.unset(Materialize.ConfKey)
  }

  test("unknown mode is rejected") {
    spark.conf.set(Materialize.ConfKey, "turbo")
    try intercept[IllegalArgumentException](Materialize(frame()))
    finally spark.conf.unset(Materialize.ConfKey)
  }
}
