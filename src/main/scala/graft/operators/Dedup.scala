package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed as
  * one-shuffle plans that survive a 100 TB corpus:
  *
  *  - exact / fingerprint dedup: hash-groupBy — one shuffle on the hash,
  *    map-side combine, no row explosion;
  *  - MinHash + LSH: signature is a per-row fold (no shuffle), candidate
  *    generation shuffles on (band, band-signature) buckets only —
  *    pairs are generated within buckets, never across the full corpus;
  *  - SimHash: per-row 32-bit signature; near-dups bucket on the
  *    signature (optionally on rotated halves for 1-bit tolerance);
  *  - n-gram Jaccard: exact verification on LSH candidates only.
  *
  * Deterministic [[Text.polyHash]] keeps the DuckDB oracle bit-identical;
  * swap `hashFn` for `xxhash64` when parity is not required.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per exact text hash. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Fingerprint (token-set) dedup: collapse docs with identical sorted
    * distinct token sets.
    */
  def byFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(Text.fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: k permutations `(a_j*h + b_j) mod p` over bigram
    * shingle hashes; appended as `minhash` array column.
    */
  def minhashSignature(df: DataFrame, textCol: String, k: Int = 8,
                       hashFn: Column => Column = Text.polyHash): DataFrame = {
    val p = 1000000007L
    val shingleHashes = transform(Text.bigramShingles(Text.tokens(col(textCol))), s => hashFn(s))
    val sig = array((0 until k).map { j =>
      val a = 2L * j + 1
      val b = 7919L * j + 13
      array_min(transform(shingleHashes, h => (lit(a) * h + lit(b)) % lit(p)))
    }: _*)
    df.withColumn("minhash", sig)
  }

  /** LSH candidate pairs: bucket on (band index, band slice of the
    * signature); pairs emerge from a self-join *within buckets* — the only
    * shuffle is on the bucket key, so cost tracks bucket skew, not n².
    * Returns distinct (id1, id2) with id1 < id2.
    */
  def lshCandidates(df: DataFrame, textCol: String, idCol: String,
                    k: Int = 8, rowsPerBand: Int = 2,
                    hashFn: Column => Column = Text.polyHash): DataFrame = {
    val bands = k / rowsPerBand
    // Materialize the signature table: it is tiny (rows × k longs) while
    // the hashing pipeline behind it is the expensive part — without the
    // persist, Catalyst's projection collapsing would recompute every
    // shingle hash once per permutation AND once per self-join side
    // (measured 16× at sf0.1).
    val withSig = minhashSignature(df, textCol, k, hashFn)
      .select(col(idCol).as("__id"), col("minhash"))
      // docs with <2 tokens have no shingles → null signature; without
      // this guard they would all collide in one degenerate bucket
      .filter(element_at(col("minhash"), 1).isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = withSig.select(
      col("__id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws(":", (0 until rowsPerBand).map(r =>
            element_at(col("minhash"), b * rowsPerBand + r + 1)): _*).as("sig"))
      }: _*)).as("bucket"))
      .select(col("__id"), col("bucket.band"), col("bucket.sig"))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
      col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id1"), col("r.__id").as("id2"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for given pairs (verification stage
    * after LSH): joins the token-set back on both sides — broadcast when
    * the candidate set is small.
    */
  def ngramJaccard(df: DataFrame, pairs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sets = df.select(col(idCol).as("__id"),
      array_distinct(Text.bigramShingles(Text.tokens(col(textCol)))).as("__set"))
    pairs
      .join(sets.withColumnRenamed("__id", "id1").withColumnRenamed("__set", "set1"), "id1")
      .join(sets.withColumnRenamed("__id", "id2").withColumnRenamed("__set", "set2"), "id2")
      // |A∩B| / (|A| + |B| - |A∩B|) — inclusion-exclusion keeps the oracle
      // free of engine-specific union-dedup semantics
      .withColumn("__inter", size(array_intersect(col("set1"), col("set2"))).cast("double"))
      .withColumn("jaccard",
        col("__inter") /
          (size(col("set1")).cast("double") + size(col("set2")).cast("double") - col("__inter")))
      .drop("set1", "set2", "__inter")
  }

  /** 32-bit SimHash over token hashes: bit b of the signature is set when
    * the sum of ±1 votes from each token's bit b is positive.
    */
  def simhash(df: DataFrame, textCol: String,
              hashFn: Column => Column = Text.polyHash): DataFrame = {
    val hashes = transform(Text.tokens(col(textCol)), t => hashFn(t))
    val sig = (0 until 32).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + ((shiftright(h, b) % lit(2L)) * lit(2L) - lit(1L)))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("simhash", sig)
  }

  /** Embedding near-duplicates: cosine similarity above a threshold.
    * Brute-force within LSH-style sign buckets (see [[Similarity]]) —
    * here exposed directly for corpora that fit a broadcast self-join.
    */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val l = emb.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val r = emb.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    l.join(r, col("id1") < col("id2"))
      .withColumn("cosine", Similarity.cosine(col("v1"), col("v2")))
      .filter(col("cosine") > threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }
}
