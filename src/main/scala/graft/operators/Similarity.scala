package graft.operators

import graft.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Baseline: brute-force cosine top-k (broadcast the query set; one pass over
  * the corpus; per-partition top-k via window). Scale path: signed-random-
  * projection LSH — shuffle on (table, bucket) instead of the cross product,
  * exact re-rank inside buckets only.
  */
object Similarity {
  /** Cosine similarity of two array<float> columns in double precision,
    * strictly left-to-right (deterministic across engines/retries).
    * Codegen'd fused loop — Spark's zip_with/aggregate higher-order
    * functions are CodegenFallback and ~50x slower on this scan. */
  def cosine(a: Column, b: Column): Column = vec_cosine(a, b)

  /** Brute-force exact top-k neighbours for each query vector.
    * Queries are broadcast (small side); corpus streams once. Ties broken by
    * ascending neighbour id for cross-engine determinism. */
  def bruteForceTopK(
      corpus: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries), col("id") =!= col("qid"))
      .withColumn("sim", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "id", "sim")
  }

  /** LSH-bucketed approximate top-k: candidates share at least one SRP
    * bucket with the query across `tables` hash tables; exact cosine re-rank
    * on candidates only. Recall rises with `tables`, cost with bucket size
    * (controlled by `bits`). */
  def lshTopK(
      corpus: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      tables: Int = 8,
      bits: Int = 10,
      seed: Long = DefaultSeed): DataFrame = {
    val cb = corpus
      .select(col("id"), col("vec"),
        explode(srp_buckets(col("vec"), tables, bits, seed)).as("bucket"))
    val qb = queries
      .select(col("qid"), col("qvec"),
        explode(srp_buckets(col("qvec"), tables, bits, seed)).as("bucket"))
    val candidates = cb.join(qb, Seq("bucket"))
      .where(col("id") =!= col("qid"))
      .select("qid", "qvec", "id", "vec")
      .distinct()
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("id").asc)
    candidates
      .withColumn("sim", cosine(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "id", "sim")
  }

  /** IVF (inverted-file) approximate top-k — the other standard ANN scale
    * path: a small deterministic centroid set partitions the corpus into
    * cells; each query probes its `nProbe` nearest cells and re-ranks
    * exactly inside them.
    *
    * Scale shape: centroids are the nCentroids smallest-hash corpus rows —
    * a global top-N (TakeOrderedAndProject: per-partition top-N, tiny
    * shuffle, no count() pre-pass) collected to the driver (<= nCentroids
    * vectors). Cell assignment is then one codegen'd per-row sweep against
    * the constant centroid matrix — the corpus is NEVER shuffled or
    * crossJoined for assignment; the probe side is broadcast. The only
    * candidate shuffle is the final per-query top-k (WindowGroupLimit).
    * (A k-means refinement of the centroid seed would slot in without
    * changing the plan.) */
  def ivfTopK(
      corpus: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val cents: Seq[Seq[Float]] = corpus
      .select(col("vec"), xxhash64(col("id")).as("__h"), col("id"))
      .orderBy(col("__h"), col("id"))
      .limit(nCentroids)
      .select("vec").collect().toSeq
      .map(_.getSeq[Float](0).toSeq)
    val centsLit = typedLit(cents)
    val cells = corpus.withColumn("cid",
      element_at(nearest_centroids(col("vec"), centsLit, 1), 1))
    val probes = queries.withColumn("cid",
      explode(nearest_centroids(col("qvec"), centsLit, nProbe)))
    val wRank = Window.partitionBy("qid").orderBy(col("sim").desc, col("id").asc)
    cells.join(broadcast(probes), "cid")
      .where(col("id") =!= col("qid"))
      .withColumn("sim", cosine(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= k)
      .select("qid", "rank", "id", "sim")
  }

  /** Embedding near-duplicate pairs above a cosine threshold, via LSH
    * candidate generation + exact verification (the embedding analogue of
    * Dedup.minhashLshPairs). */
  def cosineNearDupPairs(
      corpus: DataFrame, // (id, vec)
      threshold: Double,
      tables: Int = 12,
      bits: Int = 8,
      seed: Long = DefaultSeed): DataFrame = {
    val cb = corpus.select(col("id"), col("vec"),
      explode(srp_buckets(col("vec"), tables, bits, seed)).as("bucket"))
    cb.as("a").join(cb.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.vec").as("vec_a"),
        col("b.id").as("id_b"), col("b.vec").as("vec_b"))
      .distinct()
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
