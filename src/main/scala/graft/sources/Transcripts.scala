package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic multi-turn transcript table, exactly the
  * `input_hint` shape: (conv_id STRING, turn_idx INT, role STRING,
  * text STRING, tool STRING, ts TIMESTAMP).
  *
  * Every column is a pure function of (seed, conv index, turn index) built
  * from Catalyst expressions only — so the table is byte-identical at any
  * parallelism (the per-row invariant: per-turn text equality under stable
  * turn ordering). Skew is intentional: the first `skewConvs` conversations
  * get ~`skewFactor`× the median turn count, exercising salted
  * pre-aggregation (the reference's split-bin motive,
  * /root/reference/src/hixf/build/hierarchical_build.cpp:91-111).
  */
/** The canonical input row (BASELINE.json `input_hint`). */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)

object Transcripts {
  val Roles = Seq("user", "assistant", "tool", "system")

  /** Typed view of the generated table. */
  def typed(spark: SparkSession, nConvs: Long, avgTurns: Int = 16,
      seed: Long = 42L): org.apache.spark.sql.Dataset[Turn] = {
    import spark.implicits._
    generate(spark, nConvs, avgTurns, seed = seed).as[Turn]
  }

  def generate(
      spark: SparkSession,
      nConvs: Long,
      avgTurns: Int = 16,
      skewConvs: Int = 2,
      skewFactor: Int = 200,
      vocab: Int = 5000,
      seed: Long = 42L): DataFrame = {
    val conv = spark.range(nConvs)
      .withColumn("conv_id", format_string("conv-%06d", col("id")))
      .withColumn("h", xxhash64(col("id"), lit(seed)))
      .withColumn(
        "n_turns",
        when(col("id") < skewConvs, lit(avgTurns * skewFactor))
          .otherwise(lit(2) + pmod(col("h"), lit(2 * avgTurns - 2))).cast("int"))
    conv
      .select(col("id"), col("conv_id"),
        explode(sequence(lit(0), col("n_turns") - 1)).as("turn_idx"))
      .withColumn("th", xxhash64(col("id"), col("turn_idx"), lit(seed)))
      .withColumn(
        "role",
        when(pmod(col("th"), lit(10)) === 0, lit("system"))
          .when(pmod(col("th"), lit(10)).isin(1, 2), lit("tool"))
          .when(pmod(col("turn_idx"), lit(2)) === 0, lit("user"))
          .otherwise(lit("assistant")))
      .withColumn(
        "tool",
        when(col("role") === "tool",
          // heavy-hitter tool distribution: u^4 * 50 concentrates on low ids
          format_string("tool_%02d",
            floor(pow(pmod(col("th"), lit(10000)) / lit(10000.0), lit(4.0))
              * 50).cast("int")))
          .otherwise(lit(null).cast("string")))
      .withColumn("n_tok", (lit(3) + pmod(xxhash64(col("th")), lit(80))).cast("int"))
      .withColumn(
        "text",
        concat_ws(" ",
          transform(sequence(lit(0), col("n_tok") - 1),
            i => concat(lit("tok"),
              pmod(xxhash64(col("id"), col("turn_idx"), i, lit(seed)),
                lit(vocab))))))
      .withColumn(
        "ts",
        timestamp_seconds(
          lit(1700000000L) + col("id") * 86400 + col("turn_idx") * 60 +
            pmod(col("th"), lit(59))))
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }
}
