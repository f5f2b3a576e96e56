package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for CO-LOCATED joins and aggregations — the storage
  * answer to the shuffle question the join operators otherwise solve at run
  * time (broadcast for small dims, salting for skew): two fact tables
  * bucketed (and sorted) on the same keys with the same bucket count join
  * with ZERO Exchange on either side, and a groupBy on the bucket keys
  * aggregates without a shuffle. At 100 TB this turns every recurring
  * fact-fact equi-join on a popular key (user_id, doc_id) from the
  * dominant shuffle into a local zipper merge — the shuffle is paid ONCE at
  * write time and amortized over every later query.
  *
  * Spark's bucket metadata lives in the session catalog (`saveAsTable` —
  * a path-written parquet file has nowhere to record its bucketing), so
  * this wrapper is explicitly catalog-based; `spark.sql.warehouse.dir`
  * decides the physical location. Bucket pruning on literal key predicates
  * and one-side-shuffle joins against a differently-bucketed table come
  * free from Catalyst once the metadata exists.
  */
object BucketedTable {

  /** Write `df` as a bucketed + in-bucket-sorted parquet table. Sorting by
    * the bucket keys lets the sort-merge join skip its per-task sort too
    * (the plan shows neither Exchange nor Sort on a co-bucketed join). */
  def write(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    keys.foreach(k => require(df.columns.contains(k),
      s"bucket key '$k' not in ${df.columns.mkString("[", ",", "]")}"))
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (a thin alias — the point is that
    * `spark.table` carries the catalog's bucket spec into the scan, which
    * `spark.read.parquet(path)` would lose). */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Co-located equi-join of two tables bucketed on `keys` with equal
    * bucket counts: validates the bucket specs up front (a mismatched or
    * missing spec silently degrades to a full shuffle — fail loudly
    * instead) and returns the inner join, which Catalyst plans without an
    * Exchange on either side. */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String]): DataFrame = {
    val (lb, ls) = bucketSpec(spark, leftTable)
    val (rb, rs) = bucketSpec(spark, rightTable)
    require(lb > 0 && rb > 0,
      s"$leftTable/$rightTable must both be bucketed tables " +
        s"(bucket counts: $lb/$rb)")
    require(lb == rb,
      s"bucket counts differ ($leftTable=$lb, $rightTable=$rb): the join " +
        "would shuffle one side — rewrite one table or accept a plain join")
    require(keys.forall(ls.contains) && keys.forall(rs.contains),
      s"join keys $keys must be bucket keys on both sides " +
        s"($leftTable=$ls, $rightTable=$rs)")
    spark.table(leftTable).join(spark.table(rightTable), keys)
  }

  /** (numBuckets, bucketColumns) from the catalog; (0, Nil) if unbucketed. */
  def bucketSpec(spark: SparkSession, table: String): (Int, Seq[String]) = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    meta.bucketSpec
      .map(b => (b.numBuckets, b.bucketColumnNames))
      .getOrElse((0, Seq.empty))
  }
}
