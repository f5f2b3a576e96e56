package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TSV scan operators mirroring the reference's hand-rolled parsers.
  *
  * IO3 — search-results TSV (10 columns, header row, `-` codes null,
  * query name truncated at the first space):
  * /root/reference/src/main/taxor_profile.cpp:93-163, header at
  * /root/reference/src/main/taxor_search.cpp:343.
  * IO2 — taxonomy TSV (6 positional columns):
  * /root/reference/src/taxonomy/parse_ncbi_taxonomy.cpp:7-42.
  */
object Tsv {
  val SearchResultsSchema: StructType = StructType(Seq(
    StructField("QUERY_NAME", StringType),
    StructField("ACCESSION", StringType),
    StructField("REFERENCE_NAME", StringType),
    StructField("TAXID", StringType),
    StructField("REF_LEN", LongType),
    StructField("QUERY_LEN", LongType),
    StructField("QHASH_COUNT", LongType),
    StructField("QHASH_MATCH", LongType),
    StructField("TAX_STR", StringType),
    StructField("TAX_ID_STR", StringType)))

  /** Read a reference-format search-results TSV: `-` to null, read id cut
    * at the first space (taxor_profile.cpp:124-125,154-158). */
  def readSearchResults(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("sep", "\t").option("header", "true")
      .schema(SearchResultsSchema)
      .csv(path)
    val nulled = SearchResultsSchema.fields.filter(_.dataType == StringType)
      .foldLeft(raw) { (df, f) =>
        df.withColumn(f.name,
          when(col(f.name) === "-", lit(null)).otherwise(col(f.name)))
      }
    nulled.withColumn("QUERY_NAME",
      split(col("QUERY_NAME"), " ").getItem(0))
  }

  val TaxonomySchema: StructType = StructType(Seq(
    StructField("accession", StringType),
    StructField("accession_version", StringType),
    StructField("taxid", StringType),
    StructField("species_taxid", StringType),
    StructField("organism_name", StringType),
    StructField("taxonomy_string", StringType)))

  /** Read a 6-column taxonomy TSV (no header). */
  def readTaxonomy(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").schema(TaxonomySchema).csv(path)

  /** IO8 — search-results TSV sink: reference 10-column header, `-` for
    * nulls (taxor_search.cpp:342-343; atomicity comes from Spark's task
    * commit protocol instead of the reference's output mutex). */
  def writeSearchResults(df: DataFrame, path: String): Unit = {
    val cols = SearchResultsSchema.fields.map { f =>
      if (f.dataType == StringType)
        coalesce(col(f.name), lit("-")).as(f.name)
      else col(f.name)
    }
    df.select(cols.toSeq: _*)
      .write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .csv(path)
  }

  /** Split a `;`-joined 7-rank taxonomy path into (rank, node) structs for
    * ProfilePipeline.rollup (taxor_profile.cpp:568-636). */
  def taxonomyPath(df: DataFrame, pathCol: String = "taxonomy_string"): DataFrame =
    df.withColumn("path",
      expr(s"transform(split($pathCol, ';'), (x, i) -> " +
        "named_struct('rank', i, 'node', x))"))
}
