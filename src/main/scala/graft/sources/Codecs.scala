package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Export/import codecs mirroring the reference's dataManager
  * (src/services/dataManager.ts:190-240 CSV with quote-escaping,
  * :303-305 JSON export) — distributed via Spark's csv/json sources,
  * which implement the identical RFC-4180-style quoting the
  * reference's hand-rolled parser handles (embedded commas, doubled
  * quotes, newlines in values).
  */
object Codecs {

  /** Header + quoted CSV export. One file iff `singleFile` (the
    * reference exports a single blob; at scale leave false to write
    * one file per partition).
    */
  def exportCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"") // RFC-4180 doubled-quote escaping, as in dataManager.parseCSVLine
      .csv(path)
  }

  /** Schema-checked CSV import (no inference drift). */
  def importCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").option("escape", "\"").schema(schema).csv(path)

  /** JSON-lines export (dataManager.exportToJSONString, distributed). */
  def exportJson(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode("overwrite").json(path)
  }

  def importJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC export — the third first-class columnar interchange format
    * beside parquet (Spark ships the reader/writer; Hive/Trino
    * ecosystems still hand over ORC at scale). Type-preserving, so no
    * schema argument on import: the round-trip proves fidelity by
    * hash equality against the parquet-derived oracle.
    */
  def exportOrc(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode("overwrite").orc(path)
  }

  def importOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
