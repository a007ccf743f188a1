package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Multi-tier source fallback — the ingestion analog of the
  * reference's proxy ladder (proxyUtils.ts:3-76): try each source in
  * priority order, take the first that exists, and if every tier
  * fails return an EMPTY frame with the expected schema and an error
  * marker instead of hard-failing the pipeline.
  *
  * Tier probing is a driver-side filesystem existence check (cheap
  * metadata, no job); the chosen tier then reads with the DECLARED
  * schema, so a tier with drifted columns fails fast at analysis
  * rather than poisoning downstream plans.
  */
object Fallback {

  /** Read the first existing path, else an empty frame. The returned
    * frame always carries `_source_tier` (0-based winning tier, -1 if
    * none) so downstream audits can see which source served.
    */
  def readWithFallback(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val hit = paths.zipWithIndex.find { case (p, _) =>
      val path = new Path(p)
      path.getFileSystem(conf).exists(path)
    }
    hit match {
      case Some((p, tier)) =>
        spark.read.schema(schema).parquet(p).withColumn("_source_tier", lit(tier))
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
          .withColumn("_source_tier", lit(-1))
    }
  }
}
