package graft
import org.apache.spark.sql.SparkSession
// scratch — deleted before commit
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.queryExecution.toRdd.count()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
