package graft
import org.apache.spark.sql.SparkSession
import graft.core.Chain
import graft.ops._
object ScratchDiffPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String) = Chain(spark, n, spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet"))
    val diff = t("orders").diffAgainst(t("orders").filterRows(Seq("o_orderkey % 2 = 0")), Seq("o_orderkey")).df
    println("PLAN_CLASS=" + diff.queryExecution.executedPlan.getClass.getSimpleName)
    diff.explain("formatted")
    spark.stop()
  }
}
