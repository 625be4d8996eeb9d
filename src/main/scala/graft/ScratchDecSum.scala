package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{MakeDecimal, UnscaledValue}

/** Dev utility: isolate the exact-decimal accumulation cost behind
  * q_corr_matrix (guide §1 measure-first) and compare candidate
  * formulations on the REAL bench column set before touching the
  * operator. Times, over lineitem at the given sf:
  *
  *   dec38  — the shipped shape: 9 × SUM(CAST(expr AS DECIMAL(38,8)))
  *   split  — UnscaledValue(cast) split hi/lo, 18 long sums, exact
  *            decimal recombination (candidate)
  *   double — plain double sums (the non-deterministic lower bound)
  *   probe  — count + per-column finite counts + max(abs()) (the
  *            range-probe pass the candidate needs)
  *
  * Each timed via the same count() action methodology as Bench. Not part
  * of the library surface.
  */
object ScratchDecSum {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    def finite(cn: String) = col(cn).isNotNull && !isnan(col(cn).cast("double"))
    val allOk = cols.map(finite).reduce(_ && _)
    val xs = cols.map(cn => when(allOk, col(cn).cast("double")))
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (i, j)
    val exprs: Seq[(String, Column)] =
      cols.indices.flatMap(i => Seq(s"_s_$i" -> xs(i), s"_ss_$i" -> (xs(i) * xs(i)))) ++
        pairs.map { case (i, j) => s"_sp_${i}_$j" -> (xs(i) * xs(j)) }

    def dec38(cc: Column) = sum(cc.cast(DecimalType(38, 8))).cast("double")
    def split(cc: Column): Column = {
      val u = GraftBridge.column(UnscaledValue(
        GraftBridge.expression(cc.cast(DecimalType(38, 8)))))
      val hi = shiftright(u, 32)
      val lo = u.bitwiseAND(lit(0xFFFFFFFFL))
      val combined = sum(hi).cast(DecimalType(20, 0)) *
        lit(new java.math.BigDecimal("42.94967296")) +
        GraftBridge.column(MakeDecimal(GraftBridge.expression(sum(lo)),
          38, 8, nullOnOverflow = true))
      combined.cast("double")
    }
    def run(tag: String, aggs: Seq[Column]): Unit = {
      var best = Double.MaxValue
      var row: org.apache.spark.sql.Row = null
      for (_ <- 1 to passes) {
        val t0 = System.nanoTime()
        row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[decsum] $tag%-8s best=${best}%.3f s  row=${row}")
    }
    run("dec38", count(xs.head).as("_n") +: exprs.map { case (n, e) => dec38(e).as(n) })
    run("split", count(xs.head).as("_n") +: exprs.map { case (n, e) => split(e).as(n) })
    run("double", count(xs.head).as("_n") +: exprs.map { case (n, e) => sum(e).as(n) })
    run("probe", (count(lit(1)).as("_t") +:
      cols.indices.map(i => count(when(finite(cols(i)), lit(1))).as(s"_c_$i"))) ++
      cols.indices.map(i => max(abs(when(finite(cols(i)), col(cols(i)).cast("double"))))
        .as(s"_m_$i")))
    spark.stop()
  }
}
