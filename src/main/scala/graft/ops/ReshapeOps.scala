package graft.ops

import graft.core.{Chain, Exact, Naming}
import org.apache.spark.sql.functions._

/** Reshape + escape hatch — reference transforms #44-46 (SURVEY §2.2):
  * pivot, unpivot, apply.
  */
final class ReshapeOps(private val c: Chain) extends AnyVal {

  /** pivot(dimensions, pivot_column, value_column, agg_method, list_of_vals):
    * rows→columns with an aggregate. When the value list is omitted it is
    * discovered with a capped, sorted distinct scan (the reference queries
    * the warehouse at compile time; rendering.py:272-291) — passing the list
    * avoids the extra job and keeps the column set explicit at scale.
    * Output columns are `<value_cleansed>` per pivoted value.
    */
  def pivot(
      dimensions: Seq[String],
      pivotColumn: String,
      valueColumn: String,
      aggMethod: String = "SUM",
      listOfVals: Seq[String] = Nil,
      maxDistinct: Int = 100): Chain = {
    val vals =
      if (listOfVals.nonEmpty) listOfVals
      else {
        val vs = c.df.select(col(pivotColumn).cast("string")).distinct()
          .limit(maxDistinct + 1).collect().map(_.getString(0)).toSeq
        if (vs.length > maxDistinct)
          throw new IllegalArgumentException(
            s"$pivotColumn has more than $maxDistinct distinct values; pass list_of_vals")
        vs.filter(_ != null).sorted
      }
    val dt = c.df.schema(valueColumn).dataType
    val (aggCol, _) = AggFns.resolve(aggMethod, col(valueColumn), dt)
    val pivoted = c.df.groupBy(dimensions.map(col): _*)
      .pivot(pivotColumn, vals).agg(aggCol)
    val df2 = vals.foldLeft(pivoted)((d, v) => d.withColumnRenamed(v, Naming.cleanse(v)))
    val frags = vals.map { v =>
      val guarded = s"CASE WHEN $pivotColumn = '${v.replace("'", "''")}' THEN $valueColumn END"
      s"${AggFns.sqlText(aggMethod, guarded, dt)} AS ${Naming.cleanse(v)}"
    }
    c.next("pivot", df2, Some(
      s"SELECT ${(dimensions ++ frags).mkString(", ")} FROM {{source}} GROUP BY ${dimensions.mkString(", ")}"))
  }

  /** unpivot(value_column, name_column, column_list_vals): columns→rows;
    * all listed columns are cast to double (a single common value type, as
    * SQL UNPIVOT requires).
    */
  def unpivot(
      valueColumn: String,
      nameColumn: String,
      columnListVals: Seq[String]): Chain = {
    val ids = c.df.columns.toSeq.filterNot(columnListVals.contains)
    val casted = columnListVals.foldLeft(c.df)((d, n) =>
      d.withColumn(n, col(n).cast("double")))
    val df2 = casted.unpivot(
      ids.map(col).toArray, columnListVals.map(col).toArray, nameColumn, valueColumn)
    val branches = columnListVals.map(v =>
      s"SELECT ${(ids :+ s"'$v' AS $nameColumn" :+ s"CAST($v AS DOUBLE) AS $valueColumn").mkString(", ")} FROM {{source}}")
    c.next("unpivot", df2, Some(branches.mkString(" UNION ALL ")))
  }

  /** apply(sql): user-supplied SQL spliced into the chain; the current chain
    * state is exposed as `{{source_table}}` via a temp view (reference
    * special case at rasgoql/primitives/rendering.py:138-143), guarded by
    * the same destructive-keyword check as raw queries.
    */
  def applySql(sqlText: String, acknowledgeRisk: Boolean = false): Chain =
    spliceSql("apply", sqlText, acknowledgeRisk, Map.empty)

  /** transform(template, args): apply a registered user transform
    * ([[graft.core.TransformTemplate]], ≅ the reference's
    * `define_transform` + chain `.transform(name=...)`,
    * rasgoql/main.py:123-144). Renders the template with the bound
    * arguments, executes through the same guarded SQL splice as
    * [[applySql]], and keeps a SQL fragment so the step round-trips
    * through `sql()`/`toDbt` like every built-in.
    */
  def transformNamed(t: graft.core.TransformTemplate,
                     args: Map[String, String] = Map.empty,
                     acknowledgeRisk: Boolean = false): Chain =
    spliceSql(t.name, t.render(args), acknowledgeRisk, args)

  private def spliceSql(op: String, sqlText: String, acknowledgeRisk: Boolean,
                        args: Map[String, String]): Chain = {
    val guard = new graft.core.GraftSession(c.spark)
    if (guard.isScarySql(sqlText) && !acknowledgeRisk)
      throw new IllegalArgumentException(
        s"$op sql contains a destructive keyword; pass acknowledgeRisk=true")
    val viewName = s"graft_apply_${java.util.UUID.randomUUID.toString.replace("-", "").take(10)}"
    c.df.createOrReplaceTempView(viewName)
    val df2 = c.spark.sql(sqlText.replace("{{source_table}}", viewName))
    c.next(op, df2, Some(sqlText.replace("{{source_table}}", "{{source}}")), args)
  }
}
