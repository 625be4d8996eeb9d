package graft.ops

import graft.core.{Chain, Naming}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date / time operators — reference transforms #30-35 (SURVEY §2.2):
  * datetrunc, datepart, dateadd, datediff, datespine, datespine_groups.
  */
final class DateOps(private val c: Chain) extends AnyVal {

  /** datetrunc(dates): column → part; adds `<col>_<part>` (reference
    * `ORDERDATE_WEEK`, tutorials/tutorial_extended.ipynb:3069).
    */
  def datetrunc(dates: Seq[(String, String)]): Chain = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType}
    // (the SQL fragments below mirror the same NTZ/date cast)
    val df2 = dates.foldLeft(c.df) { case (d, (cn, part)) =>
      // date_trunc always yields session-zoned TIMESTAMP; keep the input's
      // temporal family (NTZ/date) so written parquet stays timezone-naive.
      val truncated = c.df.schema(cn).dataType match {
        case TimestampNTZType => date_trunc(part, col(cn)).cast(TimestampNTZType)
        case DateType => date_trunc(part, col(cn)).cast(DateType)
        case _ => date_trunc(part, col(cn))
      }
      d.withColumn(Naming.datePart(cn, part), truncated)
    }
    val frags = dates.map { case (cn, p) =>
      val castSql = c.df.schema(cn).dataType match {
        case TimestampNTZType => s"CAST(DATE_TRUNC('$p', $cn) AS TIMESTAMP_NTZ)"
        case DateType => s"CAST(DATE_TRUNC('$p', $cn) AS DATE)"
        case _ => s"DATE_TRUNC('$p', $cn)"
      }
      s"$castSql AS ${Naming.datePart(cn, p)}"
    }
    c.next("datetrunc", df2, Some(s"SELECT *, ${frags.mkString(", ")} FROM {{source}}"))
  }

  /** datepart(dates): extract part as a number → `<col>_<part>`. */
  def datepart(dates: Seq[(String, String)]): Chain = {
    val df2 = dates.foldLeft(c.df) { case (d, (cn, part)) =>
      d.withColumn(Naming.datePart(cn, part), partOf(col(cn), part))
    }
    val frags = dates.map { case (cn, p) =>
      s"EXTRACT(${p.toUpperCase} FROM $cn) AS ${Naming.datePart(cn, p)}"
    }
    c.next("datepart", df2, Some(s"SELECT *, ${frags.mkString(", ")} FROM {{source}}"))
  }

  private def partOf(cc: Column, part: String): Column = part.toLowerCase match {
    case "year" => year(cc)
    case "quarter" => quarter(cc)
    case "month" => month(cc)
    case "week" => weekofyear(cc)
    case "day" => dayofmonth(cc)
    case "dayofweek" | "dow" => dayofweek(cc)
    case "dayofyear" | "doy" => dayofyear(cc)
    case "hour" => hour(cc)
    case "minute" => minute(cc)
    case "second" => second(cc)
    case other => throw new IllegalArgumentException(s"unknown date part $other")
  }

  /** dateadd(date_part, date, offset): date arithmetic → `<col>_add_<n>_<part>`
    * (negative offsets double-underscored like lag).
    */
  def dateadd(datePart: String, dateCol: String, offset: Int): Chain = {
    val name =
      if (offset < 0)
        Naming.cleanse(s"${dateCol}_add") + s"__${-offset}_" + Naming.cleanse(datePart)
      else Naming.cleanse(s"${dateCol}_add_${offset}_$datePart")
    val e = col(dateCol) + expr(s"INTERVAL $offset ${datePart.toUpperCase}")
    c.next("dateadd", c.df.withColumn(name, e),
      Some(s"SELECT *, $dateCol + INTERVAL '$offset' ${datePart.toUpperCase} AS $name FROM {{source}}"))
  }

  /** datediff(date_part, date_1, date_2): boundary-count difference
    * (date_2 − date_1) in the given part → `datediff_<d1>_<d2>`. Inputs are
    * truncated to dates first (calendar semantics, not elapsed time).
    */
  def datediffCols(datePart: String, date1: String, date2: String): Chain = {
    val name = Naming.cleanse(s"datediff_${date1}_${date2}")
    val d1 = to_date(col(date1))
    val d2 = to_date(col(date2))
    val e: Column = datePart.toLowerCase match {
      case "day" => datediff(d2, d1)
      case "week" => floor(datediff(date_trunc("week", d2), date_trunc("week", d1)) / 7).cast("int")
      case "month" => ((year(d2) - year(d1)) * 12 + (month(d2) - month(d1)))
      case "quarter" => ((year(d2) - year(d1)) * 4 + (quarter(d2) - quarter(d1)))
      case "year" => (year(d2) - year(d1))
      case other => throw new IllegalArgumentException(s"unknown date part $other")
    }
    val sqlExpr = datePart.toLowerCase match {
      case "day" => s"DATEDIFF(TO_DATE($date2), TO_DATE($date1))"
      case "week" => s"CAST(FLOOR(DATEDIFF(DATE_TRUNC('week', TO_DATE($date2)), DATE_TRUNC('week', TO_DATE($date1))) / 7) AS INT)"
      case "month" => s"(YEAR(TO_DATE($date2)) - YEAR(TO_DATE($date1))) * 12 + (MONTH(TO_DATE($date2)) - MONTH(TO_DATE($date1)))"
      case "quarter" => s"(YEAR(TO_DATE($date2)) - YEAR(TO_DATE($date1))) * 4 + (QUARTER(TO_DATE($date2)) - QUARTER(TO_DATE($date1)))"
      case "year" => s"YEAR(TO_DATE($date2)) - YEAR(TO_DATE($date1))"
    }
    c.next("datediff", c.df.withColumn(name, e),
      Some(s"SELECT *, $sqlExpr AS $name FROM {{source}}"))
  }

  /** datespine(date_col, start, end, interval_type): generate a contiguous
    * calendar at `interval_type` granularity from start to end (ISO dates)
    * and left-join the data onto it (gap-fill). The spine comes from
    * `sequence` + `explode` — distributed, no driver loop; rows with no
    * match keep the spine date and null data columns.
    */
  def datespine(
      dateCol: String,
      startDate: String,
      endDate: String,
      intervalType: String = "day"): Chain = {
    val spineName = Naming.cleanse(s"${dateCol}_spine")
    val spine = c.df.sparkSession.range(1).select(
      explode(sequence(
        lit(startDate).cast("date"),
        lit(endDate).cast("date"),
        expr(s"INTERVAL 1 ${intervalType.toUpperCase}"))).as(spineName))
    val keyed = c.df.withColumn("_graft_dk", to_date(date_trunc(intervalType, col(dateCol))))
    val df2 = spine.join(keyed, spine(spineName) === keyed("_graft_dk"), "left")
      .drop("_graft_dk")
    c.next("datespine", df2, Some(
      s"SELECT * FROM (SELECT EXPLODE(SEQUENCE(CAST('$startDate' AS DATE), CAST('$endDate' AS DATE), " +
        s"INTERVAL 1 ${intervalType.toUpperCase})) AS $spineName) " +
        s"LEFT JOIN (SELECT *, CAST(DATE_TRUNC('$intervalType', $dateCol) AS DATE) AS _graft_dk FROM {{source}}) " +
        s"ON $spineName = _graft_dk"))
  }

  /** datespine_groups(group_by, date_col, start, end, interval_type): a
    * spine per group — distinct groups × exploded calendar, left-joined.
    * The distinct-groups side is the only shuffle; the spine explode is
    * per-row and needs no driver action.
    */
  /** resample_fill(group_by, date_col, start, end, interval, value_cols,
    * method): regular per-group time grid with gaps filled —
    * [[datespineGroups]] plus per-value-column gap fill (`<col>_filled`).
    * `method = "ffill"` carries the last observation forward
    * (`last(ignoreNulls)` over the spine order); `method = "linear"`
    * interpolates interior gaps between the surrounding observations by
    * spine position and leaves leading/trailing gaps null (no
    * extrapolation). The standard time-series regularization before
    * lag/rolling features: real feeds have holes,
    * window features over holey grids silently shorten their horizons.
    * Expects one source row per (group, bucket) — aggregate first (the
    * usual pipeline order); with duplicates the fill picks the bucket's
    * last row in partition order, which is not deterministic.
    * One shuffle on the group keys; the fill reuses the spine join's
    * partitioning.
    */
  def resampleFill(groupBy: Seq[String], dateCol: String, startDate: String,
                   endDate: String, intervalType: String,
                   valueCols: Seq[String], method: String = "ffill"): Chain = {
    require(valueCols.nonEmpty, "resample_fill needs at least one value column")
    require(Seq("ffill", "linear").contains(method),
      s"resample_fill method must be ffill or linear, got $method")
    val spined = datespineGroups(groupBy, dateCol, startDate, endDate, intervalType)
    val spineName = Naming.cleanse(s"${dateCol}_spine")
    val W = org.apache.spark.sql.expressions.Window
    val ord = W.partitionBy(groupBy.map(col): _*).orderBy(col(spineName).asc)
    val back = ord.rowsBetween(Long.MinValue, 0)
    val fwd = ord.rowsBetween(0, Long.MaxValue)
    val overSql = s"OVER (PARTITION BY ${groupBy.mkString(", ")} ORDER BY $spineName ASC"
    val filled = valueCols.foldLeft(spined.df) { (d, v) =>
      val out = Naming.cleanse(s"${v}_filled")
      if (method == "ffill")
        d.withColumn(out, last(col(v), ignoreNulls = true).over(back))
      else {
        // linear: interior gaps interpolate between the surrounding
        // observations by spine position; leading/trailing gaps stay null
        // (no extrapolation). The position is materialized as a column
        // first — window calls can't nest (engines rightly reject it) —
        // then one interpolation expression identical across engines.
        val x = col(v).cast("double")
        val pos = col("_rsf_pos")
        val pv = last(x, ignoreNulls = true).over(back)
        val pp = last(when(x.isNotNull, pos), ignoreNulls = true).over(back)
        val nv = first(x, ignoreNulls = true).over(fwd)
        val np = first(when(x.isNotNull, pos), ignoreNulls = true).over(fwd)
        d.withColumn("_rsf_pos", row_number().over(ord).cast("double"))
          .withColumn(out,
            when(x.isNotNull, x)
              .otherwise(pv + (nv - pv) * (pos - pp) / (np - pp)))
          .drop("_rsf_pos")
      }
    }
    val frags = valueCols.map { v =>
      val out = Naming.cleanse(s"${v}_filled")
      if (method == "ffill")
        s"LAST($v) IGNORE NULLS $overSql ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS $out"
      else {
        val x = s"CAST($v AS DOUBLE)"
        val backS = s"$overSql ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        val fwdS = s"$overSql ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
        val pv = s"LAST($x) IGNORE NULLS $backS"
        val pp = s"LAST(CASE WHEN $x IS NOT NULL THEN _rsf_pos END) IGNORE NULLS $backS"
        val nv = s"FIRST($x) IGNORE NULLS $fwdS"
        val np = s"FIRST(CASE WHEN $x IS NOT NULL THEN _rsf_pos END) IGNORE NULLS $fwdS"
        s"CASE WHEN $x IS NOT NULL THEN $x ELSE $pv + ($nv - $pv) * (_rsf_pos - $pp) / ($np - $pp) END AS $out"
      }
    }
    val face =
      if (method == "ffill") s"SELECT *, ${frags.mkString(", ")} FROM {{source}}"
      else s"SELECT * EXCEPT (_rsf_pos), ${frags.mkString(", ")} FROM " +
        s"(SELECT *, CAST(ROW_NUMBER() $overSql) AS DOUBLE) AS _rsf_pos FROM {{source}})"
    spined.next("resample_fill", filled, Some(face))
  }

  def datespineGroups(
      groupBy: Seq[String],
      dateCol: String,
      startDate: String,
      endDate: String,
      intervalType: String = "day"): Chain = {
    val spineName = Naming.cleanse(s"${dateCol}_spine")
    // rename group cols on the spine side: both sides derive from the same
    // plan, and unaliased self-join references are ambiguous
    val groups = c.df.select(groupBy.map(n => col(n).as(s"_g_$n")): _*).distinct()
    val spined = groups.withColumn(spineName,
      explode(sequence(
        lit(startDate).cast("date"),
        lit(endDate).cast("date"),
        expr(s"INTERVAL 1 ${intervalType.toUpperCase}"))))
    val keyed = c.df.withColumn("_graft_dk", to_date(date_trunc(intervalType, col(dateCol))))
    // both sides descend from the same plan: alias-qualify every reference
    val cond = (groupBy.map(g => s"_s._g_$g = _k.$g") :+ s"_s.$spineName = _k._graft_dk")
      .mkString(" AND ")
    val dataCols = c.df.columns.toSeq.filterNot(groupBy.contains)
    val proj = groupBy.map(g => col(s"_s._g_$g").as(g)) ++ Seq(col(s"_s.$spineName")) ++
      dataCols.map(n => col(s"_k.$n"))
    val df2 = spined.alias("_s").join(keyed.alias("_k"), expr(cond), "left")
      .select(proj: _*)
    val frag = {
      val gSel = (groupBy.map(g => s"_s._g_$g AS $g") :+ s"_s.$spineName" ) ++
        dataCols.map(n => s"_k.$n")
      s"SELECT ${gSel.mkString(", ")} FROM " +
        s"(SELECT ${groupBy.map(g => s"$g AS _g_$g").mkString(", ")}, $spineName FROM " +
        s"(SELECT DISTINCT ${groupBy.mkString(", ")} FROM {{source}}) " +
        s"LATERAL VIEW EXPLODE(SEQUENCE(CAST('$startDate' AS DATE), CAST('$endDate' AS DATE), INTERVAL 1 ${intervalType.toUpperCase})) AS $spineName) _s " +
        s"LEFT JOIN (SELECT *, CAST(DATE_TRUNC('$intervalType', $dateCol) AS DATE) AS _graft_dk FROM {{source}}) _k " +
        s"ON $cond"
    }
    c.next("datespine_groups", df2, Some(frag))
  }
}
