package graft.ops

import graft.core.Chain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Joins / set ops — reference transforms #13-17 (SURVEY §2.2). All are
  * equi-joins (the reference template library has no theta/as-of joins);
  * physical strategy (broadcast vs shuffled hash vs sort-merge) is left to
  * Catalyst + AQE, which sees the actual sizes — callers can pass an already
  * `broadcast(...)`-hinted frame for small dimensions.
  */
final class JoinOps(private val c: Chain) extends AnyVal {

  /** join(join_table, join_type, join_columns, join_prefix): key-map
    * `{leftCol -> rightCol}`; result = left.* + right non-key columns,
    * optionally prefixed (mirrors the reference's rendered join,
    * tutorials/rasgoql-join-example.ipynb:2772-2804).
    */
  def join(
      other: Chain,
      joinType: String,
      joinColumns: Seq[(String, String)],
      joinPrefix: String = ""): Chain = {
    val l = c.df.alias("_l")
    val r = other.df.alias("_r")
    val cond = joinColumns
      .map { case (lk, rk) => col(s"_l.$lk") === col(s"_r.$rk") }
      .reduce(_ && _)
    val rightKeys = joinColumns.map(_._2).toSet
    val leftCols = c.df.columns.toSeq
    val rightKept = other.df.columns.toSeq.filterNot(rightKeys.contains)
    def outName(n: String): String =
      if (joinPrefix.nonEmpty) s"${joinPrefix}_$n"
      else if (leftCols.contains(n)) s"${n}_r"
      else n
    val proj = leftCols.map(n => col(s"_l.$n")) ++
      rightKept.map(n => col(s"_r.$n").as(outName(n)))
    val df2 = l.join(r, cond, normalize(joinType)).select(proj: _*)
    val rightSql = rightSource(other)
    val onSql = joinColumns.map { case (a, b) => s"_l.$a = _r.$b" }.mkString(" AND ")
    val selSql = (leftCols.map(n => s"_l.$n") ++
      rightKept.map(n => s"_r.$n AS ${outName(n)}")).mkString(", ")
    c.next("join", df2, Some(
      s"SELECT $selSql FROM {{source}} _l ${joinType.toUpperCase} JOIN $rightSql _r ON $onSql"))
  }

  /** simple_join(join_table, join_type, join_columns): USING-style join on
    * same-named columns.
    */
  def simpleJoin(other: Chain, joinType: String, joinColumns: Seq[String]): Chain = {
    val df2 = c.df.join(other.df, joinColumns, normalize(joinType))
    c.next("simple_join", df2, Some(
      s"SELECT * FROM {{source}} ${joinType.toUpperCase} JOIN ${rightSource(other)} " +
        s"USING (${joinColumns.mkString(", ")})"))
  }

  /** multi_join(join_tables, join_type, join_columns, join_prefixes): fold N
    * tables into a join cascade; per-table USING column lists (keys may come
    * from any table already folded in, enabling star-schema chains).
    */
  def multiJoin(
      others: Seq[(Chain, Seq[String])],
      joinType: String,
      joinPrefixes: Seq[String] = Nil): Chain = {
    val prefixes =
      if (joinPrefixes.nonEmpty) joinPrefixes else others.map(_ => "")
    val df2 = others.zip(prefixes).foldLeft(c.df) { case (acc, ((o, keys), p)) =>
      val renamed =
        if (p.isEmpty) o.df
        else o.df.columns.foldLeft(o.df)((d, n) =>
          if (keys.contains(n)) d else d.withColumnRenamed(n, s"${p}_$n"))
      acc.join(renamed, keys, normalize(joinType))
    }
    val joins = others.zip(prefixes).map { case ((o, keys), p) =>
      val src =
        if (p.isEmpty) rightSource(o)
        else {
          val cols = o.df.columns.toSeq.map(n =>
            if (keys.contains(n)) n else s"$n AS ${p}_$n")
          s"(SELECT ${cols.mkString(", ")} FROM ${rightSource(o)})"
        }
      s"${joinType.toUpperCase} JOIN $src USING (${keys.mkString(", ")})"
    }
    c.next("multi_join", df2,
      Some(s"SELECT * FROM {{source}} ${joins.mkString(" ")}"))
  }

  /** union(dataset2, keep_dupes): UNION ALL / UNION (set) by column name.
    * The SQL face lists the right branch's columns explicitly in the left
    * branch's order — SQL UNION is positional, the DataFrame union is
    * by-name, and the two must agree even when column orders differ.
    */
  def union(other: Chain, keepDupes: Boolean = true): Chain = {
    val u = c.df.unionByName(other.df)
    val df2 = if (keepDupes) u else u.distinct()
    val rightCols = c.df.columns.map(graft.core.Naming.quoteId).mkString(", ")
    c.next("union", df2, Some(
      s"SELECT * FROM {{source}} ${if (keepDupes) "UNION ALL" else "UNION"} " +
        s"SELECT $rightCols FROM ${rightSource(other)}"))
  }

  /** multi_union(union_tables, union_columns): UNION ALL of N tables on a
    * shared column list.
    */
  def multiUnion(others: Seq[Chain], unionColumns: Seq[String] = Nil): Chain = {
    val cols = if (unionColumns.nonEmpty) unionColumns else c.df.columns.toSeq
    val sel: DataFrame => DataFrame = _.select(cols.map(col): _*)
    val df2 = others.map(o => sel(o.df)).foldLeft(sel(c.df))(_ unionByName _)
    val colSql = cols.map(graft.core.Naming.quoteId).mkString(", ")
    c.next("multi_union", df2, Some(
      (s"SELECT $colSql FROM {{source}}" +:
        others.map(o => s"SELECT $colSql FROM ${rightSource(o)}"))
        .mkString(" UNION ALL ")))
  }

  /** intersect(dataset2): INTERSECT (set semantics). Beyond the reference
    * surface (it ships union only — SURVEY §2.2 note); rounds out the set
    * operators.
    */
  def intersectRows(other: Chain): Chain =
    c.next("intersect", c.df.intersect(other.df), Some(
      s"SELECT * FROM {{source}} INTERSECT SELECT * FROM ${rightSource(other)}"))

  /** except(dataset2): EXCEPT (set semantics; beyond the reference surface). */
  def exceptRows(other: Chain): Chain =
    c.next("except", c.df.except(other.df), Some(
      s"SELECT * FROM {{source}} EXCEPT SELECT * FROM ${rightSource(other)}"))

  /** sample(fraction, seed): Bernoulli row sample. Sampling is
    * partition-layout-dependent (each partition draws independently), so
    * results are deterministic for a fixed layout but not portable across
    * engines — no SQL-text face.
    */
  def sampleRows(fraction: Double, seed: Long = 42L): Chain =
    c.next("sample", c.df.sample(withReplacement = false, fraction, seed), None)

  /** A chain argument renders as its entry table when untransformed, else as
    * a derived table (the reference's sub-chain args,
    * rasgoql/primitives/transforms.py:446-447).
    */
  private def rightSource(o: Chain): String =
    if (o.steps.isEmpty) o.entryName else s"(${o.sql()})"

  private def normalize(joinType: String): String =
    joinType.trim.toLowerCase.replace(" ", "_")
}
