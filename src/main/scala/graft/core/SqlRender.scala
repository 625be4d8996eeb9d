package graft.core

/** CTE assembly over the step list — the reference's `assemble_cte_chain` /
  * `assemble_view_chain` (rasgoql/primitives/rendering.py:29-96) re-expressed
  * for Spark SQL. Each non-terminal step becomes `alias AS (fragment)`; the
  * last becomes the final SELECT; single-step chains skip the WITH.
  */
object SqlRender {

  private val Src = "{{source}}"

  def cteSelect(c: Chain): String = {
    val steps = c.steps
    if (steps.isEmpty) s"SELECT * FROM ${c.entryName}"
    else {
      // resolve each step's text ONCE (deferred faces may collect)
      val texts = steps.map { s =>
        s.sqlText.getOrElse(throw new UnsupportedOperationException(
          s"operator '${s.op}' has no SQL text form; use the DataFrame face"))
      }
      def frag(i: Int): String = {
        val src = if (i == 0) c.entryName else steps(i - 1).alias
        texts(i).replace(Src, src)
      }
      if (steps.length == 1) frag(0)
      else {
        val withs = steps.indices.dropRight(1)
          .map(i => s"${steps(i).alias} AS (\n${frag(i)}\n)")
          .mkString("WITH ", ",\n", "\n")
        withs + frag(steps.length - 1)
      }
    }
  }

  /** One `CREATE OR REPLACE TEMPORARY VIEW` per step (RenderMethod.VIEWS). */
  def viewCascade(c: Chain, name: String): Seq[String] = {
    val stmts = c.steps.indices.map { i =>
      val src = if (i == 0) c.entryName else c.steps(i - 1).alias
      val frag = c.steps(i).sqlText.getOrElse(
        throw new UnsupportedOperationException(
          s"operator '${c.steps(i).op}' has no SQL text form"))
      s"CREATE OR REPLACE TEMPORARY VIEW ${c.steps(i).alias} AS\n${frag.replace(Src, src)}"
    }
    stmts :+ s"CREATE OR REPLACE TEMPORARY VIEW $name AS\nSELECT * FROM ${
      if (c.steps.isEmpty) c.entryName else c.steps.last.alias}"
  }

  def render(c: Chain, method: String, name: String): String =
    method.toUpperCase match {
      case "SELECT" => cteSelect(c)
      case "TABLE" => s"CREATE OR REPLACE TABLE $name USING PARQUET AS\n${cteSelect(c)}"
      case "VIEW" => s"CREATE OR REPLACE TEMPORARY VIEW $name AS\n${cteSelect(c)}"
      case "VIEWS" => viewCascade(c, name).mkString(";\n")
      case other => throw new IllegalArgumentException(s"unknown render method $other")
    }
}
