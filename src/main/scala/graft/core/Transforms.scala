package graft.core

/** A user-defined, named, parameterized SQL transform — the engine's
  * `define_transform` parity (reference: rasgoql/main.py:123-144 registers
  * a Jinja template; template metadata shape at
  * rasgoql/primitives/transforms.py:188-223).
  *
  * The template is Spark-SQL text with `{{source_table}}` marking the
  * chain's current state and `{{arg}}` placeholders for each declared
  * argument (the parameter-substitution subset of the reference's Jinja —
  * control flow belongs in Scala around the chain, not in the template).
  * A registered transform is a first-class chain step: it executes through
  * the same guarded SQL path as `applySql` AND renders through
  * `sql()`/`toDbt`, so user-defined steps round-trip like built-ins.
  */
final case class TransformTemplate(
    name: String,
    arguments: Seq[String],
    sqlTemplate: String,
    description: String = "") {
  require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"transform name '$name' is not an identifier")
  require(sqlTemplate.contains("{{source_table}}"),
    s"transform '$name' template must reference {{source_table}}")
  arguments.foreach(a => require(sqlTemplate.contains(s"{{$a}}"),
    s"transform '$name' declares argument '$a' the template never uses"))

  /** Substitute argument values; every declared argument must be supplied,
    * and no placeholder may survive (a typo'd `{{colname}}` silently
    * reaching SQL would fail confusingly later, or worse, parse).
    */
  def render(args: Map[String, String]): String = {
    val missing = arguments.filterNot(args.contains)
    require(missing.isEmpty, s"transform '$name' missing arguments: ${missing.mkString(", ")}")
    val unknown = args.keys.filterNot(arguments.contains)
    require(unknown.isEmpty, s"transform '$name' got undeclared arguments: ${unknown.mkString(", ")}")
    val out = args.foldLeft(sqlTemplate) { case (t, (k, v)) => t.replace(s"{{$k}}", v) }
    val leftover = "\\{\\{(?!source_table\\}\\})[A-Za-z0-9_]+\\}\\}".r.findFirstIn(out)
    leftover.foreach(p => throw new IllegalArgumentException(
      s"transform '$name' has unresolved placeholder $p after substitution"))
    out
  }
}
