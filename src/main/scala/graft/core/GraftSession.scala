package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session entry point (≅ the reference's `RasgoQL` object, rasgoql/main.py:
  * 15-144): bind datasets, run raw SQL with the same destructive-keyword
  * guard, list catalog tables, start chains.
  */
final class GraftSession(val spark: SparkSession) {

  /** Bind a chain to an existing catalog table (≅ rql.dataset(fqtn)). */
  def dataset(table: String): Chain = Chain(spark, table, spark.table(table))

  /** Bind a chain to a parquet path; registers a view so the SQL render face
    * has a referenceable name.
    */
  def datasetFromParquet(path: String, name: String): Chain = {
    val df = spark.read.parquet(path)
    df.createOrReplaceTempView(name)
    Chain(spark, name, df)
  }

  /** Ingest a local DataFrame as a table (≅ dataset_from_df, main.py:62-85). */
  def datasetFromDf(df: DataFrame, name: String, overwrite: Boolean = false): Chain = {
    df.write.mode(if (overwrite) "overwrite" else "errorifexists")
      .format("parquet").saveAsTable(name)
    dataset(name)
  }

  /** Raw SQL with the reference's injection guard (`is_scary_sql`,
    * rasgoql/utils/sql.py:30-38): destructive keywords require an explicit
    * acknowledgment.
    */
  def query(sql: String, acknowledgeRisk: Boolean = false): DataFrame = {
    if (isScarySql(sql) && !acknowledgeRisk)
      throw new IllegalArgumentException(
        "query contains a destructive keyword (DELETE/TRUNCATE/DROP/ALTER/" +
          "UPDATE/INSERT/MERGE); pass acknowledgeRisk=true to run it")
    spark.sql(sql)
  }

  def queryIntoLocal(sql: String, acknowledgeRisk: Boolean = false): Array[org.apache.spark.sql.Row] =
    query(sql, acknowledgeRisk).collect()

  def isScarySql(sql: String): Boolean = {
    val words = sql.toUpperCase.split("[^A-Z]+").toSet
    Set("DELETE", "TRUNCATE", "DROP", "ALTER", "UPDATE", "INSERT", "MERGE")
      .exists(words.contains)
  }

  def listTables(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq

  // ---- user-defined transform registry (≅ rql.define_transform /
  // list_transforms, main.py:87-144)

  private val userTransforms =
    scala.collection.mutable.LinkedHashMap.empty[String, TransformTemplate]

  /** Register a named, parameterized SQL transform usable as a chain step
    * (see [[TransformTemplate]]). Re-registering a name replaces it, like
    * the reference's latest-wins template serving.
    */
  def defineTransform(name: String, arguments: Seq[String], sqlTemplate: String,
                      description: String = ""): TransformTemplate = {
    val t = TransformTemplate(name, arguments, sqlTemplate, description)
    userTransforms(name) = t
    t
  }

  def listTransforms(): Seq[TransformTemplate] = userTransforms.values.toSeq

  def transform(name: String): TransformTemplate =
    userTransforms.getOrElse(name, throw new NoSuchElementException(
      s"no transform '$name' registered; known: ${userTransforms.keys.mkString(", ")}"))

  def getSchema(table: String): Seq[(String, String)] =
    spark.table(table).schema.fields.map(f => f.name -> f.dataType.sql).toSeq

  def getDdl(table: String): String = spark.table(table).schema.toDDL
}

object GraftSession {
  /** Local-mode builder with the scale-posture defaults this engine assumes:
    * AQE on (runtime re-plan: partition coalescing, skew-join splitting,
    * broadcast demotion/promotion), UTC session, shuffle partitions sized to
    * cores rather than the 200 default.
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): GraftSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new GraftSession(spark)
  }

  def apply(spark: SparkSession): GraftSession = new GraftSession(spark)
}
