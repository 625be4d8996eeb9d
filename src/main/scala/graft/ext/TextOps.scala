package graft.ext

import graft.core.{Chain, Naming}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines (beyond
  * the reference surface — SURVEY §2.4 / north star). All are pure column
  * expressions (`functions._`, whole-stage codegen'd); no UDFs, no driver
  * actions — they scale linearly with the scan.
  */
object TextOps {
  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric marks — a cheap proxy for subword tokenizer load.
    */
  def bpeishCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Canonical fingerprint: md5 of the lowercased, whitespace-collapsed,
    * trimmed text. Stable across engines (md5 is md5).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Per-language marker words for the n-gram/stopword language heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "a", "that"),
    "es" -> Seq("el", "los", "las", "de", "y", "un", "una", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(array(markers.map(lit): _*), t)))
}

final class TextAnalysisOps(private val c: Chain) extends AnyVal {
  import TextOps._

  /** token_count(text_col): whitespace tokens + BPE-ish subword proxy. */
  def tokenCounts(textCol: String): Chain = {
    val df2 = c.df
      .withColumn("n_tokens", size(tokens(col(textCol))))
      .withColumn("n_bpeish", bpeishCount(col(textCol)).cast("int"))
    c.next("token_count", df2, None)
  }

  /** quality_score(text_col): length/punctuation/stopword heuristics with a
    * composite score in [0,1]. Exact integer-ratio arithmetic — identical
    * across engines.
    */
  def qualityScore(textCol: String): Chain = {
    val txt = col(textCol)
    val nChars = length(txt).cast("double")
    val nTok = size(tokens(txt)).cast("double")
    val nPunct = (length(txt) - length(regexp_replace(txt, "[^a-zA-Z0-9\\s]", ""))).cast("double")
    val nStop = markerCount(txt, EnStopwords).cast("double")
    val df2 = c.df
      .withColumn("n_tokens", nTok.cast("int"))
      .withColumn("punct_ratio", nPunct / nChars)
      .withColumn("stopword_ratio", nStop / nTok)
      .withColumn("avg_token_len",
        length(regexp_replace(txt, "\\s+", "")).cast("double") / nTok)
      .withColumn("quality",
        least(nTok / lit(20.0), lit(1.0)) * (lit(1.0) - (nPunct / nChars)))
    c.next("quality_score", df2, None)
  }

  /** lang_id(text_col): stopword-marker vote; deterministic tie-break in
    * lexicographic language order.
    */
  def langId(textCol: String): Chain = {
    val counts = LangMarkers.map { case (lg, ms) => lg -> markerCount(col(textCol), ms) }
    val pred = counts.init.zipWithIndex.foldRight(lit(counts.last._1)) {
      case (((lg, cnt), i), elseCol) =>
        val rest = counts.drop(i + 1).map(_._2)
        when(rest.foldLeft(lit(true))((acc, r) => acc && cnt >= r), lg).otherwise(elseCol)
    }
    val df2 = counts.foldLeft(c.df) { case (d, (lg, cnt)) =>
      d.withColumn(s"score_$lg", cnt)
    }.withColumn("lang_pred", pred)
    c.next("lang_id", df2, None)
  }

  /** fingerprint(text_col): md5 of normalized text → `<col>_fp`. */
  def fingerprintCol(textCol: String): Chain =
    c.next("fingerprint",
      c.df.withColumn(Naming.cleanse(s"${textCol}_fp"), fingerprint(col(textCol))), None)

  /** rolling_fingerprint(text_col, k): Karp–Rabin min-window content
    * fingerprint → `<col>_rfp` (codegen kernel,
    * [[graft.functions.RollingFingerprint]]). A bottom-1 sketch of the
    * k-gram set: edits collide with probability ≈ shared-k-gram fraction
    * (unlike a whole-document digest, which any edit breaks); combine
    * several k values for higher-confidence grouping.
    */
  def rollingFingerprintCol(textCol: String, k: Int = 32): Chain = {
    val normalized = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    c.next("rolling_fingerprint",
      c.df.withColumn(Naming.cleanse(s"${textCol}_rfp"),
        graft.functions.RollingFingerprint(normalized, k)), None)
  }

  /** dedup_exact(id_col, text_col): keep one row per normalized-text
    * fingerprint — the smallest id wins. One shuffle on the fingerprint.
    */
  def dedupExact(idCol: String, textCol: String): Chain = {
    val fp = fingerprint(col(textCol))
    val w = Window.partitionBy(fp).orderBy(col(idCol).asc)
    val cols = c.df.columns.toSeq
    val df2 = c.df.withColumn("_graft_rn", row_number().over(w))
      .where(col("_graft_rn") === 1)
      .select(cols.map(col): _*)
    c.next("dedup_exact", df2, None)
  }
}
