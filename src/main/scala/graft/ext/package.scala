package graft

import graft.core.Chain

/** LLM-data-pipeline extension surface (beyond reference parity — SURVEY
  * §2.4): `import graft.ext._` adds text analysis, dedup, similarity
  * search, and multimodal plumbing to [[graft.core.Chain]].
  */
package object ext {
  import scala.language.implicitConversions
  implicit def toTextAnalysisOps(c: Chain): TextAnalysisOps = new TextAnalysisOps(c)
  implicit def toDedupOps(c: Chain): DedupOps = new DedupOps(c)
  implicit def toDedupClusterOps(c: Chain): DedupClusterOps = new DedupClusterOps(c)
  implicit def toSimilarityOps(c: Chain): SimilarityOps = new SimilarityOps(c)
  implicit def toMultimodalOps(c: Chain): MultimodalOps = new MultimodalOps(c)
  implicit def toGraphOps(c: Chain): GraphOps = new GraphOps(c)
  implicit def toSelectionOps(c: Chain): SelectionOps = new SelectionOps(c)
}
