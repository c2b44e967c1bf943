package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.functions.TextFunctions

/** Session-shared corpus working set.
  *
  * [[tokens]] is the text-side analog of the pinned adjacency views the
  * traversals plan against: a `(id, text, toks)` view materialized once per
  * (session, input plan) via [[graft.core.Pin]], so every operator that
  * needs the token array of the same document set — MinHash signatures,
  * quality gates, language id — reads one materialization instead of
  * re-running the tokenizer. At cluster scale this is the
  * `persist(MEMORY_AND_DISK)` of the tokenized corpus that a multi-stage
  * curation job would hold for its lifetime.
  */
object Corpus {

  /** Pinned `(idCol, textCol, toks)` view of a document table. Callers that
    * tokenize the same input plan share the materialization. Derived-pinned:
    * stays materialized even in store-resident mode (the deployment writes
    * the tokenized corpus once, beside the source table). */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.core.Pin.pinDerived(docs.select(col(idCol), col(textCol),
      TextFunctions.tokenize(col(textCol)).as("toks")))
}
