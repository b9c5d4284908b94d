package graft.queries

/** LLM-data-pipeline extension operators (dedup, similarity, text,
  * multimodal) over the documents/embeddings tables. Populated
  * incrementally — see graft.functions.
  */
object ExtensionQueries {
  def all: Seq[Q] = Seq.empty
}
