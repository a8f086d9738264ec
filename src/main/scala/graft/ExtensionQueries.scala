package graft

/** LLM-data-pipeline extension operators (SURVEY.md §2-B): dedup,
  * similarity search, text analysis, multimodal columns. Filled in
  * incrementally; each operator lives in graft.operators.* and is
  * registered here with its DuckDB oracle.
  */
object ExtensionQueries {
  val specs: Seq[QuerySpec] = Seq()
}
