package graft.analog

import graft.Q

/** LLM-training-data pipeline operators (dedup, similarity search, text
  * analysis) over the documents/embeddings tables — filled in by
  * graft.operators.{Dedup, Similarity} and graft.functions.TextFunctions.
  */
object ExtraAnalogs {
  val queries: Seq[Q] = Seq()
}
