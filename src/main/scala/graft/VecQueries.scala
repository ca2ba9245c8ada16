package graft

/** Embedding / similarity-search workload over the embeddings table. */
object VecQueries {
  val all: Seq[Q] = Seq()
}
