package graft

/** Text-analysis + dedup workload over the documents table. */
object TextQueries {
  val all: Seq[Q] = Seq()
}
