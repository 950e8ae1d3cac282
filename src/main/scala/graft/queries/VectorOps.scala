package graft.queries

/** Vector similarity / ANN operators over the `embeddings` table. */
object VectorOps {
  val all: Seq[GraftQuery] = Seq()
}
