package graft.queries

/** Text-analysis / dedup operators over the `documents` table. Filled in
  * by graft.operators.* — see Dedup.scala / TextFunctions.scala. */
object TextOps {
  val all: Seq[GraftQuery] = Seq()
}
