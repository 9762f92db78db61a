package graft.etl.ops

import graft.etl.QueryDef

object LlmOps {
  def defs: Seq[QueryDef] = Seq()
}
