package graft.etl.ops

import graft.etl.QueryDef

object StreamOps {
  def defs: Seq[QueryDef] = Seq()
}
