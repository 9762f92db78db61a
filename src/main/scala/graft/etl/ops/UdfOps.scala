package graft.etl.ops

import graft.etl.QueryDef

object UdfOps {
  def defs: Seq[QueryDef] = Seq()
}
